package graft

import graft.corpus.CorpusGen
import graft.ocr.{Bmp, Glyphs, Ocr, Raster, StubOcr}
import graft.pipeline.Pipeline
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** OCR plumbing parity (reference `support/ocr.py`, `support/pdf.py:
  * 105-147`) around the deterministic glyph-raster stand-in engine. */
class OcrSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("raster → recognize roundtrip is lossless over the full charset") {
    val text = "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG 0123456789"
    for (scale <- Seq(1, 2, 3)) {
      val img = Raster.renderText(text, scale)
      assert(StubOcr.extractText(img) == text, s"scale=$scale")
    }
  }

  test("recognizer is nearest-template: single flipped dots still decode") {
    val img = Raster.renderText("HELLO WORLD", scale = 1)
    // flip one pixel somewhere inside the first glyph cell
    val Some((w, _, _)) = Bmp.read(img): @unchecked
    val corrupted = img.clone()
    val off = 54 + 2 * (((w * 3 + 3) / 4) * 4) + 3 // row 2, col 1
    corrupted(off) = (~corrupted(off)).toByte
    assert(StubOcr.extractText(corrupted) == "HELLO WORLD")
  }

  test("non-image bytes yield empty text (reference: Pillow open failure → '')") {
    assert(StubOcr.extractText("not an image".getBytes) == "")
    assert(StubOcr.extractText(Array[Byte]('B', 'M', 1, 2)) == "")
  }

  test("size window: ≤2 KiB and ≥30 MiB-1 KiB are rejected with None (ocr.py:20-26)") {
    val tiny = Raster.renderText("HI", scale = 1)
    assert(tiny.length <= Ocr.MinSize)
    assert(Ocr.extractOcrText(tiny).isEmpty)
    val big = new Array[Byte](Ocr.MaxSize)
    assert(Ocr.extractOcrText(big).isEmpty)
    val inWindow = Raster.renderText("IN THE WINDOW", scale = 2, minWidthChars = 30)
    assert(inWindow.length > Ocr.MinSize && inWindow.length < Ocr.MaxSize)
    assert(Ocr.extractOcrText(inWindow).contains("IN THE WINDOW"))
  }

  test("cache key = sha1(bytes) + sorted languages; per-JVM memo skips the engine") {
    val img = Raster.renderText("CACHED TEXT", scale = 2, minWidthChars = 30)
    assert(Ocr.cacheKey(img, Seq("deu", "eng")) == Ocr.cacheKey(img, Seq("eng", "deu", "eng")))
    assert(Ocr.cacheKey(img, Seq("eng")) != Ocr.cacheKey(img, Seq("deu")))
    Ocr.clearCacheForTests()
    val before = StubOcr.invocations.get()
    assert(Ocr.extractOcrText(img).contains("CACHED TEXT"))
    assert(Ocr.extractOcrText(img).contains("CACHED TEXT"))
    assert(StubOcr.invocations.get() == before + 1, "second call must hit the memo")
  }

  test("empty OCR result is cached but surfaced as None (normality.stringify)") {
    Ocr.clearCacheForTests()
    // all-blank raster, comfortably in the size window → engine runs, text ""
    val blank = Raster.renderText("", scale = 2, minWidthChars = 40)
    assert(blank.length > Ocr.MinSize)
    val before = StubOcr.invocations.get()
    assert(Ocr.extractOcrText(blank).isEmpty)
    assert(Ocr.extractOcrText(blank).isEmpty)
    assert(StubOcr.invocations.get() == before + 1)
  }

  test("ocrDataFrame: engine runs once per DISTINCT image (cache-dedup join)") {
    import spark.implicits._
    Ocr.clearCacheForTests()
    val imgs = spark.range(0, 200).as[Long].map { id =>
      (id, Raster.renderText("GROUP " + (id % 10), scale = 2, minWidthChars = 30))
    }.toDF("id", "img")
    StubOcr.invocations.set(0)
    val out = Ocr.ocrDataFrame(spark, imgs, "id", "img")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out.size == 200)
    (0L until 200L).foreach(id => assert(out(id) == "GROUP " + (id % 10)))
    assert(StubOcr.invocations.get() == 10,
      s"expected 10 engine runs for 10 distinct images, got ${StubOcr.invocations.get()}")
  }

  test("ocrDataFrame plan: bytes reach the engine via a partial-aggregated distinct, result join carries no bytes") {
    import spark.implicits._
    val imgs = spark.range(0, 50).as[Long].map { id =>
      (id, Raster.renderText("X" + (id % 5), scale = 2, minWidthChars = 30))
    }.toDF("id", "img")
    val out = Ocr.ocrDataFrame(spark, imgs, "id", "img")
    val plan = out.queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toVector
    // partial first() below the exchange = map-side dedup of image bytes
    val exchangeIdx = lines.indexWhere(_.contains("Exchange hashpartitioning(okey"))
    assert(exchangeIdx >= 0, plan.take(2000))
    assert(lines.drop(exchangeIdx).exists(_.contains("Aggregate")), plan.take(2000))
    // the id→text join side must not carry obytes
    val joinLines = lines.filter(l => l.contains("Join") && l.contains("okey"))
    assert(joinLines.nonEmpty && joinLines.forall(!_.contains("obytes")), joinLines.mkString("\n"))
  }

  test("OCR engine is pluggable (the reference's settings._ocr_service switch)") {
    val fixed = new graft.ocr.OcrEngine {
      def extractText(d: Array[Byte]): String = "ENGINE SAYS HI"
    }
    Ocr.clearCacheForTests()
    val img = Raster.renderText("WHATEVER", scale = 2, minWidthChars = 30)
    assert(Ocr.extractOcrText(img, Nil, fixed).contains("ENGINE SAYS HI"))
    // same bytes through the default engine read the raster instead
    Ocr.clearCacheForTests()
    assert(Ocr.extractOcrText(img).contains("WHATEVER"))
  }

  test("pipeline: BMP image doc gets an OCR text span; undersized does not") {
    import spark.implicits._
    val good = Raster.renderText("PLANTED WORDS", scale = 2, minWidthChars = 30)
    val tiny = Raster.renderText("HID", scale = 1)
    val pending = spark.createDataset(Seq(
      graft.core.PendingDoc("g1", "", Seq.empty, 0, "a.bmp", "", good),
      graft.core.PendingDoc("g2", "", Seq.empty, 0, "b.bmp", "", tiny)))
    val out = Pipeline.run(spark, pending)
    val spans = out.spans.collect()
    val g1Text = spans.filter(s => s.doc_id == "g1" && s.kind == "text").map(_.text)
    assert(g1Text.toSeq == Seq("PLANTED WORDS"))
    assert(!spans.exists(s => s.doc_id == "g2" && s.kind == "text"))
    // both still carry the image span + ImageIngestor classification
    assert(out.meta.collect().forall(_.ingestor == "ImageIngestor"))
    out.cleanup()
  }

  test("pdf type3 trigger: decoy text layer discarded, image OCR text emitted") {
    val img = Raster.renderText("RASTER TRUTH", scale = 2, minWidthChars = 30)
    val pdf = CorpusGen.renderPdfOcr("DECOY LAYER", img, "T3", type3 = true)
    val res = graft.extract.PdfExtractor.extract(
      graft.extract.RawDoc("p1", "t3.pdf", "application/pdf", pdf))
    val page = res.spans.filter(_.kind == "page")
    assert(page.map(_.text) == Vector("RASTER TRUTH"), page)
    assert(!res.spans.exists(_.text.contains("DECOY")))
  }

  test("pdf non-type3 page keeps its text layer AND appends image OCR text") {
    val img = Raster.renderText("APPENDED OCR", scale = 2, minWidthChars = 30)
    val pdf = CorpusGen.renderPdfOcr("REAL LAYER", img, "T1", type3 = false)
    val res = graft.extract.PdfExtractor.extract(
      graft.extract.RawDoc("p2", "t1.pdf", "application/pdf", pdf))
    val page = res.spans.filter(_.kind == "page").map(_.text).mkString
    assert(page.contains("REAL LAYER") && page.contains("APPENDED OCR"), page)
  }

  test("classifier: plausible BMP sniffs image/bmp; 'BM' text prefix does not") {
    val img = Raster.renderText("ABC", scale = 1)
    assert(graft.classify.Classifier.sniffMime("x.bmp", img) == "image/bmp")
    val fake = ("BM" + "x" * 100).getBytes("UTF-8")
    assert(graft.classify.Classifier.sniffMime("x.txt", fake) == "text/plain")
  }

  test("glyph table: 37 distinct templates, all pairwise Hamming ≥ 2") {
    val cs = Glyphs.chars
    assert(cs.length == 37)
    for (i <- cs.indices; j <- (i + 1) until cs.length) {
      val d = (0 until Glyphs.GlyphH).map(r =>
        Integer.bitCount(Glyphs.table(cs(i))(r) ^ Glyphs.table(cs(j))(r))).sum
      assert(d >= 2, s"${cs(i)} vs ${cs(j)} differ by only $d dots")
    }
  }
}
