package graft.ocr

import graft.core.TextUtil.sha1Hex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OCR support — the reference's plumbing (`/root/reference/ingestors/
  * support/ocr.py`) around a deterministic stand-in engine.
  *
  * The reference runs Tesseract (LocalOCRService) or the Vision API behind
  * an `OCRSupport` mixin that (a) rejects images outside a size window
  * (`ocr.py:20-21,24-26`: 2 KiB < len < 30 MiB-1 KiB), (b) caches results
  * under `sha1(bytes) + sorted(languages)` (`ocr.py:28-34`), and
  * (c) returns `None` for out-of-window or empty results (normality
  * `stringify`). Model weights aren't available in this sandbox, so the
  * ENGINE is a stand-in — but a real one, not a byte-sniffer: documents
  * are rasterized glyph-by-glyph through a 5×7 dot-matrix font into
  * uncompressed BMP images, and [[StubOcr]] recognizes them back by
  * nearest-template matching over the same font. Everything around the
  * engine (size window, cache key, cache-dedup join, PDF Type3 trigger)
  * is the reference's contract, oracle-checked end to end by `x_ocr` /
  * `t_ocr_cache`.
  */
object Glyphs {
  /** Classic 5×7 dot-matrix glyphs (public-domain font shape): 7 rows of
    * 5-bit masks, MSB = leftmost column. Charset: A-Z, 0-9, space. */
  val table: Map[Char, Array[Int]] = {
    def g(rows: Int*): Array[Int] = rows.toArray
    Map(
      'A' -> g(0x0e, 0x11, 0x11, 0x1f, 0x11, 0x11, 0x11),
      'B' -> g(0x1e, 0x11, 0x11, 0x1e, 0x11, 0x11, 0x1e),
      'C' -> g(0x0e, 0x11, 0x10, 0x10, 0x10, 0x11, 0x0e),
      'D' -> g(0x1e, 0x11, 0x11, 0x11, 0x11, 0x11, 0x1e),
      'E' -> g(0x1f, 0x10, 0x10, 0x1e, 0x10, 0x10, 0x1f),
      'F' -> g(0x1f, 0x10, 0x10, 0x1e, 0x10, 0x10, 0x10),
      'G' -> g(0x0e, 0x11, 0x10, 0x17, 0x11, 0x11, 0x0f),
      'H' -> g(0x11, 0x11, 0x11, 0x1f, 0x11, 0x11, 0x11),
      'I' -> g(0x0e, 0x04, 0x04, 0x04, 0x04, 0x04, 0x0e),
      'J' -> g(0x07, 0x02, 0x02, 0x02, 0x02, 0x12, 0x0c),
      'K' -> g(0x11, 0x12, 0x14, 0x18, 0x14, 0x12, 0x11),
      'L' -> g(0x10, 0x10, 0x10, 0x10, 0x10, 0x10, 0x1f),
      'M' -> g(0x11, 0x1b, 0x15, 0x15, 0x11, 0x11, 0x11),
      'N' -> g(0x11, 0x19, 0x15, 0x13, 0x11, 0x11, 0x11),
      'O' -> g(0x0e, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0e),
      'P' -> g(0x1e, 0x11, 0x11, 0x1e, 0x10, 0x10, 0x10),
      'Q' -> g(0x0e, 0x11, 0x11, 0x11, 0x15, 0x12, 0x0d),
      'R' -> g(0x1e, 0x11, 0x11, 0x1e, 0x14, 0x12, 0x11),
      'S' -> g(0x0f, 0x10, 0x10, 0x0e, 0x01, 0x01, 0x1e),
      'T' -> g(0x1f, 0x04, 0x04, 0x04, 0x04, 0x04, 0x04),
      'U' -> g(0x11, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0e),
      'V' -> g(0x11, 0x11, 0x11, 0x11, 0x11, 0x0a, 0x04),
      'W' -> g(0x11, 0x11, 0x11, 0x15, 0x15, 0x1b, 0x11),
      'X' -> g(0x11, 0x11, 0x0a, 0x04, 0x0a, 0x11, 0x11),
      'Y' -> g(0x11, 0x11, 0x0a, 0x04, 0x04, 0x04, 0x04),
      'Z' -> g(0x1f, 0x01, 0x02, 0x04, 0x08, 0x10, 0x1f),
      '0' -> g(0x0e, 0x11, 0x13, 0x15, 0x19, 0x11, 0x0e),
      '1' -> g(0x04, 0x0c, 0x04, 0x04, 0x04, 0x04, 0x0e),
      '2' -> g(0x0e, 0x11, 0x01, 0x06, 0x08, 0x10, 0x1f),
      '3' -> g(0x0e, 0x11, 0x01, 0x06, 0x01, 0x11, 0x0e),
      '4' -> g(0x02, 0x06, 0x0a, 0x12, 0x1f, 0x02, 0x02),
      '5' -> g(0x1f, 0x10, 0x1e, 0x01, 0x01, 0x11, 0x0e),
      '6' -> g(0x06, 0x08, 0x10, 0x1e, 0x11, 0x11, 0x0e),
      '7' -> g(0x1f, 0x01, 0x02, 0x04, 0x08, 0x08, 0x08),
      '8' -> g(0x0e, 0x11, 0x11, 0x0e, 0x11, 0x11, 0x0e),
      '9' -> g(0x0e, 0x11, 0x11, 0x0f, 0x01, 0x02, 0x0c),
      ' ' -> g(0, 0, 0, 0, 0, 0, 0))
  }
  val chars: Array[Char] = table.keys.toArray.sorted
  val GlyphW = 5
  val GlyphH = 7
  val CellW = 6 // 5 glyph columns + 1 blank separator

  /** The 35 dots of each glyph packed into one Long (row r occupies bits
    * [5r, 5r+5)), aligned with [[chars]]: XOR + one popcount gives the same
    * Hamming distance as the per-row sum, and iterating this array in
    * [[chars]] order preserves the strict-< first-minimum tie-break. */
  val packed: Array[Long] = chars.map { c =>
    val rows = table(c)
    var acc = 0L
    var r = 0
    while (r < GlyphH) { acc |= (rows(r).toLong & 0x1f) << (5 * r); r += 1 }
    acc
  }
}

/** Minimal uncompressed 24-bpp BMP (BITMAPFILEHEADER + BITMAPINFOHEADER —
  * fully public format): enough for lossless glyph rasters. */
object Bmp {
  def write(w: Int, h: Int, gray: Array[Byte]): Array[Byte] = {
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val dataSize = rowBytes * h
    val out = new Array[Byte](54 + dataSize)
    def le32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    le32(2, out.length); le32(10, 54)
    le32(14, 40); le32(18, w); le32(22, h)
    out(26) = 1; out(28) = 24
    le32(34, dataSize)
    var y = 0
    while (y < h) {
      val srcRow = h - 1 - y // BMP rows are bottom-up
      var x = 0
      while (x < w) {
        val v = gray(srcRow * w + x)
        val off = 54 + y * rowBytes + x * 3
        out(off) = v; out(off + 1) = v; out(off + 2) = v
        x += 1
      }
      y += 1
    }
    out
  }

  /** → (width, height, top-down grayscale) or None if not a 24-bpp BMP. */
  def read(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    def le32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    val dataOff = le32(10)
    val w = le32(18); val h = le32(22)
    val bpp = (bytes(28) & 0xff) | ((bytes(29) & 0xff) << 8)
    if (bpp != 24 || w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20)) return None
    val rowBytes = ((w * 3 + 3) / 4) * 4
    if (dataOff.toLong + rowBytes.toLong * h > bytes.length) return None
    val gray = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      val srcRow = h - 1 - y
      var x = 0
      while (x < w) {
        val off = dataOff + srcRow * rowBytes + x * 3
        val v = ((bytes(off) & 0xff) + (bytes(off + 1) & 0xff) +
          (bytes(off + 2) & 0xff)) / 3
        gray(y * w + x) = v.toByte
        x += 1
      }
      y += 1
    }
    Some((w, h, gray))
  }
}

/** Glyph rasterizer: normalized text → BMP scan line. */
object Raster {
  import Glyphs._

  private val NonAlnum = java.util.regex.Pattern.compile("[^A-Za-z0-9 ]")

  /** The charset contract between rasterizer, recognizer and the DuckDB
    * oracle: ASCII alnum + space only (uppercased AFTER stripping, so the
    * uppercasing is pure-ASCII and portable to the oracle's `upper()`).
    * Pattern precompiled once — replaceAll recompiles per call, and this
    * runs per rendered document. */
  def normalize(text: String): String =
    NonAlnum.matcher(text).replaceAll("").toUpperCase(java.util.Locale.ROOT)

  /** Render `text` (must already be normalized) black-on-white at an
    * integer `scale`; minWidthChars pads with trailing spaces (recovered
    * as trim() on the recognizer side) so callers can force the image
    * into the OCR size window. */
  def renderText(text: String, scale: Int = 2, minWidthChars: Int = 0): Array[Byte] = {
    val padded =
      if (text.length >= minWidthChars) text
      else text + (" " * (minWidthChars - text.length))
    val w = math.max(1, padded.length) * CellW * scale
    val h = GlyphH * scale
    val gray = Array.fill[Byte](w * h)(-1) // 0xff = white
    padded.zipWithIndex.foreach { case (c0, i) =>
      val rows = table.getOrElse(c0, table(' '))
      var gy = 0
      while (gy < GlyphH) {
        var gx = 0
        while (gx < GlyphW) {
          if ((rows(gy) & (1 << (GlyphW - 1 - gx))) != 0) {
            var sy = 0
            while (sy < scale) {
              var sx = 0
              while (sx < scale) {
                val x = (i * CellW + gx) * scale + sx
                val y = gy * scale + sy
                gray(y * w + x) = 0
                sx += 1
              }
              sy += 1
            }
          }
          gx += 1
        }
        gy += 1
      }
    }
    Bmp.write(w, h, gray)
  }
}

/** Engine interface — the reference switches between `LocalOCRService`
  * (Tesseract) and `GoogleOCRService` (Vision API) via settings
  * (`ocr.py:35-40`); everything around the engine (window, cache,
  * triggers) is engine-agnostic, and so is ours. Contract: return "" for
  * undecodable input, never throw. */
trait OcrEngine extends Serializable {
  def extractText(data: Array[Byte]): String
}

/** The stand-in engine: template-match each character cell against the
  * glyph table (nearest by Hamming distance over the 35 dots). Mirrors
  * the reference's `LocalOCRService.extract_text` contract: unopenable
  * image data → "" (`ocr.py:90-94`). */
object StubOcr extends OcrEngine {
  import Glyphs._

  /** Engine invocation counter — observable by cache tests (the reference
    * logs per-invocation; we count). */
  val invocations = new java.util.concurrent.atomic.AtomicLong(0)

  def extractText(data: Array[Byte]): String = {
    invocations.incrementAndGet()
    Bmp.read(data) match {
      case None => "" // cannot open image data (reference: Pillow error)
      case Some((w, h, gray)) =>
        if (h % GlyphH != 0) return ""
        val scale = h / GlyphH
        if (scale == 0 || w % (CellW * scale) != 0) return ""
        val nCells = w / (CellW * scale)
        val sb = new StringBuilder(nCells)
        val tmpl = Glyphs.packed
        val cs = Glyphs.chars
        var cell = 0
        while (cell < nCells) {
          // downsample the cell to a 5×7 dot mask (majority vote per dot),
          // packed 5 bits per row into one Long (same layout as
          // Glyphs.packed, MSB = leftmost column within each row)
          var maskL = 0L
          var gy = 0
          while (gy < GlyphH) {
            var gx = 0
            while (gx < GlyphW) {
              var dark = 0
              var sy = 0
              while (sy < scale) {
                var sx = 0
                while (sx < scale) {
                  val x = (cell * CellW + gx) * scale + sx
                  val y = gy * scale + sy
                  if ((gray(y * w + x) & 0xff) < 128) dark += 1
                  sx += 1
                }
                sy += 1
              }
              if (dark * 2 >= scale * scale)
                maskL |= 1L << (5 * gy + (GlyphW - 1 - gx))
              gx += 1
            }
            gy += 1
          }
          // nearest template by Hamming distance: one XOR + popcount per
          // glyph over the packed 35 dots (identical distance and first-
          // minimum tie-break as the per-row loop this replaces)
          var bestChar = ' '
          var bestDist = Int.MaxValue
          var ci = 0
          while (ci < tmpl.length) {
            val d = java.lang.Long.bitCount(maskL ^ tmpl(ci))
            if (d < bestDist) { bestDist = d; bestChar = cs(ci) }
            ci += 1
          }
          sb.append(bestChar)
          cell += 1
        }
        sb.toString
    }
  }
}

/** `OCRSupport` parity: size window, sha1+languages cache key, per-JVM
  * memo, and the cluster-scale cache shape as a DataFrame op. */
object Ocr {
  /** `ocr.py:20-21`: MIN_SIZE < len < MAX_SIZE, both strict. */
  val MinSize: Int = 1024 * 2
  val MaxSize: Int = 1024 * 1024 * 30 - 1024

  /** `ocr.py:29-30`: key = make_key("ocr", sha1(data), *sorted(langs)). */
  def cacheKey(data: Array[Byte], languages: Seq[String]): String =
    ("ocr" +: sha1Hex(data) +: languages.distinct.sorted).mkString(":")

  // Per-JVM (executor-local) memo — the reference's Redis tag cache is
  // cross-worker; the distributed analogue is [[ocrDataFrame]]'s
  // hash-distinct join, this map just catches within-JVM repeats (e.g.
  // the same image attached to many documents in one partition). Bounded
  // by wholesale clear — OCR text is small, the map would need ~100k
  // entries to matter.
  private val memo = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val MemoCap = 100000

  def clearCacheForTests(): Unit = memo.clear()

  /** `extract_ocr_text` parity: None outside the size window, cached by
    * content+languages, None for empty text (normality.stringify). The
    * engine is pluggable (reference `settings._ocr_service`); one engine
    * is active per deployment, so the cache key stays engine-free as in
    * the reference. */
  def extractOcrText(data: Array[Byte], languages: Seq[String] = Nil,
                     engine: OcrEngine = StubOcr): Option[String] = {
    if (data == null) return None
    if (!(MinSize < data.length && data.length < MaxSize)) return None
    val key = cacheKey(data, languages)
    val cached = memo.get(key)
    val text =
      if (cached != null) cached
      else {
        val t = engine.extractText(data).trim
        if (memo.size() >= MemoCap) memo.clear()
        memo.put(key, t)
        t
      }
    if (text.isEmpty) None else Some(text)
  }

  /** The 100 TB cache shape: OCR each distinct image ONCE cluster-wide.
    * `groupBy(sha1(bytes)).agg(first(bytes))` partial-aggregates map-side,
    * so the exchange carries one copy of each distinct image per map
    * partition (shuffle volume ~ distinct images, not rows); the OCR pass
    * runs over distincts only; results join back to ids on the 40-char
    * key — image bytes never ride the result join. */
  def ocrDataFrame(spark: SparkSession, df: DataFrame, idCol: String,
                   bytesCol: String, languages: Seq[String] = Nil,
                   engine: OcrEngine = StubOcr): DataFrame = {
    import spark.implicits._
    val keyed = df.select(col(idCol).as("id"),
      sha1(col(bytesCol)).as("okey"), col(bytesCol).as("obytes"))
    val langs = languages
    val eng = engine
    val texts = keyed.groupBy(col("okey")).agg(first(col("obytes")).as("obytes"))
      .select(col("okey"), col("obytes")).as[(String, Array[Byte])]
      .mapPartitions(_.map { case (k, b) =>
        (k, Ocr.extractOcrText(b, langs, eng).orNull)
      }).toDF("okey", "ocr_text")
    keyed.select(col("id"), col("okey"))
      .join(texts, "okey")
      .select(col("id").as(idCol), col("ocr_text"))
  }
}
