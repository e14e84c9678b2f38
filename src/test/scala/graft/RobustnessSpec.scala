package graft

import graft.core.ExtractionResult
import graft.extract._
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-input hardening: decompression bombs, pathological nesting,
  * and cyclic container structures must come back as failure rows (or
  * bounded successes) — never an OOM, StackOverflowError, or runaway
  * allocation that kills the Spark task. */
class RobustnessSpec extends AnyFunSuite {

  private def total(r: ExtractionResult): Unit =
    assert(r.status == ExtractionResult.Success ||
      r.status == ExtractionResult.Failure, r.status)

  test("deeply nested JSON is a failure row, not a StackOverflowError") {
    val bomb = ("[" * 200000).getBytes("UTF-8")
    val r = JsonExtractor.extract(RawDoc("d", "bomb.json", "application/json", bomb))
    assert(r.status == ExtractionResult.Failure)
  }

  test("deeply nested PDF arrays are bounded") {
    val body = "%PDF-1.4\n1 0 obj\n" + ("[" * 150000) + ("]" * 150000) +
      "\nendobj\ntrailer << /Root 1 0 R >>\n%%EOF"
    val r = PdfExtractor.extract(RawDoc("d", "bomb.pdf", "application/pdf",
      body.getBytes("ISO-8859-1")))
    total(r)
  }

  test("deeply nested XML is a failure row") {
    val n = 5000
    val bomb = ("<?xml version=\"1.0\"?>" + ("<a>" * n) + "x" + ("</a>" * n))
      .getBytes("UTF-8")
    val r = XmlExtractor.extract(RawDoc("d", "bomb.xml", "application/xml", bomb))
    total(r)
  }

  test("deeply nested multipart MIME is depth-bounded") {
    val depth = 500
    val sb = new StringBuilder
    sb.append("From: a@b.c\r\nSubject: bomb\r\n")
    for (i <- 0 until depth)
      sb.append(s"""Content-Type: multipart/mixed; boundary="b$i"\r\n\r\n--b$i\r\n""")
    sb.append("Content-Type: text/plain\r\n\r\nleaf\r\n")
    val r = EmlExtractor.extract(RawDoc("d", "bomb.eml", "message/rfc822",
      sb.toString.getBytes("UTF-8")))
    total(r)
  }

  test("PDF deflate bomb hits the output cap instead of inflating 100MB+") {
    // ~128 MiB of zeros deflates to ~127 KiB (>1000x ratio)
    val zeros = new Array[Byte](128 * 1024 * 1024)
    val deflater = new java.util.zip.Deflater(9)
    deflater.setInput(zeros); deflater.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val stream = out.toByteArray
    assert(stream.length < 1024 * 1024)
    intercept[graft.core.ProcessingError](PdfExtractor.inflate(stream))
    // end-to-end: a PDF page carrying the bomb stream is a failure row
    val head = "%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${stream.length} /Filter /FlateDecode >> stream\n"
    val tail = "\nendstream endobj\ntrailer << /Root 1 0 R >>\n%%EOF"
    val pdf = new java.io.ByteArrayOutputStream()
    pdf.write(head.getBytes("ISO-8859-1"))
    pdf.write(stream)
    pdf.write(tail.getBytes("ISO-8859-1"))
    val r = PdfExtractor.extract(RawDoc("d", "bomb.pdf", "application/pdf",
      pdf.toByteArray))
    assert(r.status == ExtractionResult.Failure, r.error)
  }

  test("7z declaring an absurd unpack size hits the cap, not an allocation") {
    // valid container around a folder whose kCodersUnpackSize claims 1 GiB
    val small = SevenZipWriter.write("x.txt", "tiny".getBytes)
    val r = SevenZipExtractor.extract(RawDoc("d", "bomb.7z",
      "application/x-7z-compressed", small))
    assert(r.status == graft.core.ExtractionResult.Success) // sanity: writer output ok
    // flip bytes in the trailing (plaintext) header — any outcome must be
    // total (success, or clean failure), never an OOM-scale allocation
    for (i <- small.length - 40 until small.length) {
      val b = small.clone(); b(i) = 0xff.toByte
      val rr = SevenZipExtractor.extract(RawDoc("d", "f.7z", "", b))
      assert(rr.status == graft.core.ExtractionResult.Success ||
        rr.status == graft.core.ExtractionResult.Failure)
    }
  }

  test("lzma2 chunk claiming more output than the cap aborts") {
    intercept[graft.core.ProcessingError](
      Lzma.decodeLzma2(Array[Byte](0x01, 0x7f.toByte, 0xff.toByte), 1L << 40))
  }

  test("sqlite overflow-chain loop is bounded") {
    // writer output corrupted so a payload points overflow at itself would
    // need a crafted file; the guard is the chain counter — drive it via a
    // random-ish mutation sweep staying total
    val ok = Sqlite.write("t", Seq("a"), Seq(Seq("x" * 100)))
    for (i <- 16 until math.min(ok.length, 4096) by 97) {
      val b = ok.clone(); b(i) = (b(i) ^ 0x5a).toByte
      val r = SqliteExtractor.extract(RawDoc("d", "m.sqlite", "", b))
      assert(r.status == graft.core.ExtractionResult.Success ||
        r.status == graft.core.ExtractionResult.Failure)
    }
  }

  /** Rewrites the writer's leaf (page 2) as one cell whose payload of
    * `total` bytes spills to overflow page 3, which points at itself. */
  private def sqliteWithOverflow(total: Long): Array[Byte] = {
    val ok = Sqlite.write("t", Seq("a"), Seq(Seq("x")))
    val bytes = java.util.Arrays.copyOf(ok, 4096 * 3) // append page 3
    def varint(v: Long): Array[Byte] = {
      if (v < 128) Array(v.toByte)
      else {
        val parts = scala.collection.mutable.ArrayBuffer[Byte]()
        var x = v
        while (x > 0) { parts.prepend((x & 0x7f).toByte); x >>= 7 }
        (parts.init.map(b => (b | 0x80).toByte) :+ parts.last).toArray
      }
    }
    val usable = 4096
    val localMax = usable - 35
    val localMin = (usable - 12) * 32 / 255 - 23
    val k = localMin + ((total - localMin) % (usable - 4)).toInt
    val local = if (total <= localMax) total.toInt
                else if (k <= localMax) k else localMin
    val cell = varint(total) ++ varint(1L) ++ new Array[Byte](local) ++
      Array[Byte](0, 0, 0, 3) // overflow -> page 3
    java.util.Arrays.fill(bytes, 4096, 8192, 0.toByte)
    bytes(4096) = 0x0d // table leaf
    bytes(4096 + 3) = 0; bytes(4096 + 4) = 1 // one cell
    val cellOff = 4096 - cell.length
    bytes(4096 + 5) = ((cellOff >> 8) & 0xff).toByte
    bytes(4096 + 6) = (cellOff & 0xff).toByte
    bytes(4096 + 8) = ((cellOff >> 8) & 0xff).toByte
    bytes(4096 + 9) = (cellOff & 0xff).toByte
    System.arraycopy(cell, 0, bytes, 4096 + cellOff, cell.length)
    // page 3: next-overflow pointer = 3 (self-cycle)
    bytes(8192 + 3) = 3
    bytes
  }

  test("crafted cyclic sqlite overflow chain fails cleanly (no 2GB alloc)") {
    // 50 MB declared payload, chain 3 -> 3: visited-set must fire
    val r = SqliteExtractor.extract(RawDoc("d", "m.sqlite", "", sqliteWithOverflow(50L * 1000 * 1000)))
    assert(r.status == graft.core.ExtractionResult.Failure, r.error)
  }

  test("sqlite payload beyond the member cap is rejected before allocating") {
    val r = SqliteExtractor.extract(RawDoc("d", "m.sqlite", "", sqliteWithOverflow(200L * 1000 * 1000)))
    assert(r.status == graft.core.ExtractionResult.Failure, r.error)
  }

  test("crafted self-referencing sqlite interior page aborts, not nCells^32") {
    // a table large enough for an interior root at page 2; point its
    // rightmost-child at itself
    val rows = (0 until 400).map(i => Seq(s"row $i " + "pad" * 30))
    val ok = Sqlite.write("t", Seq("a"), rows)
    assert((ok(4096) & 0xff) == 0x05, "expected interior root")
    val b = ok.clone()
    b(4096 + 8) = 0; b(4096 + 9) = 0; b(4096 + 10) = 0; b(4096 + 11) = 2
    val r = SqliteExtractor.extract(RawDoc("d", "m.sqlite", "", b))
    assert(r.status == graft.core.ExtractionResult.Failure, r.error)
  }

  test("cyclic CFBF FAT chain aborts instead of amplifying") {
    // minimal CFBF: 512B header, sector 0 = FAT, directory chain 1 -> 1 (cycle)
    val bytes = new Array[Byte](512 * 3)
    val sig = Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1)
      .map(_.toByte)
    System.arraycopy(sig, 0, bytes, 0, 8)
    def putI32(off: Int, v: Int): Unit = {
      bytes(off) = (v & 0xff).toByte
      bytes(off + 1) = ((v >> 8) & 0xff).toByte
      bytes(off + 2) = ((v >> 16) & 0xff).toByte
      bytes(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def putI16(off: Int, v: Int): Unit = {
      bytes(off) = (v & 0xff).toByte
      bytes(off + 1) = ((v >> 8) & 0xff).toByte
    }
    putI16(30, 9)     // sector shift: 512
    putI16(32, 6)     // mini sector shift: 64
    putI32(44, 1)     // number of FAT sectors
    putI32(48, 1)     // first directory sector = sid 1
    putI32(56, 4096)  // mini cutoff
    putI32(60, -2)    // no miniFAT
    putI32(68, -2)    // no DIFAT chain
    putI32(72, 0)
    putI32(76, 0)     // DIFAT[0]: FAT lives in sector 0
    for (k <- 1 until 109) putI32(76 + 4 * k, -1)
    // FAT sector (sid 0): fat[0] = FATSECT marker, fat[1] = 1 (self-cycle)
    putI32(512, -3)
    putI32(516, 1)
    for (k <- 2 until 128) putI32(512 + 4 * k, -1)
    intercept[graft.core.ProcessingError](Cfbf.parse(bytes))
    // and through the extractor: failure row, not a hang/OOM
    val r = MsgExtractor.extract(RawDoc("d", "cyc.msg",
      "application/vnd.ms-outlook", bytes))
    assert(r.status == ExtractionResult.Failure)
  }
}
