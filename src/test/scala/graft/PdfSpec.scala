package graft

import graft.core._
import graft.corpus.CorpusGen
import graft.extract.{PdfExtractor, RawDoc}
import org.scalatest.funsuite.AnyFunSuite

/** PDF goldens mirroring /root/reference/tests/test_pdf.py. */
class PdfSpec extends AnyFunSuite {

  private def raw(bytes: Array[Byte]) = RawDoc("t", "doc.pdf", "application/pdf", bytes)

  test("multi-page text: one page span per page, line breaks preserved (test_pdf.py:33-40 shape)") {
    val pdf = CorpusGen.renderPdf(
      (1 to 3).map(_ => Seq("Hello, World!", "Hello, World!")), "500 pages")
    val res = PdfExtractor.extract(raw(pdf))
    assert(res.status == ExtractionResult.Success)
    assert(res.spans.map(_.kind) == Vector("page", "page", "page"))
    assert(res.spans.map(_.offset) == Vector(1, 2, 3))
    assert(res.spans.forall(_.text == "Hello, World!\nHello, World!"))
    assert(res.properties("pageCount") == Seq("3"))
    assert(res.properties("title") == Seq("500 pages"))
  }

  test("simple readme-style pdf: body text extracted (test_pdf.py:18-31 shape)") {
    val pdf = CorpusGen.renderPdf(Seq(Seq(
      "Ingestors extract useful information",
      "in a structured standard format")))
    val res = PdfExtractor.extract(raw(pdf))
    assert(res.spans.head.text.contains("Ingestors extract useful information"))
  }

  test("encrypted pdf fails with ENCRYPTED_MSG (test_pdf.py:80-90)") {
    val pdf = new String(CorpusGen.renderPdf(Seq(Seq("secret"))), "ISO-8859-1")
      .replace("trailer\n<< /Size", "trailer\n<< /Encrypt 99 0 R /Size")
      .getBytes("ISO-8859-1")
    val res = PdfExtractor.extract(raw(pdf))
    assert(res.status == ExtractionResult.Failure)
    assert(res.error == ProcessingError.EncryptedMsg)
  }

  test("garbage after %PDF magic is a clean failure") {
    val res = PdfExtractor.extract(raw("%PDF-1.7 then nothing useful".getBytes))
    assert(res.status == ExtractionResult.Failure)
    assert(res.error.startsWith("Could not extract PDF file"))
  }

  test("classifier routes pdf magic; x2 only when declared mime misleads (pdf.py:58-65)") {
    val pdf = CorpusGen.renderPdf(Seq(Seq("x")))
    // mime sniffed from magic -> plain MIME match, score 6 (as the reference:
    // auction sets mimeType from libmagic before cls.match runs)
    val a = graft.classify.Classifier.auction("blob", "", pdf)
    assert(a.map(_.ingestor) == Right("PDFIngestor"))
    assert(a.map(_.score) == Right(6))
    // declared (wrong) mime + no ext -> magic override kicks in at x2
    val b = graft.classify.Classifier.auction("blob", "application/octet-stream", pdf)
    assert(b.map(_.ingestor) == Right("PDFIngestor"))
    assert(b.map(_.score) == Right(12))
  }

  test("PDF 1.5 object streams: objects inside /ObjStm are found") {
    // catalog + pages + page dicts all packed into one compressed ObjStm;
    // only the content stream and the ObjStm itself are top-level objects
    val inner = "<< /Type /Catalog /Pages 2 0 R >> " +
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >> " +
      "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"
    val header = "1 0 2 35 3 73 "
    val payload = (header + inner).getBytes("ISO-8859-1")
    // offsets: obj1 at 0, obj2 at 35, obj3 at 73 relative to First
    val off1 = 0
    val off2 = inner.indexOf("<< /Type /Pages")
    val off3 = inner.indexOf("<< /Type /Page /Parent")
    val hdr = s"1 0 2 $off2 3 $off3 "
    val body = (hdr + inner).getBytes("ISO-8859-1")
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(body); deflater.finish()
    val buf = new Array[Byte](body.length * 2 + 64)
    val clen = deflater.deflate(buf)
    deflater.end()
    val compressed = java.util.Arrays.copyOf(buf, clen)
    val content = "BT (Hello from an object stream) Tj ET"
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.5\n")
    w(s"5 0 obj << /Type /ObjStm /N 3 /First ${hdr.length} /Filter /FlateDecode /Length $clen >> stream\n")
    out.write(compressed)
    w("\nendstream endobj\n")
    w(s"4 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n")
    w("%%EOF")
    val r = PdfExtractor.extract(RawDoc("d", "objstm.pdf", "application/pdf",
      out.toByteArray))
    assert(r.status == graft.core.ExtractionResult.Success, r.error)
    assert(r.spans.exists(_.text.contains("Hello from an object stream")),
      r.spans.map(_.text))
  }

  test("flate-compressed content stream decodes") {
    // compress the content stream of a 1-page pdf by hand
    val content = "BT /F1 12 Tf 72 720 Td (compressed stream text) Tj ET"
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(content.getBytes("ISO-8859-1")); d.finish()
      val buf = new Array[Byte](1024)
      val n = d.deflate(buf)
      java.util.Arrays.copyOf(buf, n)
    }
    val sb = new java.io.ByteArrayOutputStream()
    def w(s: String) = sb.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n")
    w(s"4 0 obj\n<< /Length ${deflated.length} /Filter /FlateDecode >>\nstream\n")
    sb.write(deflated)
    w("\nendstream\nendobj\n")
    w("trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    val res = PdfExtractor.extract(raw(sb.toByteArray))
    assert(res.status == ExtractionResult.Success)
    assert(res.spans.head.text == "compressed stream text")
  }
}
