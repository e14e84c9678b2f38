package graft

import graft.classify.Classifier
import graft.corpus.CorpusGen
import org.scalatest.funsuite.AnyFunSuite

/** Auction/score-table parity with the reference
  * (`manager.py:133-152`, `ingestor.py:25-39` + per-class match overrides). */
class ClassifierSpec extends AnyFunSuite {

  private def winner(fileName: String, mime: String, bytes: Array[Byte]): String =
    Classifier.auction(fileName, mime, bytes).fold(identity, _.ingestor)

  test("zero-byte file routes to IgnoreIngestor x100 (ignore.py:55-59)") {
    assert(winner("whatever.pdf", "", Array.empty) == "IgnoreIngestor")
  }

  test("ignored names beat plain-text ext (ignore NAMES)") {
    assert(winner(".DS_Store", "", "junk".getBytes) == "IgnoreIngestor")
  }

  test("pdf magic doubles score even without mime/ext (documents/pdf.py:58-65)") {
    assert(winner("noext", "", "%PDF-1.7 rest".getBytes) == "PDFIngestor")
  }

  test("html by extension and by sniffed mime") {
    assert(winner("page.html", "", "<p>x</p>".getBytes) == "HTMLIngestor")
    assert(winner("noext", "", "<!DOCTYPE html><html></html>".getBytes) == "HTMLIngestor")
  }

  test("json ext beats Ignore's json ext listing (score 3 > 2)") {
    assert(winner("data.json", "", """{"a": "b"}""".getBytes) == "JSONIngestor")
  }

  test("ics routes to CalendarIngestor not Ignore (10 > 2)") {
    assert(winner("cal.ics", "", "BEGIN:VCALENDAR\r\n".getBytes) == "CalendarIngestor")
  }

  test("zip magic routes to ZipIngestor; docx manifest reroutes to OOXML x2") {
    val plainZip = CorpusGen.renderZip(Seq(("a.txt", "x".getBytes)))
    assert(winner("archive.bin", "", plainZip) == "ZipIngestor")
    val ct = """<Types><Override ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/></Types>"""
    val docx = CorpusGen.renderZip(Seq(
      ("[Content_Types].xml", ct.getBytes), ("word/document.xml", "<w:document/>".getBytes)))
    assert(winner("report.docx", "", docx) == "OfficeOpenXMLIngestor")
  }

  test("xlsx without spreadsheet manifest is rejected by ExcelXMLIngestor (-1)") {
    val plainZip = CorpusGen.renderZip(Seq(("a.txt", "x".getBytes)))
    // ext says xlsx but manifest check fails -> falls back to ZipIngestor
    assert(winner("fake.xlsx", "", plainZip) == "ZipIngestor")
  }

  test("mbox magic without extension (email/mbox.py:43-54)") {
    val mbox = "From alice@x Mon Jan 1\nSubject: hi\n\nbody\n"
    assert(winner("inbox", "", mbox.getBytes) == "MboxFileIngestor")
  }

  test("eml by extension; msg ext without OLE magic goes to RFC822 not OutlookMsg") {
    assert(winner("mail.eml", "", "Subject: x\r\n\r\nbody".getBytes) == "RFC822Ingestor")
    assert(winner("mail.msg", "", "Subject: x\r\n\r\nbody".getBytes) == "RFC822Ingestor")
  }

  test("tar.gz routes to TarIngestor, plain gz to GzipIngestor (packages/__init__.py:55-58)") {
    val tar = CorpusGen.renderTar(Seq(("a.txt", "x".getBytes)))
    assert(winner("bundle.tar.gz", "", CorpusGen.renderGzip(tar)) == "TarIngestor")
    assert(winner("notes.txt.gz", "", CorpusGen.renderGzip("text".getBytes)) == "GzipIngestor")
    assert(winner("bundle.tar", "", tar) == "TarIngestor")
  }

  test("encrypted mime rejected pre-dispatch (manager.py:140-141)") {
    val r = Classifier.auction("f.pdf", "application/encrypted", "x".getBytes)
    assert(r == Left(graft.core.ProcessingError.EncryptedMsg))
  }

  test("unknown binary is Format not supported (manager.py:149-151)") {
    val junk = Array[Byte](0x01, 0x02, 0x03, 0x00, 0x7f)
    assert(Classifier.auction("blob.xyz", "", junk) == Left("Format not supported"))
  }

  test("image/audio/video prefix fallbacks (media/*.py match)") {
    assert(winner("pic.weird", "image/x-exotic", Array[Byte](1)) == "ImageIngestor")
    assert(winner("snd.weird", "audio/x-exotic", Array[Byte](1)) == "AudioIngestor")
    assert(winner("vid.weird", "video/x-exotic", Array[Byte](1)) == "VideoIngestor")
    assert(winner("pic.png", "",
      Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 1, 2)) == "ImageIngestor")
  }

  test("sqlite probe gates SQLiteIngestor (tabular/sqlite.py:71-81)") {
    assert(winner("data.db", "", "SQLite format 3\u0000xxxx".getBytes) == "SQLiteIngestor")
    assert(winner("data.db", "", "not sqlite".getBytes) != "SQLiteIngestor")
  }

  test("csv content sniffing yields text/csv mime") {
    val csv = "a,b,c\nd,e,f\ng,h,i\n"
    val a = Classifier.auction("noext", "", csv.getBytes).toOption.get
    assert(a.mimeType == "text/csv")
    assert(a.ingestor == "CSVIngestor")
  }
}
