package graft

import graft.core._
import graft.extract.{Cfbf, MsgExtractor, RawDoc}
import org.scalatest.funsuite.AnyFunSuite

/** CFBF container + Outlook .msg extraction
  * (email/outlookmsg.py parity shape). */
class MsgSpec extends AnyFunSuite {

  private def utf16(s: String) = s.getBytes("UTF-16LE")

  private val msgBytes: Array[Byte] = Cfbf.write(Seq(
    "__substg1.0_0037001F" -> utf16("Quarterly report"),
    "__substg1.0_1000001F" -> utf16("Please find the figures attached.\r\nRegards"),
    "__substg1.0_0C1A001F" -> utf16("Alice Sender"),
    "__substg1.0_0C1F001F" -> utf16("alice@corp.example"),
    "__substg1.0_1035001F" -> utf16("<mid-778899@corp.example>"),
    "__recip_version1.0_#00000000/__substg1.0_3001001F" -> utf16("Bob Recipient"),
    "__recip_version1.0_#00000000/__substg1.0_39FE001F" -> utf16("bob@corp.example"),
    "__attach_version1.0_#00000000/__substg1.0_3707001F" -> utf16("figures.csv"),
    "__attach_version1.0_#00000000/__substg1.0_37010102" -> "a,b\n1,x\n".getBytes("UTF-8")))

  test("cfbf roundtrip: writer output parses back with full paths") {
    val entries = Cfbf.parse(msgBytes).map(e => e.path -> e.bytes).toMap
    assert(new String(entries("__substg1.0_0037001F"), "UTF-16LE") == "Quarterly report")
    assert(new String(
      entries("__recip_version1.0_#00000000/__substg1.0_39FE001F"),
      "UTF-16LE") == "bob@corp.example")
    assert(new String(
      entries("__attach_version1.0_#00000000/__substg1.0_37010102"),
      "UTF-8") == "a,b\n1,x\n")
  }

  test("msg extraction: headers, body span, recipient, attachment child") {
    val res = MsgExtractor.extract(RawDoc("t", "report.msg",
      "application/vnd.ms-outlook", msgBytes))
    assert(res.status == ExtractionResult.Success)
    assert(res.properties("subject") == Seq("Quarterly report"))
    assert(res.properties("messageId") == Seq("mid-778899@corp.example"))
    assert(res.properties("from") == Seq("Alice Sender <alice@corp.example>"))
    assert(res.properties("to") == Seq("Bob Recipient <bob@corp.example>"))
    assert(res.properties("recipients") == Seq("bob@corp.example"))
    assert(res.spans.map(_.kind) == Vector("text", "media"))
    assert(res.spans.head.text.startsWith("Please find the figures"))
    assert(res.children.map(_.file_name) == Vector("figures.csv"))
    assert(new String(res.children.head.bytes) == "a,b\n1,x\n")
  }

  test("classifier: OLE magic + msg ext routes to OutlookMsgIngestor (score 10)") {
    val a = graft.classify.Classifier.auction("report.msg", "", msgBytes)
    assert(a.map(_.ingestor) == Right("OutlookMsgIngestor"))
  }

  test("pipeline: attachment child is re-ingested as CSV") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val out = graft.pipeline.Pipeline.run(spark, spark.createDataset(Seq(
      PendingDoc("m1", "report.msg", Seq.empty, 0, "report.msg", "", msgBytes))))
    val meta = out.meta.collect().map(m => m.doc_id -> m).toMap
    assert(meta("m1").ingestor == "OutlookMsgIngestor")
    assert(meta("m1/0").ingestor == "CSVIngestor")
    out.cleanup()
  }

  test("corrupt OLE fails cleanly") {
    val junk = Array[Byte](0xd0.toByte, 0xcf.toByte, 0x11, 0xe0.toByte,
      0xa1.toByte, 0xb1.toByte, 0x1a, 0xe1.toByte) ++ Array.fill(600)(7.toByte)
    val res = MsgExtractor.extract(RawDoc("t", "x.msg", "", junk))
    assert(res.status == ExtractionResult.Failure)
  }
}
