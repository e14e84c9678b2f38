package graft

import graft.core._
import graft.corpus.CorpusGen
import graft.extract.{OlmArchiveExtractor, OlmMessageExtractor, RawDoc}
import org.scalatest.funsuite.AnyFunSuite

class OlmSpec extends AnyFunSuite {

  private val msgXml =
    """<?xml version="1.0"?>
      |<emails>
      |<email>
      |<OPFMessageCopySubject>Planning call</OPFMessageCopySubject>
      |<OPFMessageCopyMessageID>olm-mid-42</OPFMessageCopyMessageID>
      |<OPFMessageCopySentTime>2020-02-03T10:30:00Z</OPFMessageCopySentTime>
      |<OPFMessageCopyFromAddresses>
      |  <emailAddress OPFContactEmailAddressName="Alice A" OPFContactEmailAddressAddress="alice@graft.test"/>
      |</OPFMessageCopyFromAddresses>
      |<OPFMessageCopyToAddresses>
      |  <emailAddress OPFContactEmailAddressAddress="bob@graft.test"/>
      |</OPFMessageCopyToAddresses>
      |<OPFMessageCopyBody>Let us plan the quarter.</OPFMessageCopyBody>
      |<OPFMessageGetHasHTML>1E0</OPFMessageGetHasHTML>
      |<OPFMessageCopyHTMLBody>&lt;p&gt;Let us plan the quarter in html.&lt;/p&gt;</OPFMessageCopyHTMLBody>
      |<messageAttachment OPFAttachmentName="agenda.txt" OPFAttachmentContentType="text/plain" OPFAttachmentURL="Attachments/agenda.txt"/>
      |</email>
      |</emails>""".stripMargin

  private val olmZip = CorpusGen.renderZip(Seq(
    ("Accounts/alice/Inbox/message_0001.xml", msgXml.getBytes("UTF-8")),
    ("Attachments/agenda.txt", "1. numbers 2. plans".getBytes("UTF-8")),
    ("com.microsoft.__Messages/ignored.bin", Array[Byte](1, 2))))

  test("olm archive: message + referenced attachment become children") {
    val res = OlmArchiveExtractor.extract(RawDoc("t", "mail.olm", "", olmZip))
    assert(res.status == ExtractionResult.Success)
    val names = res.children.map(c => (c.file_name, c.mime_hint))
    assert(names.contains(("Accounts/alice/Inbox/message_0001.xml",
      "application/xml+opfmessage")))
    assert(names.contains(("agenda.txt", "text/plain")))
  }

  test("olm message: headers, identities, body + html body spans") {
    val res = OlmMessageExtractor.extract(
      RawDoc("t", "message_0001.xml", "application/xml+opfmessage",
        msgXml.getBytes("UTF-8")))
    assert(res.status == ExtractionResult.Success)
    assert(res.properties("subject") == Seq("Planning call"))
    assert(res.properties("messageId") == Seq("olm-mid-42"))
    assert(res.properties("from") == Seq("Alice A <alice@graft.test>"))
    assert(res.properties("recipients") == Seq("bob@graft.test"))
    assert(res.properties("date") == Seq("2020-02-03T10:30:00"))
    assert(res.spans.map(_.text) == Vector("Let us plan the quarter.",
      "Let us plan the quarter in html."))
  }

  test("olm end-to-end: pipeline routes archive -> message -> attachment") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val out = graft.pipeline.Pipeline.run(spark, spark.createDataset(Seq(
      PendingDoc("o1", "mail.olm", Seq.empty, 0, "mail.olm", "", olmZip))))
    val meta = out.meta.collect().map(m => m.doc_id -> m).toMap
    assert(meta("o1").ingestor == "OutlookOLMArchiveIngestor")
    assert(meta.values.exists(_.ingestor == "OutlookOLMMessageIngestor"))
    assert(meta.values.exists(m => m.ingestor == "PlainTextIngestor" &&
      m.file_name == "agenda.txt"))
    out.cleanup()
  }
}
