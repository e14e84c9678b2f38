package graft.extract

import graft.core._
import graft.core.TextUtil.filterText
import HtmlDom._

/** Outlook-for-Mac OLM archives: a zip of per-message OPF XML files plus
  * attachment payloads, folder hierarchy encoded in member paths
  * (`/root/reference/ingestors/email/olm.py:21-172`).
  *
  * Archive level: every `message_*.xml` member becomes a child document
  * (mime `application/xml+opfmessage`), with its sibling attachment
  * payloads resolved from the zip by the attachment URLs inside the
  * message XML. The folder path rides in the child file name so lineage
  * mirrors the reference's Folder hierarchy.
  */
object OlmArchiveExtractor extends Extractor {
  val name = "OutlookOLMArchiveIngestor"
  val schema = "Package"
  val MessageMime = "application/xml+opfmessage"
  private val Exclude = "com.microsoft.__Messages"

  protected def run(doc: RawDoc): ExtractionResult = {
    import PackageLimits._
    if (!graft.classify.Classifier.isZipMagic(doc.bytes))
      throw new ProcessingError("Invalid OLM file.")
    // read the whole zip once: message xmls + a byte map for attachments
    val members = scala.collection.mutable.LinkedHashMap.empty[String, Array[Byte]]
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(doc.bytes))
    try {
      var e = zin.getNextEntry
      var total = 0L
      while (e != null && members.size < MaxMembers) {
        if (!e.isDirectory) {
          val b = readCapped(zin, MaxMemberBytes)
          total += b.length
          if (total > MaxTotalBytes)
            throw new ProcessingError("Invalid OLM file: expands too large")
          members(e.getName) = b
        }
        e = zin.getNextEntry
      }
    } catch {
      case p: ProcessingError => throw p
      case ex: Exception => throw new ProcessingError(s"Invalid OLM file: ${ex.getMessage}")
    } finally zin.close()

    val children = Vector.newBuilder[ChildDoc]
    for ((nameM, bytes) <- members
         if nameM.split('/').last.startsWith("message_") && nameM.endsWith(".xml")) {
      val folder = nameM.split('/').dropRight(1).filterNot(_ == Exclude).mkString("/")
      val childName = if (folder.isEmpty) nameM.split('/').last
                      else s"$folder/${nameM.split('/').last}"
      children += ChildDoc(childName, MessageMime, bytes)
      // attachments referenced by this message
      try {
        val root = XmlExtractor.parseSecure(bytes)
        for (att <- allElements(root).filter(_.tag == "messageattachment")) {
          val url = att.attrs.get("opfattachmenturl")
          val attName = att.attrs.get("opfattachmentname")
            .orElse(att.attrs.get("opfattachmentcontentid"))
            .getOrElse("attachment")
          val mime = att.attrs.getOrElse("opfattachmentcontenttype", "")
          for (u <- url; payload <- members.get(u))
            children += ChildDoc(attName, mime, payload)
        }
      } catch { case _: Exception => () }
    }
    ExtractionResult.success(schema, children = children.result())
  }
}

/** One OPF message XML (`email/olm.py:112-172`): subject/messageId/dates,
  * sender/from/to/cc/bcc identities from emailAddress elements, bodyText
  * plus DOM-walked HTML body when flagged. */
object OlmMessageExtractor extends Extractor {
  val name = "OutlookOLMMessageIngestor"
  val schema = "Email"

  protected def run(doc: RawDoc): ExtractionResult = {
    val root =
      try XmlExtractor.parseSecure(doc.bytes)
      catch { case _: Exception =>
        throw new ProcessingError("Cannot parse OPF XML file.") }
    val emails = allElements(root).filter(_.tag == "email").toVector
    if (emails.size != 1)
      throw new ProcessingError("More than one email in file.")
    val email = emails.head
    def propText(tag: String): Option[String] = email.children.collectFirst {
      case e: HElem if e.tag == tag.toLowerCase && textContent(e).trim.nonEmpty =>
        textContent(e).trim
    }

    val props = Map.newBuilder[String, Seq[String]]
    val spans = Vector.newBuilder[Span]
    var offset = 0
    propText("OPFMessageCopySubject").foreach(s => props += ("subject" -> Seq(s)))
    propText("OPFMessageCopyThreadTopic").foreach(s => props += ("threadTopic" -> Seq(s)))
    propText("OPFMessageCopyPreview").foreach(s => props += ("summary" -> Seq(s)))
    propText("OPFMessageCopyMessageID").foreach(s => props += ("messageId" -> Seq(s)))
    propText("OPFMessageCopySentTime").foreach(s =>
      props += ("date" -> Seq(s.stripSuffix("Z"))))

    def contacts(tag: String): Seq[(String, String)] =
      email.children.collect { case e: HElem if e.tag == tag.toLowerCase => e }
        .flatMap(c => allElements(c).filter(_.tag == "emailaddress"))
        .map(a => (a.attrs.getOrElse("opfcontactemailaddressname", ""),
          a.attrs.getOrElse("opfcontactemailaddressaddress", "").toLowerCase))
    def identities(prop: String, lprop: String, tag: String): Unit = {
      val cs = contacts(tag)
      val labels = cs.map { case (n, a) =>
        if (n.nonEmpty && a.nonEmpty) s"$n <$a>" else if (a.nonEmpty) a else n
      }.filter(_.nonEmpty)
      val addrs = cs.map(_._2).filter(Mime.validEmail)
      if (labels.nonEmpty) props += (lprop -> labels)
      if (addrs.nonEmpty) props += (prop -> addrs)
    }
    identities("emitters", "sender", "OPFMessageCopySenderAddress")
    identities("emitters", "from", "OPFMessageCopyFromAddresses")
    identities("recipients", "to", "OPFMessageCopyToAddresses")
    identities("recipients", "cc", "OPFMessageCopyCCAddresses")
    identities("recipients", "bcc", "OPFMessageCopyBCCAddresses")

    propText("OPFMessageCopyBody").foreach { b =>
      props += ("bodyText" -> Seq(b))
      if (filterText(b)) { spans += Span(SpanKinds.Text, b, "", offset); offset += 1 }
    }
    val hasHtml = propText("OPFMessageGetHasHTML").contains("1E0")
    propText("OPFMessageCopyHTMLBody").foreach { h =>
      if (hasHtml) {
        val (text, _) = HtmlExtractor.extractContent(h, withMetadata = false)
        if (filterText(text)) {
          spans += Span(SpanKinds.Text, text, "", offset); offset += 1
        }
      }
    }
    ExtractionResult.success(schema, spans.result(), props.result())
  }
}
