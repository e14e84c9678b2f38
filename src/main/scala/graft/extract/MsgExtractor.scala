package graft.extract

import graft.core._
import graft.core.TextUtil.filterText

/** Outlook .msg (MAPI-over-CFBF), replacing the reference's msglite path
  * (`/root/reference/ingestors/email/outlookmsg.py:18-128`): property
  * streams `__substg1.0_PPPPTTTT` (PPPP = MAPI property id, TTTT = type;
  * 001F = UTF-16LE, 001E = bytes, 0102 = binary), recipient storages
  * `__recip_version1.0_#N`, attachment storages `__attach_version1.0_#N`
  * (attachment payloads re-ingested as children; embedded .msg recurse). */
object MsgExtractor extends Extractor {
  val name = "OutlookMsgIngestor"
  val schema = "Email"

  private def decodeProp(suffix: String, bytes: Array[Byte]): String =
    suffix match {
      case "001F" => new String(bytes, "UTF-16LE")
      case "001E" => new String(bytes, "windows-1252")
      case _ => ""
    }

  protected def run(doc: RawDoc): ExtractionResult = {
    val entries =
      try Cfbf.parse(doc.bytes)
      catch {
        case e: ProcessingError => throw e
        case e: Exception =>
          throw new ProcessingError(s"Cannot open message file: ${e.getMessage}")
      }
    val byPath = entries.map(e => e.path -> e.bytes).toMap

    def prop(prefix: String, pid: String): Option[String] =
      Seq("001F", "001E").flatMap { t =>
        byPath.get(s"${prefix}__substg1.0_$pid$t")
          .map(b => decodeProp(t, b)).filter(_.nonEmpty)
      }.headOption

    def binProp(prefix: String, pid: String): Option[Array[Byte]] =
      byPath.get(s"${prefix}__substg1.0_${pid}0102")

    val props = Map.newBuilder[String, Seq[String]]
    val spans = Vector.newBuilder[Span]
    val children = Vector.newBuilder[ChildDoc]
    var offset = 0

    prop("", "0037").foreach(s => props += ("subject" -> Seq(s)))
    prop("", "1035").flatMap(v =>
      EmlExtractor.parseMessageIds(Seq(v)).headOption)
      .foreach(m => props += ("messageId" -> Seq(m)))
    prop("", "007D").foreach(h => props += ("headers" -> Seq(h)))
    val senderName = prop("", "0C1A")
    val senderAddr = Seq("5D01", "5D02", "0C1F", "0065")
      .flatMap(prop("", _)).find(Mime.validEmail)
    val fromLabel = (senderName, senderAddr) match {
      case (Some(n), Some(a)) => Some(s"$n <${a.toLowerCase}>")
      case (None, Some(a)) => Some(a.toLowerCase)
      case (Some(n), None) => Some(n)
      case _ => None
    }
    fromLabel.foreach(l => props += ("from" -> Seq(l)))
    senderAddr.foreach(a => props += ("emitters" -> Seq(a.toLowerCase)))

    // body: plain text wins bodyText; RTF/HTML bodies kept as properties
    val body = prop("", "1000")
    body.foreach { b =>
      props += ("bodyText" -> Seq(b))
      if (filterText(b)) { spans += Span(SpanKinds.Text, b, "", offset); offset += 1 }
    }
    binProp("", "1013").foreach(h =>
      props += ("bodyHtml" -> Seq(new String(h, "windows-1252"))))

    // recipients
    val recipPrefixes = byPath.keys
      .filter(_.startsWith("__recip_version1.0_#"))
      .map(_.split('/').head + "/").toSeq.distinct.sorted
    val tos = Vector.newBuilder[String]
    for (rp <- recipPrefixes) {
      val email = Seq("39FE", "3003").flatMap(prop(rp, _)).find(Mime.validEmail)
        .map(_.toLowerCase)
      val nm = prop(rp, "3001")
      (nm, email) match {
        case (Some(n), Some(a)) => tos += s"$n <$a>"
        case (_, Some(a)) => tos += a
        case (Some(n), _) => tos += n
        case _ => ()
      }
      email.foreach(a => props += ("recipients" ->
        (props.result().getOrElse("recipients", Seq.empty) :+ a)))
    }
    val toList = tos.result()
    if (toList.nonEmpty) props += ("to" -> toList)

    // attachments → children
    val attachPrefixes = byPath.keys
      .filter(_.startsWith("__attach_version1.0_#"))
      .map(_.split('/').head + "/").toSeq.distinct.sorted
    for (ap <- attachPrefixes) {
      val payload = binProp(ap, "3701")
      val nameA = Seq("3707", "3704").flatMap(prop(ap, _)).headOption
        .getOrElse("attachment")
      payload.foreach { p =>
        children += ChildDoc(nameA, "", p)
        spans += Span(SpanKinds.Media, nameA, TextUtil.sha1Hex(p), offset)
        offset += 1
      }
    }

    ExtractionResult.success(schema, spans.result(), props.result(),
      children.result())
  }
}
