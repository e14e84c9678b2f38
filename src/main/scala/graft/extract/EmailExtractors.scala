package graft.extract

import graft.core._
import graft.core.TextUtil.filterText

import scala.collection.mutable

/** RFC822/EML ingestion, mirroring
  * `/root/reference/ingestors/email/msg.py:17-138` and
  * `support/email.py:57-208`:
  *   - full header extraction (subject/date/messageId/inReplyTo/threading
  *     identities);
  *   - multipart/alternative preference: the html part wins bodyHtml, the
  *     text part wins bodyText, and the missing one is synthesized;
  *   - nested message/rfc822 parts rendered as a header block;
  *   - attachments become child documents (re-ingested by the pipeline).
  *
  * Span contract: one "text" span per bodyText value in parse order, one
  * "media" span per attachment (media_ref = payload content hash).
  */
object EmlExtractor extends Extractor {
  val name = "RFC822Ingestor"
  val schema = "Email"

  private val BodyHtml = "text/html"
  private val BodyPlain = "text/plain"
  private val DisplayHeaders =
    Set("from", "to", "cc", "bcc", "subject", "reply-to", "date")

  private val MidRe = """<([^>]*)>""".r

  def parseMessageIds(values: Seq[String]): Seq[String] =
    values.flatMap(v => MidRe.findAllMatchIn(v).map(_.group(1).trim))
      .filter(_.length > 4)

  /** `support/email.py:138-146`: References last, else In-Reply-To first. */
  def parseReferences(references: Seq[String], inReplyTo: Seq[String]): Option[String] = {
    val refs = parseMessageIds(references)
    if (refs.nonEmpty) Some(refs.last)
    else parseMessageIds(inReplyTo).headOption
  }

  private final class Acc {
    val props = mutable.LinkedHashMap.empty[String, Vector[String]]
    val spans = Vector.newBuilder[Span]
    val children = Vector.newBuilder[ChildDoc]
    var spanOffset = 0
    def add(prop: String, value: String): Unit = {
      val v = if (value == null) "" else value
      if (v.nonEmpty)
        props(prop) = props.getOrElse(prop, Vector.empty) :+ v
    }
    def addBodyText(text: String): Unit = {
      add("bodyText", text)
      if (filterText(text)) {
        spans += Span(SpanKinds.Text, text, "", spanOffset)
        spanOffset += 1
      }
    }
  }

  protected def run(doc: RawDoc): ExtractionResult = {
    val msg =
      try Mime.parse(doc.bytes)
      catch {
        case e: Exception =>
          throw new ProcessingError(s"Cannot parse email: ${e.getMessage}")
      }
    if (msg.headers.isEmpty)
      throw new ProcessingError("Cannot parse email: no headers")
    val acc = new Acc
    extractHeaders(acc, msg)
    if (msg.isMultipart) parseParts(acc, msg)
    else parsePart(acc, msg, None)
    ExtractionResult.success(schema, acc.spans.result(),
      acc.props.map { case (k, v) => k -> (v: Seq[String]) }.toMap,
      acc.children.result())
  }

  private def extractHeaders(acc: Acc, msg: Mime.Part): Unit = {
    def header(names: String*): Seq[String] =
      names.flatMap(msg.getAll).map(Mime.decodeWords)

    header("Subject").foreach(acc.add("subject", _))
    header("Date").flatMap(Mime.parseDate).foreach(acc.add("date", _))
    msg.get("Content-Type").map(_.takeWhile(_ != ';').trim.toLowerCase)
      .foreach(acc.add("mimeType", _))
    header("Thread-Topic").foreach(acc.add("threadTopic", _))
    header("X-Mailer").foreach(acc.add("generator", _))
    header("Content-Language").foreach(acc.add("language", _))
    header("Keywords").foreach(acc.add("keywords", _))
    header("Comments").foreach(acc.add("summary", _))
    parseMessageIds(header("Message-ID")).foreach(acc.add("messageId", _))
    parseReferences(header("References"), header("In-Reply-To"))
      .foreach(acc.add("inReplyTo", _))

    def identities(eprop: Option[String], lprop: Option[String], names: String*): Unit =
      for (v <- header(names: _*); a <- Mime.parseAddresses(v)) {
        val email = if (Mime.validEmail(a.email)) a.email.toLowerCase
                    else if (Mime.validEmail(a.name)) a.name.toLowerCase else ""
        val nm = if (Mime.validEmail(a.name)) "" else a.name
        val label =
          if (nm.nonEmpty && email.nonEmpty) s"$nm <$email>"
          else if (email.nonEmpty) email else nm
        lprop.foreach(p => acc.add(p, label))
        eprop.foreach { p =>
          if (email.nonEmpty || nm.nonEmpty)
            acc.add(p, if (email.nonEmpty) email else nm)
        }
        acc.add("namesMentioned", nm)
        acc.add("emailMentioned", email)
      }

    identities(None, None, "Return-Path")
    identities(None, None, "Reply-To")
    identities(Some("emitters"), Some("sender"), "Sender", "X-Sender")
    identities(Some("emitters"), Some("from"), "From", "X-From")
    identities(Some("recipients"), Some("to"), "To", "Resent-To")
    identities(Some("recipients"), Some("cc"), "CC", "Cc", "Resent-Cc")
    identities(Some("recipients"), Some("bcc"), "Bcc", "BCC", "Resent-Bcc")
  }

  /** `email/msg.py:28-38`: does this multipart/alternative parent have a
    * sibling part of the given type? */
  private def hasAlternative(parent: Option[Mime.Part], contentType: String): Boolean =
    parent.exists(p => p.mimeType == "multipart/alternative" &&
      p.subParts.exists(_.mimeType == contentType))

  private def htmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;").replace("'", "&#x27;")

  /** `email/msg.py:40-45` */
  def makeHtmlAlternative(text: String): String =
    if (text == null || text.isEmpty) ""
    else htmlEscape(text).trim.replace("\n", "<br>")

  private def parseParts(acc: Acc, parent: Mime.Part): Unit =
    parent.subParts.foreach(p => parsePart(acc, p, Some(parent)))

  private def parsePart(acc: Acc, part: Mime.Part, parent: Option[Mime.Part]): Unit = {
    val mime = part.mimeType
    val fileName = part.fileName
    val isBodyType = mime == BodyHtml || mime == BodyPlain
    val isAttachment = part.isAttachment || fileName.isDefined ||
      (!isBodyType && !part.isMultipart && mime != "message/rfc822")

    if (isAttachment) {
      val payload =
        if (part.isMultipart)
          part.subParts.headOption.map(_.bodyBytes).getOrElse(Array.empty[Byte])
        else part.decodedBytes
      val nm = fileName.getOrElse("attachment")
      if (nm.nonEmpty || payload.nonEmpty) {
        acc.children += ChildDoc(nm, mime, payload)
        acc.spans += Span(SpanKinds.Media, nm, TextUtil.sha1Hex(payload), acc.spanOffset)
        acc.spanOffset += 1
      }
      return
    }

    if (mime == "message/rfc822") {
      val inner = Mime.parse(part.decodedBytes)
      val headerLines = inner.headers
        .filter { case (k, _) => DisplayHeaders.contains(k.toLowerCase) }
        .map { case (k, v) => s"$k: ${Mime.decodeWords(v)}" }
      val text = headerLines.mkString("\n")
      acc.addBodyText(text)
      acc.add("bodyHtml", makeHtmlAlternative(text))
      if (inner.isMultipart) parseParts(acc, inner)
      else parsePart(acc, inner, None)
      return
    }

    if (part.isMultipart) { parseParts(acc, part); return }

    if (mime == BodyHtml) {
      val payload = part.decodedText
      val (text, _) = HtmlExtractor.extractContent(payload, withMetadata = false)
      acc.add("bodyHtml", payload)
      if (!hasAlternative(parent, BodyPlain)) acc.addBodyText(text)
      return
    }

    if (mime == BodyPlain) {
      val payload = part.decodedText
      acc.addBodyText(payload)
      if (!hasAlternative(parent, BodyHtml))
        acc.add("bodyHtml", makeHtmlAlternative(payload))
      return
    }
    // dangling fragment: ignore (reference logs an error, msg.py:116)
  }
}

/** mbox mailbox: split into one RFC822 child per `From `-delimited message
  * (`/root/reference/ingestors/email/mbox.py:14-54`). */
object MboxExtractor extends Extractor {
  // per-message un-escape pattern, precompiled (String.replaceAll
  // recompiles per call)
  private val FromEscape = java.util.regex.Pattern.compile("(?m)^>From ")
  val name = "MboxFileIngestor"
  val schema = "Package"
  val Magic = "From "

  def looksLikeMbox(bytes: Array[Byte]): Boolean =
    bytes.length >= Magic.length &&
      new String(bytes, 0, Magic.length, "US-ASCII") == Magic

  protected def run(doc: RawDoc): ExtractionResult = {
    if (!looksLikeMbox(doc.bytes))
      throw new ProcessingError("Invalid mbox file")
    val raw = new String(doc.bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val children = Vector.newBuilder[ChildDoc]
    var count = 0
    val cur = new StringBuilder
    def flush(): Unit = if (cur.nonEmpty) {
      count += 1
      // un-escape ">From " per mbox convention
      val body = FromEscape.matcher(cur.toString).replaceAll("From ")
      children += ChildDoc(s"$count.eml", "message/rfc822",
        body.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      cur.clear()
    }
    var first = true
    for (line <- raw.split("\r\n|\n", -1)) {
      if (line.startsWith(Magic)) {
        if (!first) flush()
        first = false
        // drop the envelope line itself
      } else if (!first) {
        cur.append(line).append('\n')
      }
    }
    flush()
    ExtractionResult.success(schema, children = children.result(),
      properties = Map("mimeType" -> Seq("application/mbox")))
  }
}
