package graft.extract

import graft.core._
import graft.core.TextUtil.{collapseSpaces, filterText}

/** vCard: line-based parse, one Person per card keyed by e-mail
  * (`/root/reference/ingestors/email/vcard.py:15-54`). */
object VCardExtractor extends Extractor {
  val name = "VCardIngestor"
  val schema = "Document"

  /** Unfold continuation lines (RFC 6350 §3.2). */
  def unfold(text: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var cur: StringBuilder = null
    for (line <- text.split("\r\n|\n", -1)) {
      if (line.nonEmpty && (line.charAt(0) == ' ' || line.charAt(0) == '\t')) {
        if (cur != null) cur.append(line.drop(1))
      } else {
        if (cur != null) out += cur.toString
        cur = new StringBuilder(line)
      }
    }
    if (cur != null) out += cur.toString
    out.result().filter(_.nonEmpty)
  }

  protected def run(doc: RawDoc): ExtractionResult = {
    val text = Encoding.readDecoded(doc.bytes)
    val lines = unfold(text)
    if (!lines.exists(_.equalsIgnoreCase("BEGIN:VCARD")))
      throw new ProcessingError("Cannot parse vCard")
    val spans = Vector.newBuilder[Span]
    val names = Vector.newBuilder[String]
    val emails = Vector.newBuilder[String]
    val phones = Vector.newBuilder[String]
    var idx = 0
    var fn = ""
    def endCard(): Unit = {
      if (fn.nonEmpty) {
        spans += Span(SpanKinds.Text, fn, "", idx)
        idx += 1
      }
      fn = ""
    }
    for (line <- lines) {
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).split(';')(0).trim.toUpperCase
        val value = line.substring(colon + 1).trim
        key match {
          case "END" if value.equalsIgnoreCase("VCARD") => endCard()
          case "FN" => fn = collapseSpaces(value); names += fn
          case "N" if fn.isEmpty =>
            fn = collapseSpaces(value.split(';').reverse.mkString(" ").trim)
          case "EMAIL" if Mime.validEmail(value) => emails += value.toLowerCase
          case "TEL" => phones += value
          case _ => ()
        }
      }
    }
    ExtractionResult.success(schema, spans.result(), Seq(
      "peopleMentioned" -> names.result().distinct,
      "emailMentioned" -> emails.result().distinct,
      "phoneMentioned" -> phones.result().distinct
    ).filter(_._2.nonEmpty).toMap)
  }
}

/** iCalendar: one Event per VEVENT with organizer/attendee identities
  * (`/root/reference/ingestors/email/calendar.py:23-70`). */
object CalendarExtractor extends Extractor {
  val name = "CalendarIngestor"
  val schema = "Document"

  protected def run(doc: RawDoc): ExtractionResult = {
    val text = Encoding.readDecoded(doc.bytes)
    val lines = VCardExtractor.unfold(text)
    if (!lines.exists(_.toUpperCase.startsWith("BEGIN:VCALENDAR")))
      throw new ProcessingError("Failed to parse iCalendar")
    val spans = Vector.newBuilder[Span]
    val eventNames = Vector.newBuilder[String]
    val emails = Vector.newBuilder[String]
    var idx = 0
    var inEvent = false
    var summary = ""
    var description = ""
    for (line <- lines) {
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).split(';')(0).trim.toUpperCase
        val value = line.substring(colon + 1).trim
          .replace("\\n", "\n").replace("\\,", ",")
        key match {
          case "BEGIN" if value.equalsIgnoreCase("VEVENT") =>
            inEvent = true; summary = ""; description = ""
          case "END" if value.equalsIgnoreCase("VEVENT") =>
            if (summary.nonEmpty) {
              eventNames += summary
              spans += Span(SpanKinds.Text, summary, "", idx); idx += 1
            }
            if (filterText(description)) {
              spans += Span(SpanKinds.Text, description, "", idx); idx += 1
            }
            inEvent = false
          case "SUMMARY" if inEvent => summary = collapseSpaces(value)
          case "DESCRIPTION" if inEvent => description = value
          case "ORGANIZER" | "ATTENDEE" if inEvent =>
            val mail = value.stripPrefix("mailto:").stripPrefix("MAILTO:").toLowerCase
            if (Mime.validEmail(mail)) emails += mail
          case _ => ()
        }
      }
    }
    ExtractionResult.success(schema, spans.result(), Seq(
      "eventsMentioned" -> eventNames.result(),
      "emailMentioned" -> emails.result().distinct
    ).filter(_._2.nonEmpty).toMap)
  }
}

/** Apple .emlx: length-prefixed RFC822 payload then a plist
  * (`/root/reference/ingestors/email/emlx.py:13-28`). */
object EmlxExtractor extends Extractor {
  val name = "AppleEmlxIngestor"
  val schema = "Email"

  protected def run(doc: RawDoc): ExtractionResult = {
    val b = doc.bytes
    var i = 0
    while (i < b.length && b(i) != '\n') i += 1
    val lenStr = new String(b, 0, i, "US-ASCII").trim
    val len = lenStr.toLongOption.getOrElse(
      throw new ProcessingError("Cannot parse emlx: bad length prefix"))
    val start = i + 1
    val end = math.min(b.length.toLong, start + len).toInt
    if (start >= b.length) throw new ProcessingError("Cannot parse emlx: truncated")
    val inner = java.util.Arrays.copyOfRange(b, start, end)
    val res = EmlExtractor.extract(doc.copy(bytes = inner))
    if (res.status == ExtractionResult.Failure) throw new ProcessingError(res.error)
    res
  }
}
