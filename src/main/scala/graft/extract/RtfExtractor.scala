package graft.extract

import graft.core._
import graft.core.TextUtil.{collapseSpaces, filterText}

/** RTF text extraction — the reference routes RTF through LibreOffice
  * (`documents/office.py` MIME list includes text/rtf); the format itself
  * is a public text markup (control words, groups, hex escapes) that we
  * parse directly: skip non-content destinations (fonttbl, stylesheet,
  * info, pict, ...), map \par/\line to line breaks, decode \'hh and
  * \uN escapes. */
object RtfExtractor extends Extractor {
  val name = "DocumentIngestor" // reference class handling RTF
  val schema = "Pages"

  private val skipDestinations = Set(
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "listtable", "listoverridetable", "generator",
    "themedata", "datastore", "xmlnstbl", "filetbl", "revtbl")

  def extractText(rtf: String): String = {
    val sb = new StringBuilder
    var i = 0
    val n = rtf.length
    var skipDepth = 0 // >0 while inside a skipped destination group
    var depth = 0
    val skipAt = scala.collection.mutable.Stack.empty[Int]
    while (i < n) {
      val c = rtf.charAt(i)
      c match {
        case '{' => depth += 1; i += 1
        case '}' =>
          depth -= 1
          while (skipAt.nonEmpty && depth < skipAt.top) skipAt.pop()
          i += 1
        case '\\' if i + 1 < n =>
          val c1 = rtf.charAt(i + 1)
          if (c1 == '\'' && i + 3 < n) {
            if (skipAt.isEmpty) {
              try sb.append(Integer.parseInt(rtf.substring(i + 2, i + 4), 16).toChar)
              catch { case _: Exception => () }
            }
            i += 4
          } else if (c1 == '\\' || c1 == '{' || c1 == '}') {
            if (skipAt.isEmpty) sb.append(c1)
            i += 2
          } else if (c1 == '~') { if (skipAt.isEmpty) sb.append(' '); i += 2 }
          else if (c1.isLetter) {
            var j = i + 1
            while (j < n && rtf.charAt(j).isLetter) j += 1
            val word = rtf.substring(i + 1, j)
            // optional numeric parameter
            var k = j
            if (k < n && (rtf.charAt(k) == '-' || rtf.charAt(k).isDigit)) {
              k += 1
              while (k < n && rtf.charAt(k).isDigit) k += 1
            }
            val param = rtf.substring(j, k)
            if (k < n && rtf.charAt(k) == ' ') k += 1 // delimiter space consumed
            if (skipDestinations.contains(word)) skipAt.push(depth)
            else if (skipAt.isEmpty) word match {
              case "par" | "line" | "row" => sb.append('\n')
              case "tab" | "cell" => sb.append(' ')
              case "u" =>
                // \uN unicode escape; following fallback char is consumed
                param.toIntOption.foreach { cp =>
                  sb.append((if (cp < 0) cp + 65536 else cp).toChar)
                }
                if (k < n && rtf.charAt(k) != '\\' && rtf.charAt(k) != '{' &&
                    rtf.charAt(k) != '}') k += 1
              case _ => ()
            }
            i = k
          } else if (c1 == '*') {
            // \* marks an ignorable destination group
            skipAt.push(depth)
            i += 2
          } else i += 2
        case '\r' | '\n' => i += 1
        case other =>
          if (skipAt.isEmpty) sb.append(other)
          i += 1
      }
    }
    collapseSpaces(sb.toString.replace('\n', ' '))
  }

  def looksLikeRtf(bytes: Array[Byte]): Boolean =
    bytes.length >= 5 && new String(bytes, 0, 5, "US-ASCII") == "{\\rtf"

  protected def run(doc: RawDoc): ExtractionResult = {
    if (looksLikeRtf(doc.bytes)) {
      val text = extractText(Encoding.readDecoded(doc.bytes))
      val spans =
        if (filterText(text)) Vector(Span(SpanKinds.Text, text, "", 0))
        else Vector.empty
      return ExtractionResult.success(schema, spans)
    }
    if (Cfbf.isCfbf(doc.bytes)) {
      // legacy binary Office: OLE property-set metadata always
      // (`support/ole.py:38-58`), text from the Word piece table or the
      // PowerPoint text atoms where the container carries them
      val entries = Cfbf.parse(doc.bytes)
      val props = OleMeta.summaryPropsFromEntries(entries)
      val texts = OleMeta.docText(entries).orElse(OleMeta.pptText(entries))
        .getOrElse(Vector.empty)
      val spans = texts.filter(filterText).zipWithIndex.map {
        case (t, i) => Span(SpanKinds.Text, t, "", i)
      }.toVector
      if (spans.nonEmpty)
        return ExtractionResult.success(schema, spans, props)
      return ExtractionResult.failure(schema,
        "Legacy office conversion requires LibreOffice; unsupported in this build",
        properties = props)
    }
    throw new ProcessingError(
      "Legacy office conversion requires LibreOffice; unsupported in this build")
  }
}
