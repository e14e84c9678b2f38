package graft.extract

import graft.core._
import graft.core.TextUtil.{filterText, sha1Hex}

import scala.collection.mutable.ArrayBuffer

/** CSV ingestion: charset guess, dialect sniff over a 40 KiB sample, then
  * row streaming with per-row text fragments
  * (`/root/reference/ingestors/tabular/csv.py:13-40`,
  * `support/table.py:17-46`). */
object CsvExtractor extends Extractor {
  val name = "CSVIngestor"
  val schema = "Table"
  val SampleSize = 4096 * 10

  protected def run(doc: RawDoc): ExtractionResult = {
    val enc = Encoding.guessEncoding(doc.bytes)
    val text = Encoding.decodeReplace(doc.bytes, enc)
    val delimiter = sniffDelimiter(text.take(SampleSize)).getOrElse(
      throw new ProcessingError("Invalid CSV: could not determine delimiter"))
    val rows = CsvReader.readAll(text, delimiter)
    emitRows(doc, rows)
  }

  /** Shared row emission (TableSupport.emit_row_dicts semantics,
    * `support/table.py:17-38`): skip all-empty rows; one text fragment per
    * row keyed by row index; rowCount = rows + 1; headers synthesized
    * "Column N" from the first row (`support/table.py:40-46`). */
  def emitRows(doc: RawDoc, rows: Iterator[Seq[String]]): ExtractionResult = {
    val spans = Vector.newBuilder[Span]
    var rowCount = 0
    var headers: Seq[String] = null
    val csvOut = new StringBuilder
    for (row <- rows) {
      if (headers == null)
        headers = (1 to row.length).map(i => s"Column $i")
      val values = row.take(headers.length).padTo(headers.length, "")
      if (values.map(_.length).sum != 0) {
        csvOut.append(values.mkString("")).append('\n')
        val kept = values.filter(filterText)
        if (kept.nonEmpty)
          spans += Span(SpanKinds.Text, kept.mkString(" "), "", rowCount)
        rowCount += 1
      }
    }
    val props = Map.newBuilder[String, Seq[String]]
    if (rowCount > 0)
      props += ("csvHash" -> Seq(sha1Hex(csvOut.toString.getBytes("UTF-8"))))
    props += ("rowCount" -> Seq((rowCount + 1).toString))
    props += ("columns" -> Seq(
      if (headers == null) "[]"
      else headers.map(h => "\"" + h.replace("\"", "\\\"") + "\"").mkString("[", ", ", "]")))
    ExtractionResult.success(schema, spans.result(), props.result())
  }

  /** Dialect sniffer in the spirit of Python csv.Sniffer: pick the
    * candidate delimiter whose per-line count is most consistent and
    * non-zero across sample lines (quoted regions ignored). */
  private val LineBreak = java.util.regex.Pattern.compile("\r\n|\n|\r")

  def sniffDelimiter(sample: String): Option[Char] = {
    val candidates = Seq(',', '\t', ';', '|', ':')
    val lines = LineBreak.split(sample).filter(_.nonEmpty).take(64)
    if (lines.isEmpty) return None
    var best: Option[(Char, Int)] = None // (delim, score)
    for (d <- candidates) {
      val counts = lines.map(l => countUnquoted(l, d)).filter(_ > 0)
      if (counts.nonEmpty) {
        // consistency: mode frequency * mode value, weighted by coverage
        val mode = counts.groupBy(identity).maxBy { case (v, g) => (g.length, v) }
        val score = mode._2.length * 1000 + mode._1
        if (counts.length >= lines.length / 2 &&
            best.forall(_._2 < score)) best = Some((d, score))
      }
    }
    best.map(_._1)
  }

  private def countUnquoted(line: String, d: Char): Int = {
    var inQ = false
    var c = 0
    var i = 0
    while (i < line.length) {
      val ch = line.charAt(i)
      if (ch == '"') inQ = !inQ
      else if (ch == d && !inQ) c += 1
      i += 1
    }
    c
  }
}

/** RFC 4180 reader: quoted fields, doubled quotes, embedded newlines. */
object CsvReader {
  def readAll(text: String, delimiter: Char): Iterator[Seq[String]] =
    new Iterator[Seq[String]] {
      private var i = 0
      private val n = text.length
      def hasNext: Boolean = i < n
      def next(): Seq[String] = {
        val fields = new ArrayBuffer[String]()
        val sb = new StringBuilder
        var inQ = false
        var done = false
        while (!done) {
          if (i >= n) {
            done = true
          } else {
            val c = text.charAt(i)
            if (inQ) {
              if (c == '"') {
                if (i + 1 < n && text.charAt(i + 1) == '"') { sb.append('"'); i += 2 }
                else { inQ = false; i += 1 }
              } else { sb.append(c); i += 1 }
            } else c match {
              case '"' if sb.isEmpty => inQ = true; i += 1
              case `delimiter` => fields += sb.toString; sb.clear(); i += 1
              case '\r' =>
                i += 1
                if (i < n && text.charAt(i) == '\n') i += 1
                done = true
              case '\n' => i += 1; done = true
              case other => sb.append(other); i += 1
            }
          }
        }
        fields += sb.toString
        fields.toSeq
      }
    }
}
