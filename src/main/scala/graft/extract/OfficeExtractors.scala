package graft.extract

import graft.core._
import graft.core.TextUtil.{collapseSpaces, filterText}
import HtmlDom._

/** Native OOXML/ODF unpacking — the reference shells out to LibreOffice for
  * these (`/root/reference/ingestors/documents/ooxml.py`,
  * `documents/opendoc.py`, `tabular/xlsx.py`, `tabular/ods.py`); we parse
  * the zip + XML directly on the JVM (SURVEY §2.2), which is both
  * subprocess-free and cluster-safe. */
object OfficeXml {

  type ZipMap = scala.collection.immutable.ListMap[String, Array[Byte]]

  /** One streaming pass over the package: every office extractor needs
    * several members, and re-scanning the zip per lookup was quadratic. */
  def readAll(bytes: Array[Byte]): ZipMap = {
    import java.util.zip.ZipInputStream
    val zin = new ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    val out = scala.collection.immutable.ListMap.newBuilder[String, Array[Byte]]
    try {
      var e = zin.getNextEntry
      var guard = 0
      var total = 0L
      while (e != null && guard < PackageLimits.MaxMembers) {
        if (!e.isDirectory) {
          val b = PackageLimits.readCapped(zin, PackageLimits.MaxMemberBytes)
          total += b.length
          if (total > PackageLimits.MaxTotalBytes)
            throw new graft.core.ProcessingError("package expands too large")
          out += (e.getName -> b)
        }
        guard += 1
        e = zin.getNextEntry
      }
    } catch {
      case p: graft.core.ProcessingError => throw p
      case _: Exception => ()
    } finally zin.close()
    out.result()
  }

  def parseXmlEntry(entries: ZipMap, name: String): Option[HElem] =
    entries.get(name).flatMap { b =>
      try Some(XmlExtractor.parseSecure(b)) catch { case _: Exception => None }
    }

  /** docProps/core.xml metadata (`support/ooxml.py:22-52`). */
  def coreProps(entries: ZipMap): Map[String, Seq[String]] = {
    parseXmlEntry(entries, "docProps/core.xml") match {
      case None => Map.empty
      case Some(root) =>
        def text(tag: String): Option[String] = {
          val it = allElements(root).filter(e =>
            e.tag == tag || e.tag.endsWith(":" + tag.split(':').last))
          if (it.hasNext) {
            val t = textContent(it.next()).trim
            if (t.nonEmpty) Some(t) else None
          } else None
        }
        Seq(
          "title" -> Seq(text("dc:title")).flatten,
          "summary" -> Seq(text("dc:description")).flatten,
          "author" -> Seq(text("dc:creator"), text("cp:lastmodifiedby")).flatten.distinct,
          "authoredAt" -> Seq(text("dcterms:created")).flatten
            .map(_.stripSuffix("Z")),
          "modifiedAt" -> Seq(text("dcterms:modified")).flatten
            .map(_.stripSuffix("Z"))
        ).filter(_._2.nonEmpty).toMap
    }
  }
}

/** DOCX / PPTX: paragraph text from word/document.xml (`<w:t>` runs) or
  * slide XML (`<a:t>` runs), one text span per paragraph. */
object OoxmlExtractor extends Extractor {
  val name = "OfficeOpenXMLIngestor"
  val schema = "Pages"

  protected def run(doc: RawDoc): ExtractionResult = {
    import OfficeXml._
    val entries = readAll(doc.bytes)
    val props = coreProps(entries)
    val spans = Vector.newBuilder[Span]
    var idx = 0

    def paragraphsOf(root: HElem, pTag: String, tTag: String): Unit =
      for (p <- findAll(root, pTag)) {
        val text = collapseSpaces(
          allElements(p).filter(_.tag == tTag).map(textContent).mkString(" "))
        if (filterText(text)) {
          spans += Span(SpanKinds.Text, text, "", idx)
          idx += 1
        }
      }

    parseXmlEntry(entries, "word/document.xml") match {
      case Some(root) => paragraphsOf(root, "w:p", "w:t")
      case None =>
        // presentation: one span per slide paragraph
        val slides = entries.keys.toVector
          .filter(n => n.startsWith("ppt/slides/slide") && n.endsWith(".xml"))
          .sortBy(n => n.replaceAll("\\D", "").toIntOption.getOrElse(0))
        if (slides.isEmpty)
          throw new ProcessingError("Invalid OOXML package: no document part")
        for (s <- slides; root <- parseXmlEntry(entries, s))
          paragraphsOf(root, "a:p", "a:t")
    }
    ExtractionResult.success(schema, spans.result(), props)
  }
}

/** XLSX: sheets via xl/workbook.xml + sharedStrings + per-sheet cell walk
  * (`/root/reference/ingestors/tabular/xlsx.py:15-80`). Rows become ordered
  * text spans (flattened workbook; the reference emits Table children with
  * per-row fragments — same row stream, normalized). */
object XlsxExtractor extends Extractor {
  val name = "ExcelXMLIngestor"
  val schema = "Workbook"

  protected def run(doc: RawDoc): ExtractionResult = {
    import OfficeXml._
    val entries = readAll(doc.bytes)
    val shared: Vector[String] =
      parseXmlEntry(entries, "xl/sharedStrings.xml") match {
        case Some(root) => findAll(root, "si").map(si =>
          allElements(si).filter(_.tag == "t").map(textContent).mkString).toVector
        case None => Vector.empty
      }
    val sheetNames: Vector[String] =
      parseXmlEntry(entries, "xl/workbook.xml") match {
        case Some(root) => findAll(root, "sheet")
          .flatMap(_.attrs.get("name")).toVector
        case None => Vector.empty
      }
    val sheetFiles = entries.keys.toVector
      .filter(n => n.startsWith("xl/worksheets/sheet") && n.endsWith(".xml"))
      .sortBy(n => n.replaceAll("\\D", "").toIntOption.getOrElse(0))
    if (sheetFiles.isEmpty)
      throw new ProcessingError("Invalid XLSX: no worksheets")

    // style index → is-date (openpyxl's date handling, `tabular/xlsx.py`):
    // cellXfs numFmtId resolved against builtin date ids + custom numFmts
    val dateStyles: Set[Int] = parseXmlEntry(entries, "xl/styles.xml") match {
      case None => Set.empty
      case Some(st) =>
        val customDate = findAll(st, "numFmt").flatMap { f =>
          for {
            id <- f.attrs.get("numFmtId").flatMap(_.toIntOption)
            code <- f.attrs.get("formatCode")
            if XlsExtractor.isDateFormatString(code)
          } yield id
        }.toSet
        val xfs = findAll(st, "cellXfs").flatMap(x => findAll(x, "xf")).toVector
        xfs.zipWithIndex.collect {
          case (xf, i) if xf.attrs.get("numFmtId").flatMap(_.toIntOption)
            .exists(id => XlsExtractor.builtinDateFmts.contains(id) ||
              customDate.contains(id)) => i
        }.toSet
    }

    val spans = Vector.newBuilder[Span]
    var rowIdx = 0
    var totalRows = 0
    for (sf <- sheetFiles; root <- parseXmlEntry(entries, sf)) {
      for (row <- findAll(root, "row")) {
        val values = findAll(row, "c").map { c =>
          val v = allElements(c).filter(_.tag == "v").map(textContent).mkString
          if (c.attrs.get("t").contains("s"))
            v.toIntOption.flatMap(shared.lift).getOrElse(v)
          else if (c.attrs.get("t").contains("inlineStr"))
            allElements(c).filter(_.tag == "t").map(textContent).mkString
          else if (c.attrs.get("s").flatMap(_.toIntOption).exists(dateStyles)
                   && v.nonEmpty)
            v.toDoubleOption.flatMap(XlsExtractor.xldateIso(_, date1904 = false))
              .getOrElse(v)
          else v
        }.toVector
        if (values.map(_.length).sum != 0) {
          val kept = values.filter(filterText)
          if (kept.nonEmpty)
            spans += Span(SpanKinds.Text, kept.mkString(" "), "", rowIdx)
          rowIdx += 1
          totalRows += 1
        }
      }
    }
    ExtractionResult.success(schema, spans.result(), Map(
      "sheets" -> sheetNames,
      "rowCount" -> Seq((totalRows + 1).toString)
    ) ++ coreProps(entries))
  }
}

/** ODT/ODP (OpenDocument text): content.xml paragraphs + meta.xml
  * (`/root/reference/ingestors/documents/opendoc.py`,
  * `support/opendoc.py`). */
object OpenDocExtractor extends Extractor {
  val name = "OpenDocumentIngestor"
  val schema = "Pages"

  protected def run(doc: RawDoc): ExtractionResult = {
    import OfficeXml._
    val entries = readAll(doc.bytes)
    val root = parseXmlEntry(entries, "content.xml").getOrElse(
      throw new ProcessingError("Invalid OpenDocument package: no content.xml"))
    val spans = Vector.newBuilder[Span]
    var idx = 0
    for (p <- allElements(root) if p.tag == "text:p" || p.tag == "text:h") {
      val text = collapseSpaces(textContent(p))
      if (filterText(text)) {
        spans += Span(SpanKinds.Text, text, "", idx)
        idx += 1
      }
    }
    val props = parseXmlEntry(entries, "meta.xml") match {
      case Some(m) =>
        def t(tag: String) = {
          val it = allElements(m).filter(_.tag == tag)
          if (it.hasNext) Some(textContent(it.next()).trim).filter(_.nonEmpty) else None
        }
        Seq("title" -> t("dc:title").toSeq,
          "author" -> (t("meta:initial-creator").toSeq ++ t("dc:creator").toSeq).distinct,
          "authoredAt" -> t("meta:creation-date").toSeq,
          "modifiedAt" -> t("dc:date").toSeq).filter(_._2.nonEmpty).toMap
      case None => Map.empty[String, Seq[String]]
    }
    ExtractionResult.success(schema, spans.result(), props)
  }
}

/** ODS spreadsheets: table rows with column-repeat expansion
  * (`/root/reference/ingestors/tabular/ods.py:15-83`). */
object OdsExtractor extends Extractor {
  val name = "OpenOfficeSpreadsheetIngestor"
  val schema = "Workbook"

  protected def run(doc: RawDoc): ExtractionResult = {
    import OfficeXml._
    val entries = readAll(doc.bytes)
    val root = parseXmlEntry(entries, "content.xml").getOrElse(
      throw new ProcessingError("Invalid ODS package: no content.xml"))
    val spans = Vector.newBuilder[Span]
    val sheets = Vector.newBuilder[String]
    var rowIdx = 0
    var totalRows = 0
    for (table <- findAll(root, "table:table")) {
      table.attrs.get("table:name").foreach(sheets += _)
      for (row <- findAll(table, "table:table-row")) {
        val values = Vector.newBuilder[String]
        for (cell <- row.children.collect { case e: HElem if e.tag == "table:table-cell" => e }) {
          val repeat = cell.attrs.get("table:number-columns-repeated")
            .flatMap(_.toIntOption).getOrElse(1).min(256)
          val v = collapseSpaces(textContent(cell))
          (1 to repeat).foreach(_ => values += v)
        }
        val vs = values.result()
        if (vs.map(_.length).sum != 0) {
          val kept = vs.filter(filterText)
          if (kept.nonEmpty)
            spans += Span(SpanKinds.Text, kept.mkString(" "), "", rowIdx)
          rowIdx += 1
          totalRows += 1
        }
      }
    }
    ExtractionResult.success(schema, spans.result(), Map(
      "sheets" -> sheets.result(),
      "rowCount" -> Seq((totalRows + 1).toString)))
  }
}
