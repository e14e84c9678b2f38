package graft.pipeline

import graft.core._
import graft.classify.Classifier
import graft.extract._

/** Routes a classified document to its extractor — the reference's
  * `Manager.ingest` / `delegate` (`/root/reference/ingestors/manager.py:192-244`). */
object Dispatch {

  /** All 37 registered ingestors (`setup.py:20-59`). Formats whose decode
    * needs a subprocess or native driver the sandbox lacks are
    * UnsupportedExtractor → classified correctly, deterministic failure row. */
  val registry: Map[String, Extractor] = Seq[Extractor](
    IgnoreExtractor,
    HtmlExtractor,
    XmlExtractor,
    PlainTextExtractor,
    RtfExtractor, // DocumentIngestor: RTF handled natively; other legacy
                  // office formats fail cleanly (LibreOffice out of scope)
    OpenDocExtractor,
    OoxmlExtractor,
    new UnsupportedExtractor("DjVuIngestor", "Pages",
      "DjVu conversion requires ddjvu; unsupported in this build"),
    PdfExtractor,
    RarExtractor, // store-method + symlink members extracted from headers;
                  // compressed members skipped (no public codec spec)
    ZipExtractor,
    WarcExtractor, // beyond the reference: Common Crawl container
    TarExtractor,
    SevenZipExtractor,
    GzipExtractor,
    Bz2Extractor,
    PstExtractor,
    OlmArchiveExtractor,
    OlmMessageExtractor,
    MsgExtractor,
    EmlExtractor,
    EmlxExtractor,
    VCardExtractor,
    CalendarExtractor,
    CsvExtractor,
    AccessExtractor,
    SqliteExtractor,
    XlsExtractor,
    XlsxExtractor,
    OdsExtractor,
    MboxExtractor,
    DbfExtractor,
    ImageExtractor,
    TiffExtractor,
    SvgExtractor,
    AudioExtractor,
    VideoExtractor,
    JsonExtractor
  ).map(e => e.name -> e).toMap

  final case class Ingested(ingestor: String, mime: String, result: ExtractionResult)

  /** auction + delegate; auction failures become failure rows on the
    * generic Document schema (`manager.py:226-234`). */
  def ingest(fileName: String, mimeHint: String, bytes: Array[Byte]): Ingested = {
    // RAR members whose codec has no public spec: the parent extractor
    // planted this hint; reproduce the reference's warn-and-skip
    // (`packages/rar.py:28-30`) as a deterministic failure row
    if (mimeHint == Rar.UnsupportedMemberMime)
      return Ingested("RARIngestor", mimeHint,
        ExtractionResult.failure("Document",
          s"Failed to unpack [$fileName]: compressed RAR member (no public codec spec)"))
    // a source listed this file but could not materialize it (over the
    // per-file byte cap): the reference's processingError contract
    // (`manager.py:229-234`) — a deterministic failure row, not a silent
    // skip, so the lineage accounts for every listed input. The sentinel
    // travels in-band as a mime string, so it only short-circuits when
    // the bytes are genuinely absent — a crawled document whose hostile
    // Content-Type collides with the sentinel still has its real bytes
    // and must be classified normally (magic bytes win)
    if (mimeHint == graft.sources.Sources.OversizeMime && bytes.isEmpty)
      return Ingested("", mimeHint,
        ExtractionResult.failure("Document",
          s"Failed to ingest [$fileName]: file exceeds the per-file size " +
            "cap; skipped without reading"))
    Classifier.auction(fileName, mimeHint, bytes) match {
      case Left(err) =>
        Ingested("", if (mimeHint == null) "" else mimeHint,
          ExtractionResult.failure("Document", err))
      case Right(a) =>
        registry.get(a.ingestor) match {
          case Some(ex) =>
            Ingested(a.ingestor, a.mimeType,
              ex.extract(RawDoc("", fileName, a.mimeType, bytes)))
          case None =>
            Ingested(a.ingestor, a.mimeType,
              ExtractionResult.failure("Document", "Format not supported"))
        }
    }
  }
}
