package graft.extract

import graft.core._
import graft.core.TextUtil.{filterText, sha1Hex}

/** Media + not-yet-parseable formats. The binary decode step (OCR, EXIF via
  * full TIFF tag walk, MediaInfo) needs native libraries absent from this
  * container — the Spark-side plumbing (span shape, media_ref content
  * addressing, metadata columns) is real; the decode is a deterministic
  * stub, clearly marked (builder-prompt "multimodal columns" contract). */

/** Images: kind="image" span carrying the content address, plus the OCR
  * text span when the engine yields text
  * (`/root/reference/ingestors/media/image.py:17-83`, OCR call at `:71`).
  * The OCR path runs the reference's full plumbing (size window, content
  * cache) around the deterministic stand-in engine — see `graft.ocr.Ocr`. */
object ImageExtractor extends Extractor {
  val name = "ImageIngestor"
  val schema = "Image"
  protected def run(doc: RawDoc): ExtractionResult = {
    val ref = sha1Hex(doc.bytes)
    // EXIF per the reference's mapping (`media/image.py:38-58`):
    // DateTimeOriginal/DateTime → authoredAt/date, Make/Model → generator
    val exif = Exif.read(doc.bytes)
    val props = Map.newBuilder[String, Seq[String]]
    props += ("contentHash" -> Seq(ref))
    val gen = (exif.make.toSeq ++ exif.model.toSeq).distinct
    if (gen.nonEmpty) props += ("generator" -> gen)
    exif.dateTimeOriginal.foreach(d =>
      props += ("authoredAt" -> Seq(Exif.exifDateToIso(d))))
    MediaMeta.imageDims(doc.bytes).foreach { case (w, h) =>
      props += ("width" -> Seq(w.toString))
      props += ("height" -> Seq(h.toString))
    }
    val ocrSpan = graft.ocr.Ocr.extractOcrText(doc.bytes) match {
      case Some(text) if filterText(text) =>
        Vector(Span(SpanKinds.Text, text, "", 1))
      case _ => Vector.empty
    }
    ExtractionResult.success(schema,
      Vector(Span(SpanKinds.Image, "", ref, 0)) ++ ocrSpan, props.result())
  }
}

/** TIFF → reference rasterizes to PDF pages + OCR (`media/tiff.py:10-43`;
  * the tiff2pdf subprocess is out of scope); we emit the image span plus
  * the EXIF/IFD metadata the TIFF container itself carries (same IFD
  * walker as JPEG), and run the payload through the same OCR plumbing —
  * real TIFF rasters come back empty from the stand-in engine, preserving
  * the no-text contract, while the window/cache path stays exercised. */
object TiffExtractor extends Extractor {
  val name = "TIFFIngestor"
  val schema = "Pages"
  protected def run(doc: RawDoc): ExtractionResult = {
    val ref = sha1Hex(doc.bytes)
    val exif = Exif.read(doc.bytes)
    val props = Map.newBuilder[String, Seq[String]]
    props += ("contentHash" -> Seq(ref))
    val gen = (exif.make.toSeq ++ exif.model.toSeq).distinct
    if (gen.nonEmpty) props += ("generator" -> gen)
    exif.dateTimeOriginal.foreach(d =>
      props += ("authoredAt" -> Seq(Exif.exifDateToIso(d))))
    val ocrSpan = graft.ocr.Ocr.extractOcrText(doc.bytes) match {
      case Some(text) if filterText(text) =>
        Vector(Span(SpanKinds.Text, text, "", 1))
      case _ => Vector.empty
    }
    ExtractionResult.success(schema,
      Vector(Span(SpanKinds.Image, "", ref, 0)) ++ ocrSpan, props.result())
  }
}

/** SVG: decode + HTML content walk (`media/svg.py:11-20`). */
object SvgExtractor extends Extractor {
  val name = "SVGIngestor"
  val schema = "HyperText"
  protected def run(doc: RawDoc): ExtractionResult = {
    val body = Encoding.readDecoded(doc.bytes)
    val (text, _) = HtmlExtractor.extractContent(body, withMetadata = false)
    val spans = Vector(Span(SpanKinds.Image, "", sha1Hex(doc.bytes), 0)) ++
      (if (filterText(text)) Vector(Span(SpanKinds.Text, text, "", 1)) else Vector.empty)
    ExtractionResult.success(schema, spans)
  }
}

/** Audio: container metadata (MP4/M4A atoms, ID3v2, WAV) mapped to
  * title/generator/authoredAt/duration/samplingRate — the reference's
  * MediaInfo track loop (`media/audio.py:40-57`). */
object AudioExtractor extends Extractor {
  val name = "AudioIngestor"
  val schema = "Audio"
  protected def run(doc: RawDoc): ExtractionResult =
    ExtractionResult.success(schema,
      Vector(Span(SpanKinds.Media, "", sha1Hex(doc.bytes), 0)),
      MediaMeta.read(doc.bytes).props)
}

/** Video: MP4/QuickTime atom metadata (`media/video.py:29-46`). */
object VideoExtractor extends Extractor {
  val name = "VideoIngestor"
  val schema = "Video"
  protected def run(doc: RawDoc): ExtractionResult =
    ExtractionResult.success(schema,
      Vector(Span(SpanKinds.Media, "", sha1Hex(doc.bytes), 0)),
      MediaMeta.read(doc.bytes).props)
}

/** Formats the reference handles via subprocesses/native drivers that are
  * out of sandbox scope (SURVEY §2.2): classify correctly, emit a failure
  * row — never silently succeed. */
final class UnsupportedExtractor(val name: String, val schema: String,
                                 reason: String) extends Extractor {
  protected def run(doc: RawDoc): ExtractionResult =
    ExtractionResult.failure(schema, reason)
}
