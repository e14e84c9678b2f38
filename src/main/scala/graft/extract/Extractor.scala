package graft.extract

import graft.core._

/** Input to an extractor: one document's payload plus routing facts.
  * The analogue of the reference's (file_path, entity) pair
  * (`/root/reference/ingestors/ingestor.py:17-23`). */
case class RawDoc(docId: String, fileName: String, mimeType: String,
                  bytes: Array[Byte]) {
  def size: Long = if (bytes == null) 0L else bytes.length.toLong
}

/** An extractor is a pure total function from payload bytes to an
  * ExtractionResult. Failures are values, never exceptions
  * (`manager.py:229-234` converts ProcessingException to
  * processingStatus=failure). */
trait Extractor extends Serializable {
  /** Ingestor name, mirroring the reference class names for parity. */
  def name: String
  /** FtM schema this extractor assigns (SURVEY §1.2). */
  def schema: String
  protected def run(doc: RawDoc): ExtractionResult

  final def extract(doc: RawDoc): ExtractionResult =
    try run(doc)
    catch {
      case e: ProcessingError => ExtractionResult.failure(schema, e.getMessage)
      case e: Exception =>
        // total-ness guarantee: arbitrary bytes never break the pipeline
        ExtractionResult.failure(schema, s"unexpected: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      case e: StackOverflowError =>
        // input-controlled recursion depth (nested JSON/XML/PDF/MIME) is an
        // Error, not an Exception — without this the Spark task dies and
        // one crafted payload kills the job. The stack has unwound by the
        // time we're here, so building the failure row is safe.
        ExtractionResult.failure(schema, "unexpected: StackOverflowError: nesting too deep")
    }
}

object SpanKinds {
  val Raw = "raw"
  val Text = "text"
  val Page = "page"
  val Image = "image"
  val Media = "media"
}
