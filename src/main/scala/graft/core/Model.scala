package graft.core

/** Core data model for the extraction engine.
  *
  * Mirrors the FollowTheMoney entity-fragment stream of the reference
  * (`/root/reference/ingestors/manager.py:96-131`) re-expressed as typed
  * Spark Dataset rows per `BASELINE.json.input_hint`:
  *
  * input table: (doc_id: string, spans: array<struct<kind,text,media_ref,offset>>)
  * output:      ordered span rows + one metadata row per document.
  */

/** One span of an interleaved document.
  *
  * Input convention for raw (not-yet-extracted) documents: a single span with
  * `kind = "raw"`, `text` = original file name (the reference carries
  * `fileName` as an entity property, `manager.py:178-190`), `media_ref` =
  * content hash resolving into the blobs table, `offset = 0`.
  *
  * Output span kinds: "text" (extracted text unit), "page" (page marker),
  * "image" / "media" (binary payload reference), "row" is represented as
  * "text" with offset = row index.
  */
case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** A row of the input table. */
case class DocRow(doc_id: String, spans: Seq[Span])

/** Content-addressed payload bytes. At production scale this is the blob
  * store (`manager.py:166-176`); at test scale an inline side table. */
case class Blob(media_ref: String, bytes: Array[Byte])

/** Ordered output span (the "entity fragment" analogue). `seq` is the global
  * emission order within the document — the reference's tests assert on
  * emission order (`tests/support.py:20-23`), our invariant is
  * span-sequence equality on (kind, text, media_ref, order). */
case class SpanOut(doc_id: String, seq: Int, kind: String, text: String,
                   media_ref: String, offset: Int)

/** Per-document metadata row — the final root-entity emission of the
  * reference (`manager.py:192-241`). `properties` carries the multi-valued
  * FtM-style property bag (title, authors, subject, messageId, ...). */
case class DocMeta(doc_id: String,
                   parent_id: String,
                   ancestors: Seq[String],
                   depth: Int,
                   schema: String,
                   mime_type: String,
                   ingestor: String,
                   processing_status: String,
                   processing_error: String,
                   file_name: String,
                   file_size: Long,
                   content_hash: String,
                   properties: Map[String, Seq[String]],
                   duration_ms: Long = 0L)

/** A child document produced during extraction (archive member, email
  * attachment, mbox message) destined for re-ingestion —
  * the reference re-queues these (`support/email.py:57-79`,
  * `support/package.py:13-43`). */
case class ChildDoc(file_name: String, mime_hint: String, bytes: Array[Byte])

/** Work-queue row for the iterative extraction loop (the RabbitMQ task
  * analogue, `worker.py:28-74`). */
case class PendingDoc(doc_id: String,
                      parent_id: String,
                      ancestors: Seq[String],
                      depth: Int,
                      file_name: String,
                      mime_hint: String,
                      bytes: Array[Byte])

/** One document's full extraction outcome for one loop iteration. */
case class DocResult(meta: DocMeta, spans: Seq[SpanOut], children: Seq[PendingDoc])

/** Per-partition lineage row for checkpoint/resume
  * (the early-fragment/orphan-avoidance concern of the reference,
  * `tabular/xlsx.py:62-66`, re-expressed as snapshot bookkeeping). */
case class LineageRow(partition_id: Int, doc_id: String, ingestor: String,
                      status: String, depth: Int)

/** In-extractor result, pre-Dataset. Pure value returned by every extractor:
  * extractors are total functions — malformed input yields status=failure
  * (`manager.py:229-234`), never an exception. */
case class ExtractionResult(schema: String,
                            spans: Vector[Span],
                            properties: Map[String, Seq[String]],
                            children: Vector[ChildDoc],
                            status: String,
                            error: String)

object ExtractionResult {
  val Success = "success"
  val Failure = "failure"

  def success(schema: String,
              spans: Vector[Span] = Vector.empty,
              properties: Map[String, Seq[String]] = Map.empty,
              children: Vector[ChildDoc] = Vector.empty): ExtractionResult =
    ExtractionResult(schema, spans, properties, children, Success, "")

  def failure(schema: String, error: String,
              spans: Vector[Span] = Vector.empty,
              properties: Map[String, Seq[String]] = Map.empty): ExtractionResult =
    ExtractionResult(schema, spans, properties, Vector.empty, Failure, error)
}

/** Exception type for recoverable extraction errors — the analogue of the
  * reference's ProcessingException (`ingestors/exc.py`). Extractors may throw
  * it internally; the dispatch layer converts it to a failure result. */
final class ProcessingError(msg: String) extends Exception(msg)

object ProcessingError {
  /** `ingestors/exc.py:1` */
  val EncryptedMsg =
    "The file is encrypted or password protected. Could not extract its content."
}
