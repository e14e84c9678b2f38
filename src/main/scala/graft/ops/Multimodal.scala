package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads as opaque binary
  * columns with typed metadata. The decode step is a DETERMINISTIC STUB
  * (the container has no image/audio codecs — builder-prompt contract);
  * the Spark-side plumbing — binary schema, batched mapPartitions decode,
  * partition sizing by payload bytes — is real and tested. At production
  * scale the stub body is replaced by an actual codec call; the dataflow
  * does not change. */
object Multimodal {

  final case class MediaMeta(doc_id: Long, kind: String, byte_len: Long,
                             width: Int, height: Int, duration_ms: Long,
                             feature: Array[Float])

  /** STUB decode: derives deterministic pseudo-metadata from the payload
    * bytes (stands in for an image header parse / codec probe). */
  def decodeStub(id: Long, kind: String, bytes: Array[Byte]): MediaMeta = {
    val h = graft.core.TextUtil.fnv64(bytes)
    val w = 64 + (math.abs(h) % 1024).toInt
    val ht = 64 + (math.abs(h >> 10) % 1024).toInt
    val dur = if (kind == "audio" || kind == "video") math.abs(h >> 20) % 600000 else 0L
    // 8-dim pseudo feature vector (stands in for an embedding extractor)
    val feat = Array.tabulate(8)(i => (((h >> (i * 8)) & 0xff) / 255.0f))
    MediaMeta(id, kind, bytes.length.toLong, w, ht, dur, feat)
  }

  /** Batched decode over a binary column: one narrow mapPartitions, no
    * shuffle; payload bytes never leave the executor. */
  def decodeMedia(spark: SparkSession, df: DataFrame, idCol: String,
                  kindCol: String, bytesCol: String): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(kindCol), col(bytesCol))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, kind, bytes) =>
        decodeStub(id, kind, if (bytes == null) Array.empty[Byte] else bytes)
      })
  }

  /** Frame-sampling plan for video payloads: explode into one row per
    * sampled frame index (stub: every `stepMs`). Shows the explode-side
    * schema; the frame decode itself is the same stub boundary. */
  def sampleFrames(meta: Dataset[MediaMeta], stepMs: Long): DataFrame = {
    import meta.sparkSession.implicits._
    meta.filter(_.kind == "video")
      .flatMap(m => (0L until m.duration_ms by stepMs).map(t => (m.doc_id, t)))
      .toDF("doc_id", "frame_ts_ms")
  }
}
