package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator building the per-ingestor ingest-duration histogram —
  * the reference's Prometheus `ingestfile_ingestion_duration_seconds`
  * buckets (0.005s … 15min, `/root/reference/ingestors/manager.py:39-60`)
  * re-expressed as a partial-aggregable Spark Aggregator (map-side combine
  * for free, one long[] per group as the buffer). */
object DurationHistogram {

  /** Bucket upper bounds in milliseconds (reference buckets × 1000). */
  val bucketsMs: Array[Long] = Array(
    5L, 10L, 25L, 50L, 100L, 250L, 500L, 1000L, 5000L, 15000L,
    60000L, 300000L, 900000L)

  val labels: Array[String] =
    bucketsMs.map(b => s"le_${b}ms") :+ "le_inf"

  val agg: Aggregator[Long, Array[Long], Map[String, Long]] =
    new Aggregator[Long, Array[Long], Map[String, Long]] {
      def zero: Array[Long] = new Array[Long](bucketsMs.length + 1)
      def reduce(buf: Array[Long], durationMs: Long): Array[Long] = {
        var i = 0
        while (i < bucketsMs.length && durationMs > bucketsMs(i)) i += 1
        buf(i) += 1
        buf
      }
      def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
      def finish(buf: Array[Long]): Map[String, Long] =
        labels.zip(buf).filter(_._2 > 0).toMap
      def bufferEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
      def outputEncoder: Encoder[Map[String, Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    }
}
