package graft

import graft.corpus.CorpusGen
import graft.pipeline.Pipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-ingestor cost profile over the bench corpus: docs, summed
  * duration_ms, bytes — the first stop when hunting extraction hot spots
  * (pair with JFR: `-XX:StartFlightRecording=filename=prof.jfr` and
  * `jfr print --events ExecutionSample`). Round-3 findings: sha1Hex's
  * %02x-format hex was 11.5 µs/call (now 0.4), collapseSpaces' regex
  * replaceAll 2x the hand loop. */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (docs, blobs) = CorpusGen.corpus(spark, 400000L)
    val pending = Pipeline.initialPending(spark, docs, blobs)
      .repartition(96, col("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    pending.count()
    val out = Pipeline.run(spark, pending)
    out.meta.toDF().groupBy("ingestor")
      .agg(count(lit(1)).as("docs"), sum("duration_ms").as("total_ms"),
        sum("file_size").as("bytes"))
      .orderBy(desc("total_ms")).show(40, false)
    out.cleanup()
    spark.stop()
  }
}
