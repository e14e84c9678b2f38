package graft

import graft.corpus.CorpusGen
import graft.ops.Dedup
import graft.pipeline.Pipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf1 scale soak: 10× the bench corpus (4M root documents) through the
  * durable snapshot pipeline, content-hash dedup, and MinHash near-dup —
  * end-to-end on disk-committed snapshots, recording per-phase wall time,
  * partition counts, and peak heap. This is the "would it survive a 10×
  * scale-up" evidence for BASELINE.md: the pipeline path is the same one
  * `runDurable` ships to a cluster (per-level parquet commits + resume),
  * so memory headroom here bounds executor sizing there.
  *
  * Usage: graft.Soak [nDocs] [snapshotDir]  (defaults 4,000,000 and
  * /tmp/graft_soak; SPARK_GRAFT_CPUS as in Bench). */
object Soak {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(4000000L)
    val snapDir = if (args.length > 1) args(1) else "/tmp/graft_soak"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt * 2)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val mem = java.lang.management.ManagementFactory.getMemoryMXBean
    var peakHeap = 0L
    val phases = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      peakHeap = math.max(peakHeap, mem.getHeapMemoryUsage.getUsed)
      phases += (name -> sec)
      System.err.println(f"[soak] $name: $sec%.1f s, heap ${mem.getHeapMemoryUsage.getUsed / (1 << 20)} MiB")
      r
    }

    val (docs, blobs) = CorpusGen.corpus(spark, nDocs)
    val parts = spark.sparkContext.defaultParallelism * 3
    val pending = Pipeline.initialPending(spark, docs, blobs)
      .repartition(parts, col("doc_id"))

    // 1. durable pipeline: per-depth parquet snapshot commits + resume
    val metaCount = phase("pipeline_durable") {
      val (_, meta, _) = Pipeline.runDurable(spark, pending, snapDir)
      meta.count()
    }

    // 2. content-hash dedup over the full pending set (AQE-chosen join)
    val dedupCount = phase("dedup_by_content") {
      Pipeline.dedupByContent(spark, pending)._1.count()
    }

    // 3. MinHash near-dup over the extracted text bodies, read back from
    // the committed snapshots (kind=text spans, reassembled in seq order).
    // maxBucket=256 is the web-scale guard: the synthetic corpus repeats
    // templates, which is exactly the boilerplate-bucket pathology.
    val pairCount = phase("minhash_lsh") {
      val spans = spark.read.parquet(s"$snapDir/depth=*/spans")
      val texts = spans.filter($"kind" === "text")
        .groupBy($"doc_id")
        .agg(concat_ws(" ", transform(
          array_sort(collect_list(struct($"seq", $"text"))),
          s => s.getField("text"))).as("body"))
        .select(xxhash64($"doc_id").as("id"), $"body")
      Dedup.minhashLsh(spark, texts, "id", "body", 0.8,
        maxBucket = 256).count()
    }

    val total = phases.values.sum
    val pipeSec = phases("pipeline_durable")
    val qs = phases.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    println(f"""{"metric":"soak_total","value":$total%.3f,"unit":"sec","phases":$qs,"n_docs":$nDocs,"meta_rows":$metaCount,"dedup_rows":$dedupCount,"neardup_pairs":$pairCount,"docs_per_sec":${metaCount / math.max(pipeSec, 1e-9)}%.1f,"pending_partitions":$parts,"shuffle_partitions":${cpus.toInt * 2},"peak_heap_mib":${peakHeap / (1 << 20)},"cpus":$cpus}""")
    spark.stop()
  }
}
