package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - `bruteForceTopK`: exact baseline — broadcast the (small) query set,
  *    one narrow pass over the corpus computing cosine via the codegen'd
  *    native expression, then a per-query top-k window. No shuffle of
  *    the corpus; only the k·|Q| candidate rows move.
  *  - `lshTopK`: the scale path — random-hyperplane signatures bucket the
  *    corpus. Only (id, table, sig) rows shuffle into the bucket join
  *    (never the vectors: at 100 TB the vector column dominates the
  *    corpus bytes, and the naive plan would replicate it ×tables);
  *    vectors are fetched once per side after candidate dedup. Multi-probe
  *    (one-bit signature flips on the query side only) trades a small
  *    query-side fan-out for recall.
  */
object Similarity {

  /** cosine(a, b) with double math (columns must be array<double>).
    * Backed by the native codegen'd CosineSimilarity expression — the
    * zip_with/aggregate composition is CodegenFallback and ~3-5x slower. */
  def cosineCol(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosine_sim(a, b)

  /** Exact top-k neighbors for each query id. Output
    * (qid, rank, cid, sim_r6) with rank 1..k by (sim desc, cid asc), sim
    * rounded to 6 decimals for engine-portable determinism. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).cast("long").as("cid"),
      col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).cast("long").as("qid"),
      col(vecCol).cast("array<double>").as("qv"))
    val scored = c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("sim", round(cosineCol(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("sim"))
  }

  /** Deterministic random hyperplanes: tables × bits planes of dim dims. */
  private[ops] def hyperplanes(tables: Int, bits: Int, dim: Int,
                               seed: Long): Array[Array[Array[Double]]] = {
    val rng = new graft.corpus.CorpusGen.Rng(seed)
    Array.fill(tables, bits)(Array.fill(dim)(rng.nextDouble() * 2 - 1))
  }

  /** Sign signature of `v` under one table's planes. */
  private[ops] def signature(v: Array[Double], planes: Array[Array[Double]]): Long = {
    var sig = 0L
    var b = 0
    while (b < planes.length) {
      var dot = 0.0
      val p = planes(b)
      var i = 0
      val n = math.min(v.length, p.length)
      while (i < n) { dot += v(i) * p(i); i += 1 }
      if (dot > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** (id, table, sig) rows — id-only banding; the vector column never
    * leaves the producing stage. */
  private[ops] def bandIds(spark: SparkSession, df: DataFrame, idCol: String,
                           vecCol: String, tables: Int, bits: Int, dim: Int,
                           seed: Long, probeBits: Int = 0): DataFrame = {
    import spark.implicits._
    val bPlanes = spark.sparkContext.broadcast(hyperplanes(tables, bits, dim, seed))
    df.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val ps = bPlanes.value
        it.flatMap { case (id, v) =>
          ps.indices.iterator.flatMap { t =>
            val sig = signature(v, ps(t))
            // multi-probe: also visit the `probeBits` single-bit flips
            val probes = Iterator.single(sig) ++
              (0 until math.min(probeBits, ps(t).length)).iterator.map(b => sig ^ (1L << b))
            probes.map(s => (id, t, s))
          }
        }
      }.toDF("id", "table", "sig")
  }

  /** Random-hyperplane LSH top-k: `tables` independent signatures of `bits`
    * hyperplanes each; candidates = same (table, signature) bucket (queries
    * additionally probe one-bit-flipped buckets), exact-rescored and
    * top-k'd. */
  def lshTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              bits: Int = 6, tables: Int = 16, dim: Int = 64,
              probeBits: Int = 4): DataFrame = {
    import spark.implicits._
    val seed = 0x243f6a8885a308d3L
    val cs = bandIds(spark, corpus, idCol, vecCol, tables, bits, dim, seed)
      .toDF("cid", "table", "sig")
    val qs = bandIds(spark, queries, idCol, vecCol, tables, bits, dim, seed,
      probeBits = probeBits).toDF("qid", "table", "sig")
    // candidate ids only — dedup across tables/probes before any vector moves
    val cands = cs.join(qs, Seq("table", "sig"))
      .filter($"qid" =!= $"cid")
      .select($"qid", $"cid")
      .distinct()
    val cvecs = corpus.select(col(idCol).cast("long").as("cid"),
      col(vecCol).cast("array<double>").as("cv"))
    val qvecs = queries.select(col(idCol).cast("long").as("qid"),
      col(vecCol).cast("array<double>").as("qv"))
    // vectors fetched exactly once per side: query side broadcast (small),
    // corpus side one hash equi-join on cid
    val w = Window.partitionBy($"qid").orderBy($"sim".desc, $"cid".asc)
    cands
      .join(broadcast(qvecs), "qid")
      .join(cvecs, "cid")
      .withColumn("sim", round(cosineCol($"qv", $"cv"), 6))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"qid", $"rank", $"cid", $"sim")
  }
}
