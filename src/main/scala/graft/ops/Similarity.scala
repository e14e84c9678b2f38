package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - `bruteForceTopK`: exact baseline — broadcast the (small) query set,
  *    one narrow pass over the corpus computing cosine via codegen'd
  *    `zip_with`/`aggregate`, then a per-query top-k window. No shuffle of
  *    the corpus; only the k·|Q| candidate rows move.
  *  - `lshTopK`: the scale path — random-hyperplane signatures bucket the
  *    corpus; each query probes only its bucket (multi-probe via several
  *    tables). Recall < 1, cost ~ |bucket| instead of |corpus|.
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

  /** Random-hyperplane LSH: `tables` independent signatures of `bits`
    * hyperplanes each; candidates = same (table, signature) bucket,
    * exact-rescored and top-k'd. */
  def lshTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              bits: Int = 6, tables: Int = 16, dim: Int = 64): DataFrame = {
    import spark.implicits._
    // deterministic gaussian-ish hyperplanes
    val rng = new graft.corpus.CorpusGen.Rng(0x243f6a8885a308d3L)
    val planes: Array[Array[Array[Double]]] = Array.fill(tables, bits) {
      Array.fill(dim)(rng.nextDouble() * 2 - 1)
    }
    val bPlanes = spark.sparkContext.broadcast(planes)

    def signatures(df: DataFrame, idName: String, vecName: String) =
      df.select(col(idCol).cast("long").as(idName),
          col(vecCol).cast("array<double>").as(vecName))
        .as[(Long, Array[Double])]
        .mapPartitions { it =>
          val ps = bPlanes.value
          it.flatMap { case (id, v) =>
            (0 until ps.length).iterator.map { t =>
              var sig = 0L
              var b = 0
              while (b < ps(t).length) {
                var dot = 0.0
                val p = ps(t)(b)
                var i = 0
                val n = math.min(v.length, p.length)
                while (i < n) { dot += v(i) * p(i); i += 1 }
                if (dot > 0) sig |= (1L << b)
                b += 1
              }
              (id, v, t, sig)
            }
          }
        }.toDF(idName, vecName, "table", "sig")

    val cs = signatures(corpus, "cid", "cv")
    val qs = signatures(queries, "qid", "qv")
    val cands = cs.join(qs, Seq("table", "sig"))
      .filter($"qid" =!= $"cid")
      .select($"qid", $"qv", $"cid", $"cv")
      .dropDuplicates("qid", "cid")
    val w = Window.partitionBy($"qid").orderBy($"sim".desc, $"cid".asc)
    cands.withColumn("sim", round(cosineCol($"qv", $"cv"), 6))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"qid", $"rank", $"cid", $"sim")
  }
}
