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

  /** Symmetric per-vector int8 quantization — the compression step an
    * embedding store runs before vectors ride a shuffle or land in the
    * ANN index (the same scalar-quantize shape [[ivfPqTopK]]'s PQ codes
    * refine): per vector, scale = max|x|/127 and q_i = round(x_i/scale)
    * ∈ [-127, 127]. Output (id, scale_micros, q) with q as the
    * space-joined int string and scale_micros = round(1e6·max|x|) —
    * integer outputs so a DuckDB oracle replays the arithmetic exactly
    * (both engines evaluate the same float32→double widening and
    * ties-away-from-zero rounding).
    *
    * Scale shape: one narrow codegen'd pass — max|x| is computed once per
    * row as its own column (NOT inlined per element, which would be
    * O(d²)); nothing shuffles. At 100 TB the quantized corpus is ~4× the
    * id volume instead of 4·d bytes/vec. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    df.select(col(idCol).cast("long").as("id"), v.as("v"))
      .withColumn("maxabs", array_max(transform(col("v"), x => abs(x))))
      .select(col("id"),
        round(col("maxabs") * 1e6).cast("long").as("scale_micros"),
        array_join(transform(col("v"), x =>
          when(col("maxabs") === 0d, lit(0L))
            .otherwise(round(x * 127d / col("maxabs")).cast("long"))
            .cast("string")), " ").as("q"))
  }

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

  /** Candidate (qid, cid) pairs → exact cosine rescore → per-query top-k.
    * Query vectors broadcast (small side), corpus vectors fetched by ONE
    * hash equi-join on cid — candidates are deduped before any vector
    * bytes move. */
  private def rescoreTopK(corpus: DataFrame, queries: DataFrame,
                          idCol: String, vecCol: String,
                          cands: DataFrame, k: Int): DataFrame = {
    val cvecs = corpus.select(col(idCol).cast("long").as("cid"),
      col(vecCol).cast("array<double>").as("cv"))
    val qvecs = queries.select(col(idCol).cast("long").as("qid"),
      col(vecCol).cast("array<double>").as("qv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid").asc)
    cands
      .join(broadcast(qvecs), "qid")
      .join(cvecs, "cid")
      .withColumn("sim", round(cosineCol(col("qv"), col("cv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("sim"))
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
    rescoreTopK(corpus, queries, idCol, vecCol, cands, k)
  }

  // ---- IVF (inverted-file) ANN ---------------------------------------------

  /** Deterministic spherical k-means over a bounded sample: unit-normalized
    * vectors, assignment by max dot product, mean-then-renormalize updates.
    * Coarse-quantizer training is a small-sample job by construction (the
    * standard IVF recipe) — only the assignment pass is distributed. */
  private[ops] def trainCentroids(sample: Array[Array[Double]], kCells: Int,
                                  iters: Int, seed: Long): Array[Array[Double]] = {
    def normalize(v: Array[Double]): Array[Double] = {
      var n = 0.0
      var i = 0
      while (i < v.length) { n += v(i) * v(i); i += 1 }
      val inv = if (n > 0) 1.0 / math.sqrt(n) else 0.0
      v.map(_ * inv)
    }
    val unit = sample.map(normalize).filter(_.exists(_ != 0.0))
    if (unit.isEmpty) return Array(Array.fill(1)(0.0))
    val k = math.min(kCells, unit.length)
    val rng = new graft.corpus.CorpusGen.Rng(seed)
    val centroids = Array.tabulate(k)(i => unit(((rng.nextLong() >>> 1) % unit.length).toInt).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](unit(0).length))
      val counts = new Array[Int](k)
      for (v <- unit) {
        var best = 0
        var bestDot = Double.NegativeInfinity
        var c = 0
        while (c < k) {
          var dot = 0.0
          var i = 0
          while (i < v.length && i < centroids(c).length) {
            dot += v(i) * centroids(c)(i); i += 1
          }
          if (dot > bestDot) { bestDot = dot; best = c }
          c += 1
        }
        var i = 0
        while (i < v.length) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) centroids(c) = normalize(sums(c))
        c += 1
      }
      it += 1
    }
    centroids
  }

  private[ops] def nearestCells(v: Array[Double],
                                centroids: Array[Array[Double]],
                                nProbe: Int): Array[Int] = {
    val scored = centroids.indices.map { c =>
      var dot = 0.0
      var n = 0.0
      var i = 0
      while (i < v.length && i < centroids(c).length) {
        dot += v(i) * centroids(c)(i); i += 1
      }
      i = 0
      while (i < v.length) { n += v(i) * v(i); i += 1 }
      (c, if (n > 0) dot / math.sqrt(n) else dot)
    }
    scored.sortBy { case (c, d) => (-d, c) }.take(nProbe).map(_._1).toArray
  }

  /** IVF top-k: spherical-k-means cells bucket the corpus (one narrow
    * assignment pass under broadcast centroids — scaling-invariant, so
    * direction-identical vectors always share a cell); each query probes
    * its `nProbe` nearest cells; candidates equi-join on the cell id,
    * vectors fetched once per side, exact rescore. The inverted lists are
    * (cell, id) rows — the vector column never rides the bucket join. */
  def ivfTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nCells: Int = 64, nProbe: Int = 4, sampleN: Int = 2048,
              iters: Int = 8, seed: Long = 0x9e3779b97f4a7c15L): DataFrame = {
    import spark.implicits._
    val sample = corpus.select(col(vecCol).cast("array<double>"))
      .limit(sampleN).as[Array[Double]].collect()
    val bCentroids = spark.sparkContext.broadcast(
      trainCentroids(sample, nCells, iters, seed))

    def assign(df: DataFrame, idName: String, probes: Int): DataFrame =
      df.select(col(idCol).cast("long").as(idName),
          col(vecCol).cast("array<double>").as("v"))
        .as[(Long, Array[Double])]
        .mapPartitions { it =>
          val cs = bCentroids.value
          it.flatMap { case (id, v) =>
            nearestCells(v, cs, probes).iterator.map(cell => (id, cell))
          }
        }.toDF(idName, "cell")

    val cLists = assign(corpus, "cid", 1)
    val qLists = assign(queries, "qid", nProbe)
    val cands = cLists.join(qLists, Seq("cell"))
      .filter($"qid" =!= $"cid")
      .select($"qid", $"cid")
      .distinct()
    rescoreTopK(corpus, queries, idCol, vecCol, cands, k)
  }

  // ---- IVF-PQ (inverted file + product quantization) -----------------------

  private[ops] def l2normalize(v: Array[Double]): Array[Double] = {
    var n = 0.0
    var i = 0
    while (i < v.length) { n += v(i) * v(i); i += 1 }
    val inv = if (n > 0) 1.0 / math.sqrt(n) else 0.0
    v.map(_ * inv)
  }

  /** Plain (non-spherical) L2 k-means for PQ codebook training — residual
    * subvectors are not unit vectors, so the spherical update is wrong for
    * them. Deterministic: seeded init, empty clusters keep their centroid. */
  private[ops] def kmeansPlain(sample: Array[Array[Double]], k0: Int,
                               iters: Int, seed: Long): Array[Array[Double]] = {
    if (sample.isEmpty) return Array(Array(0.0))
    val k = math.max(1, math.min(k0, sample.length))
    val d = sample(0).length
    val rng = new graft.corpus.CorpusGen.Rng(seed)
    val cents = Array.tabulate(k)(_ =>
      sample(((rng.nextLong() >>> 1) % sample.length).toInt).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](d))
      val counts = new Array[Int](k)
      for (v <- sample) {
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < k) {
          var dist = 0.0; var i = 0
          while (i < d) { val t = v(i) - cents(c)(i); dist += t * t; i += 1 }
          if (dist < bestD) { bestD = dist; best = c }
          c += 1
        }
        var i = 0
        while (i < d) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var i = 0
          while (i < d) { cents(c)(i) = sums(c)(i) / counts(c); i += 1 }
        }
        c += 1
      }
      it += 1
    }
    cents
  }

  /** Nearest-codeword index per subspace (m bytes per vector). */
  private[ops] def pqEncode(res: Array[Double],
                            books: Array[Array[Array[Double]]]): Array[Byte] = {
    val m = books.length
    val code = new Array[Byte](m)
    val dsub = if (m == 0) 0 else res.length / m
    var s = 0
    while (s < m) {
      val book = books(s)
      val off = s * dsub
      var best = 0; var bestD = Double.MaxValue; var j = 0
      while (j < book.length) {
        var dist = 0.0; var i = 0
        while (i < dsub) { val t = res(off + i) - book(j)(i); dist += t * t; i += 1 }
        if (dist < bestD) { bestD = dist; best = j }
        j += 1
      }
      code(s) = best.toByte
      s += 1
    }
    code
  }

  /** IVF-PQ top-k — the memory-bounded 100 TB ANN shape (Jégou et al.,
    * "Product Quantization for Nearest Neighbor Search", TPAMI 2011; the
    * IVFADC recipe FAISS popularized):
    *
    *  - vectors are unit-normalized once (inner product = cosine), coarse
    *    spherical-k-means cells as in [[ivfTopK]];
    *  - each corpus vector is stored as its cell id + an `m`-byte PQ code
    *    of its **residual** (v − centroid): at dim 64 that is 8 bytes in
    *    the inverted lists instead of 512 — the whole point at 100 TB,
    *    where the float vectors dominate corpus bytes and must not ride
    *    the candidate join;
    *  - queries probe `nProbe` cells; scoring is ADC — per query one
    *    `m × ksub` lookup table of subspace dot products, so a candidate
    *    costs m table adds, no vector fetch;
    *  - the per-query ADC top-(`refine`·k) shortlist is exact-rescored
    *    (one id-join to fetch the shortlist's true vectors) so the output
    *    contract matches the other ANN variants: (qid, rank, cid, sim_r6).
    *
    * Training (coarse + codebooks) runs on a bounded `sampleN` driver
    * sample — the standard recipe; everything distributed is one narrow
    * encode pass + an equi-join on the cell id carrying only
    * (qid, cid, m bytes). */
  def ivfPqTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
                idCol: String, vecCol: String, k: Int,
                nCells: Int = 64, nProbe: Int = 4, m: Int = 8,
                ksub: Int = 256, sampleN: Int = 2048, iters: Int = 8,
                refine: Int = 4,
                seed: Long = 0x9e3779b97f4a7c15L,
                maxQueries: Int = 65536): DataFrame = {
    import spark.implicits._
    require(m > 0 && ksub > 1 && ksub <= 256, "PQ codes are 1 byte per subspace")

    val sample = corpus.select(col(vecCol).cast("array<double>"))
      .limit(sampleN).as[Array[Double]].collect()
      .map(l2normalize).filter(_.exists(_ != 0.0))
    val centroids = trainCentroids(sample, nCells, iters, seed)
    val residuals = sample.map { v =>
      val cell = nearestCells(v, centroids, 1)(0)
      val c = centroids(cell)
      Array.tabulate(v.length)(i => v(i) - (if (i < c.length) c(i) else 0.0))
    }
    val dim = if (sample.isEmpty) 0 else sample(0).length
    val dsub = math.max(1, dim / math.min(m, math.max(1, dim)))
    val mEff = if (dim == 0) 1 else dim / dsub
    val books = Array.tabulate(mEff) { s =>
      kmeansPlain(residuals.map(_.slice(s * dsub, (s + 1) * dsub)),
        ksub, iters, seed ^ (0x9e3779b97f4a7c15L * (s + 1)))
    }
    val bModel = spark.sparkContext.broadcast((centroids, books))

    // inverted lists: (cid, cell, m-byte code) — one narrow encode pass
    val codes = corpus
      .select(col(idCol).cast("long").as("cid"),
        col(vecCol).cast("array<double>").as("v"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val (cs, bks) = bModel.value
        it.map { case (id, v0) =>
          val v = l2normalize(v0)
          val cell = nearestCells(v, cs, 1)(0)
          val c = cs(cell)
          val res = Array.tabulate(v.length)(i =>
            v(i) - (if (i < c.length) c(i) else 0.0))
          (id, cell, pqEncode(res, bks))
        }
      }.toDF("cid", "cell", "code")

    // query side: (qid, cell) probe rows + a broadcast qid→unit-vector map
    // (the query set is the small side by contract, as in bruteForceTopK).
    // The collect is ENFORCED bounded: limit(maxQueries+1) caps what can
    // reach the driver, and the require turns an oversize query side into
    // a fast, explicit failure instead of a silent driver OOM.
    val qvecs = queries
      .select(col(idCol).cast("long").as("qid"),
        col(vecCol).cast("array<double>").as("v"))
      .as[(Long, Array[Double])]
    val qArr = qvecs.limit(maxQueries + 1).collect()
    require(qArr.length <= maxQueries,
      s"ivfPqTopK: query side exceeds maxQueries=$maxQueries rows — the " +
      "query set is broadcast from the driver; batch the queries or raise " +
      "maxQueries if the driver heap genuinely accommodates it")
    val qmap = spark.sparkContext.broadcast(
      qArr.map { case (id, v) => id -> l2normalize(v) }.toMap)
    val qcells = qvecs.mapPartitions { it =>
      val (cs, _) = bModel.value
      it.flatMap { case (id, v) =>
        nearestCells(l2normalize(v), cs, nProbe).iterator.map(c => (id, c))
      }
    }.toDF("qid", "cell")

    // ADC scoring: per (qid) one m×ksub LUT of subspace dots, built lazily
    // per partition; approx = dot(q, centroid_cell) + Σ_s LUT(s)(code_s)
    val scored = codes.join(qcells, Seq("cell"))
      .filter($"qid" =!= $"cid")
      .select($"qid", $"cell", $"cid", $"code")
      .as[(Long, Int, Long, Array[Byte])]
      .mapPartitions { it =>
        val (cs, bks) = bModel.value
        val qs = qmap.value
        val luts = scala.collection.mutable.HashMap.empty[Long, Array[Array[Double]]]
        val qdotc = scala.collection.mutable.HashMap.empty[(Long, Int), Double]
        it.map { case (qid, cell, cid, code) =>
          val q = qs(qid)
          val lut = luts.getOrElseUpdate(qid, {
            Array.tabulate(bks.length) { s =>
              val off = s * (q.length / bks.length)
              bks(s).map { cw =>
                var dot = 0.0; var i = 0
                while (i < cw.length && off + i < q.length) {
                  dot += q(off + i) * cw(i); i += 1
                }
                dot
              }
            }
          })
          val base = qdotc.getOrElseUpdate((qid, cell), {
            val c = cs(cell)
            var dot = 0.0; var i = 0
            while (i < c.length && i < q.length) { dot += q(i) * c(i); i += 1 }
            dot
          })
          var approx = base
          var s = 0
          while (s < code.length && s < lut.length) {
            approx += lut(s)(code(s) & 0xff); s += 1
          }
          (qid, cid, approx)
        }
      }.toDF("qid", "cid", "approx")

    // ADC shortlist → exact rescore (dedup across probes first: a candidate
    // can surface from several probed cells with the same approx score)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("approx").desc, col("cid").asc)
    val cands = scored
      .groupBy($"qid", $"cid").agg(max($"approx").as("approx"))
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= math.max(refine * k, 32))
      .select($"qid", $"cid")
    rescoreTopK(corpus, queries, idCol, vecCol, cands, k)
  }

  // ---- SemDeDup (semantic deduplication) -----------------------------------

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication", arXiv:2303.09540): prune
    * semantic near-duplicates by (1) k-means clustering the embeddings so
    * the quadratic pairwise comparison never crosses cluster boundaries,
    * then (2) within each cluster removing every point that has a
    * smaller-id neighbor with cosine ≥ `threshold` (the paper keeps one
    * exemplar per semantic group; smallest id is the deterministic
    * stand-in for its "keep the first" rule).
    *
    * Scale shape (the reason this beats [[Dedup.embeddingDups]]' hyperplane
    * banding for *semantic* — lower-cosine — duplicates, where band
    * collision probability collapses):
    *
    *  - coarse centroids train on a bounded `sampleN` driver sample
    *    (standard k-means-on-sample recipe, same as the IVF quantizer);
    *  - cluster assignment is one narrow pass under broadcast centroids —
    *    cosine scoring, so it is scaling-invariant and direction-identical
    *    vectors always co-cluster;
    *  - the pairwise stage is an equi-join on the cell id. Each side
    *    carries its vector exactly once into a cluster-partitioned
    *    exchange — unavoidable (the cosine needs both vectors) and
    *    bounded: expected cluster size is n/k, so the per-cluster
    *    quadratic work is (n/k)² and the planner sizes k to the corpus
    *    (the paper runs k = n/â for target cluster size â);
    *  - `maxCluster` caps any single cell before the join (first
    *    `maxCluster` members by id participate; the row_number guard
    *    reuses the join's hash-partitioning on `cell`), so one degenerate
    *    centroid cannot go quadratic at 100 TB — same discipline as the
    *    LSH `maxBucket` guard.
    *
    * Returns the ids of removed (pruned) rows, one column `removed_id`. */
  def semDedup(spark: SparkSession, df: DataFrame, idCol: String,
               vecCol: String, threshold: Double, nClusters: Int = 64,
               sampleN: Int = 2048, iters: Int = 8,
               maxCluster: Int = 1 << 20,
               seed: Long = 0x9e3779b97f4a7c15L): DataFrame = {
    import spark.implicits._
    val base = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val sample = base.select($"v").limit(sampleN).as[Array[Double]].collect()
    val bC = spark.sparkContext.broadcast(
      trainCentroids(sample, nClusters, iters, seed))
    val assigned = base.as[(Long, Array[Double])]
      .mapPartitions { it =>
        val cs = bC.value
        it.map { case (id, v) => (id, v, nearestCells(v, cs, 1)(0)) }
      }.toDF("id", "v", "cell")
    val guarded =
      if (maxCluster == Int.MaxValue) assigned
      else {
        val w = Window.partitionBy($"cell").orderBy($"id")
        assigned.withColumn("_n", row_number().over(w))
          .filter($"_n" <= maxCluster).drop("_n")
      }
    // per-side column renames, NOT self-join aliases (attribute resolution)
    val lhs = guarded.toDF("id_a", "va", "cell")
    val rhs = guarded.toDF("id_b", "vb", "cell")
    lhs.join(rhs, Seq("cell"))
      .filter($"id_a" < $"id_b")
      .filter(cosineCol($"va", $"vb") >= threshold)
      .select($"id_b".as("removed_id"))
      .distinct()
  }
}
