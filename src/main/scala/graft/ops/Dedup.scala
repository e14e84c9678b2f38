package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for web-scale corpora. Scale notes per operator:
  *
  *  - exact: one hash-partitioned groupBy on a 64-bit content hash — the
  *    only full shuffle, keyed on a short fixed-width column (never the
  *    document text itself);
  *  - MinHash+LSH: per-row signature (narrow) → explode to b band keys →
  *    self-join on (band, key) buckets — the classic
  *    shingle→minhash→band→bucket-join plan; the join is an equi-join on a
  *    short key so Catalyst sort-merge-joins it and AQE splits skewed
  *    buckets; candidates are exact-verified so the LSH stage only affects
  *    recall/cost, not precision;
  *  - SimHash: 64-bit signature per doc, banded into 4×16-bit chunks for
  *    hamming≤3 candidate generation (each near-pair shares ≥1 chunk).
  */
object Dedup {

  // ---- exact -----------------------------------------------------------

  /** Keep the smallest id per identical text (first-writer-wins, like the
    * reference's content-hash caches, `support/convert.py:27-45`). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    df.select(col(idCol), col(textCol))
      .groupBy(xxhash64(col(textCol)).as("h"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))
      .drop("h")
  }

  // ---- MinHash ---------------------------------------------------------

  /** Deterministic 64-bit string hash (FNV-1a), stable across JVMs. */
  def hashToken(s: String): Long = graft.core.TextUtil.fnv64(s)

  /** k permutation approximations via (a*x+b) mod p over the shingle hash. */
  final case class MinHashParams(numHashes: Int = 128, bands: Int = 64,
                                 shingleSize: Int = 3) {
    def rows: Int = numHashes / bands
  }

  private val P = (1L << 61) - 1 // Mersenne prime

  // Coefficients are deterministic in k — computed once per JVM (executor),
  // not per document: the signature loop is the hottest code in the LSH path.
  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  private def hashCoeffs(k: Int): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent(k, (kk: Int) => {
      val rng = new graft.corpus.CorpusGen.Rng(0x6a09e667f3bcc908L)
      val as = new Array[Long](kk); val bs = new Array[Long](kk)
      var i = 0
      while (i < kk) {
        as(i) = math.abs(rng.nextLong()) % (P - 1) + 1
        bs(i) = math.abs(rng.nextLong()) % P
        i += 1
      }
      (as, bs)
    })

  def minhashSignature(shingleHashes: Iterable[Long], k: Int): Array[Long] = {
    val (as, bs) = hashCoeffs(k)
    val sig = Array.fill(k)(Long.MaxValue)
    for (x0 <- shingleHashes) {
      val x = (x0 & 0x7fffffffffffffffL) % P
      var i = 0
      while (i < k) {
        // (a*x+b) mod p via BigInt-free 126-bit mod-Mersenne reduction
        val v = modMersenne61(mulmod61(as(i), x) + bs(i))
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig
  }

  private def mulmod61(a: Long, b: Long): Long = {
    // multiply mod 2^61-1 using 128-bit split
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // value = hi*2^64 + lo; 2^64 ≡ 8 (mod 2^61-1)
    modMersenne61(modMersenne61(hi) * 8 + modMersenne61(lo & 0x7fffffffffffffffL) +
      (if (lo < 0) modMersenne61(1L << 62) + modMersenne61(1L << 62) else 0L))
  }

  private def modMersenne61(x0: Long): Long = {
    var x = (x0 & P) + (x0 >>> 61)
    if (x >= P) x -= P
    x
  }

  /** Jaccard over shingle sets — the exact verifier. */
  def jaccard(a: Set[String], b: Set[String]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val inter = a.intersect(b).size
    val union = a.size + b.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** MinHash+LSH near-duplicate pairs with exact-jaccard verification.
    * Input (id: Long, text: String); output (id_a, id_b, jaccard) with
    * id_a < id_b and jaccard ≥ threshold.
    *
    * `maxBucket` caps the size of any (band, bucket) group before the
    * self-join: a bucket of b docs contributes b² candidate pairs, so one
    * pathological bucket (boilerplate-identical pages, which web corpora
    * always have) turns the join quadratic. Oversized buckets are dropped
    * whole — the standard web-scale trade (those docs are caught by exact
    * dedup or by their other, smaller bands). Default = no cap, which is
    * the exhaustive-oracle behavior; the sf1 soak runs with a cap. */
  def minhashLsh(spark: SparkSession, df: DataFrame, idCol: String,
                 textCol: String, threshold: Double,
                 params: MinHashParams = MinHashParams(),
                 maxBucket: Int = Int.MaxValue): DataFrame = {
    import spark.implicits._
    val k = params.numHashes
    val bands = params.bands
    val rows = params.rows
    val shingleN = params.shingleSize

    val docs = df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
    // signature + band keys per doc (narrow stage)
    val banded = docs.mapPartitions(_.flatMap { case (id, text) =>
      val toks = graft.core.TextUtil.tokens(text).toIndexedSeq
      val sh = TextOps.shingles(toks, shingleN)
      if (sh.isEmpty) Iterator.empty
      else {
        val sig = minhashSignature(sh.iterator.map(hashToken).toIterable, k)
        (0 until bands).iterator.map { b =>
          var h = 1125899906842597L ^ b
          var r = 0
          while (r < rows) { h = h * 1000003L + sig(b * rows + r); r += 1 }
          (b, h, id)
        }
      }
    }).toDF("band", "bucket", "id")
      .transform { b =>
        if (maxBucket == Int.MaxValue) b
        else {
          // the count window shuffles on (band, bucket) — the same key the
          // self-join below needs, so AQE reuses the exchange
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("band", "bucket")
          b.withColumn("_n", count(lit(1)).over(w))
            .filter(col("_n") <= maxBucket).drop("_n")
        }
      }

    // bucket self-join → candidate pairs (dedup across bands).
    // Columns are renamed per side: alias-only self-joins misresolve the
    // l/r attributes (same attribute ids on both sides).
    val lSide = banded.toDF("band", "bucket", "id_a")
    val rSide = banded.toDF("band", "bucket", "id_b")
    val candidates = lSide.join(rSide, Seq("band", "bucket"))
      .filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b")
      .distinct()

    // exact verify: join text back, compute true jaccard
    val texts = docs.toDF("id", "text")
    candidates
      .join(texts.withColumnRenamed("id", "id_a").withColumnRenamed("text", "text_a"), "id_a")
      .join(texts.withColumnRenamed("id", "id_b").withColumnRenamed("text", "text_b"), "id_b")
      .select($"id_a", $"id_b", $"text_a", $"text_b") // USING joins reorder columns
      .as[(Long, Long, String, String)]
      .mapPartitions(_.map { case (a, b, ta, tb) =>
        val sa = TextOps.shingles(graft.core.TextUtil.tokens(ta).toIndexedSeq, shingleN)
        val sb = TextOps.shingles(graft.core.TextUtil.tokens(tb).toIndexedSeq, shingleN)
        (a, b, jaccard(sa, sb))
      })
      .toDF("id_a", "id_b", "jaccard")
      .filter($"jaccard" >= threshold)
  }

  /** Exhaustive n-gram-Jaccard pairs via shingle explode + equi-join —
    * exact (no LSH), quadratic only within shared shingles. Same output
    * contract as minhashLsh; at scale the LSH variant replaces it. */
  def ngramJaccardExact(spark: SparkSession, df: DataFrame, idCol: String,
                        textCol: String, threshold: Double,
                        shingleN: Int = 3): DataFrame = {
    import spark.implicits._
    val docs = df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
    val sh = docs.mapPartitions(_.flatMap { case (id, text) =>
      val s = TextOps.shingles(graft.core.TextUtil.tokens(text).toIndexedSeq, shingleN)
      s.iterator.map(x => (id, hashToken(x), s.size))
    }).toDF("id", "shingle", "sz")
    val l = sh.toDF("id_a", "shingle", "sz_a")
    val r = sh.toDF("id_b", "shingle", "sz_b")
    l.join(r, Seq("shingle"))
      .filter($"id_a" < $"id_b")
      .groupBy($"id_a", $"id_b", $"sz_a", $"sz_b")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        $"inter" / ($"sz_a" + $"sz_b" - $"inter"))
      .filter($"jaccard" >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ---- SimHash -----------------------------------------------------------

  def simhash64(tokens: Iterable[String]): Long = {
    val acc = new Array[Int](64)
    for (t <- tokens) {
      val h = hashToken(t)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (acc(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxDist, candidate
    * generation via 16-bit chunk banding (pigeonhole: dist ≤ 3 ⇒ some
    * chunk equal). */
  def simhashPairs(spark: SparkSession, df: DataFrame, idCol: String,
                   textCol: String, maxDist: Int = 3): DataFrame = {
    import spark.implicits._
    require(maxDist <= 3, "4x16-bit banding supports hamming<=3")
    val sigs = df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id, simhash64(graft.core.TextUtil.tokens(text)))
      }).toDF("id", "sig")
    val banded = sigs.select($"id", $"sig",
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk"),
          shiftrightunsigned($"sig", c * 16).bitwiseAND(lit(0xffffL)).as("key"))): _*))
        .as("b"))
      .select($"id", $"sig", $"b.chunk", $"b.key")
    val l = banded.toDF("id_a", "sig_a", "chunk", "key")
    val r = banded.toDF("id_b", "sig_b", "chunk", "key")
    l.join(r, Seq("chunk", "key"))
      .filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b",
        bit_count($"sig_a".bitwiseXOR($"sig_b")).as("dist"))
      .distinct()
      .filter($"dist" <= maxDist)
  }

  /** Embedding-cosine near-dup: pairs with cosine ≥ threshold — APPROXIMATE
    * in recall, exact in precision.
    *
    * Recall contract: a candidate pair surfaces only if some table's `bits`
    * hyperplane signs all agree. For angle θ between the vectors each bit
    * agrees with probability 1−θ/π, so recall ≈ 1−(1−(1−θ/π)^bits)^tables —
    * at the defaults (8 tables × 16 bits) that is ~0.999 for cosine 0.995,
    * ~0.97 for cosine 0.98, ~0.80 for cosine 0.95. Pairs that do surface are
    * always cosine-verified (no false positives). Raise `tables` (linear
    * cost, narrow stage) to buy recall at lower thresholds. The
    * `e_embed_dups` oracle plants both exact-direction and slightly
    * perturbed (cos≈0.995) duplicates to pin this behavior.
    *
    * Scale plan: random-hyperplane sign signatures bucket the vectors
    * (`tables` independent 16-bit bands — near-identical directions share
    * every band; recall decays with angle, precision is exact because every
    * candidate is cosine-verified). The bucket self-join is an equi-join on
    * (table, sig) over (id, table, sig) rows only — vectors never ride the
    * shuffle and nothing is O(n²); the physical plan is asserted
    * CartesianProduct/BroadcastNestedLoopJoin-free by OpsSpec. */
  def embeddingDups(spark: SparkSession, emb: DataFrame, idCol: String,
                    vecCol: String, threshold: Double,
                    tables: Int = 8, bits: Int = 16, dim: Int = 64): DataFrame = {
    import spark.implicits._
    val banded = Similarity.bandIds(spark, emb, idCol, vecCol, tables, bits,
      dim, seed = 0x452821e638d01377L)
    // rename per side: alias-only self-joins misresolve (same attribute ids)
    val l = banded.toDF("id_a", "table", "sig")
    val r = banded.toDF("id_b", "table", "sig")
    val cands = l.join(r, Seq("table", "sig"))
      .filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b")
      .distinct()
    val vecs = emb.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    cands
      .join(vecs.toDF("id_a", "v_a"), "id_a")
      .join(vecs.toDF("id_b", "v_b"), "id_b")
      .withColumn("cosine", Similarity.cosineCol($"v_a", $"v_b"))
      .filter($"cosine" >= threshold)
      .select($"id_a", $"id_b", $"cosine")
  }
}
