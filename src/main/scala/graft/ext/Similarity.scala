package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (array<float>).
  *
  * Baseline: brute-force cosine top-k — probe × candidate join with the dot
  * product as a left-to-right array fold in DOUBLE (cast before multiply:
  * deterministic, engine-portable; float accumulation would not be).
  *
  * Scale path: LSH bucketing by random-hyperplane sign bits (deterministic
  * integer-derived hyperplanes) — candidates shuffle on the bucket key, so
  * probe cost is |bucket| not |corpus|. An IVF variant would replace the
  * hash with learned centroids; the plumbing is identical.
  */
object Similarity {

  /** Elementwise cast to double — do this ONCE, then all math is double. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product as an in-order fold (bit-reproducible). Backed by the
    * codegen'd [[graft.functions.DotProduct]] — same left-to-right IEEE op
    * sequence as the combinator form (and the DuckDB list_reduce mirrors),
    * but one Java loop per row instead of two interpreted lambda calls per
    * dimension.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorOps.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine = dot / (|a|·|b|) with pinned op order. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each probe row (filtered by `isProbe`),
    * the k nearest other vectors. Rank ties pinned by candidate id.
    */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
      isProbe: Column, k: Int): DataFrame =
    bruteForceTopKFiltered(emb, idCol, vecCol, isProbe, k, lit(true))

  /** [[bruteForceTopK]] restricted to candidates satisfying `candPred`
    * (probes exempt) — the exact ground truth for filtered ANN (q114's
    * certification denominator).
    */
  def bruteForceTopKFiltered(emb: DataFrame, idCol: String, vecCol: String,
      isProbe: Column, k: Int, candPred: Column): DataFrame = {
    // Norms are precomputed per ROW before the pair join — O(n) folds
    // instead of O(n·probes); at scale this is the difference between one
    // pass over the corpus and |probes| passes.
    val base = emb.filter(candPred)
      .select(col(idCol).as("cand_id"), toDouble(col(vecCol)).as("cvec"))
      .withColumn("cnorm", norm(col("cvec")))
    val probes = emb.filter(isProbe)
      .select(col(idCol).as("probe_id"), toDouble(col(vecCol)).as("pvec"))
      .withColumn("pnorm", norm(col("pvec")))
    // the BOUNDED probe set is the build side — unhinted, Spark builds
    // the right operand of the non-equi join, i.e. the WHOLE corpus; at
    // scale that broadcast is the query. Probes broadcast, corpus streams.
    val scored = base.join(broadcast(probes), col("probe_id") =!= col("cand_id"))
      .select(col("probe_id"), col("cand_id"),
        (dot(col("pvec"), col("cvec")) / (col("pnorm") * col("cnorm"))).as("cos"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * assign every embedding to its nearest k-means centroid, then compare
    * pairs ONLY within a cluster and drop any document whose cluster holds
    * a near-duplicate (cos ≥ `minCos`) with a smaller id — a deterministic
    * greedy keep-first. Returns (id, list, keep) for every input row.
    *
    * Scale shape: the cluster assignment is pure expressions over centroid
    * literals (no shuffle), the pair join shuffles once on the list id, and
    * the O(n²) pair blowup is sharded into nlist independent O((n/nlist)²)
    * problems — the reason SemDeDup clusters before comparing at all. At
    * corpus scale, nlist grows with n to bound list sizes; a pathological
    * giant cluster (a skewed corpus whose embeddings collapse into one
    * list) is sub-sharded behind `giantCap`: rows of any list larger than
    * the cap get an in-list LSH bucket ([[lshBucketT]], `subBits` sign
    * bits, an independent `subTable`) appended to the pair-join key, so the
    * worst task holds O((cap-ish)²) pairs instead of O(|list|²). Near-dup
    * pairs (cos ≥ minCos) point in almost the same direction, so their sign
    * bits agree unless a hyperplane lands inside the tiny angle between
    * them — sub-sharding can only MISS pairs (keep a few extra rows), never
    * invent drops (SimilaritySpec pins both the subset property and the
    * per-shard bound).
    *
    * @param giantCap sub-shard lists larger than this many rows; the
    *                 default never triggers
    */
  def semDedup(emb: DataFrame, idCol: String, vecCol: String,
      model: IvfIndex.Model, minCos: Double, giantCap: Int = Int.MaxValue,
      subBits: Int = 4, subTable: Int = 9): DataFrame = {
    // assignment + norm computed once into a scoped cache: the frame feeds
    // both pair-join sides and the final keep join
    val v0 = emb.select(col(idCol).cast("long").as("id"), toDouble(col(vecCol)).as("vec"))
      .withColumn("n", norm(col("vec")))
      .withColumn("list", IvfIndex.listId(model, col("vec")))
    // ADAPTIVE guard (round-5 verdict ask #3): the size measurement is a
    // whole-partition window count INSIDE the plan — no driver probe, no
    // size join, no extra action. The window shuffles rows (linear in
    // |list|, safe even for the pathological list — it's the PAIRS that
    // blow up, not the rows), and the LSH projection evaluates only on
    // rows whose list actually exceeds the cap: a corpus with no giant
    // cluster pays one reused exchange and zero projections. This is
    // literally the COUNT() OVER (PARTITION BY list) CASE the q70 DuckDB
    // mirror computes, so both engines make the per-row decision from
    // identical arithmetic.
    val v =
      if (giantCap == Int.MaxValue) v0.withColumn("sub", lit(0L))
        .transform(graft.core.CacheScope.scoped)
      else {
        val byList = org.apache.spark.sql.expressions.Window.partitionBy(col("list"))
        v0.withColumn("sub",
            when(count(lit(1)).over(byList) > giantCap,
              lshBucketT(col("vec"), subBits, subTable)).otherwise(lit(0L)))
          .transform(graft.core.CacheScope.scoped)
      }
    val a = v.select(col("list"), col("sub"), col("id").as("id_a"),
      col("vec").as("va"), col("n").as("na"))
    val b = v.select(col("list"), col("sub"), col("id").as("id_b"),
      col("vec").as("vb"), col("n").as("nb"))
    val dropped = a.join(b, Seq("list", "sub"))
      .filter(col("id_a") < col("id_b"))
      .filter(dot(col("va"), col("vb")) / (col("na") * col("nb")) >= minCos)
      .select(col("id_b").as("id")).distinct()
    v.select(col("id"), col("list"))
      .join(dropped.withColumn("__drop", lit(true)), Seq("id"), "left")
      .select(col("id"), col("list"), col("__drop").isNull.as("keep"))
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1]:
    * LCG(seed = j·dim + i) scaled by an exact rational. Integer-derived →
    * identical in any engine.
    */
  def hyperplaneAt(j: Column, i: Column): Column = {
    val seed = j * 4099 + i * 131 + 7
    val lcg = (seed * lit(1103515245L) + 12345L) % lit(2147483647L)
    (pmod(lcg, lit(2001L)) - 1000L).cast("double") / 1000.0
  }

  /** LSH bucket id from `nBits` hyperplane sign bits. Backed by the
    * codegen'd [[graft.functions.LshBucket]] (one Java loop per row); the
    * combinator formulation paid nBits·dim interpreted lambda calls per
    * vector and kept the projection out of whole-stage codegen. The
    * hyperplane derivation ([[hyperplaneAt]]) and fold orders are replayed
    * exactly, so the q31 oracle stays bit-identical.
    */
  def lshBucket(vec: Column, nBits: Int): Column =
    graft.functions.LshBucket.lshBucket(vec, nBits, 0)

  /** LSH bucket id with a per-table seed offset (independent hash tables). */
  def lshBucketT(vec: Column, nBits: Int, table: Int): Column =
    graft.functions.LshBucket.lshBucket(vec, nBits, table)

  /** Multi-table LSH approximate top-k: candidates share the probe's bucket
    * in ANY of `tables` independent hyperplane tables (the standard
    * recall-vs-cost lever: recall ≈ 1-(1-p)^L). Bucket rows explode per
    * table and join on (table, bucket) — the shuffle key stays narrow.
    * Recall vs. brute force is pinned in SimilaritySpec.
    */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String,
      isProbe: Column, k: Int, nBits: Int, tables: Int = 1): DataFrame = {
    def buckets(vec: Column): Column =
      array((0 until tables).map(t => lshBucketT(vec, nBits, t)): _*)
    val probes = emb.filter(isProbe)
      .select(col(idCol).as("probe_id"), toDouble(col(vecCol)).as("pvec"))
      .withColumn("pnorm", norm(col("pvec")))
      .select(col("probe_id"), col("pvec"), col("pnorm"),
        posexplode(buckets(col("pvec"))).as(Seq("table", "bucket")))
    val cands = emb
      .select(col(idCol).as("cand_id"), toDouble(col(vecCol)).as("cvec"))
      .withColumn("cnorm", norm(col("cvec")))
      .select(col("cand_id"), col("cvec"), col("cnorm"),
        posexplode(buckets(col("cvec"))).as(Seq("table", "bucket")))
    val scored = probes.join(cands, Seq("table", "bucket"))
      .filter(col("probe_id") =!= col("cand_id"))
      .select(col("probe_id"), col("cand_id"),
        (dot(col("pvec"), col("cvec")) / (col("pnorm") * col("cnorm"))).as("cos"))
      .distinct() // a pair can collide in several tables
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }
}
