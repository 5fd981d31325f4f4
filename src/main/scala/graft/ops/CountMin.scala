package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) as plain DataFrame
  * algebra — the frequency-estimation member of the mergeable-sketch
  * tier ([[Sketches]] holds the distinct/quantile/top-k members).
  *
  * A sketch is a d×w grid of counters held as a (row, bucket, cnt)
  * DataFrame of at most d·w rows: a few KB regardless of input size.
  *   - BUILD is one explode (fan-out exactly d) + one groupBy on the
  *     (row, bucket) cell key — map-side combine collapses each
  *     partition to ≤ d·w cells before the shuffle, so the exchange
  *     moves O(partitions · d · w) rows, not O(N).
  *   - MERGE across shards (days, sources, repo shards) is cell-wise
  *     sum — associative, commutative, loss-free: merging per-shard
  *     sketches is bit-identical to sketching the union, which is what
  *     the q104 oracle pins.
  *   - ESTIMATE for a key is min over its d cells; the classic
  *     guarantees hold (never an undercount; overcount ≤ εN with
  *     ε = e/w at probability 1−e^−d) — and because the hash family is
  *     fixed and integer-exact, an independent engine reproduces the
  *     ESTIMATE bit-exactly, not just its bound.
  *
  * Hash family: row j uses the affine map
  * `((2j+1)·2654435761 mod P) · key + (40503·j + 7) mod P mod w`,
  * P = 1e9+7 — the same public Knuth/LCG-style family as the MinHash
  * signatures (`ext/Dedup.scala`), chosen for exact mirroring in ANSI
  * SQL. Precondition: keys in [0, [[MaxKey]]] so the products stay
  * inside a 64-bit long — ENFORCED at [[bucket]] (round-6 ADVICE: an
  * out-of-range key would silently overflow to a negative bucket, and
  * both engines would stay mutually consistent, so the oracle could
  * never catch the caller's violation; the row-level guard fails the
  * job instead).
  */
object CountMin {

  val P = 1000000007L

  /** Largest admissible key: aCoef < P, so aCoef·key overflows a long
    * only beyond Long.MaxValue / P ≈ 9.2·10⁹.
    */
  val MaxKey: Long = Long.MaxValue / P

  private def aCoef(j: Column): Column = (lit(2L) * j + 1L) * lit(2654435761L) % P
  private def bCoef(j: Column): Column = lit(40503L) * j + 7L

  /** Bucket of `key` in sketch row `j` (all integer arithmetic). The
    * range guard compiles to one codegen'd CASE branch per row — it
    * never changes a valid key's bucket, and an invalid key raises
    * instead of hashing wrong.
    */
  def bucket(key: Column, j: Column, w: Int): Column = {
    require(w > 0, s"count-min width must be positive, got $w")
    val guarded = when(key.isNull || (key >= 0L && key <= MaxKey), key)
      .otherwise(raise_error(concat(
        lit(s"count-min key outside [0, $MaxKey]: "), key.cast("string"))))
    (aCoef(j) * guarded + bCoef(j)) % P % w
  }

  /** Build one sketch per value combination of `shardCols` (none →
    * one global sketch). Output: shardCols ++ (row, bucket, cnt).
    */
  def sketch(df: DataFrame, keyCol: String, depth: Int, width: Int,
      shardCols: Column*): DataFrame = {
    require(depth > 0, s"count-min depth must be positive, got $depth")
    val rows = df.select(shardCols :+ col(keyCol).cast("long").as("__k"): _*)
      .withColumn("row", explode(sequence(lit(0L), lit(depth - 1L))))
      .withColumn("bucket", bucket(col("__k"), col("row"), width))
    rows.groupBy(shardCols :+ col("row") :+ col("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Cell-wise merge of sharded sketches into one global sketch. */
  def merge(sketches: DataFrame): DataFrame =
    sketches.groupBy(col("row"), col("bucket")).agg(sum(col("cnt")).as("cnt"))

  /** Point-estimate every key of `keys` against a (row, bucket, cnt)
    * sketch: min over the key's d cells, absent cells counting 0. The
    * sketch is at most d·w rows, so Spark broadcasts its side of the
    * join; the keys side never shuffles.
    */
  def estimate(keys: DataFrame, keyCol: String, sk: DataFrame,
      depth: Int, width: Int): DataFrame = {
    require(depth > 0, s"count-min depth must be positive, got $depth")
    val probes = keys.select(col(keyCol), col(keyCol).cast("long").as("__k"))
      .withColumn("row", explode(sequence(lit(0L), lit(depth - 1L))))
      .withColumn("bucket", bucket(col("__k"), col("row"), width))
    probes.join(broadcast(sk), Seq("row", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }
}
