package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Sketches
import graft.queries.SketchQueries

/** The sketch tier's correctness contract (round-4 verdict ask #7): no
  * DuckDB oracle can hash-match another engine's sketch, so the bound IS
  * the test — HLL relative error and GK rank error, asserted against the
  * exact tier at sf0.1 (the scale the driver benches; the bounds are
  * scale-free but the spec exercises real cardinalities, ~600k rows).
  */
class SketchSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.1"

  // lgK=12 → relative standard error ≈ 1.04/sqrt(2^12) ≈ 1.6%; 5% ≈ 3σ.
  private val HllTol = 0.05

  test("q81: per-group HLL estimates within 5% of exact distinct counts") {
    val est = SketchQueries.q81_hll_distinct(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag")).agg(countDistinct(col("l_partkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = Tables.lineitem(spark, sf)
      .agg(countDistinct(col("l_partkey"))).head().getLong(0)
    assert(est.keySet == exact.keySet + "ALL")
    for ((g, ex) <- exact + ("ALL" -> exactAll)) {
      val e = est(g)
      assert(math.abs(e - ex).toDouble / ex <= HllTol,
        s"group $g: estimate $e vs exact $ex exceeds ${HllTol * 100}%")
    }
  }

  test("q81: estimates are deterministic across runs (order-independent registers)") {
    val a = SketchQueries.q81_hll_distinct(spark, sf).collect().toSeq
    val b = SketchQueries.q81_hll_distinct(spark, sf).collect().toSeq
    assert(a == b)
  }

  /** Exact rank of `v` in `colName` ≤ bound away from the target rank. */
  private def assertRankWithin(df: org.apache.spark.sql.DataFrame, colName: String,
      v: Double, q: Double, n: Long, epsN: Double, what: String): Unit = {
    // GK returns an observed value; its rank window is [rank(v..<), rank(v..<=)]
    val below = df.filter(col(colName) < v).count()
    val atOrBelow = df.filter(col(colName) <= v).count()
    val target = q * n
    val lo = below - epsN
    val hi = atOrBelow + epsN
    assert(target >= lo && target <= hi,
      s"$what: value $v has rank window [$below,$atOrBelow], target ${target.toLong}, slack ${epsN.toLong}")
  }

  test("q82: per-group and merged quantiles honor the GK rank-error bound") {
    val li = Tables.lineitem(spark, sf)
    val rows = SketchQueries.q82_quantile_sketch(spark, sf).collect()
    val probs = Seq(("p50_est", 0.5), ("p95_est", 0.95), ("p99_est", 0.99))
    for (r <- rows) {
      val g = r.getString(0)
      val n = r.getLong(4)
      val part = if (g == "ALL") li else li.filter(col("l_returnflag") === g)
      for (((cn, q), i) <- probs.zipWithIndex) {
        val v = r.getDouble(1 + i)
        // single sketch: eps·n; the ALL row went through a merge: 2·eps·n
        val slack = (if (g == "ALL") 2.0 else 1.0) * Sketches.DefaultEps * n
        assertRankWithin(part, "l_extendedprice", v, q, n, slack, s"$g/$cn")
      }
    }
  }

  test("q83: Misra-Gries finds exactly the hot keys, within the n/k undercount bound") {
    val exact = SketchQueries.heavyHitterStream(spark, sf)
      .groupBy(col("domain")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val floor = n / 64
    val hot = exact.filter(_._2 > floor).keySet
    val out = SketchQueries.q83_heavy_hitters(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every key with true > n/k must be reported above the floor...
    assert(hot.subsetOf(out.keySet), s"missing hot keys: ${hot -- out.keySet}")
    // ...anything else reported is sub-threshold residue the floor filter
    // should have removed unless its TRUE count brushes the floor
    for ((k, est) <- out) {
      val ex = exact(k)
      assert(est <= ex, s"$k: MG must never overcount (est $est > exact $ex)")
      assert(est >= ex - floor, s"$k: undercount beyond n/k (est $est, exact $ex, floor $floor)")
    }
    assert(hot.size == 5, s"fixture should have exactly 5 hot domains, got ${hot.size}")
  }

  test("q84: bottom-k sample is 10 rows per group and re-run identical") {
    val a = SketchQueries.q84_bottomk_sample(spark, sf).collect().toSeq
    val b = SketchQueries.q84_bottomk_sample(spark, sf).collect().toSeq
    assert(a == b, "deterministic sample must be identical across runs")
    val perGroup = a.groupBy(_.getString(0)).view.mapValues(_.size).toMap
    assert(perGroup.values.forall(_ == 10), s"per-group sizes: $perGroup")
    // ranks within each group are 1..10 ordered by the md5 sample key
    for ((_, rows) <- a.groupBy(_.getString(0))) {
      val keys = rows.sortBy(_.getInt(4)).map(_.getString(3))
      assert(keys == keys.sorted, "sample_rank order must follow the hash order")
    }
  }

  test("q85: KMV estimates of |A|, |B|, union, intersection within 10% of exact") {
    val li = Tables.lineitem(spark, sf)
    val sides = li.select(pmod(col("l_suppkey"), lit(2)).as("side"), col("l_partkey"))
    val exA = sides.filter(col("side") === 0).select("l_partkey").distinct().count()
    val exB = sides.filter(col("side") === 1).select("l_partkey").distinct().count()
    val exU = sides.select("l_partkey").distinct().count()
    val exI = exA + exB - exU
    val r = SketchQueries.q85_set_overlap_sketch(spark, sf).head()
    def within(est: Double, exact: Long, tol: Double, what: String): Unit =
      assert(math.abs(est - exact) / exact <= tol,
        f"$what: est $est%.0f vs exact $exact (${math.abs(est - exact) / exact * 100}%.1f%%)")
    within(r.getAs[Double]("est_a"), exA, 0.10, "A")
    within(r.getAs[Double]("est_b"), exB, 0.10, "B")
    within(r.getAs[Double]("est_union"), exU, 0.10, "union")
    // intersection compounds union + ratio noise: 15%
    within(r.getAs[Double]("est_inter"), exI, 0.15, "intersection")
  }

  test("quantile sketches merge across arbitrary shards without rescan") {
    // shard by orderkey (uncorrelated with price), store one sketch per
    // shard, fold the four stored sketches — never re-reading the rows
    val skAgg = udaf(new Sketches.QuantileSketchBytes(Sketches.DefaultEps))
    val mergeQ = udaf(new Sketches.QuantileSketchMergeQuery(Sketches.DefaultEps, Seq(0.5, 0.95)))
    val li = Tables.lineitem(spark, sf)
    val shardSketches = li.groupBy(pmod(col("l_orderkey"), lit(4)).as("shard"))
      .agg(skAgg(col("l_extendedprice")).as("sk"))
    val merged = shardSketches.agg(mergeQ(col("sk")).as("qs"))
      .select(col("qs").getItem(0).as("p50"), col("qs").getItem(1).as("p95"))
      .head()
    val n = li.count()
    val slack = 2.0 * Sketches.DefaultEps * n
    assertRankWithin(li, "l_extendedprice", merged.getDouble(0), 0.5, n, slack, "sharded p50")
    assertRankWithin(li, "l_extendedprice", merged.getDouble(1), 0.95, n, slack, "sharded p95")
  }
}
