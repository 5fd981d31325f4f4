package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.queries.ExtensionQueries6

/** Property pins for the round-5 batch (cross-engine equality itself is
  * the DuckDB oracle's job — these assert the operator SEMANTICS).
  */
class ExtensionQueries6Spec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.01"

  test("q87: systematic sampling picks one row per weight step, per group") {
    val li = Tables.lineitem(spark, sf)
    val totals = li.groupBy(col("l_returnflag"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val picks = ExtensionQueries6.q87_weighted_sample(spark, sf)
      .groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val step = 50000000L
    for ((g, w) <- totals) {
      // exactly one pick per crossed step boundary: floor(W/step) ± the
      // partial first/last step
      val expect = w / step
      assert(math.abs(picks(g) - expect) <= 1,
        s"group $g: ${picks(g)} picks for total weight $w (expected ~$expect)")
    }
  }

  test("q87: re-run picks the identical rows") {
    val a = ExtensionQueries6.q87_weighted_sample(spark, sf).collect().toSeq
    val b = ExtensionQueries6.q87_weighted_sample(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("q89: one-row verdict; clean synthetic data passes every constraint") {
    val r = ExtensionQueries6.q89_quality_constraints(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_rows") == Tables.lineitem(spark, sf).count())
    assert(row.getAs[Int]("passed") == 1,
      s"driver testdata should satisfy all constraints: $row")
  }

  test("q90: outlier flags match a driver-side median/MAD recomputation") {
    val rows = ExtensionQueries6.q90_mad_outliers(spark, sf).collect()
    val cents = rows.map(_.getAs[Long]("day_cents").toDouble).sorted
    def medOf(xs: Array[Double]): Double = {
      val n = xs.length
      if (n % 2 == 1) xs(n / 2) else (xs(n / 2 - 1) + xs(n / 2)) / 2.0
    }
    val med = medOf(cents)
    val mad = medOf(rows.map(r => math.abs(r.getAs[Long]("day_cents") - med)).sorted)
    for (r <- rows) {
      val expect = if (math.abs(r.getAs[Long]("day_cents") - med) > mad * 3 * 1.4826) 1 else 0
      assert(r.getAs[Int]("is_outlier") == expect,
        s"day ${r.getAs[Long]("day_idx")}: flag ${r.getAs[Int]("is_outlier")} != $expect")
    }
  }

  test("q88: drift localizes to exactly the buckets containing perturbed keys") {
    val li = Tables.lineitem(spark, sf)
    val perturbedBuckets = li.filter(pmod(col("l_orderkey"), lit(1000)) === 0)
      .select(pmod(col("l_orderkey"), lit(64)).as("b")).distinct()
      .collect().map(_.getLong(0)).toSet
    val out = ExtensionQueries6.q88_table_checksum(spark, sf).collect()
    val drifted = out.filter(_.getAs[Int]("drifted") == 1).map(_.getAs[Long]("bucket")).toSet
    assert(drifted == perturbedBuckets,
      s"drift detection: got $drifted, expected $perturbedBuckets")
    // row counts never differ (same cardinality, different content)
    assert(out.forall(r => r.getAs[Long]("n_a") == r.getAs[Long]("n_b")))
  }
}
