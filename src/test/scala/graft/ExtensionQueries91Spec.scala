package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries91

/** Semantics pins for the forensics/surface batch (q364-q366). */
class ExtensionQueries91Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q364: Benford terms equal the driver recount; uniform totals flag hard") {
    val p = Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L, 57992L, 51153L, 45757L)
    assert(p.sum == 1000000L, "pinned Benford table must sum to exactly 1e6")
    val cents = graft.core.Tables.orders(spark, dir)
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).collect()
      .map(_.getLong(0))
    val obs = cents.map(_.toString.head.asDigit).groupBy(identity)
      .map { case (d, xs) => d -> xs.length.toLong }
    val n = cents.length.toLong
    val ref = obs.map { case (d, o) =>
      val e = n * p(d - 1)
      val diff = BigInt(o * 1000000L - e)
      d.toLong -> (o, e, (diff * diff / e).toLong)
    }
    val got = ExtensionQueries91.q364_benford(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == ref)
    // order totals are uniform-ish, nothing like Benford: the χ² must be
    // enormous relative to the 5% critical value for 8 df (15.51 → the
    // micro threshold 15507000). A Benford-conformant corpus would sit
    // under it; this one must NOT.
    val chi2Micro = got.values.map(_._3).sum
    assert(chi2Micro > 15507000L * 10,
      s"uniform totals should obliterate the Benford fit: $chi2Micro")
  }

  test("q365: UNPIVOT rows equal the wide aggregate recount, 3 metrics per flag") {
    val wide = graft.core.Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(sum(expr("CAST(round(l_quantity * 100) AS BIGINT)")).as("qty_c"),
        sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("price_c"),
        count(lit(1)).as("n_rows"))
      .collect()
      .flatMap(r => Seq(
        (r.getString(0), "qty_c", r.getLong(1)),
        (r.getString(0), "price_c", r.getLong(2)),
        (r.getString(0), "n_rows", r.getLong(3))))
      .sortBy(t => (t._1, t._2))
    val got = ExtensionQueries91.q365_sql_unpivot(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == wide.toSeq)
  }

  test("q366: observed metrics surface the PRE-filter scan totals in one pass") {
    val df = ExtensionQueries91.q366_observed_metrics(spark, dir)
    val rows = df.collect()
    // the observation sees every scanned row — BEFORE the status filter —
    // so its totals must match the whole orders table, not the result
    val all = graft.core.Tables.orders(spark, dir)
      .agg(count(lit(1)), sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")))
      .collect().head
    val m = df.queryExecution.observedMetrics("q366_scan")
    assert(m.getAs[Long]("scan_rows") == all.getLong(0))
    assert(m.getAs[Long]("scan_cents") == all.getLong(1))
    // and the pass-through result is the filtered rollup (fewer rows than
    // the scan — proving observe didn't perturb the plan)
    assert(rows.map(_.getLong(1)).sum < all.getLong(0))
    assert(rows.nonEmpty && rows.map(_.getString(0)).distinct.length == rows.length)
  }
}
