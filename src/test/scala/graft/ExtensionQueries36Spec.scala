package graft

import graft.queries.ExtensionQueries36

/** Property pins for the round-9 twenty-fourth batch (cross-engine
  * equality is the DuckDB oracle's job — these assert operator
  * SEMANTICS: argmax tie-breaks and accuracy accounting, proration
  * identities at histogram extremes, fan-out arithmetic).
  */
class ExtensionQueries36Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  private def eventsDir(prefix: String,
      rows: Seq[(Long, Long, String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    rows.map { case (id, u, t, ts) => (id, u, t, ts, 1.0) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  // ------------------------------------------------ q201 Markov eval

  test("q201: argmax prediction, alphabetical tie-break, exact accuracy") {
    val m = 60000000000L
    // user 1: A->B, B->A, A->B  (A: 2x ->B; B: 1x ->A)
    // user 2: A->C              (A: 1x ->C) => A predicts B (2 > 1)
    // user 3: C->A, C from nothing; C->A only => C predicts A
    val rows = Seq(
      (1L, 1L, "A", 1 * m), (2L, 1L, "B", 2 * m), (3L, 1L, "A", 3 * m),
      (4L, 1L, "B", 4 * m),
      (5L, 2L, "A", 1 * m), (6L, 2L, "C", 2 * m),
      (7L, 3L, "C", 1 * m), (8L, 3L, "A", 2 * m))
    val out = ExtensionQueries36
      .q201_markov_accuracy(spark, eventsDir("q201", rows)).collect()
      .map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("A") == (("B", 3L, 2L, 666666L)))
    assert(out("B") == (("A", 1L, 1L, 1000000L)))
    assert(out("C") == (("A", 1L, 1L, 1000000L)))
  }

  test("q201: a tied argmax picks the alphabetically smaller successor") {
    val m = 60000000000L
    // A->B once and A->C once (different users) -> predict B
    val rows = Seq(
      (1L, 1L, "A", 1 * m), (2L, 1L, "B", 2 * m),
      (3L, 2L, "A", 1 * m), (4L, 2L, "C", 2 * m))
    val out = ExtensionQueries36
      .q201_markov_accuracy(spark, eventsDir("q201b", rows)).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("A") == "B")
  }

  // ------------------------------------------- q202 selectivity

  test("q202: estimates are within one bucket of truth; boundary probes are exact") {
    val out = ExtensionQueries36.q202_selectivity_eval(spark, sfTiny).collect()
    assert(out.length == 3)
    out.foreach { r =>
      val (est, act) = (r.getLong(2), r.getLong(3))
      // proration error is bounded by the largest single bucket count
      assert(est >= 0 && act >= 0)
      assert(math.abs(r.getLong(4)) <= 1000000L)
    }
    // thresholds are strictly increasing with pct
    val ts = out.sortBy(_.getLong(0)).map(_.getLong(1))
    assert(ts.sorted.sameElements(ts))
    // estimated and actual are both monotone non-increasing in pct
    val est = out.sortBy(_.getLong(0)).map(_.getLong(2))
    val act = out.sortBy(_.getLong(0)).map(_.getLong(3))
    assert(est.reverse.sorted.sameElements(est.reverse))
    assert(act.reverse.sorted.sameElements(act.reverse))
  }

  test("q202: uniform hand data prorates exactly (error 0)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q202").toString
    // cents 0..1999 once each: range 2000, buckets of 100, perfectly uniform
    (0 until 2000).map(i => (i.toLong, i.toLong, "O", i / 100.0,
        new java.sql.Timestamp(0L), "x"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = ExtensionQueries36.q202_selectivity_eval(spark, dir).collect()
    out.foreach { r =>
      assert(r.getLong(2) == r.getLong(3), s"pct ${r.getLong(0)}: $r")
      assert(r.getLong(4) == 0L)
    }
  }

  // ------------------------------------------- q203 skew report

  test("q203: fan-out arithmetic and share accounting on real data") {
    val out = ExtensionQueries36.q203_join_skew_report(spark, sfTiny).collect()
    assert(out.length == 10)
    out.foreach { r =>
      assert(r.getLong(3) == r.getLong(1) * r.getLong(2))
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 1000000L)
    }
    // descending by fan-out
    val fans = out.map(_.getLong(3))
    assert(fans.reverse.sorted.sameElements(fans.reverse))
  }
}
