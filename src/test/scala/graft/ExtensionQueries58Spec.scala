package graft

import graft.queries.ExtensionQueries58

/** Property pins for the round-9 forty-sixth batch (cross-engine
  * equality is the DuckDB oracle's job — these assert operator
  * SEMANTICS: an engineered paradox, half-life boundaries, matrix
  * accounting).
  */
class ExtensionQueries58Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  // ------------------------------------------- q267 Simpson check

  test("q267: an engineered Simpson reversal trips the paradox flag") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q267").toString
    def ts = new java.sql.Timestamp(0L)
    // Segment A beats B within BOTH nations, but B's orders concentrate
    // in the high-value nation -> overall B "wins" -> paradox.
    // nation 0 (cheap): A orders $20 x4, B orders $10 x1
    // nation 1 (rich):  A orders $200 x1, B orders $100 x4
    val custs = Seq(
      (1L, 0, "AUTOMOBILE"), (2L, 0, "BUILDING"),
      (3L, 1, "AUTOMOBILE"), (4L, 1, "BUILDING"))
    custs.map { case (k, n, seg) => (k, s"c$k", n, 0.0, seg) }
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val orders =
      (1 to 4).map(i => (i.toLong, 1L, 20.0)) ++ Seq((5L, 2L, 10.0)) ++
        Seq((6L, 3L, 200.0)) ++ (7 to 10).map(i => (i.toLong, 4L, 100.0))
    orders.map { case (k, c, p) => (k, c, "O", p, ts, "x") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = ExtensionQueries58.q267_simpsons_check(spark, dir).collect()(0)
    // AUTOMOBILE (5 orders) is rank 1, BUILDING (5) tie-breaks second.
    // Within nation 0: A mean 20 > B 10; nation 1: A 200 > B 100 -> A
    // wins both. Overall: A mean = 280/5 = 56 < B mean = 410/5 = 82.
    assert(r.getLong(0) == -1L)     // overall: A loses
    assert(r.getLong(1) == 2L && r.getLong(2) == 0L)
    assert(r.getBoolean(4), s"paradox should trip: $r")
  }

  test("q267: the real data yields a consistent (non-null) verdict") {
    val r = ExtensionQueries58.q267_simpsons_check(spark, sfTiny).collect()
    assert(r.length == 1)
    assert(Set(-1L, 0L, 1L).contains(r(0).getLong(0)))
  }

  // ------------------------------------------- q268 half-life

  test("q268: engineered decay halves exactly at the right offset") {
    import spark.implicits._
    val weekNs = 7L * 86400000000000L
    // cohort week 0: 4 users sign up; actives by offset: 4, 3, 2, 1
    // -> halflife = first off with active*2 <= 4 -> off 2 (active 2)
    val rows =
      (1L to 4L).map(u => (u * 10, u, "signup", 1000L + u)) ++
        (1L to 3L).map(u => (u * 10 + 1, u, "view", 1 * weekNs + u)) ++
        (1L to 2L).map(u => (u * 10 + 2, u, "view", 2 * weekNs + u)) ++
        Seq((13L, 1L, "view", 3 * weekNs + 1))
    val dir = java.nio.file.Files.createTempDirectory("q268").toString
    rows.map { case (id, u, t, ts) => (id, u, t, ts, 1.0) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = ExtensionQueries58.q268_activity_halflife(spark, dir)
      .collect()
    assert(out.length == 1)
    assert((out(0).getLong(0), out(0).getLong(1), out(0).getLong(2))
      == ((0L, 4L, 2L)))
  }

  // ------------------------------------------- q269 ABC x XYZ

  test("q269: matrix accounts for every multi-week part; classes are valid") {
    import org.apache.spark.sql.functions._
    val out = ExtensionQueries58.q269_abc_xyz_matrix(spark, sfTiny).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(Set("A", "B", "C").contains(r.getString(0)))
      assert(Set("X", "Y", "Z").contains(r.getString(1)))
      assert(r.getLong(2) > 0)
    }
    // parts with >= 2 active weeks all appear exactly once
    val expected = graft.core.Tables.orders(spark, sfTiny)
      .join(graft.core.Tables.lineitem(spark, sfTiny),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("l_partkey"),
        (datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")).cast("long") / lit(7L))
          .cast("long").as("week"))
      .groupBy("l_partkey").agg(countDistinct("week").as("w"))
      .filter(col("w") > 1).count()
    assert(out.map(_.getLong(2)).sum == expected)
  }
}
