package graft

import graft.queries.ExtensionQueries60

/** Property pins for the round-9 forty-eighth batch (cross-engine
  * equality is the DuckDB oracle's job — these assert operator
  * SEMANTICS: index at parity, dependence extremes, lift identities).
  */
class ExtensionQueries60Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  // ---------------------------------------------- q273 price index

  test("q273: identical matched baskets give index exactly 1e6") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q273").toString
    def ts = new java.sql.Timestamp(0L)
    // nations 0 and 1, same two parts at the same prices and counts
    Seq((1L, 0), (2L, 1)).map { case (k, n) => (k, s"c$k", n, 0.0, "S") }
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, 1L), (2L, 2L)).map { case (o, c) => (o, c, "O", 1.0, ts, "x") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val lines = Seq((1L, 10L, 5.0), (1L, 20L, 7.0),
      (2L, 10L, 5.0), (2L, 20L, 7.0))
    lines.zipWithIndex.map { case ((o, p, pr), i) =>
      (o, p, p, i, 1.0, pr, 0.0, 0.0, "N", "O", ts) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = ExtensionQueries60.q273_price_index(spark, dir).collect()(0)
    assert(r.getLong(2) == 2L)           // both parts matched
    assert(r.getLong(3) == 0L)           // no part dearer in A
    assert(r.getLong(4) == 1000000L)     // exact parity
  }

  // ---------------------------------------------- q274 dependence

  test("q274: dependence is max/total exactly and bounded by (1/n, 1]") {
    val out = ExtensionQueries60.q274_order_dependence(spark, sfTiny)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, tot, mx, dep) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
      assert(n >= 3L && mx <= tot)
      assert(dep == mx * 1000000L / tot)
      assert(dep * n >= 1000000L - n) // max >= mean => dep >= 1/n (ppm slack)
    }
  }

  // ---------------------------------------------- q275 session lift

  test("q275: a type present in EVERY session lifts its partners to ~1e6") {
    import spark.implicits._
    val m = 60000000000L
    // every session has 'view'; 'purchase' in half the sessions
    val rows = (0L until 10L).flatMap { u =>
      val base = Seq((u * 10 + 1, u, "view", 0 * m))
      if (u < 5) base :+ ((u * 10 + 2, u, "purchase", 1 * m)) else base
    }.map { case (id, u, t, ts) => (id, u, t, ts, 1.0) }
    val dir = java.nio.file.Files.createTempDirectory("q275").toString
    rows.toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = ExtensionQueries60.q275_session_type_lift(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    // P(view | purchase session) = 1; base P(view) = 1 -> lift 1e6
    assert(out(("purchase", "view")) == 1000000L)
    // P(purchase | view session) = 1/2; base P(purchase) = 1/2 -> 1e6
    assert(out(("view", "purchase")) == 1000000L)
  }

  test("q275: the full pair grid materializes on real data") {
    val out = ExtensionQueries60.q275_session_type_lift(spark, sfTiny)
      .collect()
    val types = graft.core.Tables.events(spark, sfTiny)
      .select("event_type").distinct().count().toInt
    assert(out.length == types * (types - 1))
  }
}
