package graft

import graft.queries.ExtensionQueries31

/** Property pins for the round-9 nineteenth batch (cross-engine equality
  * is the DuckDB oracle's job — these assert operator SEMANTICS: the
  * prefix-scan CUSUM equals the sequential recurrence, also-bought
  * ranking/ties, per-session pair dedup).
  */
class ExtensionQueries31Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  private def ordersByDay(prefix: String, perDay: Seq[Int]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    val rows = perDay.zipWithIndex.flatMap { case (n, day) =>
      (1 to n).map(i => (day * 1000L + i,
        new java.sql.Timestamp(day * 86400000L)))
    }
    rows.toDF("o_orderkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  // ------------------------------------------------ q187 CUSUM

  test("q187: prefix-scan CUSUM equals the sequential Page recurrence (hand case)") {
    // x = [10,10,10,10,30,30,10]: k = 11*110 // 70 = 17, d = x-17,
    // S via max(0, S+d): [0,0,0,0,13,26,19]
    val dir = ordersByDay("q187", Seq(10, 10, 10, 10, 30, 30, 10))
    val out = ExtensionQueries31.q187_cusum_changepoint(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out(4L) == ((30L, 13L, false)))
    assert(out(5L) == ((30L, 26L, false)))
    assert(out(6L) == ((10L, 19L, false)))
    assert(out(0L) == ((10L, 0L, false)))
  }

  test("q187: matches a driver-side sequential recurrence on real data") {
    import org.apache.spark.sql.functions._
    val days = graft.core.Tables.orders(spark, sfTiny)
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("day"))
      .groupBy("day").agg(count(lit(1)).as("x"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val total = days.map(_._2).sum
    val k = 11 * total / (10 * days.length)
    var s0 = 0L
    val seq = days.map { case (day, x) =>
      s0 = math.max(0L, s0 + (x - k)); (day, x, s0, s0 > k * 5)
    }
    val expected = seq.sortBy { case (day, _, s, _) => (-s, day) }.take(10)
      .map { case (day, x, s, a) => s"$day,$x,$s,$a" }
    val got = ExtensionQueries31.q187_cusum_changepoint(spark, sfTiny)
      .collect()
      .map(r => s"${r.getLong(0)},${r.getLong(1)},${r.getLong(2)},${r.getBoolean(3)}")
    assert(got.sameElements(expected), s"\ngot=${got.mkString(";")}\nexp=${expected.mkString(";")}")
  }

  // ------------------------------------------------ q188 also-bought

  test("q188: cofrequency ranking with smaller-key tie-break") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q188").toString
    // baskets: {1,2,3}, {1,2}, {1,2}
    val rows = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L))
    rows.map { case (o, p) => (o, p, p, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
        new java.sql.Timestamp(0L)) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = ExtensionQueries31.q188_also_bought(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(out((1L, 1L)) == ((2L, 3L))) // part 1's top partner: 2, 3 orders
    assert(out((1L, 2L)) == ((3L, 1L)))
    assert(out((2L, 1L)) == ((1L, 3L)))
    assert(out((3L, 1L)) == ((1L, 1L))) // tie 1 vs 2 at n=1 -> smaller key
    assert(out((3L, 2L)) == ((2L, 1L)))
  }

  // ------------------------------------------- q189 co-visitation

  test("q189: pairs count once per session; sessions split on the 30-min gap") {
    import spark.implicits._
    val m = 60000000000L
    val rows = Seq(
      // user 1 session 1: pages 5, 7, 5 (dup page in session counts once)
      (1L, 1L, 5L, 0 * m), (2L, 1L, 7L, 1 * m), (3L, 1L, 5L, 2 * m),
      // user 1 session 2 (40-min gap): pages 5, 7 again -> second session
      (4L, 1L, 5L, 43 * m), (5L, 1L, 7L, 44 * m),
      // user 2, one session: pages 7, 9
      (6L, 2L, 7L, 0 * m), (7L, 2L, 9L, 1 * m))
      .map { case (id, u, page, ts) =>
        (id, u, "view", ts, 1.0, s"""{"k": $page}""") }
    val dir = java.nio.file.Files.createTempDirectory("q189").toString
    rows.toDF("event_id", "user_id", "event_type", "ts", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = ExtensionQueries31.q189_session_covisitation(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((5L, 7L) -> 2L, (7L, 9L) -> 1L))
  }
}
