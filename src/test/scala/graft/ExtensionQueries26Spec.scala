package graft

import org.apache.spark.sql.functions._
import graft.queries.ExtensionQueries26

/** Property pins for the round-9 fourteenth batch (cross-engine equality
  * is the DuckDB oracle's job — these assert operator SEMANTICS: credit
  * conservation, bitmap-distinct equality, decile accounting).
  */
class ExtensionQueries26Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  // --------------------------------------------- q173 multi-touch

  test("q173: U-shaped credits sum to EXACTLY 1e6 per purchase, remainder to the first view") {
    import spark.implicits._
    val m = 60000000000L // 1 minute in ns
    // user 1: 1 view → full credit; user 2: 2 views → 50/50;
    // user 3: 5 views → 400002 / 66666 / 66666 / 66666 / 400000
    val rows = Seq(
      (1L, 1L, "view", 1 * m), (2L, 1L, "purchase", 2 * m),
      (3L, 2L, "view", 1 * m), (4L, 2L, "view", 2 * m), (5L, 2L, "purchase", 3 * m),
      (10L, 3L, "view", 1 * m), (11L, 3L, "view", 2 * m), (12L, 3L, "view", 3 * m),
      (13L, 3L, "view", 4 * m), (14L, 3L, "view", 5 * m), (15L, 3L, "purchase", 6 * m))
    val dir = java.nio.file.Files.createTempDirectory("q173").toString
    rows.map { case (id, u, t, ts) => (id, u, t, ts, 1.0) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = ExtensionQueries26.q173_multitouch(spark, dir).collect()
    val byPurchase = out.groupBy(_.getLong(0))
    assert(byPurchase.keySet == Set(2L, 5L, 15L))
    // conservation: every purchase's credits sum to exactly 1e6
    byPurchase.foreach { case (pid, rs) =>
      assert(rs.map(_.getLong(4)).sum == 1000000L, s"purchase $pid: ${rs.mkString(";")}")
    }
    val five = byPurchase(15L).sortBy(_.getLong(1)).map(_.getLong(4)).toSeq
    assert(five == Seq(400002L, 66666L, 66666L, 66666L, 400000L), five.toString)
    assert(byPurchase(5L).map(_.getLong(4)).toSet == Set(500000L))
    assert(byPurchase(2L).map(_.getLong(4)).toSeq == Seq(1000000L))
  }

  // ------------------------------------------ q174 bitmap distinct

  test("q174: bitmap OR/popcount equals COUNT(DISTINCT) on the real table") {
    val got = ExtensionQueries26.q174_bitmap_distinct(spark, sfTiny)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = graft.core.Tables.events(spark, sfTiny)
      .groupBy("event_type").agg(countDistinct("user_id").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty && got == expect)
  }

  test("q174: word-boundary users (63 vs 64) land in different words, count once each") {
    import spark.implicits._
    val rows = Seq((1L, 63L, "a"), (2L, 64L, "a"), (3L, 63L, "a"), (4L, 64L, "b"))
      .map { case (id, u, t) => (id, u, t, id * 1000000L, 1.0) }
    val dir = java.nio.file.Files.createTempDirectory("q174").toString
    rows.toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = ExtensionQueries26.q174_bitmap_distinct(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 2L, "b" -> 1L), got.toString)
  }

  // ---------------------------------------------- q175 decile lift

  test("q175: deciles partition the user base; rates and lifts are exact ratios") {
    val out = ExtensionQueries26.q175_decile_lift(spark, sfTiny).collect()
    val users = graft.core.Tables.events(spark, sfTiny)
      .select("user_id").distinct().count()
    assert(out.map(_.getLong(1)).sum == users)
    assert(out.map(_.getLong(0)).toSet.subsetOf((0L to 9L).toSet))
    out.foreach { r =>
      val (nu, nb, conv) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nb <= nu && conv == nb * 1000000L / nu, s"$r")
    }
  }
}
