package graft

import graft.queries.ExtensionQueries48

/** Property pins for the round-9 thirty-sixth batch (cross-engine
  * equality is the DuckDB oracle's job — these assert operator
  * SEMANTICS: bitmap-pair identities, load-factor extremes, signed
  * association extremes).
  */
class ExtensionQueries48Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  private val dayNs = 86400000000000L

  private def eventsDir(prefix: String,
      rows: Seq[(Long, Long, String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    rows.map { case (id, u, t, ts) => (id, u, t, ts, 1.0, "{}") }
      .toDF("event_id", "user_id", "event_type", "ts", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  // -------------------------------------------- q237 DAU stability

  test("q237: identical day pairs give Jaccard 1e6; disjoint give 0") {
    val rows = Seq(
      // day 0 and 1: same users {1, 2} -> jaccard 1e6
      (1L, 1L, "a", 0L), (2L, 2L, "a", 1000L),
      (3L, 1L, "a", 1 * dayNs), (4L, 2L, "a", 1 * dayNs + 1000L),
      // day 2: disjoint {70} -> day1->day2 jaccard 0
      (5L, 70L, "a", 2 * dayNs))
    val out = ExtensionQueries48
      .q237_dau_stability(spark, eventsDir("q237", rows)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(out(0L) == ((2L, 2L, 2L, 1000000L)))
    assert(out(1L) == ((2L, 1L, 0L, 0L)))
  }

  test("q237: bitmap Jaccard equals set Jaccard on real data") {
    import org.apache.spark.sql.functions._
    val got = ExtensionQueries48.q237_dau_stability(spark, sfTiny).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    val uw = graft.core.Tables.events(spark, sfTiny)
      .select(expr("ts div 1000 div 86400000000").as("day"), col("user_id"))
      .distinct().collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    got.foreach { case (day, ppm) =>
      val (a, b) = (uw(day), uw(day + 1))
      assert(ppm == a.intersect(b).size.toLong * 1000000L / a.union(b).size)
    }
  }

  // -------------------------------------------- q238 load factor

  test("q238: uniform hourly load gives exactly 1e6; a spike raises it") {
    val hourNs = 3600000000000L
    // type F: 2 events in each of 3 hours -> factor 1e6
    // type S: 1,1,4 across the same hours -> peak 4, mean 2 -> 2e6
    val rows =
      (0 until 3).flatMap(h => Seq((h * 10L + 1, 1L, "F", h * hourNs),
        (h * 10L + 2, 2L, "F", h * hourNs + 1000L))) ++
      Seq((100L, 1L, "S", 0L), (101L, 1L, "S", hourNs),
        (102L, 1L, "S", 2 * hourNs), (103L, 2L, "S", 2 * hourNs + 1000L),
        (104L, 3L, "S", 2 * hourNs + 2000L), (105L, 4L, "S", 2 * hourNs + 3000L))
    val out = ExtensionQueries48
      .q238_load_factor(spark, eventsDir("q238", rows)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(out("F") == ((6L, 2L, 0L, 1000000L)))
    assert(out("S") == ((6L, 4L, 2L, 2000000L)))
  }

  // ------------------------------------- q239 type association

  test("q239: perfect co-occurrence is +1e6; perfect substitution is -1e6") {
    // users 1-4 do both A and B; users 5-8 do neither (but do C so they exist)
    val co = (1L to 4L).flatMap(u => Seq((u * 10, u, "A", u * 1000),
        (u * 10 + 1, u, "B", u * 2000))) ++
      (5L to 8L).map(u => (u * 10, u, "C", u * 1000))
    val out1 = ExtensionQueries48
      .q239_type_association(spark, eventsDir("q239a", co)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(6)).toMap
    assert(out1(("A", "B")) == 1000000L)

    // substitution: users 1-4 do only A, 5-8 do only B
    val sub = (1L to 4L).map(u => (u * 10, u, "A", u * 1000)) ++
      (5L to 8L).map(u => (u * 10, u, "B", u * 1000))
    val out2 = ExtensionQueries48
      .q239_type_association(spark, eventsDir("q239b", sub)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(6)).toMap
    assert(out2(("A", "B")) == -1000000L)
  }

  test("q239: cells partition the user base on real data") {
    val out = ExtensionQueries48.q239_type_association(spark, sfTiny)
      .collect()
    val nUsers = graft.core.Tables.events(spark, sfTiny)
      .select("user_id").distinct().count()
    out.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) + r.getLong(5)
        == nUsers)
      assert(math.abs(r.getLong(6)) <= 1000000L)
    }
  }
}
