package graft

import org.apache.spark.sql.functions._
import graft.queries.ExtensionQueries37

/** Property pins for the round-9 twenty-fifth batch (cross-engine
  * equality is the DuckDB oracle's job — these assert operator
  * SEMANTICS: bitmap set-algebra identities, OTHERS mass conservation,
  * hierarchical share accounting).
  */
class ExtensionQueries37Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  // ------------------------------------------ q204 audience algebra

  test("q204: inclusion-exclusion identities hold on every pair (real data)") {
    val out = ExtensionQueries37.q204_bitmap_audiences(spark, sfTiny).collect()
    assert(out.nonEmpty)
    val sizes = graft.core.Tables.events(spark, sfTiny)
      .select(col("event_type"), col("user_id")).distinct()
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      val (both, onlyA, onlyB, union) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(both + onlyA == sizes(ta), s"$ta size")
      assert(both + onlyB == sizes(tb), s"$tb size")
      assert(union == both + onlyA + onlyB, "inclusion-exclusion")
      assert(r.getLong(6) == both * 1000000L / union)
    }
  }

  test("q204: hand bitmaps across a word boundary (users 63/64)") {
    import spark.implicits._
    val rows = Seq(
      (1L, 63L, "a"), (2L, 64L, "a"), (3L, 63L, "b"), (4L, 100L, "b"))
      .map { case (id, u, t) => (id, u, t, id * 1000000L, 1.0, "{}") }
    val dir = java.nio.file.Files.createTempDirectory("q204").toString
    rows.toDF("event_id", "user_id", "event_type", "ts", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = ExtensionQueries37.q204_bitmap_audiences(spark, dir).collect()
    assert(r.length == 1)
    // A = {63, 64}, B = {63, 100}: both=1, onlyA=1, onlyB=1, union=3
    assert((r(0).getLong(2), r(0).getLong(3), r(0).getLong(4), r(0).getLong(5))
      == ((1L, 1L, 1L, 3L)))
    assert(r(0).getLong(6) == 333333L)
  }

  // ------------------------------------------ q205 top-N + others

  test("q205: top-3 plus OTHER conserves each type's total mass") {
    val out = ExtensionQueries37.q205_topn_others(spark, sfTiny).collect()
    val totals = graft.core.Tables.events(spark, sfTiny)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").try_cast("long").as("page"))
      .filter(col("page").isNotNull)
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val byType = out.groupBy(_.getString(0))
    assert(byType.keySet == totals.keySet)
    byType.foreach { case (t, rows) =>
      assert(rows.map(_.getLong(3)).sum == totals(t), s"mass for $t")
      assert(rows.length <= 4)
      val other = rows.filter(_.getLong(1) == 4L)
      assert(other.length == 1 && other(0).getLong(2) == -1L)
      // ranks 1..3 are real pages in descending count order
      val top = rows.filter(_.getLong(1) <= 3L).sortBy(_.getLong(1))
      assert(top.map(_.getLong(3)).reverse.sorted.sameElements(
        top.map(_.getLong(3)).reverse))
    }
  }

  // ------------------------------------------ q206 hierarchy share

  test("q206: nation shares sum to ~1e6 per region; region shares to ~1e6 overall") {
    val out = ExtensionQueries37.q206_hierarchy_share(spark, sfTiny).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getString(0)).foreach { case (region, rows) =>
      val sum = rows.map(_.getLong(3)).sum
      // truncating div loses < 1 ppm per nation
      assert(sum <= 1000000L && sum > 1000000L - rows.length,
        s"$region nation shares sum to $sum")
      // region share identical on every row of the region
      assert(rows.map(_.getLong(4)).distinct.length == 1)
    }
    val regionShares = out.groupBy(_.getString(0))
      .map(_._2.head.getLong(4)).sum
    val nRegions = out.map(_.getString(0)).distinct.length
    assert(regionShares <= 1000000L && regionShares > 1000000L - nRegions)
  }
}
