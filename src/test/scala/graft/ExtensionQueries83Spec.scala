package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries83

/** Semantics pins for the sketch/as-of/smoothing batch (q341-q343). */
class ExtensionQueries83Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q341: merged and direct estimates are in bound on every week") {
    val rows = ExtensionQueries83.q341_sketch_merge_identity(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"merged estimate out of bound: $r")
      assert(r.getBoolean(4), s"direct estimate out of bound: $r")
    }
    // weeks with >1 day actually exercise the union path
    assert(rows.exists(_.getLong(1) > 1L))
  }

  test("q342: tolerance nulls exactly the stale matches; q34 agrees elsewhere") {
    val tol = ExtensionQueries83.q342_asof_tolerance(spark, dir).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .toMap
    val base = graft.queries.RelationalQueries3.q34_asof_join(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    assert(tol.size == base.size, "tolerance must not change the row count")
    base.foreach { case (eid, us, picked) =>
      val expected = picked.filter(su => us - su <= 3600000000L)
      assert(tol(eid) == expected, s"event $eid")
    }
    // the tolerance bites somewhere and spares somewhere
    val dropped = base.count { case (eid, _, p) => p.isDefined && tol(eid).isEmpty }
    val kept = base.count { case (eid, _, _) => tol(eid).isDefined }
    assert(dropped > 0 && kept > 0, s"degenerate fixture: dropped=$dropped kept=$kept")
  }

  test("q343: the integer EWMA equals the driver fold over the ordered series") {
    val daily = graft.core.Tables.events(spark, dir)
      .select(col("event_type"), expr("ts div 1000 div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day")).count().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val ref = daily.groupBy(_._1).map { case (t, ds) =>
      val series = ds.sortBy(_._2).map(_._3)
      t -> series.tail.foldLeft(series.head)((acc, x) => (acc + x) / 2)
    }
    val rows = ExtensionQueries83.q343_integer_ewma(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(rows == ref)
  }
}
