package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries68

/** Semantics pins for the JSON/map-function batch (q297-q299):
  * explicit-schema from_json == the source columns (incl. array order),
  * the map pipeline == the relational spelling, map_zip_with emits the
  * KEY UNION with coalesce-to-0 lambda semantics.
  */
class ExtensionQueries68Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q297: from_json under explicit DDL schema reproduces source + array order") {
    val got = ExtensionQueries68.q297_from_json(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got.length % 2 == 0)
    // pos-1 sums are exactly double the pos-0 sums, pairwise by type
    val byType = got.groupBy(_.head)
    byType.foreach { case (t, rows) =>
      val m = rows.map(r => r(1) -> r(3)).toMap
      assert(m(1) == 2L * m(0).asInstanceOf[Long], s"type $t: pos1 != 2*pos0")
    }
  }

  test("q298: map pipeline == relational spelling; only score>=300 kept") {
    val rows = ExtensionQueries68.q298_map_filter(spark, dir).collect()
    assert(rows.nonEmpty)
    val ref = graft.core.Tables.events(spark, dir)
      .groupBy((col("user_id") % 50).as("u"), col("event_type").as("et"))
      .agg(count(lit(1)).as("c"))
      .withColumn("score", col("c") * 100 + length(col("et")))
      .filter(col("score") >= 300)
      .groupBy(col("u"))
      .agg(array_join(array_sort(collect_list(
        concat(col("et"), lit(":"), col("score")))), ",").as("kept"),
        count(lit(1)).cast("int").as("n_kept"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(rows.length == ref.size)
    rows.foreach { r =>
      val (kept, n) = ref(r.getLong(0))
      assert(r.getString(2) == kept && r.getInt(1) == n,
        s"bucket ${r.getLong(0)} mismatch")
    }
    // every serialized score is >= 300
    rows.foreach(_.getString(2).split(",").foreach { e =>
      assert(e.split(":")(1).toLong >= 300, s"entry $e below threshold")
    })
  }

  test("q299: map_zip_with covers the key union; per-type delta sum is odd-even count gap") {
    val rows = ExtensionQueries68.q299_map_zip_with(spark, dir).collect()
    assert(rows.nonEmpty)
    val gap = graft.core.Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg((sum(when(col("event_id") % 2 === 1, 1L).otherwise(0L)) -
        sum(when(col("event_id") % 2 === 0, 1L).otherwise(0L))).as("g"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val deltaSum = r.getString(1).split(",").map(_.split(":")(1).toLong).sum
      assert(deltaSum == gap(r.getString(0)),
        s"type ${r.getString(0)}: delta sum $deltaSum != ${gap(r.getString(0))}")
    }
    // keys serialize sorted ascending
    rows.foreach { r =>
      val ks = r.getString(1).split(",").map(_.split(":")(0).toInt).toSeq
      assert(ks == ks.sorted, s"keys not sorted: $ks")
    }
  }
}
