package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries69

/** Semantics pins for the bitmap/XML/KV batch (q300-q302): bitmap
  * cardinalities are EXACT (== countDistinct), the or_agg merge
  * reuses per-bucket bitmaps correctly, and the typed extractions
  * reproduce the source columns.
  */
class ExtensionQueries69Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q300: bitmap counts are exact; (all) row == global distinct") {
    val rows = ExtensionQueries69.q300_bitmap_distinct(spark, dir).collect()
    val e = graft.core.Tables.events(spark, dir)
    val perType = e.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val global = e.agg(countDistinct(col("user_id"))).head.getLong(0)
    assert(rows.length == perType.size + 1)
    rows.foreach { r =>
      val expect = if (r.getString(0) == "(all)") global else perType(r.getString(0))
      assert(r.getLong(1) == expect, s"${r.getString(0)}: ${r.getLong(1)} != $expect")
    }
    // the merge matters: global < sum of per-type (users overlap types)
    assert(global < perType.values.sum)
  }

  test("q301: from_xml attribute + element extraction reproduces source") {
    val got = ExtensionQueries69.q301_from_xml(spark, dir)
      .collect().map(_.toSeq).toSeq
    val ref = graft.core.Tables.events(spark, dir)
      .groupBy(col("event_type").as("t"),
        (get_json_object(col("props"), "$.k").cast("int") % 4).as("k_mod"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("cents_sum"))
      .orderBy(col("t"), col("k_mod"))
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == ref)
  }

  test("q302: str_to_map typed re-extraction reproduces source") {
    val got = ExtensionQueries69.q302_str_to_map(spark, dir)
      .collect().map(_.toSeq).toSeq
    val ref = graft.core.Tables.events(spark, dir)
      .groupBy(col("event_type").as("t"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_id") % 2 === 1,
          round(col("value") * 100).cast("long")).otherwise(0L)).as("odd_cents"),
        sum(get_json_object(col("props"), "$.k").cast("long")).as("k_sum"))
      .orderBy(col("t"))
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == ref)
  }
}
