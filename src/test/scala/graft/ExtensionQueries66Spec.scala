package graft

import org.apache.spark.sql.functions._
import graft.queries.ExtensionQueries66

/** Semantics pins for the Spark 4 language-surface batch (q291-q293):
  * VARIANT typed extraction == the source values, collation grouping
  * merges exactly the cased variants, pipe syntax == the nested form.
  */
class ExtensionQueries66Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q291: variant_get typed paths reproduce the source columns exactly") {
    val got = ExtensionQueries66.q291_variant_extract(spark, dir)
      .collect().map(_.toSeq).toSeq
    // recompute without VARIANT: same rollup straight from the columns
    val ref = graft.core.Tables.events(spark, dir)
      .select(col("event_type").as("t"),
        (get_json_object(col("props"), "$.k").cast("int") % 7).as("k_mod"),
        round(col("value") * 100).cast("long").as("vc"))
      .groupBy(col("t"), col("k_mod"))
      .agg(count(lit(1)).as("n"), sum(col("vc")).as("cents_sum"),
        lit(0L).as("n_absent"))
      .orderBy(col("t"), col("k_mod"))
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == ref)
    // try_variant_get of an absent path is NULL in every row
    assert(got.forall(_.last == 0L), "n_absent must be 0 everywhere")
  }

  test("q292: UTF8_LCASE grouping merges exactly the cased variants") {
    val rows = ExtensionQueries66.q292_collated_group(spark, dir).collect()
    assert(rows.nonEmpty)
    // output keys are canonical lower() — the collated representative
    // value is partition-order-dependent, so never expose it raw
    assert(rows.forall(r => r.getString(0) == r.getString(0).toLowerCase))
    // expected cased-variant count per lang, straight from the data:
    // 2 where both parities occur, else 1
    val expect = graft.core.Tables.documents(spark, dir)
      .groupBy(col("lang"))
      .agg(countDistinct(col("doc_id") % 2).as("n_cased"),
        count(lit(1)).as("n_docs"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.length == expect.size, "one output row per case-insensitive lang")
    rows.foreach { r =>
      val (nCased, nDocs) = expect(r.getString(0))
      assert(r.getLong(3) == nCased && r.getLong(1) == nDocs,
        s"lang ${r.getString(0)}: got (${r.getLong(1)}, ${r.getLong(3)}), " +
          s"want ($nDocs, $nCased)")
    }
  }

  test("q293: pipe-operator chain == the nested standard form") {
    val piped = ExtensionQueries66.q293_pipe_sql(spark, dir)
      .collect().map(_.toSeq).toSeq
    val nested = graft.core.Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .orderBy(col("o_orderpriority"))
      .collect().map(_.toSeq).toSeq
    assert(piped.nonEmpty && piped == nested)
  }
}
