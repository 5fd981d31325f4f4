package graft

import org.apache.spark.sql.functions._
import graft.queries.ExtensionQueries33

/** Property pins for the round-9 twenty-first batch (cross-engine
  * equality is the DuckDB oracle's job — these assert operator
  * SEMANTICS: first-fit bin contracts, exact quartiles + Tukey fences,
  * hapax accounting).
  */
class ExtensionQueries33Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  private def docsDir(prefix: String,
      rows: Seq[(Long, String, String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    rows.map { case (id, text, src, n) => (id, text, "en", src, n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // ---------------------------------------------- q193 compaction

  test("q193: bins close when the running count crosses the target; overshoot ≤ one doc") {
    // docs of 5000 chars each: bin boundary at 8192 -> bins of 2 docs
    // (0+5000 < 8192 -> doc2 same bin; excl=10000 -> doc3 bin 1 ...)
    val rows = (1L to 7L).map(i => (i, "x", "s1", 5000L))
    val dir = docsDir("q193", rows)
    val out = ExtensionQueries33.q193_compaction_plan(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // excl: 0,5000,10000,15000,20000,25000,30000 -> bins 0,0,1,1,2,3,3
    assert(out == Map(("s1", 0L) -> ((2L, 10000L)), ("s1", 1L) -> ((2L, 10000L)),
      ("s1", 2L) -> ((1L, 5000L)), ("s1", 3L) -> ((2L, 10000L))))
  }

  test("q193: bins partition every document exactly once on real data") {
    val out = ExtensionQueries33.q193_compaction_plan(spark, sfTiny).collect()
    val total = graft.core.Tables.documents(spark, sfTiny)
      .agg(count(lit(1)), sum(col("n_chars"))).collect()(0)
    assert(out.map(_.getLong(2)).sum == total.getLong(0))
    assert(out.map(_.getLong(3)).sum == total.getLong(1))
  }

  // ---------------------------------------------- q194 box plot

  test("q194: hand distribution — exact ceil-rank quartiles and Tukey fence") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q194").toString
    // segment A: balances 1..8 dollars plus one far outlier 100
    val bals = (1 to 8).map(_.toDouble) :+ 100.0
    bals.zipWithIndex.map { case (b, i) =>
      (i.toLong + 1, s"c$i", 0, b, "A") }
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val r = ExtensionQueries33.q194_boxplot_segments(spark, dir).collect()(0)
    // n=9: q1 rank ceil(9/4)=3 -> 300; q2 rank ceil(18/4)=5 -> 500;
    // q3 rank ceil(27/4)=7 -> 700; iqr=400
    assert(r.getString(0) == "A" && r.getLong(1) == 9L)
    assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      == ((300L, 500L, 700L, 400L)))
    // fence: 2*(x-700) > 1200 -> x > 1300: only 10000 qualifies
    assert(r.getLong(6) == 1L)
  }

  test("q194: quartiles are order statistics of the segment on real data") {
    val out = ExtensionQueries33.q194_boxplot_segments(spark, sfTiny).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3) && r.getLong(3) <= r.getLong(4))
      assert(r.getLong(5) == r.getLong(4) - r.getLong(2))
      assert(r.getLong(6) >= 0 && r.getLong(6) < r.getLong(1))
    }
  }

  // ---------------------------------------- q195 lexical diversity

  test("q195: hapax and TTR accounting on a hand corpus") {
    val dir = docsDir("q195", Seq(
      (1L, "a a b", "s1", 5L), (2L, "a c", "s1", 3L), // s1: a=3,b=1,c=1
      (3L, "z z z z", "s2", 7L)))                     // s2: z=4
    val out = ExtensionQueries33.q195_lexical_diversity(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out("s1") == ((5L, 3L, 2L, 600000L, 666666L)))
    assert(out("s2") == ((4L, 1L, 0L, 250000L, 0L)))
  }
}
