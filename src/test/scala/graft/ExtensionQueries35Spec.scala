package graft

import org.apache.spark.sql.functions._
import graft.queries.{ExtensionQueries2, ExtensionQueries35}

/** Property pins for the round-9 twenty-third batch (cross-engine
  * equality is the DuckDB oracle's job — these assert operator
  * SEMANTICS: the multiset-distance identity against a driver-side
  * recomputation, and YoY alignment incl. negative growth).
  */
class ExtensionQueries35Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  // ------------------------------------------------ q199 dedup diff

  test("q199: every pair's edit distance equals a driver-side multiset diff") {
    val out = ExtensionQueries35.q199_neardup_diff(spark, sfTiny).collect()
    assert(out.nonEmpty)
    val texts = ExtensionQueries2.q42Corpus(spark, sfTiny)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def counts(id: Long): Map[String, Long] =
      texts(id).split(" ", -1).groupBy(identity).map { case (t, a) => t -> a.length.toLong }
    out.foreach { r =>
      val (rep, id) = (r.getLong(0), r.getLong(1))
      val (cm, cr) = (counts(id), counts(rep))
      val edit = (cm.keySet ++ cr.keySet).toSeq
        .map(t => math.abs(cm.getOrElse(t, 0L) - cr.getOrElse(t, 0L))).sum
      assert(r.getLong(2) == edit, s"pair ($rep,$id)")
      assert(r.getLong(3) == cm.values.sum && r.getLong(4) == cr.values.sum)
      assert(id != rep)
    }
  }

  // ------------------------------------------------ q200 YoY

  test("q200: calendar alignment, exact ppm incl. negative growth, missing prior drops") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q200").toString
    def ts(y: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"$y-$m%02d-15 00:00:00")
    val rows = Seq(
      (1L, ts(1994, 1), 10.0), (2L, ts(1995, 1), 15.0),  // +50%
      (3L, ts(1994, 3), 20.0), (4L, ts(1995, 3), 10.0),  // -50%
      (5L, ts(1995, 2), 99.0))                           // no prior Feb
    rows.map { case (k, d, p) => (k, k, "O", p, d, "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = ExtensionQueries35.q200_yoy_growth(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val jan95 = 1995L * 12 + 0
    val mar95 = 1995L * 12 + 2
    assert(out.keySet == Set(jan95, mar95))
    assert(out(jan95) == ((1500L, 1000L, 500000L)))
    assert(out(mar95) == ((1000L, 2000L, -500000L)))
  }
}
