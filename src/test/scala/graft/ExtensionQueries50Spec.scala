package graft

import graft.queries.ExtensionQueries50

/** Property pins for the round-9 thirty-eighth batch (cross-engine
  * equality is the DuckDB oracle's job — these assert operator
  * SEMANTICS: overlap identities, Heaps monotonicity/first-occurrence,
  * bias flag thresholds).
  */
class ExtensionQueries50Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  // -------------------------------------------- q243 assortment

  test("q243: Jaccard identities per pair on real data") {
    import org.apache.spark.sql.functions._
    val out = ExtensionQueries50.q243_segment_assortment(spark, sfTiny)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (na, nb, both) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(both <= math.min(na, nb))
      assert(r.getLong(5) == both * 1000000L / (na + nb - both))
    }
  }

  // -------------------------------------------- q244 Heaps curve

  test("q244: types count first occurrences; curve is monotone; TTR falls") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q244").toString
    // docs 1..100 say "common w<i>"; 101..200 say "common"; 201..400 too
    val rows = (1 to 400).map { i =>
      val text = if (i <= 100) s"common w$i" else "common common"
      (i.toLong, text, "en", "s", text.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = ExtensionQueries50.q244_heaps_curve(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // N=100: tokens 200, types 101; N=200: tokens 400, types 101 (no new)
    assert(out(100L) == ((200L, 101L, 505000L)))
    assert(out(200L) == ((400L, 101L, 252500L)))
    assert(out(400L) == ((800L, 101L, 126250L)))
  }

  test("q244: types and tokens are monotone in N on real data") {
    val out = ExtensionQueries50.q244_heaps_curve(spark, sfTiny).collect()
      .sortBy(_.getLong(0))
    val types = out.map(_.getLong(2))
    val tokens = out.map(_.getLong(1))
    assert(types.sorted.sameElements(types))
    assert(tokens.sorted.sameElements(tokens))
  }

  // -------------------------------------------- q245 round bias

  test("q245: planted round amounts trip the flag; organic cents do not") {
    import spark.implicits._
    def dirFor(prefix: String, cents: Seq[Long]): String = {
      val dir = java.nio.file.Files.createTempDirectory(prefix).toString
      cents.zipWithIndex.map { case (c, i) =>
        (i.toLong, i.toLong, "purchase", i * 1000000L, c / 100.0, "{}") }
        .toDF("event_id", "user_id", "event_type", "ts", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    // fabricated: half the 40 amounts are exact dollars
    val fab = (1L to 20L).map(_ * 100L) ++ (1L to 20L).map(_ * 100L + 37L)
    val r1 = ExtensionQueries50
      .q245_round_number_bias(spark, dirFor("q245a", fab)).collect()(0)
    assert(r1.getLong(1) == 20L && r1.getBoolean(4))

    // organic: cents never on a dollar mark
    val org = (1L to 40L).map(_ * 100L + 37L)
    val r2 = ExtensionQueries50
      .q245_round_number_bias(spark, dirFor("q245b", org)).collect()(0)
    assert(r2.getLong(1) == 0L && !r2.getBoolean(4) && !r2.getBoolean(5))
  }
}
