package graft

import org.apache.spark.sql.functions._
import graft.queries.ExtensionQueries20

/** Property pins for the round-9 eighth batch (cross-engine equality is
  * the DuckDB oracle's job — these assert operator SEMANTICS: island
  * maximality, eval-harness identities, 3σ alert arithmetic).
  */
class ExtensionQueries20Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  // ---------------------------------------------------- q156 streaks

  test("q156: hand events — interleaving breaks runs; the maximal run wins") {
    import spark.implicits._
    // user 1: A A A B A  → longest A-streak 3 (not 4: B breaks it)
    // user 2: B B        → streak 2
    val rows = Seq(
      (1L, 10L, "A", 1000L), (1L, 11L, "A", 2000L), (1L, 12L, "A", 3000L),
      (1L, 13L, "B", 4000L), (1L, 14L, "A", 5000L),
      (2L, 20L, "B", 1000L), (2L, 21L, "B", 2000L))
    val dir = java.nio.file.Files.createTempDirectory("q156").toString
    rows.toDF("user_id", "event_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = ExtensionQueries20.q156_event_streaks(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.head == ((1L, "A", 3L, 10L)), s"maximal run first: ${out.head}")
    assert(out(1) == ((2L, "B", 2L, 20L)))
    // the post-break A run is its own island of length 1
    assert(out.count(t => t._1 == 1L && t._2 == "A" && t._3 == 1L && t._4 == 14L) == 1)
  }

  // ------------------------------------------------ q157 LSH quality

  test("q157: eval identities — hit ⊆ both sides, ppm arithmetic exact") {
    val r = ExtensionQueries20.q157_lsh_quality(spark, sfTiny).collect().head
    val (nT, nC, nH) = (r.getAs[Long]("n_truth"), r.getAs[Long]("n_cand"),
      r.getAs[Long]("n_hit"))
    assert(nT > 0 && nC > 0, s"doctored universe must produce pairs: $r")
    assert(nH <= math.min(nT, nC))
    assert(r.getAs[Long]("precision_ppm") == nH * 1000000L / nC)
    assert(r.getAs[Long]("recall_ppm") == nH * 1000000L / nT)
    // 16 bands × r=4 at j ≥ 0.5 ⇒ pair admission ≥ 1−(1−0.5⁴)¹⁶ ≈ 0.645;
    // the doctored pairs sit far above 0.5, so recall must clear half
    assert(r.getAs[Long]("recall_ppm") >= 500000L,
      s"banding should recall most truth pairs: $r")
  }

  // -------------------------------------------- q158 rolling z-score

  test("q158: hand sequence — a 3σ spike alerts, in-band values do not") {
    import spark.implicits._
    // 40 calm events of 10.00 then one 50.00 spike: variance 0 ⇒ any
    // deviation alerts; then a second 10.00 is within the (now nonzero)
    // band and must NOT alert
    val calm = (1 to 40).map(i => (i.toLong, s"m", i * 1000000000L, 10.0))
    val rows = calm ++ Seq((41L, "m", 41L * 1000000000L, 50.0),
      (42L, "m", 42L * 1000000000L, 10.0))
    val dir = java.nio.file.Files.createTempDirectory("q158").toString
    rows.toDF("event_id", "event_type", "ts", "value")
      .withColumn("user_id", lit(1L))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = ExtensionQueries20.q158_rolling_zscore(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((41L, 5000L, 40L)),
      s"only the spike alerts (zero-variance window): ${out.mkString(";")}")
  }

  test("q158: window cap — only the last 100 priors participate") {
    import spark.implicits._
    // 150 events: first 50 are 100.00, next 100 are 10.00. At event 151
    // (value 100.00) the window holds ONLY the hundred 10.00s — zero
    // variance again ⇒ the old regime's value now alerts.
    val rows = (1 to 50).map(i => (i.toLong, "m", i * 1000000000L, 100.0)) ++
      (51 to 150).map(i => (i.toLong, "m", i * 1000000000L, 10.0)) ++
      Seq((151L, "m", 151L * 1000000000L, 100.0))
    val dir = java.nio.file.Files.createTempDirectory("q158b").toString
    rows.toDF("event_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = ExtensionQueries20.q158_rolling_zscore(spark, dir).collect()
    val last = out.filter(_.getLong(0) == 151L)
    assert(last.length == 1 && last.head.getAs[Long]("n_window") == 100L,
      s"event 151 must alert against exactly the last 100: ${out.mkString(";")}")
  }
}
