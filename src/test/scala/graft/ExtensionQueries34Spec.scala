package graft

import graft.queries.ExtensionQueries34

/** Property pins for the round-9 twenty-second batch (cross-engine
  * equality is the DuckDB oracle's job — these assert operator
  * SEMANTICS: LTV cumulation, collocation lift identity, Spearman at
  * its extremes).
  */
class ExtensionQueries34Spec extends SparkSpecBase {

  private val weekNs = 7L * 86400000000000L

  private def eventsDir(prefix: String,
      rows: Seq[(Long, Long, String, Long, Double)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    rows.toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  // ------------------------------------------------ q196 cohort LTV

  test("q196: LTV cumulates across offsets; spend outside the window drops") {
    // user 1 signs up week 0; buys $10 week 0, $20 week 1, $40 week 5 (outside)
    // user 2 signs up week 0; never buys
    val rows = Seq(
      (1L, 1L, "signup", 0L, 0.0),
      (2L, 1L, "purchase", 0L + 1000, 10.0),
      (3L, 1L, "purchase", 1 * weekNs, 20.0),
      (4L, 1L, "purchase", 5 * weekNs, 40.0),
      (5L, 2L, "signup", 1000L, 0.0))
    val out = ExtensionQueries34.q196_cohort_ltv(spark, eventsDir("q196", rows))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // cohort week 0, 2 users: off0 cum=1000c ltv=500; off1..3 cum=3000c ltv=1500
    assert(out((0L, 0L)) == ((2L, 1000L, 500L)))
    assert(out((0L, 1L)) == ((2L, 3000L, 1500L)))
    assert(out((0L, 2L)) == ((2L, 3000L, 1500L)))
    assert(out((0L, 3L)) == ((2L, 3000L, 1500L)))
    assert(out.keySet.forall(_._1 == 0L))
  }

  // ------------------------------------------------ q197 collocations

  test("q197: a glued bigram scores the exact independence lift") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q197").toString
    // 'x y' always adjacent (5 times); fillers push N up
    val docs = (1L to 5L).map(i => (i, s"x y f$i g$i h$i"))
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = ExtensionQueries34.q197_collocations(spark, dir).collect()
    // only (x,y) reaches n12 >= 5: n12=5, N=25, c1=c2=5 ->
    // lift = 5*25*1e6/25 = 5e6 ppm (5x over independence)
    assert(out.length == 1)
    val r = out(0)
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))
      == (("x", "y", 5L, 5000000L)))
  }

  // ------------------------------------------------ q198 Spearman

  test("q198: perfectly aligned ranks give rho = 1e6; reversed give -1e6") {
    // clicks and spend both increase with user id -> identical ranks
    val aligned = (1L to 6L).flatMap { u =>
      (1L to u).map(k => (u * 100 + k, u, "click", k * 1000000L, 0.0)) :+
        ((u * 100 + 99, u, "purchase", 99 * 1000000L, u.toDouble))
    }
    val r1 = ExtensionQueries34
      .q198_spearman(spark, eventsDir("q198a", aligned)).collect()(0)
    assert(r1.getLong(0) == 6L && r1.getLong(1) == 0L)
    assert(r1.getLong(2) == 1000000L)

    // spend decreases as clicks increase -> perfect reversal
    val reversed = (1L to 6L).flatMap { u =>
      (1L to u).map(k => (u * 100 + k, u, "click", k * 1000000L, 0.0)) :+
        ((u * 100 + 99, u, "purchase", 99 * 1000000L, (7 - u).toDouble))
    }
    val r2 = ExtensionQueries34
      .q198_spearman(spark, eventsDir("q198b", reversed)).collect()(0)
    // sum d^2 for reversal of n=6: 2*(5^2+3^2+1^2) = 70 -> rho = -1e6
    assert(r2.getLong(1) == 70L)
    assert(r2.getLong(2) == -1000000L)
  }
}
