package graft

import graft.queries.ExtensionQueries28

/** Property pins for the round-9 sixteenth batch (cross-engine equality
  * is the DuckDB oracle's job — these assert operator SEMANTICS: the
  * Mann–Whitney identity at its extremes and under ties, exact quintile
  * accounting, and the eventually-follows ⟺ first<last identity).
  */
class ExtensionQueries28Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  private def docsDir(rows: Seq[(Long, String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q178").toString
    rows.map { case (id, lang, n) => (id, s"doc $id", lang, "src", n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def eventsDir(prefix: String,
      rows: Seq[(Long, Long, String, Long, Double)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    rows.toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  // ------------------------------------------------- q178 exact AUC

  test("q178: perfect separation gives AUC exactly 1e6; reversed gives 0") {
    // 3 positives (en) strictly above 4 negatives
    val perfect = docsDir(Seq(
      (1L, "en", 100L), (2L, "en", 90L), (3L, "en", 80L),
      (4L, "de", 50L), (5L, "fr", 40L), (6L, "de", 30L), (7L, "es", 20L)))
    val r = ExtensionQueries28.q178_auc_mannwhitney(spark, perfect).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 3L && r(0).getLong(1) == 4L)
    assert(r(0).getLong(2) == 24L) // 2U = 2 * 3 * 4
    assert(r(0).getLong(3) == 1000000L)

    val reversed = docsDir(Seq(
      (1L, "en", 10L), (2L, "en", 9L),
      (3L, "de", 50L), (4L, "fr", 40L)))
    val r2 = ExtensionQueries28.q178_auc_mannwhitney(spark, reversed).collect()
    assert(r2(0).getLong(2) == 0L && r2(0).getLong(3) == 0L)
  }

  test("q178: all-tied scores give AUC exactly 500000 (midrank identity)") {
    val tied = docsDir(Seq(
      (1L, "en", 42L), (2L, "en", 42L), (3L, "de", 42L), (4L, "fr", 42L),
      (5L, "es", 42L)))
    val r = ExtensionQueries28.q178_auc_mannwhitney(spark, tied).collect()
    // 2U = np*nn (every pair ties) -> auc = 1/2 exactly
    assert(r(0).getLong(2) == 2L * 3L)
    assert(r(0).getLong(3) == 500000L)
  }

  test("q178: hand-computed mixed case with a partial tie") {
    // pos scores {3, 2}, neg scores {2, 1}:
    //   (3,2):2  (3,1):2  (2,2):1  (2,1):2  => 2U = 7, auc = 7/8
    val d = docsDir(Seq(
      (1L, "en", 3L), (2L, "en", 2L), (3L, "de", 2L), (4L, "fr", 1L)))
    val r = ExtensionQueries28.q178_auc_mannwhitney(spark, d).collect()
    assert(r(0).getLong(2) == 7L)
    assert(r(0).getLong(3) == 875000L)
  }

  // ------------------------------------------------- q179 RFM

  test("q179: 5 users with aligned R/F/M orders land on the diagonal segments") {
    val m = 60000000000L // 1 minute in ns
    // user u: u purchases at minutes u, 2u, ..., value u dollars each.
    // last_us, freq, cents all increase with u -> each user is its own
    // quintile on every dimension: (1,1,1) ... (5,5,5).
    val rows = for {
      u <- 1L to 5L
      k <- 1L to u
    } yield ((u * 100 + k, u, "purchase", u * k * m, u.toDouble))
    val dir = eventsDir("q179", rows)
    val out = ExtensionQueries28.q179_rfm_segments(spark, dir).collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getLong(0) == r.getLong(1) && r.getLong(1) == r.getLong(2))
      assert(r.getLong(3) == 1L) // one user per segment
    }
    // user u spent u purchases x u dollars = u^2 dollars = u^2*100 cents
    val centsByQ = out.map(r => r.getLong(0) -> r.getLong(4)).toMap
    (1L to 5L).foreach(u => assert(centsByQ(u) == u * u * 100L))
  }

  test("q179: segment populations sum to the purchaser count on real data") {
    val out = ExtensionQueries28.q179_rfm_segments(spark, sfTiny).collect()
    val nPurchasers = graft.core.Tables.events(spark, sfTiny)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(out.map(_.getLong(3)).sum == nPurchasers)
    out.foreach { r =>
      (0 to 2).foreach(i => assert(r.getLong(i) >= 1L && r.getLong(i) <= 5L))
    }
  }

  // ------------------------------------- q180 eventually-follows

  test("q180: non-adjacent follows count; order is respected; ppm vs ALL users") {
    val m = 60000000000L
    // user 1: A@1, B@2, A@3  -> A->B (1<2) and B->A (2<3)
    // user 2: A@1, C@5       -> A->C only (first C=5 not < last A=1)
    // user 3: only D         -> contributes no pairs, but counts in nu
    val rows = Seq(
      (1L, 1L, "A", 1 * m), (2L, 1L, "B", 2 * m), (3L, 1L, "A", 3 * m),
      (4L, 2L, "A", 1 * m), (5L, 2L, "C", 5 * m),
      (6L, 3L, "D", 1 * m)
    ).map { case (id, u, t, ts) => (id, u, t, ts, 1.0) }
    val dir = eventsDir("q180", rows)
    val out = ExtensionQueries28.q180_eventually_follows(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.keySet == Set(("A", "B"), ("B", "A"), ("A", "C")))
    assert(out(("A", "B")) == ((1L, 333333L))) // 1 of 3 users
    assert(out(("B", "A")) == ((1L, 333333L)))
    assert(out(("A", "C")) == ((1L, 333333L)))
  }

  test("q180: equal timestamps across types do NOT count as follows (strict <)") {
    val rows = Seq((1L, 1L, "A", 1000000L, 1.0), (2L, 1L, "B", 1000000L, 1.0))
    val dir = eventsDir("q180b", rows)
    val out = ExtensionQueries28.q180_eventually_follows(spark, dir).collect()
    assert(out.isEmpty)
  }
}
