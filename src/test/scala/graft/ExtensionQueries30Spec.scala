package graft

import org.apache.spark.sql.functions._
import graft.queries.ExtensionQueries30

/** Property pins for the round-9 eighteenth batch (cross-engine equality
  * is the DuckDB oracle's job — these assert operator SEMANTICS: Zipf
  * mass accounting and rank tie-breaks, negative-sampling disjointness
  * and determinism, session entry/exit/bounce identities).
  */
class ExtensionQueries30Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  // ------------------------------------------------ q184 vocab curve

  test("q184: hand corpus — exact cumulative mass and string tie-break") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q184").toString
    // counts: a=4, b=2, c=2, d=1, e=1 (ties b/c and d/e break by string)
    Seq((1L, "a a b c d"), (2L, "a a b c e"))
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = ExtensionQueries30.q184_vocab_coverage(spark, dir).collect()
    // vocab has 5 tokens -> only top_n=1 and top_n=5 rows exist
    assert(out.map(_.getLong(0)).toSet == Set(1L, 5L))
    val byN = out.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(byN(1L) == ((4L, 10L, 400000L)))  // 'a' covers 4 of 10
    assert(byN(5L) == ((10L, 10L, 1000000L))) // full vocab covers all
  }

  test("q184: coverage is monotone and ends at full mass on real data") {
    val out = ExtensionQueries30.q184_vocab_coverage(spark, sfTiny).collect()
    val ppm = out.sortBy(_.getLong(0)).map(_.getLong(3))
    assert(ppm.nonEmpty && ppm.sorted.sameElements(ppm))
    assert(out.forall(r => r.getLong(1) <= r.getLong(2)))
  }

  // -------------------------------------------- q185 negative sampling

  test("q185: negatives never collide with positives; deterministic; capped at 5") {
    val out1 = ExtensionQueries30.q185_negative_sampling(spark, sfTiny).collect()
    val out2 = ExtensionQueries30.q185_negative_sampling(spark, sfTiny).collect()
    assert(out1.nonEmpty)
    assert(out1.map(_.toString).sameElements(out2.map(_.toString)))
    val pos = graft.core.Tables.orders(spark, sfTiny)
      .join(graft.core.Tables.lineitem(spark, sfTiny),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    out1.foreach { r =>
      assert(!pos.contains((r.getLong(0), r.getLong(1))),
        s"sampled a positive: $r")
    }
    out1.groupBy(_.getLong(0)).foreach { case (c, rs) =>
      assert(rs.length <= 5, s"customer $c got ${rs.length} negatives")
    }
    // parts in range [1, maxPart]
    val mp = graft.core.Tables.part(spark, sfTiny)
      .agg(max(col("p_partkey"))).collect()(0).getLong(0)
    out1.foreach(r => assert(r.getLong(1) >= 1 && r.getLong(1) <= mp))
  }

  // ------------------------------------------------ q186 session paths

  test("q186: entry/exit per island; bounce = single-event session; ppm vs all sessions") {
    import spark.implicits._
    val m = 60000000000L // 1 minute ns
    val rows = Seq(
      // user 1 session 1: view -> click (2 events within 30 min)
      (1L, 1L, "view", 0 * m), (2L, 1L, "click", 1 * m),
      // user 1 session 2 (40 min gap): single view -> bounce
      (3L, 1L, "view", 41 * m),
      // user 2: one session click -> purchase -> error
      (4L, 2L, "click", 0 * m), (5L, 2L, "purchase", 10 * m),
      (6L, 2L, "error", 29 * m))
      .map { case (id, u, t, ts) => (id, u, t, ts, 1.0) }
    val dir = java.nio.file.Files.createTempDirectory("q186").toString
    rows.toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = ExtensionQueries30.q186_session_paths(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.keySet == Set(("view", "click"), ("view", "view"),
      ("click", "error")))
    assert(out(("view", "click")) == ((1L, 0L, 333333L)))
    assert(out(("view", "view")) == ((1L, 1L, 333333L))) // the bounce
    assert(out(("click", "error")) == ((1L, 0L, 333333L)))
  }

  test("q186: session totals reconcile with q21 on real data") {
    val paths = ExtensionQueries30.q186_session_paths(spark, sfTiny).collect()
    val nSessions = graft.queries.RelationalQueries2
      .q21_sessionize(spark, sfTiny).count()
    assert(paths.map(_.getLong(2)).sum == nSessions)
    val bounces = paths.map(_.getLong(3)).sum
    // a bounce has one event, so its entry == exit: mixed pairs carry none
    paths.filter(r => r.getString(0) != r.getString(1))
      .foreach(r => assert(r.getLong(3) == 0L, s"bounce with entry!=exit: $r"))
    assert(bounces >= 0 && bounces <= nSessions)
  }
}
