package graft

import graft.queries.ExtensionQueries52

/** Property pins for the round-9 fortieth batch (cross-engine equality
  * is the DuckDB oracle's job — these assert operator SEMANTICS: purge
  * matrix accounting, exemplar determinism, byte-overhead identities).
  */
class ExtensionQueries52Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  // ------------------------------------------------ q249 purge audit

  test("q249: residuals match direct tombstone counts per table") {
    import org.apache.spark.sql.functions._
    val out = ExtensionQueries52.q249_purge_audit(spark, sfTiny).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.keySet == Set("events", "orders", "customer"))
    val ev = graft.core.Tables.events(spark, sfTiny)
      .filter(col("user_id") % 97 === 0).count()
    assert(out("events")._2 == ev)
    out.values.foreach { case (n, res) => assert(res <= n) }
  }

  // ------------------------------------------------ q250 exemplars

  test("q250: exemplar is the smallest (user, session) of its path; stable across runs") {
    val a = ExtensionQueries52.q250_path_exemplars(spark, sfTiny).collect()
    val b = ExtensionQueries52.q250_path_exemplars(spark, sfTiny).collect()
    assert(a.nonEmpty && a.map(_.toString).sameElements(b.map(_.toString)))
    // reconcile counts with q186
    val paths = graft.queries.ExtensionQueries30
      .q186_session_paths(spark, sfTiny).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    a.foreach { r =>
      assert(r.getLong(2) == paths((r.getString(0), r.getString(1))))
      assert(r.getLong(5) >= 1L && r.getLong(6) >= 0L)
    }
  }

  // ------------------------------------------------ q251 encoding

  test("q251: ASCII corpus certifies zero overhead; planted CJK does not") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q251").toString
    val rows = Seq(
      (1L, "plain ascii text", "s1", 16L),
      (2L, "more ascii", "s1", 10L),
      (3L, "中文文本", "s2", 4L))     // 4 chars, 12 UTF-8 bytes
    rows.map { case (id, t, src, n) => (id, t, "en", src, n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = ExtensionQueries52.q251_encoding_health(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getBoolean(5)))).toMap
    assert(out("s1") == ((26L, 26L, 0L, true)))
    assert(out("s2") == ((4L, 12L, 2000000L, false)))
  }
}
