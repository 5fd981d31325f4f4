package graft

import graft.queries.ExtensionQueries49

/** Property pins for the round-9 thirty-seventh batch (cross-engine
  * equality is the DuckDB oracle's job — these assert operator
  * SEMANTICS: cell accounting per variant, TVD extremes, recovery
  * window boundaries).
  */
class ExtensionQueries49Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  private val dayNs = 86400000000000L

  private def eventsDir(prefix: String,
      rows: Seq[(Long, Long, String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    rows.map { case (id, u, t, ts) => (id, u, t, ts, 1.0, "{}") }
      .toDF("event_id", "user_id", "event_type", "ts", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  // ----------------------------------------------- q240 A/B retention

  test("q240: planted variant gap — cells, rates, and the 2x2 verdict") {
    // 20 even users (variant 0) all retained at D1; 20 odd users none.
    val rows = (0L until 40L).flatMap { u =>
      val base = Seq((u * 10, u, "signup", 0L))
      if (u % 2 == 0) base :+ ((u * 10 + 1, u, "view", 1 * dayNs)) else base
    }
    val out = ExtensionQueries49
      .q240_ab_retention(spark, eventsDir("q240", rows)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))).toMap
    // D1: a=20 (v0 retained), b=0, c=0, d=20 -> maximal dependence
    assert(out(1L) == ((20L, 0L, 0L, 20L, 1000000L, 0L, true)))
    // D7: nobody retained -> a=c=0; chi2 degenerates to 0, not significant
    assert(out(7L)._7 == false)
  }

  test("q240: cohort accounting holds on real data") {
    val out = ExtensionQueries49.q240_ab_retention(spark, sfTiny).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (a, b, c, d) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(a + b > 0 && c + d > 0)
      assert(r.getLong(5) == a * 1000000L / (a + b))
      assert(r.getLong(6) == c * 1000000L / (c + d))
    }
  }

  // ----------------------------------------------- q241 TVD

  test("q241: a source matching the corpus mix scores ~0; a shifted one is large") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q241").toString
    // s1: 30 short + 30 long; s2: same mix (TVD vs corpus small);
    // s3: all long (shifted)
    val rows =
      (1 to 30).map(i => (i.toLong, "s1", 10L)) ++
        (31 to 60).map(i => (i.toLong, "s1", 600L)) ++
        (61 to 90).map(i => (i.toLong, "s2", 10L)) ++
        (91 to 120).map(i => (i.toLong, "s2", 600L)) ++
        (121 to 180).map(i => (i.toLong, "s3", 600L))
    rows.map { case (id, src, n) => (id, "t", "en", src, n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = ExtensionQueries49.q241_length_tvd(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // corpus: 60 short / 120 long -> (1/3, 2/3)
    // s1 = s2 = (1/2, 1/2): TVD = 1/2*(|1/2-1/3| + |1/2-2/3|) = 1/6
    assert(out("s1") == 166666L && out("s2") == 166666L)
    // s3 = (0, 1): TVD = 1/2*(1/3 + 1/3) = 1/3
    assert(out("s3") == 333333L)
  }

  // ----------------------------------------------- q242 recovery

  test("q242: the 60s window is inclusive; error-after-error is not recovery") {
    val rows = Seq(
      (1L, 1L, "error", 0L),                    // next at exactly 60s -> recovered
      (2L, 1L, "view", 60L * 1000000000L),
      (3L, 2L, "error", 0L),                    // next at 61s -> not recovered
      (4L, 2L, "view", 61L * 1000000000L),
      (5L, 3L, "error", 0L),                    // next is another error -> no
      (6L, 3L, "error", 1L * 1000000000L),
      (7L, 4L, "error", 0L))                    // no next event -> abandoned
    val out = ExtensionQueries49
      .q242_error_recovery(spark, eventsDir("q242", rows)).collect()
    val hour0 = out.filter(_.getLong(0) == 0L)
    assert(hour0.length == 1)
    // errors in hour 0: users 1,2,3(x2... user 3 has errors at 0s and 1s;
    // the first error's next event IS an error (no), the second has no next),
    // user 4 -> 5 errors, 1 recovered (user 1)
    assert(hour0(0).getLong(1) == 5L && hour0(0).getLong(2) == 1L)
    assert(hour0(0).getLong(3) == 200000L)
  }
}
