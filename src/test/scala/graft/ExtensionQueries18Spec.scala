package graft

import org.apache.spark.sql.functions._
import graft.queries.ExtensionQueries18

/** q148 (positional phrase search) and q149 (conversion timing). */
class ExtensionQueries18Spec extends SparkSpecBase {

  private val DayNs = 86400000000000L

  test("q148: adjacency matters — the phrase matches in order only") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_phrase").toString
    // "new york" appears 3x in doc 1, 1x in doc 2; doc 3 has both tokens
    // but NEVER adjacent in order — bag-of-words would match it, the
    // positional phrase must not
    Seq(
      (1L, "new york new york loves new york"),
      (2L, "i left new york yesterday"),
      (3L, "york new says the reversed sign"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = ExtensionQueries18.q148_phrase_search(spark, dir).collect()
    assert(rows.forall(_.getAs[String]("phrase") == "new york"))
    val byDoc = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_in_doc")).toMap
    assert(byDoc == Map(1L -> 3L, 2L -> 1L), s"doc 3 must not match: $byDoc")
  }

  test("q149: planted funnel — ranks select the exact order statistics") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_conv").toString
    // users 1..4 sign up at t=0; latencies 10, 20, 30, 40 days in events;
    // user 5 signs up but never buys; user 6 buys WITHOUT signup (excluded);
    // user 1 also bought BEFORE signup (must not count as conversion time)
    val rows = Seq(
      (1L, 0L, 1L, "signup", 0.0, "{}"),
      (2L, 0L, 2L, "signup", 0.0, "{}"),
      (3L, 0L, 3L, "signup", 0.0, "{}"),
      (4L, 0L, 4L, "signup", 0.0, "{}"),
      (5L, 0L, 5L, "signup", 0.0, "{}"),
      (10L, 10 * DayNs, 1L, "purchase", 1.0, "{}"),
      (11L, 20 * DayNs, 2L, "purchase", 1.0, "{}"),
      (12L, 25 * DayNs, 2L, "purchase", 1.0, "{}"), // later buy ignored
      (13L, 30 * DayNs, 3L, "purchase", 1.0, "{}"),
      (14L, 29 * DayNs, 4L, "purchase", 1.0, "{}"),
      (15L, 5 * DayNs, 6L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = ExtensionQueries18.q149_conversion_timing(spark, dir).collect().head
    assert(r.getAs[Long]("n_converted") == 4L)
    assert(r.getAs[Long]("n_signed") == 5L)
    assert(r.getAs[Long]("conversion_ppm") == 800000L)
    // latencies sorted: [10, 20, 29, 30] days (µs); p50 = 2nd, p90 = 4th
    assert(r.getAs[Long]("p50_latency_us") == 20 * DayNs / 1000)
    assert(r.getAs[Long]("p90_latency_us") == 30 * DayNs / 1000)
  }

  test("q149: pre-signup purchases do not create negative latencies") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_conv2").toString
    Seq(
      (1L, 10 * DayNs, 1L, "signup", 0.0, "{}"),
      (2L, 5 * DayNs, 1L, "purchase", 1.0, "{}"), // before signup
      (3L, 12 * DayNs, 1L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = ExtensionQueries18.q149_conversion_timing(spark, dir).collect().head
    assert(r.getAs[Long]("n_converted") == 1L)
    assert(r.getAs[Long]("p50_latency_us") == 2 * DayNs / 1000)
  }
}
