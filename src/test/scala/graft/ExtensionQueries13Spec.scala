package graft

import org.apache.spark.sql.functions._
import graft.queries.ExtensionQueries13

class ExtensionQueries13Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  /** The q130 contract arithmetic, re-derived independently in Scala. */
  private def margin(text: String): (Long, Long) = {
    val toks = text.split(" ", -1)
    val ws = toks.map { t =>
      val h = t.getBytes("UTF-8").foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
      val bucket = h % ExtensionQueries13.HashDim
      (bucket * 2654435761L) % 1001L - 500L
    }
    (ws.sum, toks.length.toLong)
  }

  test("q129: heatmap cells partition the events table; calendar ranges hold") {
    val hm = ExtensionQueries13.q129_calendar_heatmap(spark, sfTiny).collect()
    val total = graft.core.Tables.events(spark, sfTiny).count()
    assert(hm.map(_.getAs[Long]("n")).sum == total, "cells must partition all events")
    assert(hm.forall { r =>
      val d = r.getAs[Int]("iso_dow"); val h = r.getAs[Int]("hour_of_day")
      d >= 1 && d <= 7 && h >= 0 && h <= 23
    })
    assert(hm.forall(r => r.getAs[Long]("n_users") <= r.getAs[Long]("n")))
    assert(hm.length <= 7 * 24)
  }

  test("q129: iso_dow is a real calendar field (epoch 1970-01-01 was a Thursday)") {
    import spark.implicits._
    // 1970-01-01 00:00 UTC (Thu, isodow 4) and 1970-01-04 (Sun, isodow 7):
    // integer bucket math can't produce these without calendar knowledge
    val e = Seq((1L, 0L, 1L, 0.0), (2L, 3L * 86400L * 1000000000L, 2L, 0.0))
      .toDF("event_id", "ts", "user_id", "value")
    val dows = e.withColumn("event_ts", timestamp_micros(expr("ts div 1000")))
      .select((weekday(col("event_ts")) + 1).as("iso_dow"))
      .collect().map(_.getAs[Int]("iso_dow")).sorted
    assert(dows.toSeq == Seq(4, 7))
  }

  test("q130: margin matches the hand-computed hashing-trick arithmetic") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the the the"),
      (3L, "")).toDF("id", "body")
    val got = ExtensionQueries13.hashMargin(docs, "id", "body")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("margin"), r.getAs[Long]("n_tokens"), r.getAs[Boolean]("accepted"))).toMap
    for ((id, text) <- Seq(1L -> "the quick brown fox", 2L -> "the the the", 3L -> "")) {
      val (m, n) = margin(text)
      assert(got(id) == ((m, n, m > 0)), s"doc $id: got ${got(id)}, want ($m, $n, ${m > 0})")
    }
  }

  test("q130: term frequency weights linearly (doc 'w w' has twice the margin of 'w')") {
    import spark.implicits._
    val docs = Seq((1L, "alpha"), (2L, "alpha alpha")).toDF("id", "body")
    val m = ExtensionQueries13.hashMargin(docs, "id", "body")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("margin")).toMap
    assert(m(2L) == 2 * m(1L))
  }

  test("q130: corpus margins are integer-bounded by n_tokens * 500") {
    val rows = ExtensionQueries13.q130_hash_classifier(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r =>
      math.abs(r.getAs[Long]("margin")) <= 500L * r.getAs[Long]("n_tokens")))
  }
}
