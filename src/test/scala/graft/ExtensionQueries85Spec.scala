package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries85

/** Semantics pins for the corpus-geometry/profiles batch (q347-q349). */
class ExtensionQueries85Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q347: cos2 equals the driver recompute; same-vocabulary languages score high") {
    val tris = graft.core.Tables.documents(spark, dir)
      .select("lang", "text").collect()
      .flatMap { r =>
        val t = r.getString(1)
        (0 to t.length - 3).map(i => (r.getString(0), t.substring(i, i + 3)))
      }
    val counts = tris.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val byLang = counts.groupBy(_._1._1)
    val langs = byLang.keys.toSeq.sorted
    def nsq(l: String) = byLang(l).values.map(c => c * c).sum
    def dot(a: String, b: String) = byLang(a).map { case ((_, tri), c) =>
      c * counts.getOrElse((b, tri), 0L)
    }.sum
    val ref = (for {
      a <- langs; b <- langs if a < b
    } yield (a, b) -> (BigInt(dot(a, b)) * dot(a, b) * 1000000 /
      (BigInt(nsq(a)) * nsq(b))).toLong).toMap
    val rows = ExtensionQueries85.q347_lang_trigram_similarity(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rows == ref)
    // the synthetic corpus shares one vocabulary across langs: every
    // pair lands WELL above zero (the statistic discriminates scripts,
    // not these near-identical profiles — which is itself the pin)
    assert(rows.values.forall(_ > 100000L), s"unexpectedly low: $rows")
  }

  test("q348: power-of-two decay equals the driver recompute; decay retains < 100%") {
    val e = graft.core.Tables.events(spark, dir)
      .select(col("event_type"), expr("ts div 1000 div 86400000000").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val maxDay = e.map(_._2).max
    val ref = e.groupBy(_._1).map { case (t, es) =>
      val raw = es.map(_._3).sum
      val dec = es.map { case (_, d, c) => c / (1L << ((maxDay - d) / 7)) }.sum
      t -> (es.size.toLong, raw, dec, dec * 1000 / raw)
    }
    val rows = ExtensionQueries85.q348_recency_decay(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows == ref)
    assert(rows.values.forall(v => v._4 < 1000L && v._4 > 0L),
      "decay must bite but not annihilate on a ~30-day corpus")
  }

  test("q349: diversity bands equal the driver bit-surrogate recompute") {
    val c = graft.core.Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type")).count().collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    def bits(x: Long) = java.lang.Long.toBinaryString(x).length.toLong
    val ref = c.groupBy(_._1).map { case (_, cs) =>
      val n = cs.map(_._2).sum
      val wbits = cs.map { case (_, cc) => cc * bits(cc) }.sum
      (n * bits(n) - wbits) * 100 / n
    }.groupBy(_ / 50).map { case (b, us) =>
      b -> (us.size.toLong, us.min, us.max)
    }
    val rows = ExtensionQueries85.q349_behavior_diversity(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows == ref)
    assert(rows.size >= 2, "the histogram must separate repeaters from explorers")
  }
}
