package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries82

/** Semantics pins for the dedup-tuning/release batch (q338-q340). */
class ExtensionQueries82Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q338: sweep is monotone in the threshold and matches the pair frame") {
    val pairs = graft.ext.Dedup.jaccardPairs(
        graft.core.Tables.documents(spark, dir), "doc_id", col("text"), 3)
      .select("id_a", "id_b", "inter", "na", "nb").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    def ref(t10: Long) = {
      val sel = pairs.filter(p => p._3 * 10 >= t10 * (p._4 + p._5 - p._3))
      (sel.length.toLong,
        sel.flatMap(p => Seq(p._1, p._2)).distinct.length.toLong)
    }
    val rows = ExtensionQueries82.q338_dedup_threshold_sweep(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set(5L, 6L, 7L, 8L))
    Seq(5L, 6L, 7L, 8L).foreach(t => assert(rows(t) == ref(t), s"t10=$t"))
    // raising the threshold can only shrink the affected population
    Seq(5L, 6L, 7L).foreach { t =>
      assert(rows(t + 1)._1 <= rows(t)._1 && rows(t + 1)._2 <= rows(t)._2)
    }
  }

  test("q339: manifest fingerprints equal the driver recompute and cover the corpus") {
    val q53ids = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.ext.TextAnalysis.polyHash(
          concat(col("doc_id").cast("string"), lit(":split"))).as("hs"),
        graft.ext.TextAnalysis.polyHash(
          concat(col("doc_id").cast("string"), lit(":shard"))).as("hh"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val ref = q53ids.groupBy { case (_, hs, hh) =>
      val split = if (hs % 100 < 90) "train" else if (hs % 100 < 95) "valid" else "test"
      (split, hh % 8)
    }.view.mapValues(ds => md5hex(ds.map(_._1).sorted.mkString(","))).toMap
    val rows = ExtensionQueries82.q339_release_manifest(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getString(4)))
      .toMap
    assert(rows.view.mapValues(_._2).toMap == ref)
    assert(rows.values.map(_._1).sum == q53ids.length.toLong, "doc conservation")
  }

  test("q340: the plan composes q326's shares with q321's fertility, exactly") {
    val rows = ExtensionQueries82.q340_token_budget_projection(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toMap
    // internal identities: token_alloc = temp_ppm * 1e9 / 1e6 and
    // doc_alloc = token_alloc / avg
    rows.values.foreach { case (ppm, tok, avg, docs) =>
      assert(tok == ppm * 1000000000L / 1000000L)
      assert(docs == tok / avg)
    }
    // Σ allocations never exceed the budget (truncation only loses)
    assert(rows.values.map(_._2).sum <= 1000000000L)
    // cross-check temp_ppm against q326 (same weights, same totals)
    val q326 = graft.queries.ExtensionQueries78
      .q326_temperature_mixture(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(rows.view.mapValues(_._1).toMap == q326)
  }
}
