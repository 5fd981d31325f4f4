package graft

import org.apache.spark.sql.functions._
import graft.core.PandasCompat
import graft.ops.{CtrNormalize, Scoring}
import graft.ops.Scoring.{Bucket, ScoringConfig}

class ScoringSpec extends SparkSpecBase {
  import spark.implicits._

  test("bucket key parsing: single, range, decimal range, dead 'default' key") {
    assert(Bucket.parseKey("1").contains((1.0, 1.0)))
    assert(Bucket.parseKey("4-5").contains((4.0, 5.0)))
    assert(Bucket.parseKey("3.1-5").contains((3.1, 5.0)))
    assert(Bucket.parseKey("default").isEmpty) // etl_merge.py:355-370: unreachable config key
    assert(Bucket.fromConfig(Seq("1" -> 0.3, "default" -> 0.006)).map(_.key) == Seq("1"))
  }

  test("expectedCtr: first bucket wins, fallback for null/out-of-range, units+uplift") {
    val cfg = ScoringConfig(
      buckets = Bucket.fromConfig(Seq("1-3" -> 30.0, "2-5" -> 10.0)),
      units = "percent", uplift = 0.1)
    val df = Seq(Some(2.0), Some(4.0), Some(9.0), None).toDF("position")
      .withColumn("fallback", lit(5.0))
      .withColumn("e", Scoring.expectedCtr(cfg, col("position"), col("fallback")))
      .withColumn("b", Scoring.expectedCtrBucket(cfg, col("position")))
    val rows = df.select("e", "b").collect()
    assert(rows(0).getDouble(0) == (30.0 / 100.0) * 1.1) // overlap → first bucket
    assert(rows(0).getString(1) == "1-3")
    assert(rows(1).getDouble(0) == (10.0 / 100.0) * 1.1)
    assert(rows(2).getDouble(0) == (5.0 / 100.0) * 1.1) // fallback also normalized
    assert(rows(2).getString(1) == "fallback_median")
    assert(rows(3).getString(1) == "fallback_median") // null position
  }

  test("intentMultiplier: hint order wins over schema; schema fallback; default 1.0") {
    val cfg = ScoringConfig(buckets = Nil,
      intentMultipliers = Map("transactional" -> 1.5, "informational" -> 0.8),
      urlIntentHints = Seq("/shop/" -> "transactional", "/blog/" -> "informational"))
    val df = Seq(
      ("https://x/shop/blog/a", "Article"), // first hint wins
      ("https://x/blog/a", "Product"), // hint beats schema
      ("https://x/other", "SomeProduct"), // schema contains product
      ("https://x/other", "NewsArticle"), // schema contains article
      ("https://x/other", "Thing"), // default
      (null, null) // nulls → default
    ).toDF("url", "schema_types")
      .withColumn("m", Scoring.intentMultiplier(cfg, col("url"), col("schema_types")))
    assert(df.select("m").collect().map(_.getDouble(0)).toSeq ==
      Seq(1.5, 0.8, 1.5, 0.8, 1.0, 1.0))
  }

  test("ctrDeficit clips at 0 but propagates null (pandas clip semantics)") {
    val cfg = ScoringConfig(buckets = Nil, margin = 0.1)
    val df = Seq((Some(0.5), Some(0.1)), (Some(0.1), Some(0.5)), (Some(0.5), None))
      .toDF("expected", "ctr")
      .withColumn("d", Scoring.ctrDeficit(cfg, col("expected"), col("ctr")))
    val ds = df.select("d").collect()
    assert(math.abs(ds(0).getDouble(0) - 0.3) < 1e-12)
    assert(ds(1).getDouble(0) == 0.0)
    assert(ds(2).isNullAt(0)) // NaN-propagating clip
  }

  test("PandasCompat.sumZero: empty/all-null group sums to 0.0 not null") {
    val df = Seq(("a", Some(1.0)), ("b", None), ("b", None)).toDF("k", "v")
      .groupBy("k").agg(PandasCompat.sumZero(col("v")).as("s"))
    val m = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m == Map("a" -> 1.0, "b" -> 0.0))
  }

  test("CtrNormalize: '%' forces /100; garbage coerces to null; ',' stripped") {
    val df = Seq("5.2%", "5,2 %", "abc", "0.5").toDF("ctr")
    val out = CtrNormalize(df, "ctr", "n").select("n").collect()
    assert(math.abs(out(0).getDouble(0) - 0.052) < 1e-12)
    assert(math.abs(out(1).getDouble(0) - 0.52) < 1e-12) // '52 ' → 52/100
    assert(out(2).isNullAt(0))
    assert(math.abs(out(3).getDouble(0) - 0.005) < 1e-12) // divided (saw %)
  }

  test("CtrNormalize majority heuristic counts over ALL rows (nulls count against)") {
    // 2 of 5 rows in (1,100] → 0.4 ≤ 0.5 → NO divide (nulls in denominator)
    val df = Seq("5", "7", "x", "y", "z").toDF("ctr")
    val out = CtrNormalize(df, "ctr", "n").select("n").collect()
    assert(out(0).getDouble(0) == 5.0)
    // 3 of 5 → divide
    val df2 = Seq("5", "7", "9", "x", "0.1").toDF("ctr")
    val out2 = CtrNormalize(df2, "ctr", "n").select("n").collect()
    assert(out2(0).getDouble(0) == 0.05)
  }
}
