package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.core.UrlOps

/** Property-based invariants (SURVEY §5.2): url_normalize idempotence,
  * spine preservation, click-share summation, deficit non-negativity,
  * aggregation invariance under row permutation.
  */
class PropertySpec extends SparkSpecBase {

  /** Deterministic sampling from a Gen (no scalatestplus bridge in the
    * offline cache): fixed seeds → reproducible cases.
    */
  private def forSamples[A](g: Gen[A], n: Int = 60)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  import spark.implicits._

  private val pathSeg = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(10))
  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "HTTPS", "Http")
    host <- Gen.oneOf("Example.com", "a.B.co", "X-y.org")
    segs <- Gen.listOfN(2, pathSeg)
    trail <- Gen.oneOf("", "/")
    q <- Gen.oneOf("", "?utm_source=g", "?k=1&utm_x=2", "?a=b c&utm_=z", "?k")
    frag <- Gen.oneOf("", "#f", "#a b")
  } yield s"$scheme://$host/${segs.mkString("/")}$trail$q$frag"

  test("Ranks.bounded after sort+limit == global-window row_number (random data)") {
    import org.apache.spark.sql.expressions.Window
    val rows = Gen.listOfN(200, Gen.zip(Gen.chooseNum(0L, 5000L), Gen.chooseNum(0, 40)))
    forSamples(rows, n = 5) { data =>
      val df = data.distinct.toDF("id", "v") // distinct ids → total order via (v desc, id)
      val k = 25
      val bounded = df.orderBy(col("v").desc, col("id")).limit(k)
        .withColumn("r", row_number()
          .over(graft.ops.Ranks.bounded(col("id"), col("v").desc, col("id"))).cast("int"))
        .select("id", "r").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val global = df
        .withColumn("r", row_number().over(Window.orderBy(col("v").desc, col("id"))).cast("int"))
        .filter(col("r") <= k)
        .select("id", "r").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(bounded == global)
    }
  }

  test("url_normalize is idempotent over generated URLs (f(f(x)) == f(x))") {
    forSamples(urlGen) { u =>
      val once = UrlOps.normalize(u, "", stripAllParams = false)
      assert(UrlOps.normalize(once, "", stripAllParams = false) == once, s"input: $u")
    }
  }

  test("url_normalize with siteBase is idempotent for path-only inputs") {
    forSamples(Gen.zip(Gen.listOfN(2, pathSeg), Gen.oneOf("", "/"))) { case (segs, trail) =>
      val u = s"/${segs.mkString("/")}$trail"
      val once = UrlOps.normalize(u, "https://Base.org", stripAllParams = false)
      assert(once.startsWith("https://base.org/"))
      assert(UrlOps.normalize(once, "https://Base.org", stripAllParams = false) == once)
    }
  }

  test("sum aggregation is invariant under row permutation/partitioning (FpSafe)") {
    forSamples(Gen.zip(Gen.listOfN(30, Gen.chooseNum(1L, 999999L)), Gen.chooseNum(1, 8)), n = 10) {
      case (cents, parts) =>
        val df = cents.map(c => ("k", c / 100.0)).toDF("k", "v")
        val total = df.repartition(parts).groupBy("k")
          .agg(graft.core.FpSafe.moneySum(col("v")).as("s"))
          .collect().head.getDouble(1)
        val expected = cents.map(c => math.round(c / 100.0 * 100)).sum / 100.0
        assert(total == expected, s"parts=$parts")
    }
  }

  test("moneySumDecimal == moneySum wherever long cents are in range") {
    forSamples(Gen.listOfN(25, Gen.chooseNum(-99999999L, 99999999L)), n = 8) { cents =>
      val df = cents.map(c => ("k", c / 100.0)).toDF("k", "v")
      val r = df.groupBy("k").agg(
        graft.core.FpSafe.moneySum(col("v")).as("longSum"),
        graft.core.FpSafe.moneySumDecimal(col("v")).cast("double").as("decSum"))
        .collect().head
      assert(r.getDouble(1) == r.getDouble(2), s"cents=$cents")
    }
  }

  test("click_share sums to 1 when total > 0 (within one ulp per row)") {
    val df = Tables1.orders.limit(500)
    val share = graft.queries.RelationalQueries.q04_click_share(spark, "/root/testdata/sf0.001")
    val sum = share.agg(org.apache.spark.sql.functions.sum("click_share"))
      .collect().head.getDouble(0)
    assert(math.abs(sum - 1.0) < 1e-9, s"share sum $sum")
    assert(df.count() > 0)
  }

  test("ctr_deficit is never negative; null inputs stay null") {
    val cfg = graft.ops.Scoring.ScoringConfig(buckets = Nil, margin = 0.002)
    forSamples(Gen.zip(Gen.option(Gen.chooseNum(0.0, 1.0)), Gen.option(Gen.chooseNum(0.0, 1.0))), n = 20) {
      case (e, c) =>
        val d = Seq((e, c)).toDF("e", "c")
          .select(graft.ops.Scoring.ctrDeficit(cfg, col("e"), col("c")).as("d"))
          .collect().head
        if (e.isEmpty || c.isEmpty) assert(d.isNullAt(0))
        else assert(d.getDouble(0) >= 0.0)
    }
  }
}

object Tables1 {
  lazy val orders = graft.core.Tables.orders(SparkSpecBase.session, "/root/testdata/sf0.001")
}
