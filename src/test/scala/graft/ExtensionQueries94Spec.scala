package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries94

/** Semantics pins for the curation/robust-trend/CI batch (q373-q375). */
class ExtensionQueries94Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q373: coverage equals the driver first-seen recount; marginals telescope") {
    val st = graft.core.Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    val vocab = st.map(_._2).distinct
    val firstSeen = st.groupBy(_._2).map { case (t, xs) => t -> xs.map(_._1).min }
    val ref = st.groupBy(_._1).map { case (s, xs) =>
      val nNew = firstSeen.count(_._2 == s).toLong
      s -> (xs.length.toLong, nNew, nNew * 1000000L / vocab.length)
    }
    val got = ExtensionQueries94.q373_source_coverage(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == ref)
    // first-seen attribution partitions the vocabulary exactly once
    assert(got.values.map(_._2).sum == vocab.length.toLong)
    // the lexicographically first source claims everything it contains
    val first = got.keys.min
    assert(got(first)._1 == got(first)._2, "src0's tokens are all first-seen there")
  }

  test("q374: Theil-Sen equals the driver pair-median; robust against the OLS pull") {
    val daily = graft.core.Tables.orders(spark, dir)
      .groupBy(expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("r"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val slopes = (for {
      i <- daily.indices; j <- daily.indices if i < j
    } yield {
      val num = (daily(j)._2 - daily(i)._2) * 1000000L
      val den = daily(j)._1 - daily(i)._1
      num / den
    }).sorted
    val row = ExtensionQueries94.q374_theil_sen(spark, dir).collect().head
    assert(row.getLong(0) == daily.length.toLong)
    assert(row.getLong(1) == slopes.length.toLong)
    assert(row.getLong(2) == slopes((slopes.length + 1) / 2 - 1))
    // the pair-median slope sits inside the slope distribution's IQR —
    // i.e. it is not dragged to the extremes the way a single wild day
    // drags OLS
    val (q1, q3) = (slopes(slopes.length / 4), slopes(3 * slopes.length / 4))
    assert(row.getLong(2) >= q1 && row.getLong(2) <= q3)
  }

  test("q375: Wilson interval equals the driver formula and behaves like one") {
    val agg = graft.core.Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("k"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ref = agg.map { case (p, (n, k)) =>
      val phat = k * 1000000L / n
      val center = (k * 1000000L + 3841600L / 2) * 1000000L / (n * 1000000L + 3841600L)
      val rad = k * (n - k) * 1000000000000L / n + 960400000000L
      val half = 1960000L * math.sqrt(rad.toDouble).floor.toLong /
        (n * 1000000L + 3841600L)
      p -> (n, k, phat, center, center - half, center + half)
    }
    val got = ExtensionQueries94.q375_wilson_ci(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got == ref)
    for ((_, (n, _, phat, center, lo, hi)) <- got) {
      // interval brackets the point estimate, is inside [0, 1e6], and the
      // Wilson center shrinks toward 1/2 relative to p-hat
      assert(lo <= phat && phat <= hi)
      assert(lo >= 0L && hi <= 1000000L)
      assert(math.abs(center - 500000L) <= math.abs(phat - 500000L) + 1)
      // width scales like 1/sqrt(n): for these ~300-row groups the 95%
      // interval is a few percentage points — not degenerate, not vacuous
      assert(hi - lo > 10000L && hi - lo < 250000L, s"width ${hi - lo} at n=$n")
    }
  }
}
