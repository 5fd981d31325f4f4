package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries92

/** Semantics pins for the agreement/symbolic/concentration batch
  * (q367-q369): driver-side recomputation plus direction bands.
  */
class ExtensionQueries92Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def md5head(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .take(4).map("%02x".format(_)).mkString, 16)

  test("q367: alpha equals the driver coincidence math; mostly-agreeing raters score high") {
    val items = graft.core.Tables.orders(spark, dir)
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    def label(i: Long, r: Int): Long = {
      val h = md5head(s"$i-$r") % 10
      if (h < 2) (i % 3 + 1 + h % 2) % 3 else i % 3
    }
    def present(i: Long, r: Int): Boolean = md5head(s"$i+$r") % 5 != 0
    val perItem = items.map { i =>
      (1 to 3).filter(present(i, _)).map(label(i, _))
    }.filter(_.size >= 2)
    val nItems = perItem.length.toLong
    val nRatings = perItem.map(_.size.toLong).sum
    val oOff = perItem.map { ls =>
      val m = ls.size.toLong
      val ssq = ls.groupBy(identity).values.map(g => g.size.toLong * g.size).sum
      2 * (m * m - ssq) / (m - 1)
    }.sum
    val margins = perItem.flatten.groupBy(identity)
      .map { case (_, xs) => 2L * xs.size }
    val nS2 = margins.sum
    val denom = nS2 * nS2 - margins.map(c => c * c).sum
    val alpha = 1000000L - (BigInt(nS2 - 2) * oOff * 1000000 / denom).toLong
    val row = ExtensionQueries92.q367_krippendorff_alpha(spark, dir).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4)) == (nItems, nRatings, oOff, denom, alpha))
    // raters agree on ~80% of votes: alpha must be solidly positive but
    // below perfect, and some items must have dropped to < 2 ratings
    assert(alpha > 300000L && alpha < 950000L, s"alpha out of band: $alpha")
    assert(nItems < items.length, "missingness never removed an item")
  }

  test("q368: SAX symbols equal the driver PAA/rank math; alphabet is balanced") {
    val daily = graft.core.Tables.orders(spark, dir)
      .select(expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)").as("day"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum }
    val d0 = daily.keys.min
    val segs = daily.groupBy { case (d, _) => (d - d0) / 7 }
      .map { case (seg, m) =>
        seg -> (m.size.toLong, m.values.sum / m.size) }
    val n = segs.size.toLong
    val ranked = segs.toSeq.sortBy { case (seg, (_, paa)) => (paa, seg) }
      .zipWithIndex.map { case ((seg, (nd, paa)), i) =>
        seg -> (nd, paa, i + 1L, ('a' + ((i.toLong) * 4 / n).toInt).toChar.toString)
      }.toMap
    val got = ExtensionQueries92.q368_sax(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got == ranked)
    // rank-quartile alphabet: the four letters split the segments evenly
    val freq = got.values.groupBy(_._4).view.mapValues(_.size).toMap
    assert(freq.keySet == Set("a", "b", "c", "d"), s"alphabet: $freq")
    assert(freq.values.max - freq.values.min <= 1, s"unbalanced: $freq")
  }

  test("q369: HHI equals the driver share math and brackets the 1/n floor") {
    val rev = graft.core.Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val natOf = graft.core.Tables.supplier(spark, dir)
      .join(graft.core.Tables.nation(spark, dir),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val ref = rev.toSeq.groupBy { case (sk, _) => natOf(sk) }
      .map { case (nat, xs) =>
        val tot = xs.map(_._2).sum
        val ssq = xs.map(x => BigInt(x._2) * x._2).sum
        nat -> (xs.size.toLong, tot, (ssq * 1000000 / (BigInt(tot) * tot)).toLong)
      }
    val got = ExtensionQueries92.q369_hhi(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == ref)
    // HHI is bounded below by 1e6/n (perfect equality) and above by 1e6;
    // allow the integer-truncation slack of 1 on the floor
    assert(got.values.forall { case (n, _, h) => h >= 1000000L / n - 1 && h <= 1000000L })
  }
}
