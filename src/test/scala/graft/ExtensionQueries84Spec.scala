package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries84

/** Semantics pins for the uncertainty/aggregation-honesty batch
  * (q344-q346).
  */
class ExtensionQueries84Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def hash2(id: Long): Long =
    48271L * ((69621L * (id + 1) % 2147483647L) + 1) % 2147483647L

  private def centsBuckets() = graft.core.Tables.orders(spark, dir)
    .select(col("o_orderkey"), round(col("o_totalprice") * 100).cast("long"))
    .collect().map(r => (r.getLong(0), r.getLong(1)))

  test("q344: jackknife SE equals the driver recompute and is positive") {
    val ds = centsBuckets().map { case (k, c) => (hash2(k) % 10, c) }
    val ts = ds.map(_._2).sum
    val tc = ds.length.toLong
    val reps = (0L to 9L).map { r =>
      val (bs, bc) = (ds.filter(_._1 == r).map(_._2).sum,
        ds.count(_._1 == r).toLong)
      (ts - bs) / (tc - bc)
    }
    val (b, sm) = (reps.size.toLong, reps.sum)
    val ssq = reps.map(m => { val d = b * m - sm; d * d }).sum
    val se = math.sqrt(((b - 1) * ssq / (b * b * b)).toDouble).toLong
    val row = ExtensionQueries84.q344_jackknife_se(spark, dir).collect().head
    assert(row.getLong(0) == ts / tc)
    assert(row.getLong(1) == b && row.getLong(2) == sm / b)
    assert(row.getLong(3) == ssq && row.getLong(4) == se)
    assert(se > 0, "degenerate fixture: zero jackknife variance")
  }

  test("q345: shard medians, their median, and the true median match the driver") {
    val ds = centsBuckets().map { case (k, c) => (hash2(k) % 8, c) }
    def lowerMed(xs: Seq[Long]): Long = {
      val s = xs.sorted; s(((s.size + 1) / 2 - 1).toInt)
    }
    val mom = lowerMed((0L to 7L).map(r =>
      lowerMed(ds.filter(_._1 == r).map(_._2).toSeq)))
    val tm = lowerMed(ds.map(_._2).toSeq)
    val row = ExtensionQueries84.q345_median_of_medians_bias(spark, dir)
      .collect().head
    assert(row.getLong(0) == 8L)
    assert(row.getLong(1) == tm && row.getLong(2) == mom)
    assert(row.getLong(3) == (mom - tm) * 1000000L / tm)
  }

  test("q346: GROUP BY ALL equals the explicit grouping") {
    val all = ExtensionQueries84.q346_group_by_all(spark, dir).collect().toSeq
    val explicit = spark.sql(
      s"""SELECT l_returnflag, l_linestatus, count(*) AS n_items,
         |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         |    AS price_cents
         |FROM parquet.`$dir/lineitem.parquet`
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus, n_items, price_cents""".stripMargin)
      .collect().toSeq
    assert(all == explicit)
    assert(all.nonEmpty)
  }
}
