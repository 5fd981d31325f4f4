package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries95

/** Semantics pins for the PIVOT/gaps/moments batch (q376-q378). */
class ExtensionQueries95Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q376: PIVOT cells equal the grouped conditional aggregation") {
    val li = graft.core.Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"),
        expr("CAST(round(l_quantity * 100) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val ref = li.groupBy(_._1).map { case (f, xs) =>
      def cell(st: String) = {
        val g = xs.filter(_._2 == st)
        (g.length.toLong, g.map(_._3).sum)
      }
      f -> (cell("F"), cell("O"))
    }
    val df = ExtensionQueries95.q376_sql_pivot(spark, dir)
    assert(df.columns.toSeq == Seq("l_returnflag", "f_n", "f_qty", "o_n", "o_qty"))
    val got = df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2)), (r.getLong(3), r.getLong(4)))).toMap
    assert(got == ref)
  }

  test("q377: gap audit equals the driver calendar diff; identities hold") {
    val days = graft.core.Tables.orders(spark, dir)
      .select(expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)"))
      .collect().map(_.getLong(0)).distinct.sorted
    val (d0, d1) = (days.head, days.last)
    val present = days.toSet
    val missing = (d0 to d1).filterNot(present)
    val runs = missing.foldLeft(List.empty[(Long, Long)]) {
      case ((s, len) :: rest, d) if d == s + len => (s, len + 1) :: rest
      case (acc, d) => (d, 1L) :: acc
    }
    val (gapStart, gapLen) = runs.map { case (s, l) => (s, l) }
      .sortBy { case (s, l) => (-l, s) }.head
    val row = ExtensionQueries95.q377_calendar_gaps(spark, dir).collect().head
    assert(row.getLong(0) == d1 - d0 + 1)
    assert(row.getLong(1) == days.length.toLong)
    assert(row.getLong(2) == missing.length.toLong)
    assert(row.getLong(3) == gapLen && row.getLong(4) == gapStart)
    // span partitions into present + missing exactly
    assert(row.getLong(1) + row.getLong(2) == row.getLong(0))
    // sparse sf0.001 calendar must actually contain holes
    assert(row.getLong(2) > 0 && row.getLong(3) >= 1)
  }

  test("q378: moments equal the driver power-sum identities; shape reads sane") {
    val base = graft.core.Tables.orders(spark, dir)
      .select(col("o_orderpriority"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT) div 10000"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val ref = base.groupBy(_._1).map { case (p, xs) =>
      val n = BigInt(xs.length)
      val x = xs.map(t => BigInt(t._2))
      val (s1, s2, s3, s4) =
        (x.sum, x.map(v => v * v).sum, x.map(v => v * v * v).sum, x.map(v => v * v * v * v).sum)
      val p2 = n * s2 - s1 * s1
      val p3 = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1
      val p4 = n * n * n * s4 - 4 * n * n * s1 * s3 + 6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1
      val fsq = BigInt(math.sqrt(p2.toDouble).floor.toLong)
      p -> (n.toLong, (s1 / n).toLong,
        (1000 * p4 / (p2 * p2)).toLong,
        (1000 * p3 / (p2 * fsq)).toLong)
    }
    val got = ExtensionQueries95.q378_moments(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == ref)
    // order totals are a bounded right-skewed-ish distribution: kurtosis
    // must sit in the platykurtic-to-moderate band (1 < kurt < 9) and
    // |skew| below 2 — degenerate or exploded shapes would leave it
    for ((p, (_, _, kurt, skew)) <- got) {
      assert(kurt > 1000L && kurt < 9000L, s"$p kurt_milli=$kurt")
      assert(math.abs(skew) < 2000L, s"$p skew_milli=$skew")
    }
  }
}
