package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries105

/** Semantics pins for the rules/factorial closer (q405-q406). */
class ExtensionQueries105Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q405: rules equal the driver basket recount; lift separates association from popularity") {
    val lp = graft.core.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val nBaskets = lp.map(_._1).distinct.length.toLong
    val itemN = lp.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val co = lp.groupBy(_._1).values.flatMap { b =>
      val ps = b.map(_._2)
      for (a <- ps; c <- ps if a != c) yield (a, c)
    }.groupBy(identity).view.mapValues(_.size.toLong).filter(_._2 >= 3L).toMap
    val scored = co.map { case ((a, b), c) =>
      (a, b, c, c * 1000000L / nBaskets, c * 1000000L / itemN(a),
        (BigInt(c) * nBaskets * 1000000 / (BigInt(itemN(a)) * itemN(b))).toLong)
    }.toSeq
    val ref = scored.sortBy(t => (-t._6, t._1, t._2)).take(200).zipWithIndex
      .map { case ((a, b, c, s, cf, l), i) => (i + 1L, a, b, c, s, cf, l) }
    val got = ExtensionQueries105.q405_association_rules(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == ref.toSeq)
    // lift ranks differently from raw co-count: the top rule by lift is
    // not simply the most co-purchased pair (popularity normalized away)
    assert(got.nonEmpty)
    val topByCo = scored.maxBy(t => (t._3, -t._1, -t._2))
    assert(got.head._7 >= topByCo._6,
      "top lift must be at least the most-popular pair's lift")
    // rules are directed: confidence differs across directions somewhere
    val dirMap = got.map(t => (t._2, t._3) -> t._6).toMap
    assert(dirMap.exists { case ((a, b), cf) =>
      dirMap.get((b, a)).exists(_ != cf) })
  }

  test("q406: factorial effects equal the driver cell algebra and read as noise") {
    val u = graft.core.Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def cell(a: Long, b: Long): Long = {
      val xs = u.filter(x => x._1 % 2 == a && (x._1 / 2) % 2 == b).map(_._2)
      xs.sum * 1000 / xs.length
    }
    val (m00, m01, m10, m11) = (cell(0, 0), cell(0, 1), cell(1, 0), cell(1, 1))
    val row = ExtensionQueries105.q406_factorial_effects(spark, dir).collect().head
    assert(row.getLong(0) == u.length.toLong)
    assert((row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4)) ==
      (m00, m01, m10, m11))
    assert(row.getLong(5) == (m10 + m11 - m00 - m01) / 2)
    assert(row.getLong(6) == (m01 + m11 - m00 - m10) / 2)
    assert(row.getLong(7) == (m11 - m10) - (m01 - m00))
    // hash assignment is null: effects and interaction are noise
    // relative to the grand cell level
    val level = (m00 + m01 + m10 + m11) / 4
    for (e <- Seq(row.getLong(5), row.getLong(6), row.getLong(7)))
      assert(math.abs(e) * 2 < level, s"effect $e vs level $level")
  }
}
