package graft

import graft.queries.ExtensionQueries76

/** Semantics pins for the agreement/fertility/dynamic-SQL batch
  * (q320-q322): Fleiss' kappa recomputes from first principles with a
  * driver-side md5, fertility recomputes per language, and EXECUTE
  * IMMEDIATE returns exactly its literal twin.
  */
class ExtensionQueries76Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def md5hex8(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  test("q320: kappa equals the driver recompute; perfect agreement would be 1e6") {
    val items = graft.core.Tables.orders(spark, dir)
      .select("o_orderkey").collect().map(_.getLong(0))
    def label(i: Long, r: Int): Long = {
      val h = md5hex8(s"$i-$r") % 10
      if (h < 2) (i % 3 + 1 + h % 2) % 3 else i % 3
    }
    val nij = items.flatMap(i => (1 to 3).map(r => (i, label(i, r))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = items.length.toLong
    val a = nij.values.map(v => v * v).sum - 3 * n
    val b = nij.groupBy(_._1._2).values
      .map(m => { val c = m.values.sum; c * c }).sum
    def ppm(num: BigInt, den: BigInt): Long = (num * 1000000 / den).toLong
    val row = ExtensionQueries76.q320_fleiss_kappa(spark, dir).collect().head
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == ppm(a, 6 * n), "pbar")
    assert(row.getLong(2) == ppm(b, BigInt(9) * n * n), "pe")
    assert(row.getLong(3) ==
      ppm(BigInt(3) * n * a - 2 * b, BigInt(18) * n * n - 2 * b), "kappa")
    // the raters agree well above chance (~0.47 at the 20% flip rate)
    // but far from perfectly
    assert(row.getLong(3) > 300000L && row.getLong(3) < 900000L)
  }

  test("q321: fertility equals a driver recompute per language") {
    val rx = graft.ext.TextAnalysis.BpeSplitPattern.r
    val ds = graft.core.Tables.documents(spark, dir)
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val ref = ds.groupBy(_._1).map { case (lang, docs) =>
      val ch = docs.map(_._2.length.toLong).sum
      val ws = docs.map(_._2.split(" ", -1).length.toLong).sum
      val rxn = docs.map(d => rx.findAllIn(d._2).size.toLong).sum
      lang -> (docs.size.toLong, ch * 1000 / ws, ch * 1000 / rxn, rxn * 1000 / ws)
    }
    val rows = ExtensionQueries76.q321_token_fertility(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows == ref)
  }

  test("q322: EXECUTE IMMEDIATE binding returns exactly the literal twin") {
    val bound = ExtensionQueries76.q322_execute_immediate(spark, dir).collect()
    val literal = spark.sql(
      s"""SELECT lang, count(*) AS n_docs, sum(n_chars) AS chars_sum
         |FROM parquet.`$dir/documents.parquet`
         |WHERE n_chars >= 200 AND n_chars < 700
         |GROUP BY lang ORDER BY lang""".stripMargin).collect()
    assert(bound.toSeq == literal.toSeq)
    assert(bound.nonEmpty)
    // the parameters actually bind (a different hi changes the result)
    val narrower = spark.sql(
      s"""EXECUTE IMMEDIATE
         |  'SELECT count(*) AS n FROM parquet.`$dir/documents.parquet`
         |   WHERE n_chars >= :lo AND n_chars < :hi'
         |  USING 200 AS lo, 300 AS hi""".stripMargin).collect().head.getLong(0)
    val wider = bound.map(_.getLong(1)).sum
    assert(narrower < wider)
  }
}
