package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries103

/** Semantics pins for the capstone pair (q400-q401). */
class ExtensionQueries103Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q400: scorecard covers every table; counts equal the catalogs; corpus is clean") {
    val got = ExtensionQueries103.q400_table_scorecard(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == Set("customer", "documents", "embeddings", "events",
      "lineitem", "nation", "orders", "part", "region", "supplier"))
    // spot-check the row counts against direct scans
    assert(got("orders")._1 == graft.core.Tables.orders(spark, dir).count())
    assert(got("lineitem")._1 == graft.core.Tables.lineitem(spark, dir).count())
    assert(got("documents")._1 == graft.core.Tables.documents(spark, dir).count())
    // no null cells anywhere, and every single-column key is unique —
    // but the scorecard CAUGHT a real generator quirk: the TPC-H-style
    // composite key (l_orderkey, l_linenumber) is NOT unique in this
    // synthetic lineitem (line numbers repeat within an order). The pin
    // is the finding, not a clean bill.
    assert(got.values.forall(_._3 == 0L), s"null cells: $got")
    assert((got - "lineitem").values.forall(_._2 == 0L), s"pk dups: $got")
    assert(got("lineitem")._2 > 0L,
      "the known lineitem composite-key violation disappeared — regenerated data?")
    assert(got("lineitem")._1 > got("orders")._1)
  }

  test("q401: AR(1) equals the driver lag-pair moments; daily revenue is memoryless") {
    val daily = graft.core.Tables.orders(spark, dir)
      .groupBy(expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)").as("day"))
      .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100").as("r"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val pairs = daily.toSeq.flatMap { case (d, x) =>
      daily.get(d + 1).map(y => (x, y)) }
    val k = BigInt(pairs.length)
    val sx = BigInt(pairs.map(_._1).sum)
    val sy = BigInt(pairs.map(_._2).sum)
    val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
    val sxx = pairs.map(p => BigInt(p._1) * p._1).sum
    val phi = ((k * sxy - sx * sy) * 1000000 / (k * sxx - sx * sx)).toLong
    val row = ExtensionQueries103.q401_ar1_coefficient(spark, dir).collect().head
    assert(row.getLong(0) == pairs.length.toLong && row.getLong(1) == phi)
    // independent daily draws: |phi| must read well below persistence
    assert(math.abs(phi) < 300000L, s"phi_micro = $phi")
  }
}
