package graft

import graft.queries.ExtensionQueries55

/** Property pins for the round-9 forty-third batch (cross-engine
  * equality is the DuckDB oracle's job — these assert operator
  * SEMANTICS: band accounting, screen predicate boundaries, ratio
  * identities).
  */
class ExtensionQueries55Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  // ------------------------------------------ q258 discount bands

  test("q258: bands partition all lines; discount cents reconcile") {
    import org.apache.spark.sql.functions._
    val out = ExtensionQueries55.q258_discount_bands(spark, sfTiny).collect()
    val totals = graft.core.Tables.lineitem(spark, sfTiny)
      .agg(count(lit(1)),
        sum(round(col("l_extendedprice") * col("l_discount") * 100)
          .cast("long"))).collect()(0)
    assert(out.map(_.getLong(1)).sum == totals.getLong(0))
    assert(out.map(_.getLong(4)).sum == totals.getLong(1))
    // zero band gives back zero discount cents
    out.filter(_.getLong(0) == 0L)
      .foreach(r => assert(r.getLong(4) == 0L))
  }

  // ------------------------------------------ q259 credit screen

  test("q259: every flagged customer is negative-balance AND above median") {
    import org.apache.spark.sql.functions._
    val out = ExtensionQueries55.q259_credit_screen(spark, sfTiny).collect()
    assert(out.nonEmpty)
    val spends = graft.core.Tables.orders(spark, sfTiny)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("s"))
      .collect().map(_.getLong(1)).sorted
    val med = spends((spends.length + 1) / 2 - 1)
    out.foreach { r =>
      assert(r.getLong(1) < 0L)
      assert(r.getLong(2) > med)
      assert(r.getLong(3) == r.getLong(2) * 1000000L / med)
    }
  }

  // ------------------------------------------ q260 position effects

  test("q260: position 1 ratio is exactly 1e6; means are exact integer divisions") {
    val out = ExtensionQueries55.q260_position_effects(spark, sfTiny)
      .collect().sortBy(_.getLong(0))
    assert(out.nonEmpty && out.head.getLong(0) == 1L)
    assert(out.head.getLong(3) == 1000000L)
    val first = out.head.getLong(2)
    out.foreach { r =>
      assert(r.getLong(3) == r.getLong(2) * 1000000L / first)
    }
    // every position has some population (the generator draws line
    // numbers, so counts need not be monotone — only nonzero)
    assert(out.forall(_.getLong(1) > 0L))
  }
}
