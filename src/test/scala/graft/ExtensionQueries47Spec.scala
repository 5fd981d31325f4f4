package graft

import graft.queries.ExtensionQueries47

/** Property pins for the round-9 thirty-fifth batch (cross-engine
  * equality is the DuckDB oracle's job — these assert operator
  * SEMANTICS: cap accounting vs q142, grid mass conservation,
  * dispersion extremes).
  */
class ExtensionQueries47Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  // --------------------------------------------- q234 cluster capping

  test("q234: kept = min(size, 2); reconciles with q142's keep-1 canon") {
    val out = ExtensionQueries47.q234_cluster_capping(spark, sfTiny)
      .collect()
    assert(out.nonEmpty)
    val canon = graft.queries.ExtensionQueries16
      .q142_canonical_docs(spark, sfTiny).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    out.foreach { r =>
      val (rep, size, kept, dropped) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(kept == math.min(size, 2L) && kept + dropped == size)
      val keptIds = r.getString(4).split(",").map(_.toLong)
      assert(keptIds.length == kept && keptIds.sorted.sameElements(keptIds))
      // the K=1 canon (max tokens, tie smaller id) is always among the K=2 keeps
      assert(keptIds.contains(canon(rep)), s"canon of $rep missing")
    }
  }

  // ------------------------------------------ q235 dependence grid

  test("q235: grid mass conserves; deviations sum to ~0") {
    val out = ExtensionQueries47.q235_rank_dependence_grid(spark, sfTiny)
      .collect()
    assert(out.nonEmpty && out.length <= 16)
    val n = out.map(_.getLong(2)).sum
    // each quartile's marginal mass is ~n/4 (exact rank-cut arithmetic)
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val m = rows.map(_.getLong(2)).sum
      assert(math.abs(m - n / 4) <= 1)
    }
    // signed deviations cancel up to div truncation
    val devSum = out.map(_.getLong(3)).sum
    assert(math.abs(devSum) < 16 * 2, s"dev sum $devSum")
  }

  // ------------------------------------------ q236 dispersion

  test("q236: constant counts disperse to 0; planted clumping exceeds 1e6") {
    import spark.implicits._
    def dirFor(prefix: String, counts: Seq[Int]): String = {
      val dir = java.nio.file.Files.createTempDirectory(prefix).toString
      counts.zipWithIndex.flatMap { case (c, o) =>
        (1 to c).map(l => (o.toLong + 1, l.toLong, l.toLong, l, 1.0, 1.0,
          0.0, 0.0, "N", "O", new java.sql.Timestamp(0L)))
      }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_quantity", "l_extendedprice", "l_discount", "l_tax",
          "l_returnflag", "l_linestatus", "l_shipdate")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      dir
    }
    val const = ExtensionQueries47
      .q236_dispersion_index(spark, dirFor("q236a", Seq.fill(10)(4)))
      .collect()(0)
    assert(const.getLong(3) == 0L) // zero variance
    // clumped: half the orders have 1 line, half have 9 -> D = 16/5 wait:
    // mean 5, var = 16 -> D = 3.2e6
    val clump = ExtensionQueries47
      .q236_dispersion_index(spark,
        dirFor("q236b", Seq.fill(5)(1) ++ Seq.fill(5)(9)))
      .collect()(0)
    assert(clump.getLong(3) > 1000000L)
    // exact: n=10, s1=50, s2=5*1+5*81=410; n*s2-s1^2=4100-2500=1600
    // 1600*1e6/(9*50) = 3555555
    assert(clump.getLong(3) == 3555555L)
  }
}
