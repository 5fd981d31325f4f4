package graft

import org.apache.spark.sql.functions._
import graft.queries.ExtensionQueries24

/** Property pins for the round-9 twelfth batch (cross-engine equality is
  * the DuckDB oracle's job — these assert operator SEMANTICS: k-threshold
  * accounting, inclusive-range bucketing, integer log2 buckets).
  */
class ExtensionQueries24Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  // ---------------------------------------------- q168 k-anonymity

  test("q168: hand groups of 3 and 7 — only the sub-k group is at risk") {
    import spark.implicits._
    // segment A: one QI group of 3 (risk) and one of 7 (safe)
    val rows = (1 to 3).map(i => (i.toLong, "A", 1, 100.0)) ++
      (4 to 10).map(i => (i.toLong, "A", 2, 100.0))
    val dir = java.nio.file.Files.createTempDirectory("q168").toString
    rows.toDF("c_custkey", "c_mktsegment", "c_nationkey", "c_acctbal")
      .withColumn("c_name", lit("x"))
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val r = ExtensionQueries24.q168_k_anonymity(spark, dir).collect().head
    assert(r.getString(0) == "A" && r.getLong(1) == 2L && r.getLong(2) == 1L &&
      r.getLong(3) == 3L && r.getLong(4) == 300000L, s"$r")
  }

  // ------------------------------------------ q169 equi-width hist

  test("q169: hand values — inclusive-range bucket map keeps max in the last bucket") {
    import spark.implicits._
    val rows = Seq((1L, 10.0), (2L, 10.0), (3L, 19.99), (4L, 30.0))
    val dir = java.nio.file.Files.createTempDirectory("q169").toString
    rows.toDF("o_orderkey", "o_totalprice")
      .withColumn("o_custkey", lit(1L))
      .withColumn("o_orderdate",
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = ExtensionQueries24.q169_equiwidth_hist(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // mn=1000, mx=3000, span+1=2001
    assert(out.toSeq == Seq((0L, 1000L, 2L, 500000L),
      (9L, 1900L, 1L, 250000L), (19L, 2900L, 1L, 250000L)), out.mkString(";"))
  }

  test("q169: real data — buckets in range, counts cover, bounds monotone") {
    val out = ExtensionQueries24.q169_equiwidth_hist(spark, sfTiny).collect()
    val n = graft.core.Tables.orders(spark, sfTiny).count()
    assert(out.map(_.getLong(2)).sum == n)
    assert(out.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= 19))
    val lows = out.map(_.getLong(1)).toSeq
    assert(lows == lows.sorted)
  }

  // ------------------------------------------ q170 degree histogram

  test("q170: triangle + isolate — degree 2 lands in bucket 1; isolate in -1") {
    import spark.implicits._
    // one order with parts 1,2,3 → undirected triangle, every degree 2
    val li = Seq((1L, 1L), (1L, 2L), (1L, 3L))
    val dir = java.nio.file.Files.createTempDirectory("q170").toString
    li.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq(1L, 2L, 3L, 4L).toDF("p_partkey")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val out = ExtensionQueries24.q170_degree_histogram(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(out == Seq(-1L -> 1L, 1L -> 3L), out.mkString(";"))
  }
}
