package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.DenseIds

class DenseIdsSpec extends SparkSpecBase {

  import spark.implicits._

  test("ids are exactly 0..n-1 in the requested total order, across many partitions") {
    val df = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"),
        md5(concat_ws("|", col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))).as("k"))
    val n = df.count()
    val ids = DenseIds.withDenseId(df, "id", 16, col("k"), col("l_orderkey"),
      col("l_linenumber"))
    // dense: no gaps, no duplicates
    val stats = ids.agg(count(lit(1)), countDistinct(col("id")),
      min(col("id")), max(col("id"))).head()
    assert(stats.getLong(0) == n && stats.getLong(1) == n)
    assert(stats.getLong(2) == 0L && stats.getLong(3) == n - 1)
    // order: id increases with the order key (sampled via self-comparison)
    val disordered = ids.select(col("k"), col("id"))
      .withColumn("prev_k", lag("k", 1).over(
        Window.partitionBy(pmod(col("id"), lit(1)).cast("int")).orderBy("id")))
      .filter(col("prev_k").isNotNull && col("prev_k") > col("k")).count()
    assert(disordered == 0, s"$disordered id pairs out of key order")
  }

  test("re-run assigns identical ids (sampled range boundaries don't leak into results)") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"),
        md5(concat_ws("|", col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))).as("k"))
    // fully-identical rows are interchangeable under any total order, so
    // compare the id SET per key (min+count), not an arbitrary pick
    def run() = DenseIds.withDenseId(df, "id", 7, col("k"), col("l_orderkey"),
        col("l_linenumber"))
      .groupBy("k").agg(min("id").as("lo"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(run() == run())
  }
}
