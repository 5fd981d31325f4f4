package graft

import org.apache.spark.sql.functions._
import graft.ops.Skyline

class SkylineSpec extends SparkSpecBase {

  import spark.implicits._

  private def naive(rows: Seq[(Long, Long, Long)]): Set[Long] =
    rows.filter { case (_, x, y) =>
      !rows.exists { case (_, x2, y2) => x2 < x && y2 >= y }
    }.map(_._1).toSet

  test("front2D == naive dominance filter, including x-ties and duplicate points") {
    val rows = Seq(
      (1L, 10L, 5L), (2L, 10L, 9L),   // x-tie: both can survive
      (3L, 5L, 9L),                   // dominates nothing at x=10 with y>=? (5,9) beats (10,5) and ties (10,9)
      (4L, 5L, 9L),                   // duplicate point
      (5L, 20L, 20L), (6L, 30L, 19L), // (30,19) dominated by (20,20)
      (7L, 1L, 1L))
    val df = rows.toDF("id", "x", "y")
    val got = Skyline.front2D(df, col("x"), col("y"), nPartitions = 3)
      .select("id").as[Long].collect().toSet
    assert(got == naive(rows), s"got $got, want ${naive(rows)}")
  }

  test("front2D matches naive on real data across many partitions") {
    val p = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .select(col("p_partkey").as("id"),
        round(col("p_retailprice") * 100).cast("long").as("x"),
        col("p_size").cast("long").as("y"))
    val rows = p.as[(Long, Long, Long)].collect().toSeq
    val got = Skyline.front2D(p, col("x"), col("y"), nPartitions = 7)
      .select("id").as[Long].collect().toSet
    assert(got == naive(rows))
  }
}
