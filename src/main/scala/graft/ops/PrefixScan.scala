package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scan-order prefix aggregates WITHOUT the single-reducer global window.
  * `max(v) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING ... 1 PRECEDING)` —
  * the obvious spelling of "the watermark the stream had seen before this
  * row" — funnels the whole table through one task. The two-phase shape
  * (DenseIds' sibling):
  *
  *  1. range-repartition + in-partition sort on the order key — partition
  *     p holds a contiguous key range;
  *  2. per-partition max (a tiny one-row-per-partition aggregate, the
  *     repo's bounded-collect contract), exclusive prefix-max of those
  *     maxima on the driver, broadcast back;
  *  3. row prefix = greatest(in-partition exclusive running max, the
  *     prior-partitions max) — the window parallelizes per partition.
  *
  * Result is EXACTLY the global exclusive prefix max (NULL for the first
  * row overall), independent of where the range cuts fell.
  */
object PrefixScan {

  /** @param value LONG-typed column to prefix-max over
    * @param order  total order (ties would make "prior" ambiguous)
    * @return input columns + `prefixCol` = max(value) over all STRICTLY
    *         prior rows in the total order; NULL for the first row
    */
  def prefixMaxExclusive(df: DataFrame, prefixCol: String, nPartitions: Int,
      value: Column, order: Column*): DataFrame = {
    require(order.nonEmpty, "order columns required")
    // checkpoint pins ONE materialization: RangePartitioner samples its
    // boundaries, and the broadcast prior-maxima below are only valid for
    // the partitioning they were computed on (same invariant as DenseIds)
    val sorted = df.repartitionByRange(nPartitions, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value)
      .localCheckpoint()
    val partMax = sorted.groupBy(col("__pid")).agg(max(col("__v")).as("__mx"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    // exclusive prefix max across partitions, aligned pid -> max of all
    // partitions strictly before it (None for the first)
    var running = Option.empty[Long]
    val prior = partMax.map { case (pid, mx) =>
      val out = (pid, running)
      running = Some(running.fold(mx)(math.max(_, mx)))
      out
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val priorDf = prior.toDF("__pid", "__prior")
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    // greatest() skips NULLs: first row of the first partition gets NULL
    // (no priors anywhere), first row of later partitions gets __prior
    sorted.join(broadcast(priorDf), Seq("__pid"), "left")
      .withColumn(prefixCol, greatest(max(col("__v")).over(w), col("__prior")))
      .drop("__pid", "__prior", "__v")
  }
}
