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
      .transform(graft.core.Ckpt.eager)
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

  /** INCLUSIVE running sums of several LONG columns at once, in the total
    * order given by `order` — same two-phase shape as
    * [[prefixMaxExclusive]] (sums are associative, so per-partition
    * running sums plus the broadcast exclusive prefix of per-partition
    * totals reconstruct the global scan exactly). One checkpoint and one
    * bounded collect cover ALL requested columns.
    *
    * @param values (column, outputName) pairs; each output is
    *               `sum(column) OVER (ORDER BY order ROWS UNBOUNDED
    *               PRECEDING TO CURRENT ROW)`
    */
  def prefixSumsInclusive(df: DataFrame, nPartitions: Int,
      order: Seq[Column], values: Seq[(Column, String)]): DataFrame = {
    require(order.nonEmpty && values.nonEmpty)
    val names = values.map(_._2)
    val sorted = values.zipWithIndex.foldLeft(
        df.repartitionByRange(nPartitions, order: _*)
          .sortWithinPartitions(order: _*)
          .withColumn("__pid", spark_partition_id())) {
        case (acc, ((v, _), i)) => acc.withColumn(s"__v$i", v)
      }
      .transform(graft.core.Ckpt.eager)
    val totals = sorted.groupBy(col("__pid"))
      .agg(names.indices.map(i => sum(col(s"__v$i")).as(s"__t$i")).head,
        names.indices.drop(1).map(i => sum(col(s"__v$i")).as(s"__t$i")): _*)
      .collect()
      .map(r => r.getInt(0) -> names.indices.map(i =>
        r.getLong(r.fieldIndex(s"__t$i"))))
      .sortBy(_._1)
    var running = names.indices.map(_ => 0L)
    val prior = totals.map { case (pid, ts) =>
      val out = (pid, running)
      running = running.zip(ts).map { case (a, b) => a + b }
      out
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val priorDf = prior.map { case (pid, ps) => (pid, ps.toArray) }
      .toDF("__pid", "__priors")
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val joined = sorted.join(broadcast(priorDf), Seq("__pid"))
    val withSums = values.zipWithIndex.foldLeft(joined) {
      case (acc, ((_, name), i)) =>
        acc.withColumn(name,
          sum(col(s"__v$i")).over(w) + element_at(col("__priors"), i + 1))
    }
    withSums.drop("__pid" +: "__priors" +: names.indices.map(i => s"__v$i"): _*)
  }
}
