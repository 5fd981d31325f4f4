package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-free sequential ids in a chosen total order, WITHOUT the
  * single-reducer global window. `row_number() OVER (ORDER BY k)` — the
  * obvious spelling — funnels the entire table through one partition
  * (Spark even warns "No Partition Defined"); at 100 TB that task never
  * finishes. `monotonically_increasing_id` scales but leaves ~2^33-sized
  * gaps between partitions, which breaks consumers that need dense ids
  * (embedding row indices, matrix coordinates, shard-relative offsets).
  *
  * The standard two-phase pattern instead:
  *  1. range-repartition + sort within partitions on the order key —
  *     partition p holds a contiguous key range, sorted (equal keys
  *     co-locate, so per-partition numbering is globally consistent);
  *  2. count rows per partition (a tiny aggregate: one row per
  *     partition, the repo's bounded-collect contract), prefix-sum the
  *     counts on the driver, broadcast the offsets back;
  *  3. id = partition offset + (row_number within the partition − 1) —
  *     the within-partition window parallelizes across partitions.
  *
  * The result is EXACTLY `row_number() OVER (ORDER BY key...) − 1`
  * (which is the DuckDB oracle for q91): range boundaries are
  * data-dependent, but the assigned id is the row's position in the
  * total order, which doesn't depend on where the cuts fell. The order
  * columns must form a total order for the ids to be deterministic.
  */
object DenseIds {

  def withDenseId(df: DataFrame, idCol: String, nPartitions: Int,
      order: Column*): DataFrame = {
    require(order.nonEmpty, "order columns required")
    // localCheckpoint (not a scoped cache) is CORRECTNESS here:
    // RangePartitioner SAMPLES its boundaries, so any recomputation may
    // cut the ranges differently — and the offsets below are only valid
    // for the materialization they were counted on. The checkpoint pins
    // ONE materialization for the offset count and for every later
    // action on the returned frame (a frame whose ids silently changed
    // when a cache expired would be a correctness landmine, the same
    // reason connectedComponents checkpoints its iteration state).
    val sorted = df.repartitionByRange(nPartitions, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      .transform(graft.core.Ckpt.eager)
    val offsets = sorted.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      .scanLeft((0, 0L)) { case ((_, acc), (pid, n)) => (pid, acc + n) }
    // scanLeft yields the EXCLUSIVE prefix sum aligned to the NEXT pid;
    // rebuild as pid -> rows-before-this-partition
    val offsetOf = offsets.sliding(2).collect {
      case Array((_, before), (pid, _)) => pid -> before
    }.toSeq
    // offsets return as a broadcast-joined (pid, offset) frame, NOT a
    // folded when()-chain: a chain is O(nPartitions) deep, and at the
    // thousands-of-range-partitions posture this targets it would stress
    // codegen (64 KB method limit, slow constant folding) even though
    // per-row cost is fine (round-5 ADVICE)
    val spark = df.sparkSession
    val offsetsDf = spark.createDataFrame(offsetOf).toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
    sorted.join(broadcast(offsetsDf), Seq("__pid"))
      .withColumn(idCol, col("__off") + row_number().over(w).cast("long") - 1L)
      .drop("__pid", "__off")
  }
}
