package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Write-side data layout for scan pruning — the storage half of the
  * 100 TB story. A parquet scan can only skip what the writer clustered:
  * row-group and file min/max stats prune a predicate ONLY if rows are
  * physically ordered by the filtered column. [[clusteredWrite]] is the
  * standard recipe:
  *
  *  - `repartitionByRange(n, cols)` — a range-partitioner (sampled
  *    boundaries) sends disjoint key ranges to disjoint files, so a
  *    point/range predicate touches O(1) of the n files;
  *  - `sortWithinPartitions(cols)` — orders rows inside each file, so
  *    parquet's per-row-group min/max prune WITHIN the touched file and
  *    the column's RLE/dictionary pages compress tighter.
  *
  * This is exactly what engines call `CLUSTER BY` / Z-order's 1-D
  * special case. The multi-column form range-partitions on the leading
  * column and breaks ties on the rest — for true multi-dimensional
  * skipping interleave a space-filling-curve key first and cluster on
  * that (the same API: `clusteredWrite(df.withColumn("z", zkey), n,
  * "z")`).
  */
object Layout {

  def clusteredWrite(df: DataFrame, path: String, nFiles: Int,
      cols: String*): Unit = {
    require(cols.nonEmpty, "cluster columns required")
    df.repartitionByRange(nFiles, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Per-file [min, max] of `c` over a written dataset — the evidence
    * that a layout prunes: disjoint ranges mean a point predicate can
    * touch only one file. Reads only the clustered column.
    */
  def fileRanges(spark: org.apache.spark.sql.SparkSession, path: String,
      c: String): DataFrame =
    spark.read.parquet(path)
      .select(col(c), input_file_name().as("file"))
      .groupBy(col("file"))
      .agg(min(col(c)).as("lo"), max(col(c)).as("hi"), count(lit(1)).as("n"))
}
