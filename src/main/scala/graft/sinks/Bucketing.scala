package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table sink: the co-located-join story for repeated big joins.
  *
  * A join between two tables bucketed by the join key into the same
  * bucket count needs NO shuffle exchange — each task reads matching
  * buckets from both sides (likewise a groupBy on the bucket key skips
  * its exchange). At 100 TB this converts the nightly "fact ⋈ fact"
  * re-shuffle into a metadata-only co-location: the shuffle is paid once
  * at write time and amortized over every subsequent join. The price is
  * write-side: each task writes one file per bucket it touches, so
  * repartition by the bucket key first (done here) to keep file counts
  * at `buckets`, not `tasks × buckets`.
  *
  * BucketingSpec pins the plan property (SortMergeJoin, zero Exchange).
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (overwrite). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.repartition(buckets, df.col(key))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Co-located equi-join of two tables bucketed on `key` with the same
    * bucket count. The plan contains no shuffle for the join itself.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
