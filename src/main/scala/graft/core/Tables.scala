package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Testdata table access. One parquet file per table under the sf dir
  * (see /root/repo/TESTDATA.md). All reads go through here so scans stay
  * uniform (vectorized parquet reader, pushdown-friendly).
  *
  * NOTE: `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader
  * rejects; sessions set `spark.sql.legacy.parquet.nanosAsLong=true`, so
  * `events.ts` surfaces as LONG nanoseconds-since-epoch. Queries do exact
  * integer time math on it (no double round-trips — ns magnitudes exceed
  * 2^53). Convert via `timestamp_micros(col("ts") / 1000)` only where real
  * timestamp semantics are needed (streaming windows).
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")
}
