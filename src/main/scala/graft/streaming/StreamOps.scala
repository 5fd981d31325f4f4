package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY §2 I — absent from the reference,
  * built per the north star): the same transforms run in batch and
  * streaming (the standard Spark testing idiom — batch equivalence is the
  * oracle, pinned in StreamingSpec).
  *
  * Scale posture: watermarks bound state; aggregations are keyed by
  * (window, type) / (user, session) so state partitions by key; no
  * per-record driver work.
  */
object StreamOps {

  /** The events schema as read under nanosAsLong (ts = long nanos). */
  val EventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** ns-long → proper timestamp (µs precision) for event-time semantics. */
  def tsCol: Column = timestamp_micros(expr("ts div 1000"))

  /** Tumbling-window counts/sums per event type. Works on batch and
    * streaming frames alike.
    */
  def tumblingAgg(events: DataFrame, width: String): DataFrame =
    events.withColumn("event_ts", tsCol)
      .groupBy(window(col("event_ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window variant. */
  def slidingAgg(events: DataFrame, width: String, slide: String): DataFrame =
    events.withColumn("event_ts", tsCol)
      .groupBy(window(col("event_ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** Session windows (gap-merged) per user — Spark's native session_window;
    * equivalence with the relational gaps-and-islands form (q21) is pinned
    * in StreamingSpec.
    */
  def sessionAgg(events: DataFrame, gap: String): DataFrame =
    events.withColumn("event_ts", tsCol)
      .groupBy(session_window(col("event_ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Idempotent re-delivery dedup: first event per (user_id, event_type).
    * Streaming: withWatermark + dropDuplicates (bounded state). Batch
    * equivalent keeps earliest (ts, event_id) via row_number.
    */
  def dedupStream(events: DataFrame, watermark: String): DataFrame =
    events.withColumn("event_ts", tsCol)
      .withWatermark("event_ts", watermark)
      .dropDuplicates("user_id", "event_type")

  /** Run a streaming transform over a parquet directory to completion via
    * the memory sink; returns the materialized result table.
    */
  def runToMemory(spark: SparkSession, srcDir: String, name: String,
      transform: DataFrame => DataFrame, mode: String): DataFrame = {
    val stream = spark.readStream.schema(EventsSchema).parquet(srcDir)
    val q = transform(stream).writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }
}
