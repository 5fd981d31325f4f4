package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import graft.core.Tables

/** Pins the event-time ingestion contract: whatever physical encoding a
  * testdata generation ships for `events.ts` — INT64 nanos (the
  * nanosAsLong surface of parquet TIMESTAMP(NANOS)), TIMESTAMP(MICROS)
  * as TIMESTAMP_NTZ, or TIMESTAMP(MICROS) as instant-adjusted TIMESTAMP —
  * `Tables.toLongNanos` must yield the identical canonical LONG-nanos
  * frame. The round-8 testdata regeneration flipped NANOS → MICROS and
  * killed 22 queries; this spec makes the next flip a no-op.
  */
class EventsTsContractSpec extends SparkSpecBase {

  // whole-µs instants (the µs encodings can't carry sub-µs anyway)
  private val micros = Seq(
    1700000000000000L, 1700000000000001L, 1712345678901234L, 0L, -1000000L)

  private def canonical: DataFrame = {
    import spark.implicits._
    micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us * 1000L) }
      .toDF("event_id", "ts")
  }

  private def roundTrip(write: DataFrame => DataFrame): DataFrame = {
    val dir = Files.createTempDirectory("graft_ts_contract").toString
    write(canonical).coalesce(1).write.mode("overwrite").parquet(dir)
    Tables.toLongNanos(spark.read.parquet(dir)).orderBy("event_id")
  }

  private def expect: Seq[(Long, Long)] =
    micros.zipWithIndex.map { case (us, i) => (i.toLong, us * 1000L) }

  private def rows(df: DataFrame): Seq[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("LONG nanos passes through unchanged") {
    val got = roundTrip(identity)
    assert(got.schema("ts").dataType == LongType)
    assert(rows(got) == expect)
  }

  test("TIMESTAMP_NTZ (parquet MICROS, isAdjustedToUTC=false) normalizes") {
    val got = roundTrip(df =>
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType)))
    assert(got.schema("ts").dataType == LongType)
    assert(rows(got) == expect)
  }

  test("TIMESTAMP (parquet MICROS, isAdjustedToUTC=true) normalizes") {
    val got = roundTrip(df =>
      df.withColumn("ts", timestamp_micros(expr("ts div 1000"))))
    assert(got.schema("ts").dataType == LongType)
    assert(rows(got) == expect)
  }

  test("normalization preserves column order and rejects unsupported types") {
    import spark.implicits._
    val threeCol = Seq((1L, 1000L, "a")).toDF("event_id", "ts", "event_type")
    assert(Tables.toLongNanos(threeCol).columns.toSeq ==
      Seq("event_id", "ts", "event_type"))
    val bad = Seq((1L, "not-a-time")).toDF("event_id", "ts")
    assertThrows[IllegalArgumentException](Tables.toLongNanos(bad))
  }

  test("real testdata events surface as LONG nanos via Tables.events") {
    val e = Tables.events(spark, "/root/testdata/sf0.001")
    assert(e.schema("ts").dataType == LongType)
    // sanity: plausible epoch-ns magnitude (year ~2001..2100), not µs
    val (lo, hi) = (1e18.toLong, 4.1e18.toLong)
    val n = e.filter(col("ts").between(lo, hi)).count()
    assert(n == e.count() && n > 0)
  }

  test("TIMESTAMP and TIMESTAMP_NTZ verify against TimestampType cast semantics") {
    // the normalizer casts NTZ→TZ through the session zone (pinned UTC):
    // both encodings of the same wall/instant µs must agree exactly
    val asNtz = roundTrip(df =>
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType)))
    val asTz = roundTrip(df =>
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast(TimestampType)))
    assert(rows(asNtz) == rows(asTz))
  }
}
