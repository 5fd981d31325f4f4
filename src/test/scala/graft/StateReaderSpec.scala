package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Spark 4 state data source (`format("statestore")`): the ops surface
  * that reads a streaming checkpoint's STATE back as a DataFrame — what
  * an operator debugging a stuck stateful pipeline at 100 TB reaches
  * for before attaching a debugger. Certified here against the
  * pipeline's own output: the checkpointed aggregate state of a keyed
  * count must hold exactly one row per key, carrying exactly the counts
  * the sink published.
  */
class StateReaderSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("statestore source reads back keyed aggregate state == sink output") {
    val ckpt = Files.createTempDirectory("graft_statereader_").toString
    // FileStreamSource wants a directory; stage the single-file table
    val srcDir = Files.createTempDirectory("graft_statereader_src_")
    Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      srcDir.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val q = spark.readStream.schema(schema).parquet(srcDir.toString)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("statereader_sink")
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val sink = spark.table("statereader_sink").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sink.nonEmpty)

    val state = spark.read.format("statestore").load(ckpt)
    // schema: key struct (the grouping columns), value struct (the agg
    // buffer — its lone long field is the count), partition_id
    val rows = state.select(col("key.event_type").as("k"), col("value.*"))
      .collect()
    val longIdx = state.select(col("value.*")).schema.fields
      .indexWhere(_.dataType == org.apache.spark.sql.types.LongType)
    assert(longIdx >= 0, "aggregate buffer must carry a long count field")
    val fromState = rows.map(r => r.getString(0) -> r.getLong(1 + longIdx)).toMap
    assert(fromState == sink,
      s"state rows must equal the published counts: $fromState vs $sink")
    // one state row per key — grouped state, not history
    assert(state.count() == sink.size.toLong)
  }
}
