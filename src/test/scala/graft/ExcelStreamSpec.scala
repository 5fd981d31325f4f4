package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.XlsxWrite
import graft.sources.excel.{ExcelFilesOffset, ExcelTable}

/** The V2 Excel MicroBatchStream: drop-directory ingestion with
  * set-difference offsets — each new workbook is read exactly once,
  * across micro-batches AND across a checkpointed cold restart.
  */
class ExcelStreamSpec extends SparkSpecBase {

  private def drop(d: String, name: String, rows: (String, Int)*): Unit =
    XlsxWrite.writeXlsx(s"$d/$name.xlsx", Seq("lang", "n_chars"),
      rows.map { case (l, n) => Seq(l, n.toString) })

  test("offset round trip: json() -> parse is identity incl. escapes") {
    val o = ExcelFilesOffset(1723700000000L,
      Seq("b.xlsx" -> 1723700001000L, """weird"name\x.xlsx""" -> 1723700002000L))
    assert(ExcelFilesOffset.parse(o.json()) == o)
    assert(ExcelFilesOffset.parse(ExcelFilesOffset.empty.json()) == ExcelFilesOffset.empty)
  }

  test("legacy v1 offsets (plain string array) still parse: entries ingested, no cutoff") {
    val legacy = """["/drop/a.xlsx","/drop/weird\"name.xlsx"]"""
    val o = ExcelFilesOffset.parse(legacy)
    assert(o.cutoff == ExcelFilesOffset.NoCutoff)
    assert(o.files == Seq("/drop/a.xlsx" -> 0L, "/drop/weird\"name.xlsx" -> 0L))
  }

  test("compacted offsets: 10k pre-ingested files -> bounded offset, O(new) batch") {
    val d = Files.createTempDirectory("graft_xlsx_compact_").toString
    // 10k historical drops: names + old mtimes are all the lister touches —
    // they are never parsed (start-at-latest implies them ingested), so
    // plain placeholder files stand in for real workbooks
    val oldMtime = System.currentTimeMillis() - 3600L * 1000
    (1 to 10000).foreach { i =>
      val f = new File(d, f"hist-$i%05d.xlsx")
      Files.createFile(f.toPath)
      assert(f.setLastModified(oldMtime))
    }
    // one real workbook, named to sort FIRST so schema inference reads it
    // (the placeholders are not valid zip archives)
    drop(d, "_seed", "en" -> 1)
    new File(d, "_seed.xlsx").setLastModified(oldMtime)
    val q = spark.readStream.format("graft.sources.excel")
      .option("streamStartingPosition", "latest") // backlog = already ingested
      .option("streamRetentionMs", (60L * 1000).toString) // 1 min window
      .load(d)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars").cast("long")).as("chars_sum"))
      .writeStream.format("memory").queryName("xlcompact")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      assert(spark.table("xlcompact").isEmpty, "backlog must not be parsed")
      drop(d, "fresh1", "en" -> 3)
      drop(d, "fresh2", "fr" -> 4)
      q.processAllAvailable()
      val r = spark.table("xlcompact").collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(r == Map("en" -> 3L, "fr" -> 4L))
      // the checkpointed offset is BOUNDED: the 10k backlog compacted away
      // behind the cutoff, only the retention window stays explicit
      val prog = q.lastProgress.sources.head
      val endOffset = Option(prog.endOffset).getOrElse("")
      assert(endOffset.contains("cutoff"), s"not a v2 offset: $endOffset")
      assert(endOffset.length < 2000,
        s"offset grew with history (len=${endOffset.length}): ${endOffset.take(200)}...")
      assert(!endOffset.contains("hist-00001"), "backlog leaked into the offset")
      // and the batches planned only the new files: 2 input rows total
      // across the whole run — the 10,001-file backlog contributed zero
      val totalRows = q.recentProgress.map(_.numInputRows).sum
      assert(totalRows == 2, s"read $totalRows rows, expected the 2 fresh ones")
    } finally q.stop()
  }

  test("earliest start plans a pre-retention backlog into batch 0, then compacts (round-12 advice)") {
    val d = Files.createTempDirectory("graft_xlsx_earliest_").toString
    // a backlog file whose mtime is FAR behind (newest mtime − retention):
    // before the fix the first listing already compacted, implying this
    // file ingested — silent data loss on the default earliest position
    drop(d, "backlog", "en" -> 11)
    assert(new File(d, "backlog.xlsx")
      .setLastModified(System.currentTimeMillis() - 3600L * 1000))
    drop(d, "newest", "fr" -> 2)
    val q = spark.readStream.format("graft.sources.excel")
      .option("streamRetentionMs", "1000") // 1 s — backlog is 1 h outside it
      .load(d)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars").cast("long")).as("chars_sum"))
      .writeStream.format("memory").queryName("xlearliest")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val r = spark.table("xlearliest").collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(r == Map("en" -> 11L, "fr" -> 2L), s"backlog skipped: $r")
      // compaction arms from the second listing on: a later drop still
      // ingests exactly once and the offset now carries a real cutoff
      drop(d, "later", "de" -> 5)
      q.processAllAvailable()
      val r2 = spark.table("xlearliest").collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(r2 == Map("en" -> 11L, "fr" -> 2L, "de" -> 5L))
      val endOffset = Option(q.lastProgress.sources.head.endOffset).getOrElse("")
      assert(endOffset.contains("cutoff"), s"not a v2 offset: $endOffset")
      assert(!endOffset.contains("\"cutoff\":" + ExcelFilesOffset.NoCutoff),
        s"compaction never armed: $endOffset")
    } finally q.stop()
  }

  test("drop dir streams: new workbooks arrive as new micro-batches, counted once") {
    val d = Files.createTempDirectory("graft_xlsx_stream_").toString
    drop(d, "a", "en" -> 10, "en" -> 20, "fr" -> 5)
    val q = graft.streaming.StreamOps.excelDropCounts(spark, d)
      .writeStream.format("memory").queryName("xldrop")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val r1 = spark.table("xldrop").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(r1 == Map("en" -> (2L, 30L), "fr" -> (1L, 5L)))
      drop(d, "b", "fr" -> 7, "de" -> 1)
      q.processAllAvailable()
      val r2 = spark.table("xldrop").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(r2 == Map("en" -> (2L, 30L), "fr" -> (2L, 12L), "de" -> (1L, 1L)))
    } finally q.stop()
  }

  test("checkpointed restart: files ingested before the stop are not re-read") {
    val d = Files.createTempDirectory("graft_xlsx_restart_").toString
    val ckpt = Files.createTempDirectory("graft_xlsx_ckpt_").toString
    drop(d, "a", "en" -> 1, "en" -> 2)
    def start() = graft.streaming.StreamOps.excelDropCounts(spark, d)
      .writeStream.format("memory").queryName("xlrestart")
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    drop(d, "b", "en" -> 4)
    val q2 = start()
    try {
      q2.processAllAvailable()
      val r = spark.table("xlrestart").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      // complete-mode agg state restores from the checkpoint, then only
      // workbook b joins it: 3 rows total, 7 chars — exactly once each
      assert(r == Map("en" -> (3L, 7L)))
      // the restarted stream's first batch planned ONLY the new file
      val batchRows = q2.recentProgress.map(_.numInputRows).sum
      assert(batchRows <= 1, s"restart re-read old files: $batchRows input rows")
    } finally q2.stop()
  }

  test("s_excel_drop passes the streaming plan gate with its written bound") {
    val d = Files.createTempDirectory("graft_xlsx_gate_").toString
    drop(d, "a", "en" -> 1)
    val v = graft.plans.PlanGate.auditStream("s_excel_drop",
      graft.streaming.StreamOps.excelDropCounts(spark, d))
    assert(v.isEmpty, v.mkString("; "))
  }
}
