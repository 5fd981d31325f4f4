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
    val o = ExcelFilesOffset(Seq("/a/b.xlsx", """/weird"dir\x.xlsx"""))
    assert(ExcelFilesOffset.parse(o.json()) == o)
    assert(ExcelFilesOffset.parse(ExcelFilesOffset(Nil).json()) == ExcelFilesOffset(Nil))
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
