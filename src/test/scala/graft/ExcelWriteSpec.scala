package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries70
import graft.sources.excel.{ExcelDataWriter, ExcelTable}

/** The V2 Excel write path: distributed append (one workbook per
  * non-empty partition, empty partitions skipped), name-based column
  * matching, truncate-overwrite, task abort cleanup, and the
  * unsupported-mode contract.
  */
class ExcelWriteSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def primed(cols: Seq[String]): String = {
    val d = Files.createTempDirectory("graft_xlsx_wspec_").toString
    ExcelTable.prime(d, cols)
    d
  }

  private def parts(d: String): Seq[String] =
    new File(d).listFiles((_, n) => n.startsWith("part-") && n.endsWith(".xlsx"))
      .map(_.getName).sorted.toSeq

  test("append writes one workbook per non-empty partition; empties skipped") {
    val d = primed(Seq("id", "v"))
    val df = spark.range(6).select(col("id").cast("string").as("id"),
      concat(lit("v"), col("id")).as("v"))
    // 8 partitions over 6 rows -> at least 2 empty
    df.repartition(8, col("id")).write
      .format("graft.sources.excel").mode("append").save(d)
    val ps = parts(d)
    assert(ps.nonEmpty && ps.size <= 6, s"got $ps")
    val back = spark.read.format("graft.sources.excel").load(d)
    assert(back.count() == 6)
    assert(back.orderBy(col("id")).collect().map(_.getString(1)).toSeq ==
      (0 to 5).map(i => s"v$i"))
  }

  test("append matches columns BY NAME against the primed schema") {
    val d = primed(Seq("a", "b"))
    // query columns deliberately reversed vs the table schema
    val df = spark.range(3).select(
      concat(lit("B"), col("id")).as("b"), col("id").cast("string").as("a"))
    df.write.format("graft.sources.excel").mode("append").save(d)
    val back = spark.read.format("graft.sources.excel").load(d)
      .orderBy("a").collect()
    assert(back.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("0", "B0"), ("1", "B1"), ("2", "B2")))
  }

  test("overwrite truncates: stale workbooks deleted, _header survives") {
    val d = primed(Seq("id"))
    val full = spark.range(10).select(col("id").cast("string").as("id"))
    full.repartition(3).write.format("graft.sources.excel").mode("append").save(d)
    val before = parts(d)
    spark.range(2).select(col("id").cast("string").as("id"))
      .coalesce(1).write.format("graft.sources.excel").mode("overwrite").save(d)
    val after = parts(d)
    assert(before.size >= 2 && after.size == 1, s"$before -> $after")
    assert(new File(d, "_header.xlsx").exists(), "_header must survive truncate")
    assert(spark.read.format("graft.sources.excel").load(d).count() == 2)
  }

  test("two successive append jobs both survive (round-11 advice: unique per-job names)") {
    val d = primed(Seq("id"))
    spark.range(3).select(col("id").cast("string").as("id"))
      .coalesce(1).write.format("graft.sources.excel").mode("append").save(d)
    spark.range(3, 5).select(col("id").cast("string").as("id"))
      .coalesce(1).write.format("graft.sources.excel").mode("append").save(d)
    assert(parts(d).size == 2, s"second append clobbered the first: ${parts(d)}")
    assert(spark.read.format("graft.sources.excel").load(d).count() == 5)
  }

  test("job commit publishes atomically; abort is scoped to the failing job") {
    val d = primed(Seq("x"))
    def row(s: String) = org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    // a concurrent writer's in-flight temp — must survive this job's abort
    val other = new File(d, ".part-otherjob-0-7.xlsx.tmp")
    Files.createFile(other.toPath)
    val bw = new graft.sources.excel.ExcelBatchWrite(d, Array("x"),
      truncate = false, jobId = "thisjob")
    val w = new ExcelDataWriter(d, 0, 1L, Array("x"), "thisjob")
    w.write(row("v"))
    val msg = w.commit() // task-committed -> STAGED, not yet reader-visible
    assert(parts(d).isEmpty, "staged output leaked to readers before job commit")
    bw.abort(Array(msg))
    assert(other.exists(), "abort deleted another job's in-flight temp")
    assert(!new File(d).listFiles().exists(_.getName.startsWith(".part-thisjob-")),
      "abort left this job's staged/temp files")
    assert(parts(d).isEmpty)
    // and a successful job publishes exactly its staged parts
    val w2 = new ExcelDataWriter(d, 0, 2L, Array("x"), "job2")
    w2.write(row("w"))
    val msg2 = w2.commit()
    new graft.sources.excel.ExcelBatchWrite(d, Array("x"), truncate = false,
      jobId = "job2").commit(Array(msg2))
    assert(parts(d) == Seq("part-job2-00000.xlsx"))
    other.delete()
  }

  test("retried job commit is idempotent: published part survives (round-12 advice)") {
    val d = primed(Seq("x"))
    val w = new ExcelDataWriter(d, 0, 3L, Array("x"), "jobR")
    w.write(org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString("v")))
    val msg = w.commit()
    val bw = new graft.sources.excel.ExcelBatchWrite(d, Array("x"),
      truncate = false, jobId = "jobR")
    bw.commit(Array(msg))
    assert(parts(d) == Seq("part-jobR-00000.xlsx"))
    val published = new File(d, "part-jobR-00000.xlsx")
    val bytes = Files.readAllBytes(published.toPath)
    // driver-side commit retry: the staged file was already renamed away —
    // the published part must be treated as the committed state, not deleted
    bw.commit(Array(msg))
    assert(parts(d) == Seq("part-jobR-00000.xlsx"), "retry lost the published part")
    assert(java.util.Arrays.equals(bytes, Files.readAllBytes(published.toPath)),
      "retry corrupted the published part")
    assert(spark.read.format("graft.sources.excel").load(d).count() == 1)
  }

  test("task abort leaves no temp or part files") {
    val d = primed(Seq("x"))
    val w = new ExcelDataWriter(d, 0, 42L, Array("x"))
    w.write(org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString("boom")))
    w.abort()
    w.close()
    assert(parts(d).isEmpty)
    assert(!new File(d).listFiles().exists(_.getName.endsWith(".tmp")))
  }

  test("default ErrorIfExists mode is rejected for V2 providers") {
    val d = primed(Seq("x"))
    val e = intercept[AnalysisException] {
      spark.range(1).select(col("id").cast("string").as("x"))
        .write.format("graft.sources.excel").save(d)
    }
    assert(e.getMessage.toLowerCase.contains("errorifexists"))
  }

  test("q303/q304 fixture: append dir has <=4 range parts; overwrite dir only en rows") {
    val (a, o) = ExtensionQueries70.writtenDirs(spark, dir)
    assert(parts(a).size <= 4 && parts(a).nonEmpty)
    val langs = spark.read.format("graft.sources.excel").load(o)
      .select("lang").distinct().collect().map(_.getString(0)).toSeq
    assert(langs == Seq("en"), s"overwrite dir must hold only en, got $langs")
  }
}
