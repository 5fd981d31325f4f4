package graft.sources.excel

import java.io.File
import java.util.OptionalLong

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.ingest.Xlsx

/** DataSource V2 Excel connector (SURVEY §2 A2, upgraded from the
  * driver-side posture): `spark.read.format("graft.sources.excel")
  * .load(dirOrFile)` scans a DIRECTORY of .xlsx exports with
  *
  *   - one [[InputPartition]] per FILE — xlsx is a zip (not splittable),
  *     but a partner-drop directory of thousands of workbook exports
  *     parallelizes file-wise across executors, which is exactly the
  *     shape the reference's ingest (one pandas `read_excel` per source,
  *     `etl_merge.py:331-342`) cannot reach;
  *   - pushed-down column pruning ([[SupportsPushDownRequiredColumns]]):
  *     the executor-side parser never materializes non-projected cells
  *     (no shared-string dereference, no character buffering — see
  *     [[Xlsx.readSheetProjected]]), so a 2-column rollup over a
  *     40-column export parses ~5% of the cell payload;
  *   - reported statistics (sum of file sizes) so the optimizer can
  *     pick a broadcast when the export directory is the small side of
  *     a join — which, vs a 100 TB lake table, it always is;
  *   - schema-merge tolerance: each file maps columns BY HEADER NAME —
  *     a file missing a projected column yields nulls (the mergeSchema
  *     contract of the parquet sources, `Sources.loadParquetMerged`).
  *
  * Everything is all-string (`read_excel(dtype=str)` parity,
  * `etl_merge.py:331`); typing happens in the resolve layer like every
  * other A-surface source. Schema inference reads ONE header row of the
  * first file ([[Xlsx.readHeader]] stops the XML stream at `</row>`).
  */
class DefaultSource extends TableProvider {

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = ExcelTable.listFiles(options)
    require(files.nonEmpty, "graft.sources.excel: no .xlsx files under the given " +
      "path — for a write target, prime the directory first (ExcelTable.prime)")
    StructType(Xlsx.readHeader(files.head).map(StructField(_, StringType, nullable = true)))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    new ExcelTable(schema, ExcelTable.listFiles(options),
      Option(options.get("path")).filter(p => new File(p).isDirectory))
  }
}

object ExcelTable {
  /** "Create table": write the zero-row `_header.xlsx` that defines the
    * directory's schema. Append/overwrite writes require a primed dir —
    * the catalog-less V2 analog of CREATE TABLE (the header workbook IS
    * the table metadata; it reads back as 0 rows).
    */
  def prime(path: String, header: Seq[String]): Unit = {
    new File(path).mkdirs()
    graft.sinks.XlsxWrite.writeXlsx(
      new File(path, "_header.xlsx").getPath, header, Nil)
  }

  /** Resolve the option paths → sorted .xlsx file list. A directory
    * expands to its *.xlsx children (sorted for deterministic partition
    * order); a file stands for itself.
    */
  def listFiles(options: CaseInsensitiveStringMap): Seq[String] = {
    val raw = Option(options.get("paths")) match {
      case Some(json) => // JSON string array, as DataFrameReader.load(paths*) encodes it
        "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(json)
          .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).toSeq
      case None => Option(options.get("path")).toSeq
    }
    raw.flatMap { p =>
      val f = new File(p)
      if (f.isDirectory) {
        // listFiles returns null (not empty) on an unreadable dir or an IO
        // race — surface a descriptive error instead of an NPE
        val listed = Option(f.listFiles((_, n) => n.toLowerCase.endsWith(".xlsx")))
        require(listed.isDefined,
          s"graft.sources.excel: cannot list directory $p (unreadable or IO race)")
        listed.get.map(_.getPath).sorted.toSeq
      } else Seq(p)
    }
  }
}

class ExcelTable(tableSchema: StructType, files: Seq[String], dir: Option[String])
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"excel(${files.length} files)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val retention = Option(options.get("streamRetentionMs")).map(_.toLong)
      .getOrElse(ExcelMicroBatchStream.DefaultRetentionMs)
    val startAtLatest = Option(options.get("streamStartingPosition"))
      .exists(_.equalsIgnoreCase("latest"))
    new ExcelScanBuilder(tableSchema, files, dir, retention, startAtLatest)
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val d = dir.getOrElse(throw new IllegalArgumentException(
      "graft.sources.excel: write target must be an existing (primed) directory"))
    new ExcelWriteBuilder(d, info)
  }
}

class ExcelScanBuilder(fullSchema: StructType, files: Seq[String], dir: Option[String],
    retentionMs: Long = ExcelMicroBatchStream.DefaultRetentionMs,
    startAtLatest: Boolean = false)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new ExcelScan(files, required, dir, retentionMs, startAtLatest)
}

case class ExcelFilePartition(path: String) extends InputPartition

class ExcelScan(files: Seq[String], requiredSchema: StructType,
    dir: Option[String] = None,
    retentionMs: Long = ExcelMicroBatchStream.DefaultRetentionMs,
    startAtLatest: Boolean = false)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new ExcelMicroBatchStream(dir.getOrElse(throw new IllegalArgumentException(
      "graft.sources.excel: streaming needs a directory path")),
      requiredSchema.fieldNames, retentionMs, startAtLatest)
  override def description(): String =
    s"graft-excel [${files.length} files, cols=${requiredSchema.fieldNames.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => ExcelFilePartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new ExcelReaderFactory(requiredSchema.fieldNames)
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(files.map(new File(_).length()).sum)
    override def numRows(): OptionalLong = OptionalLong.empty()
  }
}

class ExcelReaderFactory(requiredCols: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ExcelPartitionReader(
      partition.asInstanceOf[ExcelFilePartition].path, requiredCols)
}

/** Executor-side reader: parses its ONE file with the projection pushed
  * into the XML walk, then replays rows positionally. Name→position
  * resolves per file (schema-merge tolerance).
  */
class ExcelPartitionReader(path: String, requiredCols: Array[String])
    extends PartitionReader[InternalRow] {

  private lazy val rows: Iterator[InternalRow] = {
    val (header, data) = Xlsx.readSheetProjected(path, Some(requiredCols.toSet))
    val pos = header.zipWithIndex.toMap
    val idx = requiredCols.map(pos.getOrElse(_, -1)) // absent column → null
    data.iterator.map { r =>
      InternalRow.fromSeq(idx.map { i =>
        if (i < 0) null
        else r.lift(i).flatten.map(UTF8String.fromString).orNull
      }.toIndexedSeq)
    }
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

// ----------------------------------------------------------------- write path

/** V2 write: append (`mode("append")`) and truncate-overwrite
  * (`mode("overwrite")`, via [[SupportsTruncate]]). The unit of write is
  * one workbook PER NON-EMPTY PARTITION, built task-side and committed
  * through the standard two-phase protocol, with every filename scoped
  * by the write's `queryId` so concurrent and successive jobs can never
  * clobber each other (round-11 advice: `part-<p>.xlsx` names made a
  * second append silently overwrite the first's workbooks, and abort
  * deleted EVERY job's temp files):
  *
  *   1. tasks write `.part-<jobId>-<p>-<task>.xlsx.tmp`;
  *   2. task commit renames to the STAGED `.part-<jobId>-<p>.xlsx.staged`
  *      — still invisible to the reader's `*.xlsx` listing, so a reader
  *      never sees a job's output before the job-level commit;
  *   3. job commit publishes each staged file to `part-<jobId>-<p>.xlsx`
  *      (rename — atomic per file) and, for truncate, deletes every part
  *      not in the committed set; `_header.xlsx` (the table's schema
  *      record) always survives. Truncate publishes the new parts first
  *      and then deletes the stale ones, so the mixed-visibility window
  *      is the commit instant itself, never a failed job;
  *   4. job/task abort deletes only THIS job's `.part-<jobId>-*` temp and
  *      staged files — a concurrent writer's in-flight state is untouched
  *      and the directory stays readable at its prior contents.
  */
class ExcelWriteBuilder(dir: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new ExcelBatchWrite(dir, info.schema().fieldNames, doTruncate, info.queryId())
  }
}

/** `staged` = the task-committed hidden name; final visible name is
  * derived by the driver commit ([[ExcelBatchWrite.finalName]]).
  */
case class ExcelCommit(staged: Option[String]) extends WriterCommitMessage

object ExcelBatchWrite {
  def finalName(staged: String): String =
    staged.stripPrefix(".").stripSuffix(".staged")
}

class ExcelBatchWrite(dir: String, cols: Array[String], truncate: Boolean,
    jobId: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ExcelWriterFactory(dir, cols, jobId)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // publish: staged -> visible, atomically per file
    val committed = messages.collect { case ExcelCommit(Some(s)) =>
      val staged = new File(dir, s)
      val fin = new File(dir, ExcelBatchWrite.finalName(s))
      if (staged.exists()) { // first commit: publish staged -> visible
        if (fin.exists()) fin.delete()
        require(staged.renameTo(fin), s"publish $s -> $fin failed")
      } else {
        // retried job commit: the staged file was already renamed away by
        // the first attempt — the published part IS the committed state;
        // deleting it here would lose the data and then fail the rename
        require(fin.exists(), s"neither staged $s nor published $fin exists")
      }
      fin.getName
    }.toSet
    if (truncate) {
      Option(new File(dir).listFiles((_, n) => n.toLowerCase.endsWith(".xlsx") &&
          n != "_header.xlsx" && !committed.contains(n)))
        .foreach(_.foreach(_.delete()))
    }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // only THIS job's in-flight state — never another writer's
    Option(new File(dir).listFiles((_, n) => n.startsWith(s".part-$jobId-") &&
        (n.endsWith(".xlsx.tmp") || n.endsWith(".xlsx.staged"))))
      .foreach(_.foreach(_.delete()))
  }
}

class ExcelWriterFactory(dir: String, cols: Array[String], jobId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ExcelDataWriter(dir, partitionId, taskId, cols, jobId)
}

/** Buffers its partition's rows (export-scale by contract — one
  * workbook's worth) and materializes the file only at task commit —
  * into the job-scoped STAGED name; publication to a reader-visible
  * `*.xlsx` happens only at the job-level commit.
  */
class ExcelDataWriter(dir: String, partitionId: Int, taskId: Long, cols: Array[String],
    jobId: String = "nojob") extends DataWriter[InternalRow] {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
  private val tmp = new File(dir, s".part-$jobId-$partitionId-$taskId.xlsx.tmp")

  override def write(row: InternalRow): Unit =
    buf += cols.indices.map(i =>
      if (row.isNullAt(i)) null else row.getUTF8String(i).toString)

  override def commit(): WriterCommitMessage =
    if (buf.isEmpty) ExcelCommit(None) // empty partition -> no file
    else {
      graft.sinks.XlsxWrite.writeXlsx(tmp.getPath, cols.toIndexedSeq, buf)
      val staged = new File(dir, f".part-$jobId-$partitionId%05d.xlsx.staged")
      if (staged.exists()) staged.delete() // re-commit of a retried task, same job
      require(tmp.renameTo(staged), s"rename $tmp -> $staged failed")
      ExcelCommit(Some(staged.getName))
    }

  override def abort(): Unit = { if (tmp.exists()) tmp.delete(); () }
  override def close(): Unit = ()
}

// ----------------------------------------------------------------- streaming

/** COMPACTED streaming offset (round-11 verdict task #5 — the v1 offset
  * was the full sorted ingested-file list, re-logged per batch, so a
  * year-long drop directory grew the offset and the per-batch set diff
  * without bound). V2 semantics, FileStreamSource's maxFileAge shape
  * re-expressed as an offset invariant:
  *
  *   ingested(offset) = { every file with mtime < cutoff }  ∪  files
  *
  * `files` holds (dir-relative name, mtime) pairs only for the RETENTION
  * WINDOW — names with mtime ≥ cutoff — so the offset's size is bounded
  * by the window's drop rate, not the directory's lifetime, and a batch
  * plan is O(window), not O(history). `cutoff` advances monotonically to
  * `max(mtime) − retention` as new drops arrive; files older than the
  * window are implied-ingested and drop out of the explicit list.
  *
  * Contract (same as FileStreamSource's maxFileAge): a dropped file's
  * mtime is its drop time; a file that APPEARS bearing an mtime older
  * than `max-seen-mtime − retention` is treated as already processed and
  * ignored. Size the retention option above any possible drop-time skew
  * (default 7 days).
  *
  * Names are dir-RELATIVE (round-11 advice: absolute paths made a
  * relocated drop directory re-ingest everything). Legacy v1 offsets
  * (plain JSON string array of absolute paths) still parse: entries get
  * mtime 0 and no cutoff, which preserves their exactly-once meaning.
  */
case class ExcelFilesOffset(cutoff: Long, files: Seq[(String, Long)])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  def names: Set[String] = files.iterator.map(_._1).toSet
  override def json(): String = {
    val fs = files.sortBy(_._1).map { case (n, m) =>
      "[\"" + n.replace("\\", "\\\\").replace("\"", "\\\"") + "\"," + m + "]"
    }.mkString("[", ",", "]")
    s"""{"v":2,"cutoff":$cutoff,"files":$fs}"""
  }
}

object ExcelFilesOffset {
  /** Sentinel "no cutoff": nothing is implied-ingested. */
  val NoCutoff: Long = Long.MinValue
  val empty: ExcelFilesOffset = ExcelFilesOffset(NoCutoff, Seq.empty)

  private val Str = "\"((?:[^\"\\\\]|\\\\.)*)\"".r
  private val Entry = "\\[\"((?:[^\"\\\\]|\\\\.)*)\",(-?\\d+)\\]".r
  private def unesc(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  def parse(json: String): ExcelFilesOffset = {
    val t = json.trim
    if (t.startsWith("{")) {
      val cutoff = "\"cutoff\":(-?\\d+)".r.findFirstMatchIn(t)
        .map(_.group(1).toLong).getOrElse(NoCutoff)
      ExcelFilesOffset(cutoff,
        Entry.findAllMatchIn(t).map(m => unesc(m.group(1)) -> m.group(2).toLong).toSeq)
    } else // legacy v1: JSON string array of ingested (absolute) paths
      ExcelFilesOffset(NoCutoff,
        Str.findAllMatchIn(t).map(m => unesc(m.group(1)) -> 0L).toSeq)
  }
}

class ExcelMicroBatchStream(dir: String, cols: Array[String],
    retentionMs: Long = ExcelMicroBatchStream.DefaultRetentionMs,
    startAtLatest: Boolean = false)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  /** Monotonic floor for the compaction cutoff — never regresses within a
    * run or across a restart (deserializeOffset raises it from the
    * checkpoint), so an offset's implied-ingested set only grows.
    */
  @volatile private var cutoffFloor: Long = ExcelFilesOffset.NoCutoff

  /** Earliest-start contract: the FIRST listing of a fresh stream is
    * emitted UNCOMPACTED (cutoff stays [[ExcelFilesOffset.NoCutoff]],
    * every file explicit), so a pre-existing backlog older than
    * max(mtime) − retention is planned into batch 0 instead of being
    * implied-ingested by an advanced cutoff — `FileStreamSource` parity,
    * whose SeenFilesMap accepts everything in the first listing
    * regardless of maxFileAge. Compaction arms from the second listing
    * on; a restart is safe because deserializeOffset restores the
    * checkpointed cutoff into [[cutoffFloor]] before latestOffset runs.
    * startAtLatest=true arms immediately (its initialOffset compacts).
    */
  @volatile private var compactionArmed: Boolean = startAtLatest

  private def listNow(): Seq[(String, Long)] =
    Option(new File(dir).listFiles((_, n) => n.toLowerCase.endsWith(".xlsx")))
      .map(_.map(f => f.getName -> f.lastModified()).sortBy(_._1).toSeq)
      .getOrElse(Seq.empty)

  /** Advance the cutoff to max(mtime) − retention (never below the floor)
    * and keep only the retention window explicit.
    */
  private def compact(entries: Seq[(String, Long)]): ExcelFilesOffset = {
    val cut =
      if (entries.isEmpty) cutoffFloor
      else math.max(cutoffFloor, entries.iterator.map(_._2).max - retentionMs)
    cutoffFloor = cut
    ExcelFilesOffset(cut, entries.filter(_._2 >= cut))
  }

  /** `startAtLatest`: treat the directory's current contents as already
    * ingested (Kafka's startingOffsets=latest analog) — the offset they
    * compact to is the stream's starting point, so a pre-existing backlog
    * of e.g. 100k historical exports is never parsed.
    */
  override def initialOffset(): Offset =
    if (startAtLatest) compact(listNow()) else ExcelFilesOffset.empty

  override def latestOffset(): Offset = {
    val entries = listNow()
    if (!compactionArmed && cutoffFloor == ExcelFilesOffset.NoCutoff) {
      compactionArmed = true
      ExcelFilesOffset(ExcelFilesOffset.NoCutoff, entries)
    } else {
      compactionArmed = true
      compact(entries)
    }
  }

  override def deserializeOffset(json: String): Offset = {
    val o = ExcelFilesOffset.parse(json)
    // legacy v1 names were absolute — files are direct children, so the
    // basename is the dir-relative name
    val rel = o.copy(files = o.files.map { case (n, m) => new File(n).getName -> m })
    cutoffFloor = math.max(cutoffFloor, rel.cutoff)
    rel
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ExcelFilesOffset]
    val seen = s.names
    // new = end's explicit window minus start's ingested set (explicit
    // names ∪ implied mtime<cutoff) — O(window), never O(history)
    end.asInstanceOf[ExcelFilesOffset].files
      .collect { case (n, m) if m >= s.cutoff && !seen(n) =>
        ExcelFilePartition(new File(dir, n).getPath): InputPartition }
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new ExcelReaderFactory(cols)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

object ExcelMicroBatchStream {
  /** Default drop-time-skew tolerance; see the offset contract above. */
  val DefaultRetentionMs: Long = 7L * 24 * 3600 * 1000
}
