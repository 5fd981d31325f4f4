package graft.sinks

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Governance sinks (SURVEY §2 A6/A7): append-only run and schema-audit
  * logs. These are metadata-plane, one line per pipeline run — driver-side
  * appends, not data-plane jobs (the reference writes them the same way).
  */
object Outputs {

  private def appendCsv(path: String, header: Seq[String], row: Seq[String]): Unit = {
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    val needHeader = !Files.exists(p) || Files.size(p) == 0
    val sb = new StringBuilder
    if (needHeader) sb.append(header.mkString(",")).append('\n')
    sb.append(row.map(quote).mkString(",")).append('\n')
    Files.write(p, sb.toString.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  private def quote(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n'))
      "\"" + s.replace("\"", "\"\"") + "\"" else s

  /** CSV sink with the reference's exact output contract (SURVEY §2 A5,
    * `to_csv(..., index=False, float_format="%.6f")`, etl_merge.py:901):
    * doubles render as 6-decimal non-scientific strings, nulls stay empty
    * cells, minimal quoting, and the result is ONE real CSV file at
    * `path` (not a part-file directory) — byte-identical drop-in for the
    * reference's `merged_visibility.csv` (pinned in GoldenDemoSpec).
    * `orderBy` pins the row order (pandas' left merge preserves the frog
    * spine's file order; Spark must impose it explicitly); helper `__`
    * columns used only for ordering are excluded from the output.
    */
  def writeCsvFormatted(df: DataFrame, path: String,
      orderBy: Seq[org.apache.spark.sql.Column] = Nil,
      intLineage: Set[String] = Set.empty): Unit = {
    // pandas' DYNAMIC dtype, emulated for byte parity: a reference column
    // whose lineage is integer (to_int coercions, sums of ints) stays
    // int64 — printed bare — unless the left merge introduced a NaN, which
    // silently promotes the WHOLE column to float64 and %.6f-formats every
    // value. For the declared int-lineage columns held as doubles here,
    // one bounded 1-row aggregate asks "any null? any fractional value?"
    // and picks the rendering pandas would have picked.
    val dblInt = df.schema.fields
      .filter(f => f.dataType == DoubleType && intLineage(f.name)).map(_.name)
    val bareInt: Set[String] =
      if (dblInt.isEmpty) Set.empty
      else {
        val aggs = dblInt.flatMap { c =>
          Seq(max(when(col(c).isNull, 1).otherwise(0)).as(s"__n_$c"),
            max(when(col(c) =!= round(col(c)), 1).otherwise(0)).as(s"__f_$c"))
        }
        val r = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).head()
        dblInt.filter { c =>
          r.getAs[Any](s"__n_$c") == 0 && (r.getAs[Any](s"__f_$c") match {
            case null => true; case 0 => true; case _ => false
          })
        }.toSet
      }
    val cols = df.schema.fields.filterNot(_.name.startsWith("__")).map { f =>
      if (f.dataType == DoubleType && bareInt(f.name))
        col(f.name).cast("long").as(f.name)
      else if (f.dataType == DoubleType)
        when(col(f.name).isNotNull, format_string("%.6f", col(f.name)))
          .as(f.name)
      else col(f.name)
    }
    val one =
      if (orderBy.nonEmpty) df.repartition(1).sortWithinPartitions(orderBy: _*)
      else df.coalesce(1)
    val tmp = path + "__tmp"
    one.select(cols.toIndexedSeq: _*)
      .write.mode("overwrite").option("header", "true")
      .option("emptyValue", "").csv(tmp)
    // promote the single part file to `path` like the reference's one-file
    // to_csv, then drop the Spark output directory
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    import scala.jdk.CollectionConverters._
    val listing = Files.list(Paths.get(tmp))
    val entries = try listing.iterator().asScala.toList finally listing.close()
    val part = entries.find(_.getFileName.toString.endsWith(".csv"))
      .getOrElse(throw new IllegalStateException(s"no part file under $tmp"))
    Files.move(part, p, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    entries.filterNot(_ == part).foreach(Files.deleteIfExists(_))
    Files.deleteIfExists(Paths.get(tmp))
  }

  /** Size-governed parquet sink — the 100 TB output-hygiene counterpart of
    * the reference's single-file to_csv: `repartition(n)` bounds the FILE
    * COUNT (the small-files problem: a 32k-task job writing 32k tiny files
    * chokes downstream listing/footers), `repartitionByRange` +
    * `sortWithinPartitions` gives each file a NARROW key range so min/max
    * footer stats make downstream predicate pushdown selective (hash
    * repartitioning would spread every file across the full key range),
    * and `maxRecordsPerFile` caps file SIZE so one skewed partition cannot
    * produce a multi-GB file. The range partitioner samples — balanced
    * under skew — and nothing funnels through one task.
    */
  def writeParquetSized(df: DataFrame, path: String, numFiles: Int,
      clusterBy: Seq[String], maxRecordsPerFile: Long = 5000000L,
      codec: String = "zstd"): Unit = {
    require(numFiles > 0)
    val clustered =
      if (clusterBy.isEmpty) df.repartition(numFiles)
      else df.repartitionByRange(numFiles, clusterBy.map(col): _*)
        .sortWithinPartitions(clusterBy.map(col): _*)
    clustered.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("compression", codec) // zstd: ~30% smaller than snappy at 100 TB
      .parquet(path)
  }

  /** Hive-layout partitioned parquet sink: one directory per value of
    * `partitionBy` (the coarse pruning axis a 100 TB lake reads by —
    * language, date, source), `numFilesPerPartition` output tasks per
    * partition value via a (partition, range-bucket) repartition so one hot
    * partition value cannot produce a single giant file OR 32k tiny ones.
    * Downstream filters on the partition column prune whole directories
    * before any footer is read (PartitionFilters in the scan — asserted in
    * ScaleSpec).
    */
  def writeParquetPartitioned(df: DataFrame, path: String, partitionBy: String,
      numFilesPerPartition: Int, codec: String = "zstd"): Unit = {
    require(numFilesPerPartition > 0)
    // spread key from full row CONTENT (xxhash64 of every column):
    // deterministic under task retries — a nondeterministic key here
    // (round-robin, monotonic ids) is the classic repartition-retry
    // row-loss/duplication bug
    val spread = pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*),
      lit(numFilesPerPartition))
    df.repartition(col(partitionBy), spread)
      .write.mode("overwrite")
      .option("compression", codec)
      .partitionBy(partitionBy)
      .parquet(path)
  }

  /** Boolean-like env toggle (`get_env_bool`, `etl_merge.py:447-461`):
    * 1/true/yes/y/on → true, 0/false/no/n/off → false, unset/other → default.
    */
  def envBool(name: String, default: Boolean): Boolean =
    sys.env.get(name).map(_.trim.toLowerCase) match {
      case Some(s) if Set("1", "true", "yes", "y", "on")(s) => true
      case Some(s) if Set("0", "false", "no", "n", "off")(s) => false
      case _ => default
    }

  /** Run-log append (`etl_merge.py:986-1004`): one lineage line per run. */
  def appendRunLog(path: String, runId: String, runTimestamp: Long, rowsMerged: Long,
      frog: String, gsc: String, ga4: String, mergedOut: String): Unit =
    appendCsv(path,
      Seq("run_id", "run_timestamp", "rows_merged", "frog_csv", "gsc_csv", "ga4_csv", "merged_csv"),
      Seq(runId, runTimestamp.toString, rowsMerged.toString, frog, gsc, ga4, mergedOut))

  /** Schema-resolution audit append (`etl_merge.py:222-247`). */
  def appendAutodetectLog(path: String, timestampIso: String, source: String, rows: Long,
      autodetected: Option[String], mapping: Map[String, Option[String]]): Unit = {
    val present = mapping.collect { case (k, Some(_)) => k }.toSeq.sorted
    val missing = mapping.collect { case (k, None) => k }.toSeq.sorted
    appendCsv(path,
      Seq("timestamp_utc", "source", "rows", "autodetected_url_col", "mapped_fields", "missing_fields"),
      Seq(timestampIso, source, rows.toString, autodetected.getOrElse(""),
        present.mkString(";"), missing.mkString(";")))
  }
}
