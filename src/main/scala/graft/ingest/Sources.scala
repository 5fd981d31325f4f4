package graft.ingest

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Robust tabular sources (SURVEY §2 A1/A3/A4/A9): all-string CSV reads with
  * the reference's fallback ladder — plain parse first; if the result is a
  * single (mangled) column, re-read with comment filtering and a sniffed
  * delimiter. Excel keeps the dispatch-by-extension shape but is out of
  * engine scope (no connector in the container).
  */
object Sources {

  /** Driver-side delimiter sniff over the first non-comment KB (streamed —
    * never loads the file into memory).
    */
  def sniffDelimiter(path: String): String = {
    val in = Files.newInputStream(Paths.get(path))
    val buf = new Array[Byte](2048)
    val n = try in.read(buf) finally in.close()
    val head = new String(buf, 0, math.max(n, 0), java.nio.charset.StandardCharsets.UTF_8)
    val line = head.linesIterator.filterNot(_.startsWith("#")).take(1).toList.headOption.getOrElse("")
    Seq(",", ";", "\t", "|").maxBy(d => line.count(_.toString == d))
  }

  /** All-string CSV read (no schema inference — progressive coercion is the
    * engine's type discipline, SURVEY §1.2).
    */
  private def readCsv(spark: SparkSession, path: String, sep: String,
      comment: Option[String]): DataFrame = {
    val base = spark.read
      .option("header", "true")
      .option("inferSchema", "false")
      .option("sep", sep)
    comment.fold(base)(c => base.option("comment", c)).csv(path)
  }

  /** Robust loader: plain parse; a 1-column result (e.g. '# ----' header
    * junk) triggers re-read with comment='#' + sniffed delimiter
    * (`etl_merge.py:88-108`, `:579-601`).
    */
  def loadTable(spark: SparkSession, path: String): DataFrame = {
    require(Files.exists(Paths.get(path)), s"input not found: $path") // A9
    val ext = path.substring(path.lastIndexOf('.') + 1).toLowerCase
    if (ext == "xlsx") Xlsx.loadXlsx(spark, path) // A2: dispatch by extension
    else if (ext == "xls") Biff.loadXls(spark, path) // A2: legacy 97-2003 BIFF8
    else {
      val first = readCsv(spark, path, ",", None)
      if (first.columns.length > 1) first
      else readCsv(spark, path, sniffDelimiter(path), Some("#"))
    }
  }

  /** JSONL corpus ingest with corrupt-record QUARANTINE: at lake scale some
    * lines are always malformed (truncated uploads, encoding accidents) and
    * a 100 TB job must neither crash (FAILFAST) nor silently null them
    * (PERMISSIVE default drops the evidence). Returns (clean, quarantine):
    * clean rows parse fully; quarantined rows carry the raw offending line
    * for triage. The explicit schema keeps ingestion one pass — no
    * inference scan.
    */
  def loadJsonlQuarantined(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): (DataFrame, DataFrame) = {
    val withCorrupt = org.apache.spark.sql.types.StructType(
      schema.fields :+ org.apache.spark.sql.types.StructField(
        "_corrupt_record", org.apache.spark.sql.types.StringType, nullable = true))
    val raw = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .cache() // Spark requires referencing _corrupt_record via a cached/materialized frame
    val clean = raw.filter(org.apache.spark.sql.functions.col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val quarantine = raw
      .filter(org.apache.spark.sql.functions.col("_corrupt_record").isNotNull)
      .select(org.apache.spark.sql.functions.col("_corrupt_record").as("raw_line"))
    (clean, quarantine)
  }

  /** Schema-evolution parquet read: merge the footers of every file under
    * `dir` (a 100 TB lake accretes columns over time; the default
    * first-file schema silently DROPS later columns), with rows from
    * pre-evolution files surfacing the added columns as null. Footer
    * merging costs one distributed schema pass — use for evolving landing
    * zones, not for fixed-schema curated tables.
    */
  def loadParquetMerged(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dir)

  /** Input path resolution: ENV override → explicit config path → default
    * (`resolve_input_path`, `etl_merge.py:717-731`); existence is validated
    * at load (A9).
    */
  def resolveInputPath(envName: String, configured: Option[String], default: String): String =
    sys.env.get(envName).map(_.trim).filter(_.nonEmpty)
      .orElse(configured.map(_.trim).filter(_.nonEmpty))
      .getOrElse(default)
}
