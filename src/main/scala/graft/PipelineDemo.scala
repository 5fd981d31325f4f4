package graft

import org.apache.spark.sql.SparkSession
import graft.Pipeline.PipelineConfig
import graft.ops.Scoring.{Bucket, ScoringConfig}
import graft.sinks.Outputs

/** CLI entry for the visibility merge — the engine's analogue of the
  * reference's `make run`: three CSV paths in, merged frame + slices out.
  *
  * Usage: runMain graft.PipelineDemo <frog.csv> <gsc.csv> <ga4.csv> <outDir>
  *        [siteBase]
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PipelineDemo <frog.csv> <gsc.csv> <ga4.csv> <outDir> [siteBase]")
    val Array(frog, gsc, ga4, outDir) = args.take(4)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = PipelineConfig(
      frogPath = frog, gscPath = gsc, ga4Path = ga4,
      siteBase = args.lift(4).getOrElse(""),
      scoring = ScoringConfig(
        buckets = Bucket.fromConfig(Seq(
          "1" -> 0.32, "2" -> 0.16, "3" -> 0.1, "4-5" -> 0.07, "6-10" -> 0.03)),
        margin = 0.002, maxPosition = 20.0,
        intentMultipliers = Map("transactional" -> 1.5, "informational" -> 0.9),
        urlIntentHints = Seq("/products/" -> "transactional", "/blogs/" -> "informational")),
      runId = sys.env.getOrElse("RUN_ID", "demo"),
      runTimestamp = sys.env.get("RUN_TS").map(_.toLong).getOrElse(0L))
    // Governance (env-gated like the reference): per-source field summary
    // on stdout (`log_field_summary`, etl_merge.py:314-317), autodetect
    // audit log (etl_merge.py:222-247), run log (etl_merge.py:986-1004).
    val runLogOn = Outputs.envBool("ETL_RUN_LOG", default = true)
    val autodetectLogOn = Outputs.envBool("ETL_AUTODETECT_LOG", default = true)
    val resolutions = Pipeline.sourceResolutions(spark, cfg, countRows = autodetectLogOn)
    resolutions.foreach { r =>
      val mapped = r.mapping.collect { case (k, Some(_)) => k }.toSeq.sorted
      val missing = r.mapping.collect { case (k, None) => k }.toSeq.sorted
      println(s"[merge] ${r.source}: mapped=${mapped.mkString("[", ", ", "]")} " +
        s"missing=${missing.mkString("[", ", ", "]")}")
    }
    if (autodetectLogOn) {
      val path = sys.env.getOrElse("ETL_AUTODETECT_LOG_PATH", s"$outDir/logs/etl_autodetect.csv")
      val nowIso = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")
        .withZone(java.time.ZoneOffset.UTC).format(java.time.Instant.now())
      resolutions.foreach(r =>
        Outputs.appendAutodetectLog(path, nowIso, r.source, r.rows, r.autodetectedUrl, r.mapping))
    }

    val merged = Pipeline.run(spark, cfg, outDir)
    val mergedRows = merged.count()
    if (runLogOn) {
      val path = sys.env.getOrElse("ETL_RUN_LOG_PATH", s"$outDir/logs/runs.csv")
      Outputs.appendRunLog(path, cfg.runId, cfg.runTimestamp, mergedRows,
        frog, gsc, ga4, s"$outDir/merged_visibility")
    } else println("[governance] ETL_RUN_LOG disabled; skipping run log append")
    println(s"[pipeline] merged rows: $mergedRows")
    merged.show(10, truncate = 40)
    spark.stop()
  }
}
