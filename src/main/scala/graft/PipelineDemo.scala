package graft

import org.apache.spark.sql.SparkSession
import graft.Pipeline.PipelineConfig
import graft.ops.Scoring.{Bucket, ScoringConfig}

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
    val merged = Pipeline.run(spark, cfg, outDir)
    println(s"[pipeline] merged rows: ${merged.count()}")
    merged.show(10, truncate = 40)
    spark.stop()
  }
}
