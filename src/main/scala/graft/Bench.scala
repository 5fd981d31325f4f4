package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at the configured sf
  * dir and prints ONE JSON line. Methodology:
  *  - a warmup action first (JVM/codegen/parquet-footer caches are not part
  *    of query cost);
  *  - each query materializes fully through the `noop` sink (a bare count()
  *    can shortcut to metadata for scan-only plans);
  *  - cache cleared between queries so persisted intermediates from one
  *    query never subsidize another;
  *  - deterministic (sorted) execution order.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runToNoop(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    // Warmup: exercise codegen, shuffle machinery, and every table's footer.
    try {
      SparkEntry.queries.headOption.foreach { case (n, _) => runToNoop(n) }
      spark.catalog.clearCache()
    } catch { case _: Throwable => }

    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      spark.catalog.clearCache()
      name -> runToNoop(name)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
