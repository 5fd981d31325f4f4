package graft

import org.apache.spark.sql.SparkSession

/** Column-lineage CLI (`runMain graft.LineageAudit <query ...>
  * [--dir=sfDir]`): prints, per query, each output column and the
  * (table, column) leaves it derives from — the plan-derived answer to
  * "what does this result actually read". Pairs with ShuffleAudit
  * (physical cost) and PlanGateAudit (plan shape) as the third
  * introspection surface.
  */
object LineageAudit {
  def main(args: Array[String]): Unit = {
    val qs = args.filterNot(_.startsWith("--")).toSeq
    require(qs.nonEmpty, "usage: LineageAudit <query ...> [--dir=sfDir]")
    val dir = args.find(_.startsWith("--dir="))
      .map(_.stripPrefix("--dir=")).getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- qs) {
      println(s"== $q")
      println(graft.plans.Lineage.render(SparkEntry.queries(q)(spark, dir)))
      println()
    }
    spark.stop()
  }
}
