package graft
import org.apache.spark.sql.SparkSession
object SchemaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def ms(f: => Unit): Double = { val t0=System.nanoTime(); f; (System.nanoTime()-t0)/1e6 }
    val path = s"$sfDir/lineitem.parquet"
    val sch = spark.read.parquet(path).schema
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size/2)
    val raw = (1 to 20).map(_ => ms(spark.read.parquet(path)))
    val withSch = (1 to 20).map(_ => ms(spark.read.schema(sch).parquet(path)))
    val viaTables = (1 to 20).map(_ => ms(graft.core.Tables.t(spark, sfDir, "lineitem")))
    println(f"raw=${med(raw)}%.1f withSchema=${med(withSch)}%.1f viaTables=${med(viaTables)}%.1f ms")
    // what does executedPlan cost on a trivial select?
    val planCost = (1 to 10).map { _ =>
      ms(graft.core.Tables.t(spark, sfDir, "lineitem").select("l_orderkey").queryExecution.executedPlan)
    }
    println(f"plan_trivial=${med(planCost)}%.1f ms")
    spark.stop()
  }
}
