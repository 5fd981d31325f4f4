package graft

import org.apache.spark.sql.SparkSession

/** Fixed-cost attribution for the sub-second fleet (round-19 verdict
  * task #3): 226 queries whose bench medians sit under 0.5 s carry ~74 s
  * of the total, dominated by per-query fixed cost rather than dataflow.
  * Before touching anything, measure WHERE that fixed cost lives:
  *
  *   `runMain graft.FixedCostProbe [query ...]`   (defaults below)
  *
  * Per query, against the SPARK_GRAFT_SF_DIR data:
  *  - build_ms: construct the DataFrame via the registry lambda — table
  *    reads (parquet footer/schema inference) + plan-tree construction;
  *  - plan_ms: force `queryExecution.executedPlan` — analysis,
  *    optimization, physical planning (AQE wrapping, not runtime
  *    re-optimization);
  *  - cold_ms: first noop execution (whole-stage codegen compile + JIT
  *    + execution);
  *  - warm_ms: median of 3 further noop executions of a FRESH DataFrame
  *    each time (the bench's semantics — build+plan+exec per sample);
  *  - warm_reuse_ms: median of 3 noop executions REUSING one DataFrame
  *    (plan+codegen already resolved) — warm_ms − warm_reuse_ms is the
  *    per-sample replanning share.
  *
  * Plus two session floors printed first:
  *  - noop_floor_ms: noop write of spark.range(1) — scheduler + sink
  *    floor;
  *  - read_build_ms: median cost of `spark.read.parquet(lineitem)` frame
  *    CONSTRUCTION alone (footer/schema per call).
  */
object FixedCostProbe {

  val DefaultQueries: Seq[String] = Seq(
    "q01_pricing_summary", "q04_click_share", "q10_filters",
    "q18_regex_extract", "q34_percentiles", "q51_string_funcs",
    "q104_count_min", "q152_grouped_stats", "q230_casted_compare",
    "q305_entropy_binned")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names0 = if (args.nonEmpty) args.toSeq else DefaultQueries
    val names = names0.filter { n =>
      val ok = SparkEntry.queries.contains(n)
      if (!ok) System.err.println(s"[probe] unknown query $n — skipped")
      ok
    }

    def ms(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }

    // session warmup (codegen machinery, shuffle, noop sink)
    noop(spark.range(1000).selectExpr("id", "id % 7 as k")
      .groupBy("k").count())

    val noopFloor = med((1 to 5).map(_ => ms(noop(spark.range(1).toDF("id")))))
    val readBuild = med((1 to 5).map(_ =>
      ms(spark.read.parquet(s"$sfDir/lineitem.parquet"))))
    println(f"floors: noop_floor_ms=$noopFloor%.1f read_build_ms=$readBuild%.1f")

    names.foreach { name =>
      val q = SparkEntry.queries(name)
      release()
      val tBuild = ms(q(spark, sfDir))
      val df0 = q(spark, sfDir)
      val tPlan = ms(df0.queryExecution.executedPlan)
      val tCold = ms(noop(df0))
      val tWarm = med((1 to 3).map { _ => release(); ms(noop(q(spark, sfDir))) })
      val dfR = q(spark, sfDir)
      noop(dfR) // resolve once so the reuse samples are pure re-execution
      val tReuse = med((1 to 3).map { _ => release(); ms(noop(dfR)) })
      println(f"$name%-28s build=$tBuild%7.1f plan=$tPlan%7.1f cold=$tCold%7.1f " +
        f"warm=$tWarm%7.1f warm_reuse=$tReuse%7.1f replan_share=${tWarm - tReuse}%7.1f ms")
    }
    spark.stop()
  }
}
