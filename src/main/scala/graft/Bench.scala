package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-run benchmark: times every SparkEntry query at the configured sf
  * dir and prints ONE JSON line. Methodology:
  *  - a warmup action first (JVM/codegen/parquet-footer caches are not part
  *    of query cost);
  *  - each query materializes fully through the `noop` sink (a bare count()
  *    can shortcut to metadata for scan-only plans);
  *  - every query runs `n` times and reports the per-query MEDIAN (sub-2s
  *    queries swing ±2× run-to-run; a single sample made round-over-round
  *    deltas unattributable). `total` is the sum of medians;
  *  - cache cleared before every run, so persisted intermediates never
  *    subsidize a later run or another query;
  *  - deterministic (sorted) execution order;
  *  - a skew-join harness (see [[skewBench]]) measures the explicit salting
  *    operator against the same join unsalted, reported under "skew".
  */
object Bench {

  val Iters = 3

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

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    /** Median of `Iters` timed runs, cache cleared before each. */
    def medianOf(f: => Unit): Double = {
      val ts = (1 to Iters).map { _ =>
        spark.catalog.clearCache()
        timed(f)
      }
      ts.sorted.apply(Iters / 2)
    }

    def runToNoop(name: String): Double =
      try {
        System.gc() // benchmark hygiene: don't charge query N with query N-1's garbage
        medianOf {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        }
      } catch { case _: Throwable => -1.0 }

    // Warmup: exercise codegen, shuffle machinery, and every table's footer.
    try {
      SparkEntry.queries.headOption.foreach { case (n, _) =>
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    } catch { case _: Throwable => }

    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      name -> runToNoop(name)
    }
    val skew = try skewBench(spark, sfDir, medianOf)
      catch { case _: Throwable => (-1.0, -1.0, -1.0) }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","n":$Iters,"queries":$qs,""" +
      s""""skew":{"unsalted":${skew._1},"salted":${skew._2},"aqe":${skew._3}},"sf":"$sfDir"}""")
    spark.stop()
  }

  /** Skew join three ways, measured (SURVEY §4.4): lineitem rows
    * (×2 exploded) mapped onto a hot key carrying ~97.5% of the data, joined
    * to a 16-rows-per-key dimension and hash-aggregated (broadcast disabled —
    * the regime where skew matters is a dim too big to broadcast).
    *  1. "unsalted": shuffle join, AQE skew split OFF — the naive plan;
    *  2. "salted": the explicit SkewJoin.saltedJoin operator, same confs —
    *     the tool for skew known ahead of time or joins AQE can't rewrite;
    *  3. "aqe": the same unsalted join with AQE's runtime skew split ON —
    *     the first-line fix, reported so the salting comparison is honest
    *     about what the engine already handles. Measured: aqe ≈ unsalted
    *     here, because the hot partition (tens of MB at sf0.1) sits below
    *     AQE's skewedPartitionThresholdInBytes (256 MB default) — the
    *     "skew is real but under the knobs" case, which is exactly the
    *     regime where the explicit salt (~3×) is the right tool.
    */
  def skewBench(spark: SparkSession, sfDir: String,
      medianOf: (=> Unit) => Double): (Double, Double, Double) = {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    // ~97.5% of big-side rows land on key 0; the dimension carries 16 rows
    // per key, so the join multiplies the hot reducer's output ~16×, and the
    // post-join projection is CPU-bound (string build + hash per row) — the
    // work concentrates where the skew is (the reduce side), in a form that
    // parallelizes with cores rather than saturating memory bandwidth
    val big = li.select(
        when(pmod(xxhash64(col("l_orderkey")), lit(40)) < 39, 0L)
          .otherwise(pmod(xxhash64(col("l_orderkey"), lit(7L)), lit(996)) + 1).as("k"),
        col("l_partkey"),
        round(col("l_extendedprice") * 100).cast("long").as("vc"))
      .withColumn("rep", explode(sequence(lit(1), lit(2))))
    val small = spark.range(0, 997L * 16)
      .select((col("id") % 997).as("k"), (col("id") % 13).as("w"))
    def agg(j: DataFrame): DataFrame =
      j.agg(sum(pmod(xxhash64(repeat(concat_ws(",", col("vc"), col("w")), 8)), lit(1000000007L))).as("s"))
    val conf = spark.conf
    val savedSkew = conf.get("spark.sql.adaptive.skewJoin.enabled", "true")
    val savedBc = conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      System.gc()
      val unsalted = medianOf {
        agg(big.join(small, Seq("k")))
          .write.format("noop").mode("overwrite").save()
      }
      System.gc()
      val salted = medianOf {
        agg(graft.ops.SkewJoin.saltedJoin(big, small, "k",
          saltFrom = col("l_partkey") * 17 + col("rep"), n = 32))
          .write.format("noop").mode("overwrite").save()
      }
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      System.gc()
      val aqe = medianOf {
        agg(big.join(small, Seq("k")))
          .write.format("noop").mode("overwrite").save()
      }
      (unsalted, salted, aqe)
    } finally {
      conf.set("spark.sql.adaptive.skewJoin.enabled", savedSkew)
      conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
    }
  }
}
