package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries77

/** Semantics pins for the SQL-surface batch (q323-q325): the
  * within-watermark dedup stream converges to the q323 aggregate, the
  * lateral top-k equals its window-function twin, and IDENTIFIER
  * parameters really bind.
  */
class ExtensionQueries77Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q323: dropDuplicatesWithinWatermark stream == batch distinct rollup") {
    // replay the events table as a stream (FileStreamSource wants a dir)
    val src = Files.createTempDirectory("graft_dedupwm_src_")
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      src.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = graft.core.Tables.toLongNanos(
      spark.readStream.schema(schema).parquet(src.toString))
    val q = graft.streaming.StreamOps
      .dedupWithinWatermarkStream(stream, "30 minutes")
      .writeStream.format("memory").queryName("dedupwm")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("dedupwm")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // ...and exactly-once per key: the dedup emitted no key twice
    val emitted = spark.table("dedupwm")
      .groupBy(col("user_id"), col("event_type")).count()
      .filter(col("count") > 1).count()
    assert(emitted == 0L, "a (user, type) key was emitted more than once")
    val batch = ExtensionQueries77.q323_dedup_within_watermark(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
    // the streaming plan passes the state gate (watermarked stateful op)
    val vs = graft.plans.PlanGate.auditStream("s_dedup_wm",
      graft.streaming.StreamOps.dedupWithinWatermarkStream(stream, "30 minutes"))
    assert(vs.isEmpty, vs.mkString("; "))
  }

  test("q324: lateral top-k equals the window-function twin") {
    val cust = graft.core.Tables.customer(spark, dir)
      .select(col("c_nationkey"), col("c_name"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
    val nation = graft.core.Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_regionkey"))
    val region = graft.core.Tables.region(spark, dir)
      .select(col("r_regionkey"), col("r_name"))
    val wN = org.apache.spark.sql.expressions.Window
      .partitionBy(col("n_nationkey"))
      .orderBy(col("bal_cents").desc, col("c_name"))
    val perNation = cust.join(nation, col("c_nationkey") === col("n_nationkey"))
      .withColumn("rn", row_number().over(wN)).filter(col("rn") <= 3)
    val wR = org.apache.spark.sql.expressions.Window
      .partitionBy(col("r_name"))
      .orderBy(col("bal_cents").desc, col("c_name"))
    val twin = perNation.join(region, col("n_regionkey") === col("r_regionkey"))
      .withColumn("rnk", row_number().over(wR).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("r_name"), col("rnk"), col("c_name"), col("bal_cents"))
      .orderBy(col("r_name"), col("rnk"))
      .collect().toSeq
    val lateral = ExtensionQueries77.q324_lateral_topk(spark, dir).collect().toSeq
    assert(lateral == twin)
    assert(lateral.nonEmpty)
  }

  test("q325: IDENTIFIER parameter binds (and a different column changes the result)") {
    val bySource = ExtensionQueries77.q325_identifier_param(spark, dir)
      .collect().map(_.getString(0)).toSet
    val srcVals = graft.core.Tables.documents(spark, dir)
      .select(col("source")).distinct().collect().map(_.getString(0)).toSet
    assert(bySource == srcVals)
    val byLang = spark.sql(
      s"""SELECT IDENTIFIER(:gcol) AS grp, count(*) AS n_docs
         |FROM parquet.`$dir/documents.parquet`
         |GROUP BY IDENTIFIER(:gcol) ORDER BY grp""".stripMargin,
      Map("gcol" -> "lang")).collect().map(_.getString(0)).toSet
    assert(byLang != bySource, "parameter must actually select the column")
  }
}
