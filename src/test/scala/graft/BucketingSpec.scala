package graft

import graft.sinks.Bucketing

/** Pins the bucketing contract [[graft.sinks.Bucketing]] exists to
  * provide: a join between two tables bucketed on the join key with equal
  * bucket counts runs WITHOUT a shuffle exchange, and a groupBy on the
  * bucket key reuses the bucketing as its distribution. Broadcast and AQE
  * are disabled inside the test so the assertion sees the genuine
  * exchange-free sort-merge plan, not a broadcast that would make the
  * check vacuous.
  */
class BucketingSpec extends SparkSpecBase {
  import spark.implicits._

  test("bucketed-by-key tables join and aggregate with zero shuffle exchanges") {
    val savedBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val facts = (1L to 10000L).map(i => (i % 64, i, (i % 97) * 1L)).toDF("k", "id", "v")
      val dim = (0L until 64L).map(i => (i, s"dim_$i")).toDF("k", "name")
      Bucketing.writeBucketed(facts, "b_facts", "k", 8)
      Bucketing.writeBucketed(dim, "b_dim", "k", 8)

      val j = Bucketing.bucketedJoin(spark, "b_facts", "b_dim", "k")
      val jPlan = j.queryExecution.executedPlan.toString
      assert(jPlan.contains("SortMergeJoin"), s"expected sort-merge join:\n$jPlan")
      assert(!jPlan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$jPlan")
      assert(j.count() == 10000L)

      val agg = spark.table("b_facts").groupBy("k").sum("v")
      val aPlan = agg.queryExecution.executedPlan.toString
      assert(!aPlan.contains("Exchange"),
        s"groupBy on the bucket key must reuse the bucketing:\n$aPlan")
      assert(agg.count() == 64L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
      spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dim")
    }
  }
}
