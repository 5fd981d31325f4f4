package graft

import org.apache.spark.sql.functions._
import graft.plans.AsofJoinPhysical

/** The custom physical as-of join (tier (c), SparkPlan rung): semantics
  * pinned against hand data, row-for-row equivalence with the composed
  * union-and-fill operator on real events, and the plan itself audited —
  * the node must appear, and nothing may degrade to a nested-loop join.
  */
class AsofPhysicalSpec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  test("hand data: latest prior-or-equal wins, ties break to largest tie, unmatched is null") {
    import spark.implicits._
    val probes = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "pt", "tag")
    val refs = Seq(
      (1L, 100L, 10L, 1.0),  // equal timestamp → inclusive match for p1
      (1L, 100L, 11L, 2.0),  // same timestamp, larger tie id → wins
      (1L, 150L, 12L, 3.0),  // latest before p2
      (3L, 10L, 13L, 4.0))   // other key — never matches
      .toDF("rk", "rt", "rid", "payload")
    val out = AsofJoinPhysical.backward(probes, refs, "k", "rk", "pt", "rt", "rid")
      .select(col("tag"), col("rid"), col("payload"))
      .collect()
      .map(r => r.getString(0) -> ((Option(r.get(1)), Option(r.get(2)))))
      .toMap
    val got = out
    assert(got("p1") == ((Some(11L), Some(2.0))), s"tie → largest rid: $got")
    assert(got("p2") == ((Some(12L), Some(3.0))), s"latest prior: $got")
    assert(got("p3") == ((None, None)), s"no reference for key 2: $got")
  }

  test("physical == composed union-and-fill on real events (purchases ← latest prior view)") {
    val e = graft.core.Tables.events(spark, sfTiny)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("uid"), col("event_id").as("purchase_id"),
        expr("ts div 1000").as("pus"))
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        expr("ts div 1000").as("vus"))
    val phys = AsofJoinPhysical
      .backward(p, v, "uid", "v_user", "pus", "vus", "view_id")
      .select(col("purchase_id"), col("view_id"), col("vus"))
      .collect().map(_.toString).sorted
    // composed reference: ops.AsofJoin carries (vus, view_id)-latest struct;
    // same tie semantics via the (time, tag) union sort + max struct order
    val composed = graft.ops.AsofJoin.backward(
        p.withColumnRenamed("uid", "user_id"),
        v.withColumnRenamed("v_user", "user_id"),
        "user_id", "pus", "vus", Seq("view_id", "vus"))
      .select(col("purchase_id"), col("asof_view_id").as("view_id"),
        col("asof_vus").as("vus"))
      .collect().map(_.toString).sorted
    assert(phys.nonEmpty && phys.sameElements(composed),
      s"phys=${phys.length} composed=${composed.length}")
  }

  test("bucketed inputs elide BOTH exchanges (the shape the composed form can't reach)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_asof_bkt").toString
    (1L to 200L).map(k => (k % 10, k, s"p$k")).toDF("k", "pt", "tag")
      .write.mode("overwrite").option("path", s"$base/l")
      .bucketBy(8, "k").saveAsTable("graft_asof_bkt_l")
    (1L to 300L).map(k => (k % 10, k / 2, k)).toDF("rk", "rt", "rid")
      .write.mode("overwrite").option("path", s"$base/r")
      .bucketBy(8, "rk").saveAsTable("graft_asof_bkt_r")
    try {
      val df = AsofJoinPhysical.backward(
        spark.table("graft_asof_bkt_l"), spark.table("graft_asof_bkt_r"),
        "k", "rk", "pt", "rt", "rid")
      assert(df.count() == 200L)
      val plan = df.queryExecution.executedPlan.toString.toLowerCase
      assert(plan.contains("asofjoin"), plan)
      // EnsureRequirements sees both children already hash-clustered on
      // the key by the bucketed scan: no shuffle anywhere in the plan
      assert(!plan.contains("exchange"), plan)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_asof_bkt_l")
      spark.sql("DROP TABLE IF EXISTS graft_asof_bkt_r")
      // external tables: DROP leaves the parquet behind — remove the dir
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(base)
      val walk = java.nio.file.Files.walk(root)
      val paths = try walk.iterator().asScala.toSeq.reverse finally walk.close()
      paths.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("the plan contains AsofJoinExec and no nested-loop or cartesian join") {
    import spark.implicits._
    val p = Seq((1L, 10L)).toDF("k", "pt")
    val r = Seq((1L, 5L, 7L)).toDF("rk", "rt", "rid")
    val df = AsofJoinPhysical.backward(p, r, "k", "rk", "pt", "rt", "rid")
    df.collect() // force planning + execution (resolves the adaptive plan)
    val plan = df.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("asofjoin"), plan)
    assert(!plan.contains("nestedloop") && !plan.contains("cartesian"), plan)
  }

}
