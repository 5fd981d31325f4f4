package graft

import org.apache.spark.sql.functions._
import graft.queries.ExtensionQueries5

/** Semantics pinned for the round-4 widening batch (q74-q80): graph
  * ranking, blocked linkage, SCD-2 versioning, gap-fill/LOCF, the
  * bloom-prefiltered semi join, winsorized stats, and co-purchase lift.
  * The DuckDB hash-match covers value equality; these tests pin the
  * properties a refactor could silently break while staying hash-green on
  * one dataset (mass conservation, version invariants, fill correctness,
  * bloom-vs-exact equivalence).
  */
class ExtensionQueries5Spec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("q74: isolated parts keep exactly teleport mass; totals bounded by injected mass") {
    val rows = ExtensionQueries5.q74_pagerank(spark, sf).collect()
    assert(rows.nonEmpty)
    // sf0.001 is dense enough that every part co-occurs; when isolated
    // parts do exist (larger sf), they must hold exactly teleport mass
    val isolated = rows.filter(_.getLong(1) == 0L)
    isolated.foreach(r => assert(r.getLong(2) == 150000000000L,
      s"isolated part ${r.getLong(0)} must hold teleport-only mass"))
    val total = rows.map(_.getLong(2)).sum
    // damping + dangling leakage only ever removes mass; teleport re-injects
    // exactly 0.15e12 per node per iteration — total can never exceed init
    assert(total <= rows.length * 1000000000000L)
    assert(rows.forall(_.getLong(2) >= 150000000000L))
  }

  test("q75: pairs stay within their block, under the distance cap, ordered") {
    val rows = ExtensionQueries5.q75_fuzzy_join(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b, "pair not canonically ordered")
      assert(a.split(" ").last == b.split(" ").last, "pair crosses a block")
      assert(r.getInt(2) <= 4 && r.getInt(2) >= 1)
    }
  }

  test("q75: giant-block banding bounds candidates and preserves the pair set exactly") {
    import spark.implicits._
    // skewed fixture: 300 names ALL sharing one last token — the naive
    // block is a single O(n²) candidate task (the round-4 "watch" item)
    val names = spark.range(300).select(
        concat(lit("name"), lpad(col("id").cast("string"), 3, "0"),
          lit(" "), repeat(lit("x"), (col("id") % 40).cast("int") + 1),
          lit(" tok")).as("p_name"),
        lit(1L).as("n_parts"))
      .withColumn("block", element_at(split(col("p_name"), " "), -1))
    def pairs(cap: Int) =
      ExtensionQueries5.blockedCandidates(names, cap, bandWidth = 8)
        .select(col("a.p_name"), col("b.p_name"))
        .withColumn("d", levenshtein(col("a.p_name"), col("b.p_name")))
        .filter(col("d") <= 4)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val banded = pairs(6)
    val naive = pairs(Int.MaxValue)
    assert(banded == naive,
      "banding must be result-preserving (band width > edit threshold)")
    assert(naive.nonEmpty, "fixture should contain near-matching names")
    // the physical bound: no (block, band) candidate group may approach
    // the naive n²/2 single task
    val groups = ExtensionQueries5.blockedCandidates(names, 6, bandWidth = 8)
      .groupBy(col("a.block"), col("a.band")).count()
      .collect().map(_.getAs[Long]("count"))
    assert(groups.length > 3, s"banding produced only ${groups.length} groups")
    assert(groups.max < 300L * 299 / 8,
      s"worst candidate group ${groups.max} is still near-quadratic")
  }

  test("q76: changed customers carry a closed old version + open VIP version; others one open row") {
    val rows = ExtensionQueries5.q76_scd2(spark, sf).collect()
    val byCust = rows.groupBy(_.getLong(0))
    assert(byCust.nonEmpty)
    var changed = 0
    byCust.foreach { case (ck, vs) =>
      vs.length match {
        case 1 =>
          assert(vs.head.getInt(4) == 1 && vs.head.isNullAt(3),
            s"unchanged customer $ck must have one open row")
        case 2 =>
          changed += 1
          val Array(old, nw) = vs.sortBy(_.getDate(2).toString)
          assert(old.getInt(4) == 0 && !old.isNullAt(3), s"$ck old version not closed")
          assert(nw.getInt(4) == 1 && nw.isNullAt(3) && nw.getString(1) == "VIP",
            s"$ck new version must be the open VIP row")
        case n => fail(s"customer $ck has $n versions")
      }
    }
    assert(changed > 0, "fixture should promote some customers")
    // exactly one current row per customer — the SCD-2 core invariant
    assert(rows.count(_.getInt(4) == 1) == byCust.size)
  }

  test("q77: gaps are materialized and LOCF-filled from the last observed day") {
    val rows = ExtensionQueries5.q77_gapfill(spark, sf)
      .orderBy(col("user_id"), col("day_idx")).collect()
    assert(rows.exists(_.getInt(5) == 1), "fixture should contain gap days")
    var lastSeen: Map[Long, Long] = Map.empty
    rows.foreach { r =>
      val u = r.getLong(0)
      if (r.getInt(5) == 0) {
        assert(r.getLong(4) == r.getLong(3), "observed day must carry its own cents")
        lastSeen += u -> r.getLong(3)
      } else {
        assert(r.isNullAt(3), "gap day must have null raw cents")
        assert(lastSeen.contains(u), "per-user series must start on an observed day")
        assert(r.getLong(4) == lastSeen(u), "gap must carry the last observed value")
      }
    }
  }

  test("q78: bloom-prefiltered semi join is byte-identical to the exact semi join") {
    val got = ExtensionQueries5.q78_bloom_semijoin(spark, sf).collect()
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val hi = spark.read.parquet(s"$sf/orders.parquet")
      .filter(round(col("o_totalprice") * 100).cast("long") > 40000000L)
      .select(col("o_orderkey"))
    val want = li.join(hi, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("price_cents"))
      .withColumn("revenue", col("price_cents") / lit(100.0))
      .orderBy(col("l_returnflag")).collect()
    assert(got.map(_.toSeq).toSeq == want.map(_.toSeq).toSeq,
      "false positives must not survive the exact join")
  }

  test("q78: plan pre-filters the probe scan with the bloom probe, then broadcast-semi-joins") {
    val p = SparkEntry.queries("q78_bloom_semijoin")(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("graft_bloom_might_contain"), "bloom probe missing from plan")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "exact join must be a broadcast left-semi")
  }

  test("q79: winsorized tails and sum stay inside the percentile envelope") {
    val rows = ExtensionQueries5.q79_winsorize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1)
      val (p05, p95) = (r.getDouble(2), r.getDouble(3))
      assert(r.getLong(4) <= math.ceil(n * 0.05).toLong, "n_below exceeds the 5% tail")
      assert(r.getLong(5) <= math.ceil(n * 0.05).toLong, "n_above exceeds the 5% tail")
      val win = r.getLong(6)
      assert(win >= n * math.floor(p05 * 100).toLong && win <= n * math.ceil(p95 * 100).toLong)
      assert(r.getLong(7) == win / n, "mean must be the exact floor ratio")
    }
  }

  test("q80: supported pairs only, canonical order, recount spot-check") {
    val df = ExtensionQueries5.q80_copurchase(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty, "fixture should contain repeat co-purchases")
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) >= 2L)
    }
    // recount one pair straight off the fact table
    val r0 = rows.head
    val lp = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val n = lp.filter(col("l_partkey") === r0.getLong(0))
      .join(lp.filter(col("l_partkey") === r0.getLong(1)), Seq("l_orderkey"))
      .count()
    assert(n == r0.getLong(2), "pair support must match a direct recount")
  }
}
