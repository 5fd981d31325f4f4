package graft

import org.apache.spark.sql.functions._
import graft.ops.Bfs
import graft.queries.ExtensionQueries19

/** Property pins for the round-9 seventh batch (cross-engine equality is
  * the DuckDB oracle's job — these assert operator SEMANTICS: BFS
  * minimality, substring-count identity, exact slope arithmetic, Morton
  * interleave + pruning soundness, lift support floors, snapshot
  * monotonicity).
  */
class ExtensionQueries19Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  // ------------------------------------------------------ q150 BFS

  test("q150: path graph — minimum hop distances, bounded depth, unreached excluded") {
    import spark.implicits._
    // undirected path 1-2-3-4-5-6, seed {1}, maxHops 3
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val out = Bfs.hops(edges, Seq(1L).toDF("id"), maxHops = 3)
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.toSeq == Seq(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L),
      s"5 and 6 are beyond the bound: ${out.mkString(";")}")
  }

  test("q150: a vertex reachable by two routes gets the SHORTER distance") {
    import spark.implicits._
    // 1→2→3→4 and shortcut 1→4: dist(4) must be 1, not 3
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("src", "dst")
    val d = Bfs.hops(edges, Seq(1L).toDF("id"), maxHops = 4)
      .filter(col("id") === 4L).collect().head.getLong(1)
    assert(d == 1L)
  }

  test("q150: multi-seed — distance is the min over seeds; seeds report 0") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (9L, 3L)).toDF("src", "dst")
    val out = Bfs.hops(edges, Seq(1L, 9L).toDF("id"), maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 9L -> 0L, 2L -> 1L, 3L -> 1L),
      s"3 is 1 hop from seed 9 (not 2 from seed 1): $out")
  }

  // ------------------------------------------------- q151 blocklist

  test("q151: delete-and-measure counts NON-OVERLAPPING occurrences exactly") {
    import spark.implicits._
    val hits = Seq(("abc abc xabcx", "abc"), ("aaaa", "aa"), ("zzz", "q"))
      .toDF("text", "p")
      .select(expr(
        "(length(text) - length(replace(text, p, ''))) div length(p)").as("h"))
      .collect().map(_.getLong(0)).toSeq
    // 'abc' thrice (incl. inside xabcx); 'aa' in 'aaaa' = 2 non-overlapping; 0
    assert(hits == Seq(3L, 2L, 0L))
  }

  test("q151: flagged docs never exceed source doc counts; hits cover flagged") {
    val out = ExtensionQueries19.q151_blocklist(spark, sfTiny).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val flagged = r.getAs[Long]("docs_flagged")
      val hits = r.getAs[Long]("total_hits")
      assert(hits >= flagged, s"each flagged doc has ≥1 hit: $r")
    }
  }

  // ----------------------------------------------- q152 trend slope

  test("q152: hand orders — exact rising slope; flat, short, and degenerate histories drop") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(d: String) = Timestamp.valueOf(s"$d 00:00:00")
    val rows = Seq(
      // cust 1: y = 100 + 10x over days 0,1,2 → slope 10 $/day = 10_000_000 micro
      (1L, t("2024-01-01"), 100.0), (1L, t("2024-01-02"), 110.0),
      (1L, t("2024-01-03"), 120.0),
      // cust 2: flat → slope 0
      (2L, t("2024-01-01"), 50.0), (2L, t("2024-01-02"), 50.0),
      (2L, t("2024-01-03"), 50.0),
      // cust 3: only 2 orders → excluded by n ≥ 3
      (3L, t("2024-01-01"), 10.0), (3L, t("2024-01-09"), 90.0),
      // cust 4: all same day → den = 0 → excluded
      (4L, t("2024-02-01"), 10.0), (4L, t("2024-02-01"), 20.0),
      (4L, t("2024-02-01"), 30.0))
    val df = rows.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("q152").toString
    df.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = ExtensionQueries19.q152_trend_slope(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(out == Seq((1L, 10000000L), (2L, 0L)),
      s"rising first, flat second, 3 and 4 excluded: $out")
  }

  // ------------------------------------------------ q153 z-order

  test("q153: Morton interleave — ux fills even bit positions, dy odd") {
    import spark.implicits._
    val z = Seq((63L, 0L), (0L, 63L), (63L, 63L), (5L, 3L))
      .toDF("ux", "dy")
      .select(((0 until 6).map { i =>
        shiftleft(shiftright(col("ux"), i).bitwiseAND(lit(1L)), 2 * i) +
          shiftleft(shiftright(col("dy"), i).bitwiseAND(lit(1L)), 2 * i + 1)
      }.reduceLeft(_ + _)).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // 0b010101010101 = 1365, 0b101010101010 = 2730, 4095,
    // ux=5(101),dy=3(011) → bits: z = 1·1 + 1·2 + 0·4 + 1·8 + 1·16 + 0·32 = 27
    assert(z == Seq(1365L, 2730L, 4095L, 27L))
  }

  test("q153: pruning is SOUND — every matched row is inside a scanned block") {
    // rows_matched must be identical across layouts (layout never changes
    // WHICH rows match) and blocks_scanned ≤ n_blocks.
    val out = ExtensionQueries19.q153_zorder_skip(spark, sfTiny)
      .orderBy("layout").collect()
    assert(out.length == 2)
    val Array(lin, zo) = out
    assert(lin.getAs[Long]("rows_matched") == zo.getAs[Long]("rows_matched"))
    Seq(lin, zo).foreach { r =>
      assert(r.getAs[Long]("blocks_scanned") <= r.getAs[Long]("n_blocks"))
    }
  }

  // --------------------------------------------- q154 keyword lift

  test("q154: support floor and exact ppm arithmetic hold on the real corpus") {
    val out = ExtensionQueries19.q154_keyword_lift(spark, sfTiny).collect()
    assert(out.nonEmpty && out.length <= 10)
    out.foreach { r =>
      val (dfEn, df) = (r.getAs[Long]("df_en"), r.getAs[Long]("df"))
      assert(dfEn >= 5L && df >= dfEn, s"support floor + df ⊇ df_en: $r")
    }
    // descending lift with token tie-break ⇒ already sorted
    val lifts = out.map(_.getAs[Long]("lift_ppm")).toSeq
    assert(lifts == lifts.sorted(Ordering[Long].reverse))
  }

  // --------------------------------------------- q155 time travel

  test("q155: user coverage grows monotonically across snapshots") {
    val out = ExtensionQueries19.q155_time_travel(spark, sfTiny).collect()
    val perK = out.groupBy(_.getAs[Long]("k"))
      .map { case (k, rs) => k -> rs.map(_.getAs[Long]("n_users")).sum }
    assert(perK.keySet == Set(1L, 2L, 3L))
    assert(perK(1L) <= perK(2L) && perK(2L) <= perK(3L),
      s"users only accumulate in an append-only log: $perK")
  }

  test("q155: snapshot-3 per-user state equals a directly computed as-of lookup") {
    val events = graft.core.Tables.events(spark, sfTiny)
    val Array(mn, mx) = events.agg(min("ts"), max("ts")).collect()
      .flatMap(r => Array(r.getLong(0), r.getLong(1)))
    val t3 = mn + ((mx - mn) * 3L) / 4L
    val expect = events.filter(col("ts") <= t3)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = ExtensionQueries19.q155_time_travel(spark, sfTiny)
      .filter(col("k") === 3L)
      .collect().map(r => r.getAs[String]("state") -> r.getAs[Long]("n_users")).toMap
    assert(got == expect)
  }
}
