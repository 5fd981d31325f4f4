package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries111

/** Semantics pins for q419-q422 (patch budgeting, GMD, robust shape,
  * Cliff's delta).
  */
class ExtensionQueries111Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q419: every image fits the 256-token budget at the shallowest possible level") {
    val got = ExtensionQueries111.q419_patch_grid(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.nonEmpty)
    def patches(w: Long, h: Long, l: Long): Long = {
      val wl = (w + (1L << l) - 1) / (1L << l)
      val hl = (h + (1L << l) - 1) / (1L << l)
      ((wl + 15) / 16) * ((hl + 15) / 16)
    }
    for ((id, w, h, lvl, tokens, waste) <- got) {
      assert(id % 3 == 0, s"media $id is not an image")
      assert(tokens == patches(w, h, lvl) && tokens <= 256)
      // shallowest: one level up must bust the budget (unless native fits)
      if (lvl > 0) assert(patches(w, h, lvl - 1) > 256, s"media $id over-shrunk")
      assert(waste >= 0 && waste < 1000000)
    }
    // stub geometry is bounded by 640x480 ⇒ level 2 always suffices
    assert(got.forall(_._4 <= 2))
  }

  test("q420: GMD equals the O(n²) definition computed directly") {
    val vs = graft.core.Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100").as("v"))
      .collect().map(_.getLong(1))
    val n = vs.length.toLong
    val s = (for (i <- vs.indices; j <- vs.indices if i < j)
      yield BigInt(math.abs(vs(i) - vs(j)))).sum
    val sv = vs.sum
    val row = ExtensionQueries111.q420_gini_mean_difference(spark, dir).collect().head
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == (2 * s * 1000 / (BigInt(n) * (n - 1))).toLong)
    assert(row.getLong(2) == (2 * s * 1000000 / (BigInt(n - 1) * sv)).toLong)
  }

  test("q421: robust shape equals the discrete-quartile model per segment") {
    val spend = graft.core.Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100").as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val seg = graft.core.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val bySeg = spend.map { case (ck, v) => seg(ck) -> v }.groupBy(_._1)
      .map { case (k, xs) => k -> xs.map(_._2).toSeq }
    def disc(vs: Seq[Long], q: Double): Long = {
      val s = vs.sorted; s(math.ceil(q * s.size).toInt - 1)
    }
    val got = ExtensionQueries111.q421_robust_shape(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    for ((sg, vs) <- bySeg) {
      val (q1, q2, q3) = (disc(vs, 0.25), disc(vs, 0.5), disc(vs, 0.75))
      val mad = disc(vs.map(v => math.abs(v - q2)), 0.5)
      val (n, g1, g2, g3, gmad, bowley, qcd) = got(sg)
      assert(n == vs.size.toLong)
      assert((g1, g2, g3, gmad) == ((q1, q2, q3, mad)))
      assert(bowley == (if (q3 == q1) 0L else (q3 + q1 - 2 * q2) * 1000000 / (q3 - q1)))
      assert(qcd == (q3 - q1) * 1000000 / (q3 + q1))
    }
  }

  test("q422: delta equals the direct pairwise count; AUC identity holds under midranks") {
    val spend = graft.core.Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100").as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val seg = graft.core.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (t, c) = spend.partition { case (ck, _) => seg(ck) == "BUILDING" }
    val (xs, ys) = (t.map(_._2), c.map(_._2))
    val gt = (for (x <- xs; y <- ys) yield if (x > y) 1L else 0L).sum
    val lt = (for (x <- xs; y <- ys) yield if (x < y) 1L else 0L).sum
    val mn = xs.length.toLong * ys.length
    val expected = (gt - lt) * 1000000 / mn // exact: numerator is integral
    val row = ExtensionQueries111.q422_cliffs_delta(spark, dir).collect().head
    assert(row.getLong(0) == xs.length.toLong && row.getLong(1) == ys.length.toLong)
    assert(row.getLong(2) == expected, s"delta ${row.getLong(2)} != $expected")
  }
}
