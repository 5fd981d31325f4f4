package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries88

/** Semantics pins for the ranking-evaluation batch (q355-q357):
  * every metric recomputed independently driver-side from the raw
  * tables, plus signal-direction sanity bands.
  */
class ExtensionQueries88Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private lazy val vecs: Array[(Long, Int, Array[Double])] =
    graft.core.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))

  test("q355: metrics equal the driver-side ranking math; P@10 pins the null baseline") {
    val disc = Seq(1000000L, 630930L, 500000L, 430677L, 386853L, 356207L,
      333333L, 315465L, 301030L, 289065L)
    val discPrefix = disc.scanLeft(0L)(_ + _).tail
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val byId = vecs.map(v => v._1 -> v).toMap
    val labelCount = vecs.groupBy(_._2).map { case (l, vs) => l -> vs.length }
    val ref = vecs.filter(_._1 < 10).sortBy(_._1).map { case (pid, plbl, pv) =>
      val ranked = vecs.filter(_._1 != pid)
        .map { case (cid, clbl, cv) =>
          (cid, clbl, dot(pv, cv) / (math.sqrt(dot(pv, pv)) * math.sqrt(dot(cv, cv))))
        }
        .sortBy { case (cid, _, cos) => (-cos, cid) }
        .take(10)
      val rels = ranked.zipWithIndex.map { case ((_, clbl, _), i) =>
        (i + 1, if (clbl == plbl) 1L else 0L) }
      val nRelPool = labelCount(plbl) - 1L
      val dcg = rels.map { case (r, rel) => rel * disc(r - 1) }.sum
      val firstRel = rels.find(_._2 == 1L).map(_._1.toLong).getOrElse(0L)
      val idcg = discPrefix((math.max(math.min(nRelPool, 10L), 1L) - 1).toInt)
      (pid, plbl.toLong, nRelPool, rels.map(_._2).sum, firstRel,
        if (firstRel == 0) 0L else 1000000L / firstRel,
        dcg, idcg, dcg * 1000000L / idcg, rels.map(_._2).sum * 100000L)
    }
    val got = ExtensionQueries88.q355_ndcg_mrr(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getLong(9)))
    assert(got.toSeq == ref.toSeq)
    // this corpus's labels are independent of the embedding geometry, so
    // the metric must read AT the random baseline (P@10 ≈ pool/499 ≈ 10%)
    // — neither inflated (metric bug) nor zero (ranking bug)
    val meanP10ppm = got.map(_._10).sum / got.length
    assert(meanP10ppm > 30000L && meanP10ppm < 250000L,
      s"P@10 off the null baseline: $meanP10ppm ppm")
  }

  test("q356: pair identities hold and tau matches the driver recount") {
    val agg = graft.core.Tables.lineitem(spark, dir)
      .filter(col("l_partkey") <= 100)
      .groupBy(col("l_partkey"))
      .agg(sum(graft.core.FpSafe.cents(col("l_quantity"))).as("q"),
        sum(graft.core.FpSafe.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("r"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val pairs = for {
      i <- agg.indices; j <- agg.indices if i < j
    } yield (agg(i)._1 - agg(j)._1, agg(i)._2 - agg(j)._2)
    val c = pairs.count { case (dx, dy) => (dx > 0 && dy > 0) || (dx < 0 && dy < 0) }.toLong
    val d = pairs.count { case (dx, dy) => (dx > 0 && dy < 0) || (dx < 0 && dy > 0) }.toLong
    val tx = pairs.count(_._1 == 0L).toLong
    val ty = pairs.count(_._2 == 0L).toLong
    val tb = pairs.count(p => p._1 == 0L && p._2 == 0L).toLong
    val row = ExtensionQueries88.q356_kendall_tau(spark, dir).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4), row.getLong(5)) == (pairs.length.toLong, c, d, tx, ty, tb))
    // every pair is concordant, discordant, or tied in at least one metric
    assert(c + d + tx + ty - tb == pairs.length.toLong)
    val denom = math.sqrt(((pairs.length - tx) * (pairs.length - ty)).toDouble).floor.toLong
    assert(row.getLong(6) == (c - d) * 1000000L / denom)
    // quantity and revenue rank the same parts mostly the same way
    assert(row.getLong(6) > 0L, s"qty/revenue rankings anti-correlated: $row")
  }

  test("q357: silhouette equals the driver milli-geometry and reports the null labeling") {
    val milli = vecs.map { case (id, l, v) =>
      (id, l.toLong, v.map(x => math.round(x * 1000))) }
    val cents = milli.groupBy(_._2).map { case (l, vs) =>
      val dim = vs.head._3.length
      l -> Array.tabulate(dim) { d =>
        val s = vs.map(_._3(d)).sum
        s / vs.length // java integer division truncates toward zero, as div
      }
    }
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val perVec = milli.map { case (id, l, v) =>
      val a = d2(v, cents(l))
      val b = cents.filter(_._1 != l).values.map(d2(v, _)).min
      (l, (b - a) * 1000000L / math.max(a, b), if (b < a) 1L else 0L)
    }
    val ref = perVec.groupBy(_._1).map { case (l, ss) =>
      val sp = ss.map(_._2)
      l -> (ss.length.toLong, sp.sum / ss.length, sp.min, sp.max, ss.map(_._3).sum)
    }
    val got = ExtensionQueries88.q357_silhouette(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == ref)
    // labels are geometry-independent: simplified silhouette must sit
    // just BELOW zero (own centroid only wins by containing the point),
    // and well over half the points sit closer to a foreign centroid —
    // the metric correctly reports "this labeling is not a clustering"
    assert(got.values.forall(s => s._2 > -100000L && s._2 < 20000L),
      s"silhouette off the null band: $got")
    val mis = got.values.map(_._5).sum
    assert(mis * 10 > vecs.length * 3 && mis * 10 < vecs.length * 9,
      s"$mis of ${vecs.length} misassigned — off the null band")
  }
}
