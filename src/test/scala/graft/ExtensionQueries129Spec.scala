package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries129

/** Driver-model pins for q476-q479 (Brier decomposition, Spearman rho,
  * dup locality, SRM): recomputed from collected sf0.001 rows in plain
  * Scala + BigInt with the same binning, midrank, bucket, and hash
  * conventions.
  */
class ExtensionQueries129Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private val funcWords = Set("the", "of", "and", "to", "in", "a", "is", "that", "it", "for")

  test("q476: Brier terms equal the brute Murphy decomposition") {
    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang")).collect()
      .map { r =>
        val ts = r.getString(1).split(" ", -1)
        (r.getLong(0), ts.count(funcWords).toLong * 1000000L / ts.length,
          r.getString(2) == "en")
      }
    val n = docs.length.toLong
    val a = docs.count(_._3).toLong
    val base = a * 1000000L / n
    val sq = docs.map { d =>
      val e = d._2 - (if (d._3) 1000000L else 0L); BigInt(e) * e
    }.sum
    val bins = docs.sortBy(d => (d._2, d._1)).zipWithIndex
      .map { case ((_, sc, pos), i) => ((i.toLong * 10) / n, sc, pos) }
      .groupBy(_._1).values.map { xs =>
        val nb = xs.length.toLong
        val conf = xs.map(_._2).sum / nb
        val acc = xs.count(_._3).toLong * 1000000L / nb
        (nb, conf, acc)
      }.toSeq
    val rel = bins.map { case (nb, c, ac) => BigInt(nb) * (c - ac) * (c - ac) }.sum
    val res = bins.map { case (nb, _, ac) => BigInt(nb) * (ac - base) * (ac - base) }.sum
    val brier = (sq / (BigInt(n) * 1000000)).toLong
    val relP = (rel / (BigInt(n) * 1000000)).toLong
    val resP = (res / (BigInt(n) * 1000000)).toLong
    val unc = base * (1000000L - base) / 1000000L
    val g = ExtensionQueries129.q476_brier_decomposition(spark, dir).collect().head
    assert((g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3), g.getLong(4),
      g.getLong(5), g.getLong(6)) ==
      ((n, base, brier, relP, resP, unc, brier - (relP - resP + unc))))
    // the identity holds up to binning/truncation slack only
    assert(math.abs(g.getLong(6)) < 20000L)
  }

  test("q477: signed rho^2 equals the brute midrank Pearson model") {
    val cust = graft.core.Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT))").as("spend"),
        count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    def mid2(vs: Seq[Long]): Map[Long, Long] = {
      val cnts = vs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      cnts.map { case (v, eq) =>
        val less = vs.count(_ < v).toLong
        v -> (2 * less + eq + 1)
      }
    }
    val mx = mid2(cust.map(_._1))
    val my = mid2(cust.map(_._2))
    val np1 = cust.length.toLong + 1
    val rs = cust.map(c => (mx(c._1) - np1, my(c._2) - np1))
    val sxy = rs.map(p => BigInt(p._1) * p._2).sum
    val sxx = rs.map(p => BigInt(p._1) * p._1).sum
    val syy = rs.map(p => BigInt(p._2) * p._2).sum
    val rho2 = (sxy.sign * ((sxy * 1000000 / sxx) * sxy / syy)).toLong
    val g = ExtensionQueries129.q477_spearman_rho(spark, dir).collect().head
    assert((g.getLong(0), g.getLong(1), g.getLong(2)) ==
      ((rs.length.toLong, sxy.toLong, rho2)))
    // spend and order count must be strongly positively rank-associated
    assert(rho2 > 500000L)
  }

  test("q478: locality buckets equal the brute pair-distance model") {
    // round-16 semantics: exact STRING shingles (the PPJoin generator)
    def shingles(text: String): Set[String] = {
      val ts = text.split(" ", -1)
      if (ts.length < 3) Set.empty
      else ts.toSeq.sliding(3).map(_.mkString(" ")).toSet
    }
    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), shingles(r.getString(1)))).filter(_._2.nonEmpty)
    val ds = for {
      i <- docs.indices; j <- (i + 1) until docs.length
      inter = docs(i)._2.intersect(docs(j)._2).size.toLong
      if inter > 0 &&
        inter * 1000000L / (docs(i)._2.size + docs(j)._2.size - inter) >= 500000L
    } yield math.abs(docs(j)._1 - docs(i)._1)
    val tot = ds.length.toLong
    val expected = ds.groupBy(d => java.lang.Long.toBinaryString(d).length.toLong)
      .toSeq.sortBy(_._1).map { case (b, xs) =>
        (b, xs.length.toLong, xs.min, xs.max, xs.length.toLong * 1000000L / tot)
      }
    val got = ExtensionQueries129.q478_dup_locality(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    assert(tot > 0L)
  }

  test("q479: SRM counts and flag equal the brute assignment model") {
    val users = graft.core.Tables.events(spark, dir)
      .select(col("user_id")).distinct().collect().map(_.getLong(0))
    val arms = users.map(u => ((u * 69069L + 1) % 2147483648L) % 2)
    val na = arms.count(_ == 0L).toLong
    val nb = arms.count(_ == 1L).toLong
    val n = users.length.toLong
    val g = ExtensionQueries129.q479_srm_check(spark, dir).collect().head
    assert((g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3), g.getBoolean(4)) ==
      ((n, na, nb, (na - nb) * (na - nb) * 1000L / n,
        (na - nb) * (na - nb) > 9 * n)))
  }
}
