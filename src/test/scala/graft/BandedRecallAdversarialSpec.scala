package graft

import org.apache.spark.sql.functions._

import graft.queries.{ExtensionQueries106, ExtensionQueries89}

/** Adversarial recall property for the banded edit-distance dedup
  * (round-14 verdict task #3).
  *
  * q358b/q358c's recall_ppm has only ever read 1,000,000 because the
  * CORPUS's near-dups are near-identical prefixes (shingle Jaccard
  * ≥ ~0.66 ⇒ some 2-wide band agrees). That is a corpus fact, not a
  * property of the 4×2 band geometry. This spec plants pairs AT the
  * boundary: still exact q358 pairs (same lang / length band / first
  * token, prefix edit distance ≤ 20 — achieved as s interior 3-char
  * token substitutions, ed = 3s ≤ 18) but with s chosen to push the
  * prefix 3-shingle Jaccard from 1.0 down to ~0.04, far below the
  * band-collision floor (P[band agrees] ≈ J², any-of-4 ≈ 4J²).
  *
  * Pinned here:
  *  1. every planted pair IS an exact q358 pair (the adversary stays
  *     inside the contract);
  *  2. banded pairs remain a SUBSET of exact pairs (precision 1.0 by
  *     construction — banding can only lose, never invent);
  *  3. identical-prefix pairs (J = 1) are ALWAYS recovered;
  *  4. the q358c certificate CATCHES the planted loss: recall_ppm on
  *     this corpus reads < 1,000,000 and equals the subset-join count —
  *     i.e. the certificate works when it matters, it doesn't just
  *     echo 10⁶;
  *  5. the measured recall envelope vs Jaccard is monotone across the
  *     planted tiers (high-J tiers recover at least what low-J tiers
  *     do) — the table PLANS.md records.
  *
  * Geometry note (ExtensionQueries106.scala): 8 minhash components,
  * 4 bands × width 2. For a pair with shingle Jaccard J each component
  * agrees w.p. ≈ J, a band w.p. ≈ J², some band w.p. 1−(1−J²)⁴. The
  * planted tiers bracket that curve; everything below J ≈ 0.4 is
  * expected (and measured) to leak.
  */
class BandedRecallAdversarialSpec extends SparkSpecBase {

  /** deterministic 3-char token, no spaces */
  private def tok(seed: Int): String = {
    val h = (seed * 2654435761L & 0x7fffffffL).toInt
    s"${('a' + h % 26).toChar}${('a' + (h / 26) % 26).toChar}${('a' + (h / 676) % 26).toChar}"
  }

  /** interior positions substituted per tier (token 0 is the block key,
    * token 14 stays so the prefix length is identical) */
  private val tiers: Seq[(Int, Seq[Int])] = Seq(
    0 -> Seq(),
    1 -> Seq(7),
    2 -> Seq(4, 9),
    3 -> Seq(3, 7, 11),
    4 -> Seq(2, 6, 9, 12),
    6 -> Seq(2, 4, 6, 8, 10, 12))

  private val PairsPerTier = 10

  /** planted docs: (doc_id, text, lang, source, n_chars); pair (2k, 2k+1) */
  private lazy val planted: Seq[(Long, String, String, String, Long)] = {
    var id = 0L
    tiers.zipWithIndex.flatMap { case ((s, subs), t) =>
      (0 until PairsPerTier).flatMap { i =>
        val baseSeed = (t * 1000 + i) * 100
        val aToks = (0 until 15).map(p => tok(baseSeed + p))
        val bToks = (0 until 15).map(p =>
          if (subs.contains(p)) tok(baseSeed + p + 50) else aToks(p))
        def text(ts: Seq[String]) = ts.mkString(" ") + " " + "z" * 90 // 59+1+90 = 150 chars
        val (ta, tb) = (text(aToks), text(bToks))
        val a = (id, ta, "en", "plant", ta.length.toLong)
        val b = (id + 1, tb, "en", "plant", tb.length.toLong)
        id += 2
        Seq(a, b)
      }
    }
  }

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_band_adv").toString
    val df = spark.createDataFrame(planted)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    df.coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  /** prefix 3-shingle Jaccard, mirroring bandedPrefix/candSql exactly:
    * prefix = first 60 chars, tokens split on " " KEEPING trailing
    * empties (Spark split limit -1 == DuckDB string_split), shingles =
    * 3-token windows joined by " ". */
  private def shingles(text: String): Set[String] = {
    val p = text.take(60)
    val ts = p.split(" ", -1).toSeq
    (0 to ts.length - 3).map(i => ts.slice(i, i + 3).mkString(" ")).toSet
  }

  private def jaccard(a: String, b: String): Double = {
    val (sa, sb) = (shingles(a), shingles(b))
    sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  test("planted boundary pairs: certificate catches the banding loss; envelope is monotone") {
    val exact = ExtensionQueries89.q358_edit_distance_dedup(spark, dir)
      .select(col("doc_a"), col("doc_b"), col("edit_dist")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val banded = ExtensionQueries106.q358b_banded_edit_dedup(spark, dir)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // (1) every planted pair is an exact pair with ed = 3s
    val byTier = tiers.zipWithIndex.map { case ((s, _), t) =>
      val pairs = (0 until PairsPerTier).map { i =>
        val base = (t * PairsPerTier + i) * 2L
        (base, base + 1L)
      }
      (s, pairs)
    }
    val nPlanted = byTier.map(_._2.size).sum
    byTier.foreach { case (s, pairs) =>
      pairs.foreach { p =>
        assert(exact.contains(p), s"planted pair $p (tier s=$s) not an exact q358 pair")
        assert(exact(p) == 3L * s, s"pair $p ed ${exact(p)} != ${3 * s}")
      }
    }
    assert(exact.size == nPlanted, s"unexpected extra exact pairs: ${exact.size} != $nPlanted")

    // (2) banding never invents pairs
    assert(banded.subsetOf(exact.keySet),
      s"banded pairs outside exact set: ${banded.diff(exact.keySet)}")

    // (3)+(5) per-tier recall envelope; J=1 tier must be perfect; envelope monotone in J
    val texts = planted.map(d => d._1 -> d._2).toMap
    val envelope = byTier.map { case (s, pairs) =>
      val rec = pairs.count(banded)
      val js = pairs.map { case (a, b) => jaccard(texts(a), texts(b)) }
      (s, pairs.size, 3 * s, js.sum / js.size, rec)
    }
    info("tier  n  edit_dist  jaccard_mean  recovered   (PLANS.md recall envelope)")
    envelope.foreach { case (s, n, ed, j, rec) =>
      info(f"s=$s%-3d $n%2d   $ed%2d        $j%.3f         $rec%2d/$n")
    }
    val perfectTier = envelope.find(_._1 == 0).get
    assert(perfectTier._5 == PairsPerTier, "identical-prefix pairs must always band-collide")
    // monotone: sorted by descending Jaccard, recovered counts never increase
    val recByJ = envelope.sortBy(-_._4).map(_._5)
    assert(recByJ.zip(recByJ.tail).forall { case (hi, lo) => hi >= lo },
      s"recall envelope not monotone in Jaccard: $recByJ")
    // the boundary tiers genuinely leak (J ~ 0.04 sits far below the
    // 4-band collision floor) — this is what makes the corpus adversarial
    assert(envelope.last._5 < PairsPerTier, "lowest-J tier unexpectedly fully recovered")

    // (4) the certificate CATCHES the loss — and reports it exactly
    val cert = ExtensionQueries106.q358c_banded_recall_cert(spark, dir).collect().head
    val (nExact, nRecovered, recallPpm) =
      (cert.getAs[Long]("n_exact"), cert.getAs[Long]("n_recovered"),
        cert.getAs[Long]("recall_ppm"))
    assert(nExact == nPlanted.toLong)
    assert(nRecovered == banded.size.toLong)
    assert(recallPpm == nRecovered * 1000000L / nExact)
    assert(recallPpm < 1000000L,
      "certificate failed to catch a planted recall loss — it would read 10^6 on a leaking corpus")
  }
}
