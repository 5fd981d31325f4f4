package graft

import org.apache.spark.sql.functions._

import graft.queries.{ExtensionQueries11, ExtensionQueries136}

/** Adversarial plant for the overlap-join hot-token hybrid (round-17
  * verdict task #1 — the AhashBandCapAdversarialSpec discipline applied
  * to q497/q498).
  *
  * q497 restricts candidate generation to cold posting lists
  * (length ≤ [[ExtensionQueries136.HybridHotCap]]); its recall contract
  * says a qualifying pair is missed exactly when its rarest shared
  * element is hot — which forces the ENTIRE intersection hot and both
  * endpoints into q498's `n_docs_at_risk`. On the shipped corpora the
  * cap never binds, so recall has only ever read perfect; this spec
  * engineers the blind spot deterministically and pins that the
  * pipeline REPORTS the loss instead of silently claiming full recall.
  *
  * Corpus (through the REAL registered-query path — a temp
  * documents.parquet scanned by q116/q497/q498 themselves):
  *  - X and Y: identical 22-token texts → 20 shared 3-shingles, the
  *    planted containment pair at exactly q116's o=20 floor;
  *  - per shingle i, cap+1 chaff docs "w_i w_{i+1} w_{i+2} u v" (u, v
  *    globally unique): every planted shingle's posting list reaches
  *    cap+3 > cap (hot), chaff shingle-sets have size 3 < o (never in
  *    any qualifying pair), and any two chaff docs share at most the
  *    one planted shingle.
  *
  * Pinned:
  *  1. ground truth: exact q116 finds exactly (X, Y) at inter = 20;
  *  2. the blind spot is real: q497 returns NOTHING — every shared
  *     element is hot, so the cold join never generates the pair;
  *  3. q498 reports it: n_hot_tokens = 20, hot_pair_mass =
  *     20·C(cap+3, 2), n_docs_at_risk = 2 (X and Y alone — chaff carry
  *     one hot shingle each), max_missed_pairs = 1, and
  *     cand_pair_mass = 0 — the empty q497 answer reads as
  *     "uncertified under nonzero risk mass", never as full recall;
  *  4. control (chaff removed): every shingle cold, q497 recovers
  *     (X, Y) bit-identically to q116, and q498 certifies it —
  *     n_docs_at_risk = 0 < 2, the hybrid ≡ exact condition.
  */
class OverlapHybridAdversarialSpec extends SparkSpecBase {

  private val O = 20
  private val Cap = ExtensionQueries136.HybridHotCap.toInt
  private val ChaffPerShingle = Cap + 1
  private val HotFreq = ChaffPerShingle + 2 // chaff + X + Y

  private val plantedText = (0 until O + 2).map(i => s"w$i").mkString(" ")

  private def docRow(id: Long, text: String): (Long, String, String, String, Long) =
    (id, text, "en", "plant", text.length.toLong)

  private val pairRows = Seq(docRow(0L, plantedText), docRow(1L, plantedText))

  private val chaffRows = (0 until O).flatMap { i =>
    (0 until ChaffPerShingle).map { j =>
      val k = i * ChaffPerShingle + j
      docRow(2L + k, s"w$i w${i + 1} w${i + 2} u$k v$k")
    }
  }

  private def writeDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_overlap_adv").toString
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("all-hot-intersection planted pair: q116 finds it, q497 misses it, q498 reports it") {
    val dir = writeDocs(pairRows ++ chaffRows)

    // (1) ground truth through the exact join: the planted pair alone,
    // full containment both ways
    val exact = ExtensionQueries11.q116_overlap_join(spark, dir).collect()
    assert(exact.length == 1, s"exact q116 must find exactly the plant: ${exact.toSeq}")
    val e = exact.head
    assert(e.getAs[Long]("id_a") == 0L && e.getAs[Long]("id_b") == 1L &&
      e.getAs[Long]("inter") == O.toLong && e.getAs[Long]("cont_a_ppm") == 1000000L)

    // (2) the blind spot is real: every shared element is hot, the cold
    // join generates no candidate, the hybrid returns nothing
    val hybrid = ExtensionQueries136.q497_overlap_hybrid(spark, dir).collect()
    assert(hybrid.isEmpty,
      s"q497 unexpectedly recovered the all-hot planted pair: ${hybrid.toSeq}")

    // (3) ...and the certificate SEES the loss
    val cert = ExtensionQueries136.q498_overlap_hybrid_cert(spark, dir).collect()
    assert(cert.length == 1)
    val c = cert.head
    assert(c.getAs[Long]("n_hot_tokens") == O.toLong,
      s"expected the $O planted shingles hot, got ${c.getAs[Long]("n_hot_tokens")}")
    val hotMass = O.toLong * (HotFreq.toLong * (HotFreq - 1) / 2)
    assert(c.getAs[Long]("hot_pair_mass") == hotMass)
    // cold mass is zero: every cold shingle is a chaff doc's unique
    // bridge (freq 1 ⇒ C(1,2) = 0) — the planted mass is ALL hot
    assert(c.getAs[Long]("pair_mass") == c.getAs[Long]("hot_pair_mass"),
      "cold pair mass must be zero (all cold shingles unique)")
    assert(c.getAs[Long]("cand_pair_mass") == 0L,
      "no cold prefix posting list may carry more than one set")
    assert(c.getAs[Long]("n_docs_at_risk") == 2L,
      "exactly X and Y carry >= o hot shingles")
    assert(c.getAs[Long]("max_missed_pairs") == 1L)

    // (4) control: chaff removed — every shingle cold (freq 2), the
    // hybrid recovers the pair bit-identically to the exact join and
    // the certificate reads hybrid ≡ exact (at_risk < 2)
    val controlDir = writeDocs(pairRows)
    val ctlExact = ExtensionQueries11.q116_overlap_join(spark, controlDir).collect()
    val ctlHybrid = ExtensionQueries136.q497_overlap_hybrid(spark, controlDir).collect()
    assert(ctlHybrid.length == 1 && ctlHybrid.head.getAs[Long]("id_a") == 0L &&
      ctlHybrid.head.getAs[Long]("id_b") == 1L &&
      ctlHybrid.head.getAs[Long]("inter") == O.toLong,
      s"control corpus must recover the planted pair: ${ctlHybrid.toSeq}")
    assert(ctlExact.map(_.toString).toSeq == ctlHybrid.map(_.toString).toSeq,
      "hybrid must equal the exact join when nothing is hot")
    val ctlCert = ExtensionQueries136.q498_overlap_hybrid_cert(spark, controlDir)
      .collect().head
    assert(ctlCert.getAs[Long]("n_hot_tokens") == 0L &&
      ctlCert.getAs[Long]("n_docs_at_risk") == 0L &&
      ctlCert.getAs[Long]("max_missed_pairs") == 0L,
      "control certificate must certify hybrid ≡ exact")
  }
}
