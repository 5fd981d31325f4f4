package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Adversarial recall property for the STREAMING LSH admission path
  * (round-15 verdict task #7 — the q358b planting recipe applied to
  * [[graft.streaming.LshAdmit]]).
  *
  * q115's recall story so far is a corpus fact: the q99 fixture's
  * near-dups are truncation copies (token Jaccard ≈ 0.8+), which the
  * 16×4 MinHash banding essentially never loses. This spec plants pairs
  * AT the admission boundary instead: corpus doc A and streamed delta
  * doc B differ by s interior token substitutions out of 32, driving
  * the 3-token-shingle Jaccard down a ladder that brackets the
  * admission threshold (minEstJ = 0.4) and the banding collision floor
  * (P[some band of 4 agrees] = 1−(1−J⁴)¹⁶ — steep exactly around
  * J ≈ 0.4–0.6).
  *
  * Pinned:
  *  1. micro-batched admission ≡ one-shot batch admission on the
  *     adversarial corpus (the q115 equivalence holds under planted
  *     boundary pressure, not just on the friendly fixture);
  *  2. identical-signature pairs (s = 0) are ALWAYS dropped, with
  *     dup_of = the planted partner — the guarantee tier;
  *  3. the boundary tiers genuinely leak: some true near-dup
  *     (exact J ≥ minEstJ) streams through with keep = true;
  *  4. the admission-verdict AGGREGATION reports that miss: recall_ppm
  *     over true near-dups reads < 10⁶ and equals the per-pair count —
  *     the streaming certificate catches the loss instead of echoing
  *     10⁶ (the q358c property, now on the stream);
  *  5. the recall envelope is monotone in the planted Jaccard tiers.
  */
class StreamingLshAdversarialSpec extends SparkSpecBase {

  private val Bands = 16
  private val MinEstJ = 0.4
  private val PairsPerTier = 10
  private val NToks = 32

  /** interior positions substituted per tier; 3-shingle Jaccard for s
    * spread-out substitutions in 32 tokens ≈ (30−3s)/(30+3s):
    * 1.0, .67, .54, .43, .33, .18 */
  private val tiers: Seq[(Int, Seq[Int])] = Seq(
    0 -> Seq(),
    2 -> Seq(8, 20),
    3 -> Seq(6, 14, 24),
    4 -> Seq(5, 12, 19, 26),
    5 -> Seq(4, 10, 16, 22, 28),
    7 -> Seq(3, 7, 11, 15, 19, 23, 27))

  /** deterministic 3-char token, no spaces */
  private def tok(seed: Int): String = {
    val h = (seed * 2654435761L & 0x7fffffffL).toInt
    s"${('a' + h % 26).toChar}${('a' + (h / 26) % 26).toChar}${('a' + (h / 676) % 26).toChar}"
  }

  /** planted pairs: (pairIdx, tier s, corpus text, delta text) */
  private lazy val planted: Seq[(Int, Int, String, String)] =
    tiers.zipWithIndex.flatMap { case ((s, subs), t) =>
      (0 until PairsPerTier).map { i =>
        val idx = t * PairsPerTier + i
        val baseSeed = idx * 1000
        val aToks = (0 until NToks).map(p => tok(baseSeed + p))
        val bToks = (0 until NToks).map(p =>
          if (subs.contains(p)) tok(baseSeed + p + 101) else aToks(p))
        (idx, s, aToks.mkString(" "), bToks.mkString(" "))
      }
    }

  private def exactJ(a: String, b: String): Double = {
    def sh(t: String): Set[String] =
      t.split(" ").toSeq.sliding(3).map(_.mkString(" ")).toSet
    val (sa, sb) = (sh(a), sh(b))
    sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  test("planted boundary pairs stream through admission: stream == batch; " +
      "certificate catches the banding loss; envelope monotone") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext

    def sigs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
      .withColumn("hashes", Dedup.shingleHashes(col("text"), 3))
      .select(col("doc_id"), Dedup.minhashFromHashes(col("hashes"), 64).as("sig"))

    val corpusSigs = sigs(planted.map(p => (p._1.toLong, p._3)))
    val deltaRows = planted.map(p => (10000L + p._1, p._4))
    val deltaSigs = sigs(deltaRows)
      .withColumn("us", (col("doc_id") - 9999L) * 1000000L)
      .select(col("doc_id"), col("us"), col("sig"))

    // ---- stream the deltas in 3 micro-batches, id (= event) order
    val delta = deltaSigs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toArray))
      .sortBy(_._1)
    val batches = Seq(delta.take(delta.length / 3),
      delta.slice(delta.length / 3, 2 * delta.length / 3),
      delta.drop(2 * delta.length / 3))
    val sentinel = (9000000000L, 9000000000L * 1000000L,
      Array.tabulate(64)(i => 7919L * (i + 1)))
    val mem = MemoryStream[(Long, Long, Array[Long])]
    val stream = mem.toDF.toDF("doc_id", "us", "sig")
    val q = graft.streaming.LshAdmit
      .admitStream(stream, corpusSigs, bands = Bands, minEstJ = MinEstJ)
      .writeStream.format("memory").queryName("lsh_adv_out")
      .outputMode("append").start()
    try {
      for (b <- batches) { mem.addData(b.toSeq); q.processAllAvailable() }
      mem.addData(sentinel); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("lsh_adv_out")
      .filter(col("doc_id") < 9000000000L)
      .select(col("doc_id"), col("keep"), col("dup_of"))

    // ---- (1) equivalence with the one-shot batch run, planted corpus
    val streamedSet = streamed.collect().map(_.toSeq).toSet
    val oneShot = graft.streaming.LshAdmit
      .admitStream(deltaSigs, corpusSigs, bands = Bands, minEstJ = MinEstJ)
      .select(col("doc_id"), col("keep"), col("dup_of"))
      .collect().map(_.toSeq).toSet
    assert(streamedSet.nonEmpty && streamedSet == oneShot,
      "micro-batch admission must equal the one-shot batch run on the adversarial corpus")

    val verdicts = streamed.collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toMap
    assert(verdicts.size == planted.size, "every planted delta must get exactly one verdict")

    // ---- (2) the guarantee tier: identical signatures always dropped
    planted.filter(_._2 == 0).foreach { case (idx, _, _, _) =>
      val (keep, dupOf) = verdicts(10000L + idx)
      assert(!keep && dupOf == idx.toLong,
        s"identical pair $idx must be dropped against its planted partner, got keep=$keep dup_of=$dupOf")
    }

    // ---- (3)+(5) envelope: per tier, dropped count; monotone in mean J
    val envelope = tiers.zipWithIndex.map { case ((s, _), t) =>
      val ps = planted.filter(_._2 == s)
      val dropped = ps.count(p => !verdicts(10000L + p._1)._1)
      val jMean = ps.map(p => exactJ(p._3, p._4)).sum / ps.size
      (s, jMean, dropped)
    }
    info("tier_s  jaccard_mean  dropped/10   (streaming recall envelope)")
    envelope.foreach { case (s, j, d) => info(f"s=$s%-4d  $j%.3f         $d%2d/$PairsPerTier") }
    val dropByJ = envelope.sortBy(-_._2).map(_._3)
    assert(dropByJ.zip(dropByJ.tail).forall { case (hi, lo) => hi >= lo },
      s"streaming recall envelope not monotone in Jaccard: $dropByJ")

    // ---- (4) the verdict AGGREGATION reports the loss exactly.
    // Ground truth: planted pairs whose exact shingle Jaccard clears the
    // admission threshold — what a perfect (unbanded, exact-J) admission
    // would drop. The certificate is computed as an aggregation over the
    // verdict frame, the shape a production monitor would run.
    val truth = planted
      .map(p => (10000L + p._1, exactJ(p._3, p._4) >= MinEstJ))
      .toDF("doc_id", "is_true_dup")
    val cert = streamed.join(truth, "doc_id")
      .agg(
        sum(when(col("is_true_dup"), 1L).otherwise(0L)).as("n_true"),
        sum(when(col("is_true_dup") && !col("keep"), 1L).otherwise(0L)).as("n_caught"))
      .select(col("n_true"), col("n_caught"),
        expr("n_caught * 1000000 div n_true").as("recall_ppm"))
      .collect().head
    val (nTrue, nCaught, recallPpm) =
      (cert.getLong(0), cert.getLong(1), cert.getLong(2))
    val expectCaught = planted
      .filter(p => exactJ(p._3, p._4) >= MinEstJ)
      .count(p => !verdicts(10000L + p._1)._1)
    assert(nTrue > PairsPerTier.toLong,
      "the ladder must plant true near-dups beyond the guarantee tier")
    assert(nCaught == expectCaught.toLong && recallPpm == nCaught * 1000000L / nTrue)
    assert(nCaught < nTrue && recallPpm < 1000000L,
      "certificate failed to catch a planted streaming recall loss — " +
        "it would read 10^6 on a leaking stream")
  }
}
