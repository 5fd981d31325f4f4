package graft

import org.apache.spark.sql.functions._

import graft.ext.Multimodal
import graft.queries.ExtensionQueries132

/** Adversarial plant for the aHash hot-band cap (round-16 verdict
  * task #6).
  *
  * q488's pigeonhole guarantee — two 64-bit aHashes within Hamming
  * distance ≤ 3 agree on ≥ 1 of the 4 bands — holds only for candidate
  * GENERATION. The [[ExtensionQueries132.HotBandCap]] excludes hot band
  * keys from generation, so a near-dup pair loses its guarantee exactly
  * when EVERY band the pair agrees on is hot. q489 measures the pair
  * mass the cap removes (pair_mass vs pair_mass_capped), but nothing
  * proved the pipeline actually REPORTS the loss when that blind spot
  * is hit — on the shipped corpus the planted near-dups never land in
  * hot buckets, so recall has only ever read perfect (the same gap
  * BandedRecallAdversarialSpec closed for the text tier).
  *
  * This spec engineers the blind spot deterministically. The stub
  * decode takes the first 64 payload bytes as pixels and sets aHash
  * bit i ⟺ px_i·64 > Σpx, so with pixels drawn from {1, 'd'=100} and
  * 1 ≤ ones ≤ 63, the hash IS the chosen bit pattern (6400 > 99·n₁+64
  * ⟺ n₁ < 64, and 64 > Σpx never). Corpus:
  *  - A and B: identical payloads (Hamming 0 — the planted true pair,
  *    agreeing on all four bands);
  *  - per band b, [[ChaffPerBand]] = cap+1 chaff images sharing A's
  *    band-b key and carrying a globally unique even-parity key u in
  *    the other three bands: every one of A's four band keys becomes
  *    hot (count = cap+3 > cap), while chaff pairs stay ≥ 6 bits apart
  *    (distinct even-parity u ⇒ ≥ 2 bits per band × 3 bands) and
  *    chaff-to-A/B distances are ≥ 9 — no second true pair, no
  *    non-hot key shared by ANY two images.
  *
  * Pinned:
  *  1. the engineered payloads decode to exactly the designed band
  *     keys (the plant stays inside the real decode path);
  *  2. brute-force ground truth: (A,B) is the ONLY Hamming ≤ 3 pair;
  *  3. q488 MISSES it — the blind spot is real, not theoretical;
  *  4. q489 reports the loss: every band shows n_hot_keys ≥ 1 and
  *     removed mass pair_mass − pair_mass_capped = C(cap+3, 2), so a
  *     reader of the health audit sees nonzero at-risk mass exactly
  *     where q488's recall is uncertified;
  *  5. control: the identical corpus MINUS the chaff recovers (A,B)
  *     with hamming 0 — the miss is attributable to the cap alone.
  */
class AhashBandCapAdversarialSpec extends SparkSpecBase {

  private val Cap = ExtensionQueries132.HotBandCap
  private val ChaffPerBand = Cap + 1

  /** payload char for a 1-bit / 0-bit pixel (see header math) */
  private def textOf(bits: Seq[Int]): String = {
    require(bits.length == 64)
    bits.map(b => if (b == 1) 'd' else '\u0001').mkString
  }

  private def bitsOfKeys(keys: Seq[Int]): Seq[Int] = {
    require(keys.length == 4)
    keys.flatMap(k => (0 until 16).map(j => (k >> (15 - j)) & 1))
  }

  /** A's band keys: 2 ones per band (8 ones total, well inside 1..63) */
  private val aKeys: Seq[Int] = (0 until 4).map(b => (1 << 15) | (1 << (14 - b)))

  /** globally unique even-parity chaff key — any two distinct values
    * differ in ≥ 2 bits, and all sit below 2^10 (never equal to any
    * aKey, whose 2^15 bit is set) */
  private def chaffKey(idx: Int): Int = {
    val v = idx + 37
    (v << 1) | Integer.bitCount(v) % 2
  }

  /** (doc_id, text, lang, source, n_chars) rows; image kind needs
    * doc_id ≡ 0 (mod 3) */
  private def docRow(k: Long, keys: Seq[Int]): (Long, String, String, String, Long) = {
    val t = textOf(bitsOfKeys(keys))
    (3 * k, t, "en", "plant", t.length.toLong)
  }

  private val pairRows = Seq(docRow(0L, aKeys), docRow(1L, aKeys))

  private val chaffRows = (0 until 4).flatMap { b =>
    (0 until ChaffPerBand).map { i =>
      val u = chaffKey(b * ChaffPerBand + i)
      val keys = (0 until 4).map(c => if (c == b) aKeys(b) else u)
      docRow(2L + b * ChaffPerBand + i, keys)
    }
  }

  private def writeDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_ahash_adv").toString
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("all-four-bands-hot planted pair: q488 misses it, q489 reports the removed mass") {
    val dir = writeDocs(pairRows ++ chaffRows)

    // (1) the plant rides the REAL decode path: payload → stub decode →
    // band keys must equal the designed keys for every image
    val decoded = Multimodal.aHashBands(
        Multimodal.mediaFromDocuments(spark,
          graft.core.Tables.documents(spark, dir))
          .filter(col("kind") === "image"))
      .collect().map(h => h.media_id -> h.bands).toMap
    val designed = (pairRows ++ chaffRows).map(r => r._1 ->
      (if (r._1 <= 3) aKeys
       else {
         val k = (r._1 / 3 - 2).toInt
         val (b, i) = (k / ChaffPerBand, k % ChaffPerBand)
         val u = chaffKey(b * ChaffPerBand + i)
         (0 until 4).map(c => if (c == b) aKeys(b) else u)
       })).toMap
    assert(decoded.size == designed.size)
    designed.foreach { case (id, keys) =>
      assert(decoded(id) == keys, s"media $id decoded ${decoded(id)} != designed $keys")
    }

    // (2) brute-force ground truth over the designed hashes: exactly one
    // Hamming ≤ HamMax pair — (A=0, B=3)
    val ids = designed.keys.toSeq.sorted
    val truePairs = for {
      x <- ids; y <- ids if x < y
      d = (0 until 4).map(b => Integer.bitCount(designed(x)(b) ^ designed(y)(b))).sum
      if d <= ExtensionQueries132.HamMax
    } yield (x, y)
    assert(truePairs == Seq((0L, 3L)), s"ground truth not the single planted pair: $truePairs")

    // (3) the blind spot is real: every band the pair agrees on is hot,
    // so q488 generates no candidate for it and returns NOTHING
    val found = ExtensionQueries132.q488_ahash_band_dedup(spark, dir).collect()
    assert(found.isEmpty,
      s"q488 unexpectedly recovered the planted pair despite all-hot bands: ${found.toSeq}")

    // (4) ...and the certificate SEES the loss: per band, exactly one
    // hot key (A's), and removed mass = C(cap+3, 2) — the planted pair
    // is inside that nonzero at-risk mass, so q488's empty answer reads
    // as "uncertified under hot mass", never as "full recall"
    val audit = ExtensionQueries132.q489_ahash_band_audit(spark, dir).collect()
    assert(audit.length == 4)
    val hotBucket = (ChaffPerBand + 2).toLong // cap+1 chaff + A + B
    val removed = hotBucket * (hotBucket - 1) / 2
    audit.foreach { r =>
      val (b, nHot, mass, capped) = (r.getAs[Int]("band_idx"),
        r.getAs[Long]("n_hot_keys"), r.getAs[Long]("pair_mass"),
        r.getAs[Long]("pair_mass_capped"))
      assert(nHot == 1L, s"band $b: expected exactly A's key hot, got $nHot")
      assert(r.getAs[Long]("max_bucket") == hotBucket)
      assert(mass - capped == removed,
        s"band $b: removed mass ${mass - capped} != C($hotBucket,2)=$removed")
    }

    // (5) control: the same corpus WITHOUT the chaff — no hot keys, the
    // pigeonhole guarantee stands, q488 recovers the pair at hamming 0
    val controlDir = writeDocs(pairRows)
    val ctl = ExtensionQueries132.q488_ahash_band_dedup(spark, controlDir).collect()
    assert(ctl.length == 1 && ctl.head.getAs[Long]("media_a") == 0L &&
      ctl.head.getAs[Long]("media_b") == 3L && ctl.head.getAs[Int]("hamming") == 0,
      s"control corpus must recover the planted pair: ${ctl.toSeq}")
    val ctlAudit = ExtensionQueries132.q489_ahash_band_audit(spark, controlDir).collect()
    assert(ctlAudit.forall(_.getAs[Long]("n_hot_keys") == 0L),
      "control corpus must carry zero hot keys")
  }
}
