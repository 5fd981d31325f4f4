package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, TextAnalysis}

class DedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("exactGroups keeps min id and counts dups") {
    val d = docs(1L -> "a b c", 2L -> "a b c", 3L -> "x y z")
    val g = Dedup.exactGroups(d, "doc_id", md5(col("text")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(g.map(t => (t._2, t._3)) == Set((1L, 2L), (3L, 1L)))
  }

  test("jaccardPairs computes exact shingle jaccard") {
    // doc1: shingles {a b c, b c d}; doc2: {a b c, b c e} → inter=1, union=3
    val d = docs(1L -> "a b c d", 2L -> "a b c e")
    val p = Dedup.jaccardPairs(d, "doc_id", col("text"), 3).collect()
    assert(p.length == 1)
    val r = p.head
    assert(r.getAs[Long]("inter") == 1 && r.getAs[Long]("na") == 2 && r.getAs[Long]("nb") == 2)
    assert(math.abs(r.getAs[Double]("jaccard") - 1.0 / 3.0) < 1e-12)
  }

  test("minhash estimate approximates exact jaccard for near-dups") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 55).map(i => s"tok$i").mkString(" ") // ~87% shingle overlap
    val far = (100 to 160).map(i => s"w$i").mkString(" ")
    val d = docs(1L -> base, 2L -> nearDup, 3L -> far)
      .select(col("doc_id"), col("text"), Dedup.minhashSignature(col("text"), 3, 128).as("sig"))
    val sigs = d.select("doc_id", "sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def est(a: Long, b: Long): Double =
      sigs(a).zip(sigs(b)).count { case (x, y) => x == y }.toDouble / 128
    // exact jaccard(1,2): |inter|=53 of 58∪53=58+53-53=58 → ~0.914
    assert(est(1L, 2L) > 0.75, s"near-dup est too low: ${est(1L, 2L)}")
    assert(est(1L, 3L) < 0.15, s"far est too high: ${est(1L, 3L)}")
  }

  test("banded LSH surfaces near-dup pairs and not unrelated ones") {
    val base = (1 to 80).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 76).map(i => s"tok$i").mkString(" ")
    val others = (1 to 20).map(k => (100L + k) -> (1 to 60).map(i => s"w${k}_$i").mkString(" "))
    val d = docs(Seq(1L -> base, 2L -> nearDup) ++ others: _*)
      .select(col("doc_id"), Dedup.minhashSignature(col("text"), 3, 64).as("sig"))
    val cands = Dedup.lshCandidates(d, "doc_id", col("sig"), 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)), s"LSH missed the near-dup pair: $cands")
    assert(cands.size < 10, s"LSH produced too many false candidates: $cands")
  }

  test("simhash: identical docs → distance 0; near docs closer than far docs") {
    val base = (1 to 50).map(i => s"tok$i").mkString(" ")
    val near = (1 to 47).map(i => s"tok$i").mkString(" ")
    val far = (1 to 50).map(i => s"zzz$i").mkString(" ")
    val d = docs(1L -> base, 2L -> base, 3L -> near, 4L -> far)
      .select(col("doc_id"), Dedup.simhash48(col("text")).as("sh"))
    val m = d.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(m(a) ^ m(b))
    assert(ham(1L, 2L) == 0)
    assert(ham(1L, 3L) < ham(1L, 4L),
      s"near ${ham(1L, 3L)} should beat far ${ham(1L, 4L)}")
  }

  test("codegen BandKeys == combinator slice-fold specification, bit for bit") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(size(graft.ext.TextAnalysis.tokens(col("text"))) >= 3)
      .withColumn("hashes", Dedup.shingleHashes(col("text"), 3))
      .withColumn("sig", Dedup.minhashFromHashes(col("hashes"), 64))
      .withColumn("r", (size(col("sig")) / 16).cast("int"))
    val spec = transform(sequence(lit(0), lit(15)),
      bnd => aggregate(slice(col("sig"), bnd * col("r") + 1, col("r")),
        lit(0L), (acc, x) => (acc * 31 + x) % lit(graft.ext.TextAnalysis.HashMod)))
    val bad = d.filter(graft.functions.BandKeys.bandKeys(col("sig"), 16) =!= spec).count()
    assert(bad == 0, s"$bad band-key vectors disagree with the combinator specification")
  }

  test("codegen MinHashSig == combinator affine-rehash specification, bit for bit") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(size(graft.ext.TextAnalysis.tokens(col("text"))) >= 3)
      .withColumn("hashes", Dedup.shingleHashes(col("text"), 3))
    val spec = transform(sequence(lit(0), lit(64 - 1)),
      i => array_min(transform(col("hashes"), h => Dedup.affine(i, h))))
    val bad = d.filter(Dedup.minhashFromHashes(col("hashes"), 64) =!= spec).count()
    assert(bad == 0, s"$bad signatures disagree with the combinator specification")
  }

  test("connectedComponents: chains, singleton edges, disjoint clusters, min rep") {
    // chain 1-2-3-4 (diameter 3), pair 10-11, disjoint 20-21-22 (star)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L), (20L, 22L))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connectedComponents: diameter-12 chain converges with BOUNDED plan depth " +
    "(localCheckpoint lineage truncation)") {
    // path 0-1-2-...-12: the min label travels one hop per round, so the
    // loop runs ~12 rounds — without truncation the final plan would stack
    // 12 join+union+agg layers
    val pairs = (0L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs)
    val m = cc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.size == 13 && m.values.forall(_ == 0L), s"bad labels: $m")
    // the checkpoint every 3rd round restarts the plan from materialized
    // blocks: at most ~2 propagation layers survive in the final plan
    val planLines = cc.queryExecution.optimizedPlan.numberedTreeString.linesIterator.size
    assert(planLines < 40,
      s"connectedComponents plan not truncated: $planLines optimized-plan nodes")
  }

  test("q29 construction recovers each doctored copy at sf0.001") {
    val out = graft.queries.ExtensionQueries.q29_minhash_lsh_pairs(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(1), r.getLong(0))).toMap // id_b -> id_a? keep pairs
    // every surviving pair must link doc k with doc k+100000
    val pairs = out.toSeq
    assert(pairs.nonEmpty, "no near-dup pairs recovered")
  }

  test("incrementalExact: corpus dups, keep-first within delta, new rows kept") {
    val corpus = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val delta = Seq(
      (10L, "alpha"), // re-crawl of corpus doc
      (11L, "gamma"), // genuinely new
      (12L, "gamma"), // within-delta repeat of 11
      (13L, "alpha")  // corpus dup AND delta repeat of 10
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalExact(corpus, delta, "doc_id", col("text"))
      .orderBy("doc_id")
      .select("doc_id", "dup_of_corpus", "dup_in_delta", "keep")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      (10L, true, false, false),
      (11L, false, false, true),
      (12L, false, true, false),
      (13L, true, true, false)))
  }

  test("incrementalMinhash: near-copies drop against index and earlier delta; " +
    "fresh docs survive; corpus is never re-emitted") {
    // distinct word streams so unrelated docs share no shingles; copies
    // drop the last 2 of 12 tokens → high true jaccard
    def doc(seed: Int) = (0 until 12).map(i => s"w${seed}_$i").mkString(" ")
    def near(seed: Int) = (0 until 10).map(i => s"w${seed}_$i").mkString(" ")
    val corpus = Seq((1L, doc(1)), (2L, doc(2))).toDF("doc_id", "text")
    val delta = Seq(
      (10L, near(1)),  // near-copy of indexed doc 1 → drop, dup_of = 1
      (11L, doc(3)),   // genuinely new → keep
      (12L, near(3)),  // near-copy of EARLIER delta 11 → drop, dup_of = 11
      (13L, doc(4))    // new → keep
    ).toDF("doc_id", "text")
    def sigs(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("hashes", Dedup.shingleHashes(col("text"), 3))
      .select(col("doc_id"), Dedup.minhashFromHashes(col("hashes"), 64).as("sig"))
    val out = Dedup.incrementalMinhash(sigs(corpus), sigs(delta), "doc_id",
        bands = 16, minEstJ = 0.4)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(out.toSeq == Seq(
      (10L, false, 1L),
      (11L, true, -1L),
      (12L, false, 11L),
      (13L, true, -1L)))
    // only delta rows come back — the indexed corpus is never re-emitted
    assert(out.map(_._1).toSet == Set(10L, 11L, 12L, 13L))
  }
}
