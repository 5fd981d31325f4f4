package graft

import org.apache.spark.sql.functions._
import graft.core.UrlOps
import graft.ext.{Dedup, Similarity, TextAnalysis}

/** Guard: every custom kernel expression REALLY compiles. Under
  * `spark.sql.codegen.factoryMode=CODEGEN_ONLY` Spark throws instead of
  * silently falling back to interpreted eval, so a doGenCode regression
  * (bad generated Java, a Janino error) fails here instead of quietly
  * re-introducing the interpreted-path bench regressions this repo spent
  * two rounds removing.
  */
class KernelCodegenSpec extends SparkSpecBase {
  import spark.implicits._

  test("all custom expressions evaluate under CODEGEN_ONLY (no interpreter fallback)") {
    val saved = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val df = Seq(
        (1L, "the quick brown fox jumps over the lazy dog", Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
        (2L, "café HTTPS://Ex.COM/a/?utm_s=1&k=2#f", Seq(0.5, -1.0, 2.5), Seq(1.5, 0.0, -2.0)))
        .toDF("id", "text", "va", "vb")
        .withColumn("hashes", Dedup.shingleHashes(col("text"), 2))
      val bloom = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
      bloom.putLong(1L)
      val out = df.select(
        graft.functions.BloomMightContain.mightContainLong(col("id"), bloom).as("bm"),
        TextAnalysis.polyHash(col("text")).as("ph"),
        Dedup.simhashFromHashes(Dedup.tokenHashes48(col("text"))).as("sh"),
        graft.functions.LangIdExpr.langId(col("text")).as("lang"),
        UrlOps.urlNormalize(col("text")).as("url"),
        graft.functions.NfcNormalize.nfc(col("text")).as("nfc"),
        Similarity.dot(col("va"), col("vb")).as("dot"),
        graft.functions.VectorOps.l2sq(col("va"), col("vb")).as("l2"),
        Similarity.lshBucketT(col("va"), 8, 1).as("bucket"),
        Dedup.minhashFromHashes(col("hashes"), 8).as("sig"),
        graft.functions.BandKeys.bandKeys(
          Dedup.minhashFromHashes(col("hashes"), 8), 4).as("bands"),
        graft.functions.VectorOps.hamming(
          array(lit(0x0F0F), lit(0xFFFF)), array(lit(0x00FF), lit(0))).as("ham"),
        // cells depend on a column so constant folding cannot skip codegen;
        // rows stay proportional (a/b == c/d) -> exactly independent
        graft.functions.ChiSq2x2.chi2Micro(col("id") * 10, col("id") * 20,
          col("id") * 30, col("id") * 60).as("chi2"),
        graft.functions.ChiSq2x2.significant(col("id") * 10, col("id") * 20,
          col("id") * 30, col("id") * 60).as("sig"))
        .collect()
      assert(out.length == 2)
      // exactly independent 2x2: chi2 = 0, not significant
      assert(out.head.getLong(12) == 0L && !out.head.getBoolean(13))
      assert(out.head.getDouble(6) == 1.0 * 4 + 2 * 5 + 3 * 6) // dot sanity
      assert(out.head.getBoolean(0) && !out(1).getBoolean(0)) // bloom: no false negative on 1L
      // hamming: popcount(0x0F0F^0x00FF) + popcount(0xFFFF^0) = 8 + 16
      assert(out.head.getInt(11) == 24)

    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("BandKeys null-propagates null signature components (no 0-key collisions)") {
    // an empty hash array minhashes to an all-null signature; its band keys
    // must be null (never equijoin-matched), NOT fold-as-zero — zero keys
    // would bucket every empty doc together in every band (O(n²) blowup)
    val df = Seq((1L, "a b c d e f g h i"), (2L, "")).toDF("id", "text")
      .select(col("id"), graft.functions.BandKeys.bandKeys(
        Dedup.minhashFromHashes(Dedup.shingleHashes(col("text"), 2), 8), 4).as("bands"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getSeq[Any](1).forall(_ != null), "real signature must key")
    assert(rows(1).getSeq[Any](1).forall(_ == null),
      "empty-signature doc must emit null band keys")
  }

  test("hamming kernel == the combinator form on random band arrays") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 50).map(i =>
      (i.toLong, Seq.fill(4)(rnd.nextInt(0x10000)), Seq.fill(4)(rnd.nextInt(0x10000))))
    val df = rows.toDF("id", "a", "b")
      .select(col("id"),
        graft.functions.VectorOps.hamming(col("a"), col("b")).as("kernel"),
        expr("aggregate(zip_with(a, b, (x, y) -> bit_count(x ^ y)), 0, (acc, v) -> acc + v)")
          .cast("int").as("combinator"))
    assert(df.filter(col("kernel") =!= col("combinator")).count() == 0)
  }

  test("vector kernels yield null on length mismatch (not a truncated value)") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
      .select(Similarity.dot(col("a"), col("b")).as("d"),
        graft.functions.VectorOps.l2sq(col("a"), col("b")).as("l"),
        graft.functions.VectorOps.hamming(
          array(lit(1), lit(2)), array(lit(1))).as("h"))
    val r = df.collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2),
      "mixed-dimension vectors must not produce a finite plausible-but-wrong value")
  }
}
