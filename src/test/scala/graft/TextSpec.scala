package graft

import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis

/** Unit pins for the single-pass language-ID expression (q23's engine) and
  * the sampled IVF trainer — semantics that the oracle queries exercise only
  * on the synthetic corpus's happy path.
  */
class TextSpec extends SparkSpecBase {
  import spark.implicits._

  private def predict(texts: String*): Seq[String] =
    texts.toDF("t").select(TextAnalysis.langId(col("t")).as("p"))
      .collect().map(_.getString(0)).toSeq

  test("langId: marker argmax, duplicates counted, first-listed wins ties") {
    assert(predict("the cat and the dog") == Seq("en"))
    assert(predict("der hund und die katze ist") == Seq("de"))
    // "la" is a marker for BOTH es and fr; es is listed first → es wins
    assert(predict("la la") == Seq("es"))
    // one en marker vs one de marker → tie → first-listed (en) wins
    assert(predict("the und") == Seq("en"))
    // duplicate markers count: 2×"und" (de) beats 1×"the" (en)
    assert(predict("the und und") == Seq("de"))
  }

  test("langId: und for no markers, empty tokens ignored, null propagates") {
    assert(predict("xyzzy plugh", "", "  ") == Seq("und", "und", "und"))
    val r = Seq[Option[String]](None).toDF("t")
      .select(TextAnalysis.langId(col("t"))).collect()
    assert(r(0).isNullAt(0))
  }

  test("langId matches a direct recount on corpus docs (both codegen paths)") {
    val d = core.Tables.documents(spark, "/root/testdata/sf0.001").limit(100)
    val markers = TextAnalysis.LangMarkers
    val got = d.select(col("text"), TextAnalysis.langId(col("text")).as("p")).collect()
    got.foreach { r =>
      val toks = r.getString(0).split(" ", -1)
      val counts = markers.map { case (l, ms) => l -> toks.count(ms.contains) }
      val expected =
        if (counts.forall(_._2 == 0)) "und" else counts.maxBy(_._2)._1 // maxBy keeps first max
      assert(r.getString(1) == expected, s"doc: ${r.getString(0).take(60)}")
    }
  }

  test("repetition signals: known duplicate-ngram fractions, flags") {
    val df = Seq(
      (1L, "a a a"),            // 2-grams: ["a a","a a"] → dup2 = 1/2
      (2L, "w x y z"),          // all distinct → dup2 = 0
      (3L, "only"),             // 1 token → no 2-grams → null, keep=false (n<2)
      (4L, "ok ok $$$ %%% @@@") // symbols 9/17 > 0.1 → keep=false
    ).toDF("doc_id", "text")
    val r = TextAnalysis.withRepetitionColumns(df, col("text"))
      .select((col("doc_id") +: TextAnalysis.RepetitionColumnNames.map(col)): _*)
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Double]("dup2_frac") == 0.5)
    assert(!r(0).getAs[Boolean]("gopher_keep")) // dup2 0.5 > 0.4 threshold
    assert(r(1).getAs[Double]("dup2_frac") == 0.0)
    assert(r(1).getAs[Boolean]("gopher_keep"))
    assert(r(2).isNullAt(r(2).fieldIndex("dup2_frac")))
    assert(!r(2).getAs[Boolean]("gopher_keep"))
    assert(!r(3).getAs[Boolean]("gopher_keep"))
  }

  test("contamination overlap: verbatim leak → 1.0, disjoint doc absent") {
    val evalSet = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "alpha beta gamma delta"), // verbatim leak
      (11L, "zeta eta theta iota")     // disjoint
    ).toDF("doc_id", "text")
    val r = graft.ext.Contamination.overlap(corpus, evalSet, "doc_id", col("text"), 3)
      .collect()
    assert(r.map(_.getAs[Long]("id")).toSet == Set(10L))
    assert(r.head.getAs[Double]("overlap_frac") == 1.0)
  }

  test("q57 scrub removes every synthesized PII token; q58 balances langs to the min share") {
    val dir = "/root/testdata/sf0.001"
    val scrub = graft.queries.ExtensionQueries4.q57_pii_scrub(spark, dir)
    import org.apache.spark.sql.functions._
    val leaked = scrub.filter(
      col("text_clean").rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}") ||
        col("text_clean").rlike("\\+1-555-[0-9]{4}")).count()
    assert(leaked == 0, s"$leaked docs still carry PII after scrub")
    assert(scrub.filter(col("n_emails") >= 1 && col("n_phones") >= 1).count() == scrub.count())

    val mix = graft.queries.ExtensionQueries4.q58_mixture_sample(spark, dir).collect()
    val nMin = mix.map(_.getAs[Long]("n_total")).min
    for (r <- mix) {
      val (total, kept) = (r.getAs[Long]("n_total"), r.getAs[Long]("n_kept"))
      assert(kept <= total)
      // hash-threshold quota: binomial noise around n_min (loose 3-sigma-ish bound)
      val tol = math.max(6.0, 3 * math.sqrt(nMin.toDouble))
      assert(math.abs(kept - nMin) <= tol,
        s"lang ${r.getString(0)}: kept $kept vs target $nMin (total $total)")
    }
  }

  test("IVF train: hash-sampled path is deterministic and respects maxTrain") {
    val emb = Tables0.embeddings(spark).limit(60).cache()
    def fit() = graft.ext.IvfIndex.train(emb, "vec_id", "embedding",
      nlist = 4, maxTrain = 30)
    val m1 = fit(); val m2 = fit()
    assert(m1.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq)
    assert(m1.centroids.length == 4)
    assert(m1.centroids.forall(_.length == m1.centroids.head.length))
  }

  test("slidingChunks: HF-overflow window starts, clipped tail, stride==size degenerates to paragraphChunks") {
    import graft.ext.TextAnalysis
    val df = Seq((1, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("id", "text")
    val got = df.select(TextAnalysis.slidingChunks(col("text"), 4, 3).as("c"))
      .collect().head.getSeq[String](0)
    // starts 0,3,6,9 (while start <= len-1); last window clipped to 1 token
    assert(got == Seq("t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t10"))
    val para = df.select(TextAnalysis.paragraphChunks(col("text"), 4).as("c"))
      .collect().head.getSeq[String](0)
    val slid = df.select(TextAnalysis.slidingChunks(col("text"), 4, 4).as("c"))
      .collect().head.getSeq[String](0)
    assert(para == slid, "stride==size must equal paragraphChunks")
  }

  test("flagBoilerplate threshold boundary: minDocs-1 distinct docs kept, minDocs dropped") {
    import graft.ext.TextAnalysis
    // span A in 2 docs (one twice - distinct count still 2), span B in 3
    val paras = Seq(
      (1L, "span a"), (2L, "span a"), (2L, "span a"),
      (1L, "span b"), (2L, "span b"), (3L, "span b"),
      (3L, "unique span")).toDF("doc_id", "para")
    val out = TextAnalysis.flagBoilerplate(paras, "doc_id", "para", minDocs = 3)
      .select("para", "keep").distinct().collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(out == Map("span a" -> true, "span b" -> false, "unique span" -> true))
  }
}
