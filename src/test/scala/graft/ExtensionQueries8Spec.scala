package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.SpanDedup
import graft.ops.{CountMin, Triangles}
import graft.queries.ExtensionQueries8

/** Property pins for the round-6 second batch (cross-engine equality is
  * the DuckDB oracle's job — these assert operator SEMANTICS).
  */
class ExtensionQueries8Spec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.01"
  private val sfTiny = "/root/testdata/sf0.001"

  // ------------------------------------------------------ q103 SpanDedup

  test("q103: a planted duplicated span is cut from the LATER doc only") {
    import spark.implicits._
    val span = (1 to 8).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha $span omega"),
      (2L, s"unrelated prefix words here $span trailing tail"),
      (3L, "wholly unique text with no repeats at all")
    ).toDF("doc_id", "text")
    val out = SpanDedup.dropDuplicatedSpans(docs, "doc_id", "text", 8)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_dropped") == 0L, "first owner untouched")
    assert(out(0).getAs[String]("clean_text") == s"alpha $span omega")
    // doc 2: positions of the 8 span tokens are covered; the copy sits at
    // token offset 4, so exactly those 8 tokens go.
    assert(out(1).getAs[Long]("n_dropped") == 8L)
    assert(out(1).getAs[String]("clean_text") ==
      "unrelated prefix words here trailing tail")
    assert(out(2).getAs[Long]("n_dropped") == 0L)
  }

  test("q103: overlapping duplicated spans drop the union of positions, not 2L") {
    import spark.implicits._
    // doc 2 repeats a 9-token run of doc 1 → two overlapping duplicated
    // 8-grams covering 9 positions.
    val run = (1 to 9).map(i => s"r$i").mkString(" ")
    val docs = Seq((1L, s"$run filler"), (2L, s"x y z $run")).toDF("doc_id", "text")
    val out = SpanDedup.dropDuplicatedSpans(docs, "doc_id", "text", 8)
      .orderBy("doc_id").collect()
    assert(out(1).getAs[Long]("n_dropped") == 9L)
    assert(out(1).getAs[String]("clean_text") == "x y z")
  }

  test("q103: short docs (< L tokens) and within-doc repeats pass through") {
    import spark.implicits._
    val eight = (1 to 8).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, "tiny doc"),
      (2L, s"$eight and again $eight") // same-doc repeat: untouched
    ).toDF("doc_id", "text")
    val out = SpanDedup.dropDuplicatedSpans(docs, "doc_id", "text", 8)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_dropped") == 0L)
    assert(out(0).getAs[String]("clean_text") == "tiny doc")
    assert(out(1).getAs[Long]("n_dropped") == 0L)
  }

  test("q103 on the corpus: token accounting closes; planted dups found") {
    val out = ExtensionQueries8.q103_span_dedup(spark, sf)
    val bad = out.filter(
      (col("n_dropped") +
        when(col("clean_text") === "", 0)
          .otherwise(size(split(col("clean_text"), " "))))
        =!= col("n_tokens"))
    assert(bad.count() == 0, "kept + dropped must equal n_tokens")
    val touched = out.filter(col("n_dropped") > 0).count()
    assert(touched == 24L, s"sf0.01 plants 24 docs with duplicated 8-gram spans, got $touched")
  }

  // ------------------------------------------------------ q104 CountMin

  test("q104: estimates never undercount and shard-merge equals direct build") {
    val r = ExtensionQueries8.q104_count_min(spark, sf).collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getAs[Boolean]("never_under")))
    // merge(sketch per shard) must be cell-identical to one global build
    val li = Tables.lineitem(spark, sf)
    val direct = CountMin.sketch(li, "l_suppkey", 4, 64)
    val merged = CountMin.merge(CountMin.sketch(li, "l_suppkey", 4, 64, col("l_returnflag")))
    assert(direct.exceptAll(merged).count() == 0 && merged.exceptAll(direct).count() == 0)
  }

  test("count-min rejects out-of-range keys instead of silently mishashing") {
    import spark.implicits._
    // negative and too-large keys would overflow the affine product into
    // negative buckets CONSISTENTLY in both engines — only a guard catches it
    for (bad <- Seq(-1L, CountMin.MaxKey + 1)) {
      val e = intercept[Exception] {
        CountMin.sketch(Seq(bad).toDF("k"), "k", 2, 16).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("count-min key outside")),
        s"wrong failure for key $bad: $e")
    }
    // boundary keys pass and null keys stay null-safe (no raise)
    val ok = CountMin.sketch(Seq[java.lang.Long](0L, CountMin.MaxKey, null)
      .toDF("k"), "k", 2, 16).collect()
    assert(ok.nonEmpty)
  }

  test("q104: an absent key estimates only collision mass, far below heavy keys") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
    val sk = CountMin.merge(CountMin.sketch(li, "l_suppkey", 4, 64, col("l_returnflag")))
    val absent = Seq(987654321L).toDF("k")
    val est = CountMin.estimate(absent, "k", sk, 4, 64).collect().head.getAs[Long]("cms_est")
    val n = li.count()
    // ε = e/w bound with huge slack: collisions only, no true mass
    assert(est <= n / 8, s"absent-key estimate $est vs corpus size $n")
  }

  // ----------------------------------------------------- q105 surprisal

  test("q105: matches a driver-side recomputation on sf0.001") {
    val docs = Tables.documents(spark, sfTiny)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    val toks = docs.flatMap { case (id, t) => t.split(" ", -1).map(id -> _) }
    val cnt = toks.groupBy(_._2).map { case (w, xs) => w -> xs.length.toLong }
    val total = cnt.values.sum
    def bits(n: Long) = java.lang.Long.toBinaryString(n).length
    val expect = toks.groupBy(_._1).map { case (id, xs) =>
      val b = xs.map { case (_, w) => (bits(total) - bits(cnt(w))).toLong }.sum
      val rare = xs.count { case (_, w) => cnt(w) * 1000 < total }.toLong
      id -> ((xs.length.toLong, b, b * 100 / xs.length, rare))
    }
    val got = ExtensionQueries8.q105_surprisal(spark, sfTiny).collect()
    assert(got.length == expect.size)
    for (r <- got) {
      val (n, sb, mc, nr) = expect(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_tokens") == n)
      assert(r.getAs[Long]("sum_bits") == sb)
      assert(r.getAs[Long]("mean_centibits") == mc)
      assert(r.getAs[Long]("n_rare") == nr)
    }
  }

  // ----------------------------------------------------- q106 triangles

  test("q106: hand graph — triangle plus a pendant edge") {
    import spark.implicits._
    // K3 on {1,2,3} + pendant 3-4: tri(1)=tri(2)=tri(3)=1, tri(4)=0
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("a", "b")
    val r = Triangles.counts(edges, "a", "b").orderBy("node").collect()
    assert(r.map(x => (x.getAs[Long]("node"), x.getAs[Long]("n_tri"))).toSeq ==
      Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 0L)))
    // cc: node 1 deg 2 → 2*1*1e6/(2*1) = 1e6; node 3 deg 3 → 2e6/6
    assert(r(0).getAs[Long]("cc_ppm") == 1000000L)
    assert(r(2).getAs[Long]("cc_ppm") == 333333L)
  }

  test("q106: matches a driver-side brute-force recount on sf0.001") {
    val lp = Tables.lineitem(spark, sfTiny)
      .select("l_orderkey", "l_partkey").distinct()
    val edges = lp.as("a").join(lp.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
      .select("u", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    val brute = nodes.map { n =>
      val nb = adj(n).toSeq
      n -> (for (i <- nb.indices; j <- i + 1 until nb.length
        if adj(nb(i)).contains(nb(j))) yield 1).size.toLong
    }.toMap
    val got = ExtensionQueries8.q106_triangles(spark, sfTiny).collect()
    assert(got.map(_.getAs[Long]("node")).toSeq == nodes)
    for (r <- got) {
      assert(r.getAs[Long]("n_tri") == brute(r.getAs[Long]("node")),
        s"node ${r.getAs[Long]("node")}")
      assert(r.getAs[Long]("deg") == adj(r.getAs[Long]("node")).size)
    }
  }
}
