package graft

import org.apache.spark.sql.functions._
import graft.ext.Winnowing
import graft.queries.ExtensionQueries12

/** Property pins for the round-7 fourth batch (cross-engine equality is
  * the DuckDB oracle's job — these assert the PAPER's guarantees:
  * winnowing's match recall and density bounds, RRF's formula).
  */
class ExtensionQueries12Spec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.01"

  // ------------------------------------------------- q126 winnowing

  test("winnowing theorem 1: a shared substring of length >= w+k-1 yields a common fingerprint") {
    import spark.implicits._
    val k = 8; val w = 4
    val shared = "the quick brown fox jumps over" // 30 >= w+k-1 = 11
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta epsilon"),
      (2L, s"zzz $shared qqq completely different tail text here")).toDF("id", "text")
    val fps = Winnowing.fingerprints(docs, "id", "text", k, w)
    val a = fps.filter(col("id") === 1).select("fp").as[Long].collect().toSet
    val b = fps.filter(col("id") === 2).select("fp").as[Long].collect().toSet
    assert((a & b).nonEmpty,
      "winnowing must select at least one common hash inside a shared 30-char substring")
  }

  test("winnowing density: every window selects, each selection covers <= w windows") {
    import spark.implicits._
    val k = 8; val w = 4
    val docs = graft.core.Tables.documents(spark, sf).limit(50)
      .select(col("doc_id").as("id"), col("text"))
    val perDoc = Winnowing.fingerprints(docs, "id", "text", k, w)
      .groupBy("id").agg(count(lit(1)).as("n_fp"))
      .join(docs.select(col("id"), (length(col("text")) - (k - 1)).as("ng")), "id")
      .collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r =>
      val nFp = r.getAs[Long]("n_fp"); val ng = r.getAs[Int]("ng").toLong
      val windows = ng - (w - 1)
      assert(nFp <= windows, s"doc ${r.get(0)}: more fingerprints than windows")
      assert(nFp >= (windows + w - 1) / w,
        s"doc ${r.get(0)}: a selected position covers at most w windows")
    }
  }

  test("winnowing rightmost tie-break: a constant string selects each window's last position") {
    import spark.implicits._
    val k = 8; val w = 4
    val n = 20 // ng = 13 grams, all hashing identically
    val docs = Seq((1L, "a" * n)).toDF("id", "text")
    val out = Winnowing.fingerprints(docs, "id", "text", k, w)
      .select("pos").as[Long].collect().toSet
    val ng = n - (k - 1)
    // window starting at i picks its rightmost member i+w-1
    assert(out == (w.toLong to ng.toLong).toSet,
      s"equal hashes must resolve to the rightmost position per window: $out")
  }

  // ----------------------------------------- q128 star contraction

  test("star contraction: path + triangle + isolate resolve in O(log n) rounds") {
    import spark.implicits._
    // a 12-node path (diameter 11 — min-label propagation would need 11
    // rounds), a triangle, and an isolated node
    val path = (1L until 12L).map(i => (i, i + 1))
    val tri = Seq((20L, 21L), (21L, 22L), (20L, 22L))
    val edges = (path ++ tri).toDF("src", "dst")
    val nodes = ((1L to 12L) ++ (20L to 22L) ++ Seq(30L)).toDF("id")
    val out = graft.ops.StarContract.run(edges, nodes, 6).collect()
    val comp = out.map(r => r.getAs[Long]("id") -> r.getAs[Long]("comp")).toMap
    (1L to 12L).foreach(i => assert(comp(i) == 1L, s"path node $i"))
    (20L to 22L).foreach(i => assert(comp(i) == 20L, s"triangle node $i"))
    assert(comp(30L) == 30L, "isolated node is its own component")
    assert(out.forall(_.getAs[Boolean]("converged")),
      "6 star round-pairs must certify the fixpoint on a diameter-11 path")
  }

  // ------------------------------------------------------ q127 RRF

  test("q127: fused scores follow the RRF formula and ordering; both-list docs outrank") {
    val out = ExtensionQueries12.q127_rrf_fusion(spark, sf).collect()
    assert(out.length == 20)
    out.foreach { r =>
      val lex = Option(r.getAs[java.lang.Long]("rank_lex")).map(_.toLong)
      val vec = Option(r.getAs[java.lang.Long]("rank_vec")).map(_.toLong)
      assert(lex.nonEmpty || vec.nonEmpty, "a fused doc must come from some list")
      val expected = lex.map(r0 => 1000000L / (60 + r0)).getOrElse(0L) +
        vec.map(r0 => 1000000L / (60 + r0)).getOrElse(0L)
      assert(r.getAs[Long]("rrf_ppm") == expected, s"RRF formula mismatch on row $r")
    }
    val scores = out.map(_.getAs[Long]("rrf_ppm")).toSeq
    assert(scores == scores.sorted.reverse, "output must be sorted by fused score desc")
  }
}
