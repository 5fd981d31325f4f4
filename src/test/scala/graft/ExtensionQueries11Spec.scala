package graft

import org.apache.spark.sql.functions._
import graft.ext.{SetSimJoin, SortedNeighborhood}
import graft.ops.LinkPredict
import graft.queries.{ExtensionQueries9, ExtensionQueries11}

/** Property pins for the round-7 second batch (cross-engine equality is
  * the DuckDB oracle's job — these assert operator SEMANTICS: prune
  * completeness, blocking recall, cap contracts).
  */
class ExtensionQueries11Spec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.01"
  private val sfTiny = "/root/testdata/sf0.001"

  // ------------------------------------------------ q116 overlap join

  test("q116: hand sets — exact intersection and containment ppm; sub-floor sets never pair") {
    import spark.implicits._
    // A = 1..10, B = 1..5 ∪ 20..24, C = 1..4 (smaller than o → indexes
    // nothing), D disjoint
    val elems =
      (1 to 10).map(x => (1L, x)) ++
        ((1 to 5) ++ (20 to 24)).map(x => (2L, x)) ++
        (1 to 4).map(x => (3L, x)) ++
        (30 to 40).map(x => (4L, x))
    val out = SetSimJoin.overlapJoin(elems.toDF("id", "e"), "id", "e", 5)
      .orderBy("id_a", "id_b").collect()
    assert(out.length == 1, s"only (A,B) reaches overlap 5: ${out.mkString(";")}")
    val r = out.head
    assert(r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L)
    assert(r.getAs[Long]("inter") == 5L)
    assert(r.getAs[Long]("sa") == 10L && r.getAs[Long]("sb") == 10L)
    // 5/10 both sides, floor-scaled
    assert(r.getAs[Long]("cont_a_ppm") == 500000L)
    assert(r.getAs[Long]("cont_b_ppm") == 500000L)
  }

  test("q116: prefix + positional pruning equals the naive full-index overlap join") {
    val toks = split(col("text"), " ")
    val shingles = graft.core.Tables.documents(spark, sfTiny)
      .filter(size(toks) >= 3)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(toks) - 3),
          i => array_join(slice(toks, i + 1, lit(3)), " "))).as("sh"))
    val o = 10
    val pruned = SetSimJoin.overlapJoin(shingles, "doc_id", "sh", o)
      .orderBy("id_a", "id_b").collect().toSeq
    val tok = shingles.select(col("doc_id").as("__id"), col("sh").as("tok")).distinct()
    val sizes = tok.groupBy("__id").agg(count(lit(1)).as("s"))
    val naive = tok.as("a").join(tok.as("b"),
        col("a.tok") === col("b.tok") && col("a.__id") < col("b.__id"))
      .groupBy(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
      .filter(col("inter") >= o)
      .join(sizes.select(col("__id").as("id_a"), col("s").as("sa")), "id_a")
      .join(sizes.select(col("__id").as("id_b"), col("s").as("sb")), "id_b")
      .select(col("id_a"), col("id_b"), col("inter"), col("sa"), col("sb"),
        expr("inter * 1000000L div sa").as("cont_a_ppm"),
        expr("inter * 1000000L div sb").as("cont_b_ppm"))
      .orderBy("id_a", "id_b").collect().toSeq
    assert(naive.nonEmpty, "fixture must produce at least one overlapping pair")
    assert(pruned == naive,
      s"overlap prefix filter must lose no qualifying pair: ${pruned.size} vs ${naive.size}")
  }

  // ---------------------------------------- q117 sorted neighborhood

  test("SNM: rank window yields exactly the w-band pairs of the blocking order") {
    import spark.implicits._
    // 6 rows keyed 10..60; order by key → candidates = all pairs within
    // rank distance <= 2: (10,20) (10,30) (20,30) (20,40) ... = 2n-3 pairs
    val df = Seq(60L, 30L, 10L, 50L, 20L, 40L).toDF("k")
    val out = SortedNeighborhood.candidatePairs(df, "k", 2, 3, col("k"))
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Long]("rank_dist")))
    val expect = Seq((10L, 20L, 1L), (10L, 30L, 2L), (20L, 30L, 1L), (20L, 40L, 2L),
      (30L, 40L, 1L), (30L, 50L, 2L), (40L, 50L, 1L), (40L, 60L, 2L), (50L, 60L, 1L))
    assert(out.toSeq == expect, out.mkString(";"))
  }

  test("q117: two-pass SNM + exact verify reproduces q109's prefix-join output exactly") {
    // same 25 near-dup pairs through a COMPLETELY different candidate
    // scheme (sort-based blocking vs frequency-prefix filtering): both
    // queries' (id_a, id_b, inter, union_sz, jacc_ppm) rows must agree
    // bit-for-bit on the sf0.01 corpus
    val snm = ExtensionQueries11.q117_snm_dedup(spark, sf)
      .collect().map(_.toString).sorted
    val ppjoin = ExtensionQueries9.q109_prefix_jaccard(spark, sf)
      .collect().map(_.toString).sorted
    assert(snm.nonEmpty && snm.sameElements(ppjoin),
      s"SNM ${snm.length} pairs vs PPJoin ${ppjoin.length}")
  }

  // ------------------------------------------- q118 link prediction

  test("q118: hand graph — wedge counting, existing-edge anti-join, PA score") {
    import spark.implicits._
    // square 1-2-3-4-1: each diagonal (1,3) and (2,4) has TWO common
    // neighbors and is absent from the edge set; every present edge has
    // common neighbors too but must be anti-joined away
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("u", "v")
    val out = LinkPredict.commonNeighbors(edges, "u", "v", 10, 1)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("n_common"), r.getAs[Long]("pa_score")))
    assert(out.toSeq == Seq((1L, 3L, 2L, 4L), (2L, 4L, 2L, 4L)), out.mkString(";"))
  }

  test("q118: center-degree cap removes hub wedges from the candidate set") {
    import spark.implicits._
    // star: hub 1 with leaves 2..6; every leaf pair shares ONLY the hub.
    // cap >= 5 → C(5,2)=10 predictions; cap 4 silences the hub → none.
    val star = (2L to 6L).map(l => (1L, l)).toDF("u", "v")
    assert(LinkPredict.commonNeighbors(star, "u", "v", 5, 1).count() == 10L)
    assert(LinkPredict.commonNeighbors(star, "u", "v", 4, 1).count() == 0L)
  }

  // ------------------------------------------- q120 label propagation

  test("q120: hand graph — two triangles with a bridge settle into two communities") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L),
      (3L, 4L)).toDF("a", "b")
    val r = graft.ops.LabelProp.propagate(edges, "a", "b", 6).orderBy("node").collect()
    val by = r.map(x => x.getAs[Long]("node") -> x.getAs[Long]("community")).toMap
    assert(Seq(1L, 2L, 3L).forall(by(_) == 1L), s"triangle A: $by")
    assert(Seq(4L, 5L, 6L).forall(by(_) == 4L), s"triangle B: $by")
    assert(r.forall(_.getAs[Boolean]("converged")))
    val cs = r.map(x => x.getAs[Long]("community") -> x.getAs[Long]("csize"))
    assert(cs.forall(_._2 == 3L))
  }

  test("q120: corpus run converges; csize is consistent with the label partition") {
    val r = ExtensionQueries11.q120_label_prop(spark, sf)
    val rows = r.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Boolean]("converged")),
      s"${ExtensionQueries11.LpaRounds} self-voting rounds must reach the fixpoint")
    val byLabel = rows.groupBy(_.getAs[Long]("community"))
    assert(byLabel.forall { case (_, ms) => ms.forall(_.getAs[Long]("csize") == ms.length.toLong) },
      "csize must equal the actual member count of each community")
    assert(byLabel.size > 1 && byLabel.size < rows.length,
      "LPA must coarsen singletons without collapsing the graph into one community")
  }

  // --------------------------------------------- q121/q122 event paths

  test("q121: funnel stages are prefix-monotonic and strictly ordered in time") {
    val rows = ExtensionQueries11.q121_funnel(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (v, c, p) = (Option(r.getAs[java.lang.Long]("v_us")),
        Option(r.getAs[java.lang.Long]("c_us")), Option(r.getAs[java.lang.Long]("p_us")))
      val stage = r.getAs[Int]("stage")
      // a later stage implies every earlier one (no click without a view)
      assert(!(c.isDefined && v.isEmpty) && !(p.isDefined && c.isEmpty))
      assert(stage == Seq(v, c, p).takeWhile(_.isDefined).length)
      // chain is strictly increasing in event time
      for (Seq(x, y) <- Seq(v, c, p).flatten.map(_.toLong).sliding(2))
        assert(x < y, s"funnel must advance strictly: $x !< $y")
    }
    assert(rows.exists(_.getAs[Int]("stage") == 3), "sf0.001 must complete some funnels")
  }

  // ------------------------------------------------- q124 BM25 top-k

  test("q124: scores rank rare-term hits first, non-increasing, hits only") {
    val rows = ExtensionQueries11.q124_bm25_topk(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val scores = rows.map(_.getAs[Long]("score_ppm"))
    assert(scores.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
      "top-k must be non-increasing in score")
    // idf dominance: the rare term carries ~4 idf bits, common terms 0 —
    // every doc containing 'dup' must outrank every doc without it
    import spark.implicits._
    val dupDocs = graft.core.Tables.documents(spark, sf)
      .filter(array_contains(split(col("text"), " "), "dup"))
      .select("doc_id").as[Long].collect().toSet
    val (withDup, without) = rows.partition(r => dupDocs(r.getAs[Long]("doc_id")))
    assert(withDup.nonEmpty, "corpus plants 'dup' docs; top-k must surface them")
    if (without.nonEmpty)
      assert(withDup.map(_.getAs[Long]("score_ppm")).min >
        without.map(_.getAs[Long]("score_ppm")).max,
        "4 idf bits must dominate zero-idf common-term scores")
    assert(rows.forall(_.getAs[Long]("n_hit_terms") >= 1L))
  }

  test("q122: every event except each user's last contributes exactly one transition") {
    val total = ExtensionQueries11.q122_transitions(spark, sfTiny)
      .agg(sum("n")).collect()(0).getLong(0)
    val ev = graft.core.Tables.events(spark, sfTiny)
    val expect = ev.count() - ev.select("user_id").distinct().count()
    assert(total == expect, s"transition mass $total != events-minus-users $expect")
  }
}
