package graft

import org.apache.spark.sql.functions._
import graft.ext.{IvfIndex, Similarity}
import graft.queries.ExtensionQueries10

/** Round-7 filtered-ANN pins: predicate semantics, recall floor with
  * margin, and the pre- vs post-filtering separation q114's certification
  * rests on (cross-engine equality is the DuckDB oracle's job).
  */
class FilteredAnnSpec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  private def recallOf(ivf: org.apache.spark.sql.DataFrame,
      exact: org.apache.spark.sql.DataFrame): Double = {
    val e = exact.select(col("probe_id"), col("cand_id"))
    val hits = e.join(ivf.select(col("probe_id"), col("cand_id")),
      Seq("probe_id", "cand_id"), "left_semi").count().toDouble
    hits / e.count()
  }

  test("q113: every candidate satisfies the predicate; k rows per probe where possible") {
    val r = ExtensionQueries10.q113_ann_filtered(spark, sfTiny)
    val labels = graft.core.Tables.embeddings(spark, sfTiny)
      .select(col("vec_id").as("cand_id"), col("label"))
    assert(r.join(labels, "cand_id").filter(col("label") >= 4).count() == 0,
      "a candidate violated the pushed predicate")
    // ~40% of 500 rows qualify — far more than k=5 per probe, so every
    // probe must fill its full k (an under-filled probe = post-filtering)
    val perProbe = r.groupBy(col("probe_id")).count()
    assert(perProbe.filter(col("count") =!= 5).count() == 0,
      "a probe returned fewer than k filtered neighbors")
  }

  test("q114: filtered recall clears the floor WITH margin; post-filtering does not") {
    val e = graft.core.Tables.embeddings(spark, sfTiny)
    val m = IvfIndex.train(e, "vec_id", "embedding", nlist = 16)
    val pred = col("label") < 4
    val exact = Similarity.bruteForceTopKFiltered(
      e, "vec_id", "embedding", col("vec_id") < 20, 5, pred)
    val pre = IvfIndex.ivfTopKFiltered(
      e, "vec_id", "embedding", col("vec_id") < 20, 5, m, 4, pred)
    val rPre = recallOf(pre, exact)
    assert(rPre >= 0.50, f"pre-filtered recall $rPre%.2f leaves no margin over the 0.40 floor")
    // the classic bug: filter AFTER the unfiltered top-k truncation —
    // rows are discarded post-rank, probes go under-filled, recall craters
    val post = IvfIndex.ivfTopK(e, "vec_id", "embedding", col("vec_id") < 20, 5, m, 4)
      .join(e.select(col("vec_id").as("cand_id"), col("label")), "cand_id")
      .filter(pred)
    val rPost = recallOf(post, exact)
    assert(rPost < rPre,
      f"post-filtering ($rPost%.2f) should lose to predicate-first probing ($rPre%.2f)")
    info(f"pre-filter recall $rPre%.2f, post-filter recall $rPost%.2f")
  }
}
