package graft

import graft.queries._

/** Driver-contract invariants: the query map must not silently lose
  * entries (Map ++ overrides on key collision) and every oracle key must
  * name a real query.
  */
class ContractSpec extends SparkSpecBase {

  private val groups = Seq(
    "relational" -> (RelationalQueries.queries.keySet, RelationalQueries.oracle.keySet),
    "scoring" -> (ScoringQueries.queries.keySet, ScoringQueries.oracle.keySet),
    "relational2" -> (RelationalQueries2.queries.keySet, RelationalQueries2.oracle.keySet),
    "relational3" -> (RelationalQueries3.queries.keySet, RelationalQueries3.oracle.keySet),
    "relational4" -> (RelationalQueries4.queries.keySet, RelationalQueries4.oracle.keySet),
    "relational5" -> (RelationalQueries5.queries.keySet, RelationalQueries5.oracle.keySet),
    "streaming" -> (StreamingQueries.queries.keySet, StreamingQueries.oracle.keySet),
    "extension" -> (ExtensionQueries.queries.keySet, ExtensionQueries.oracle.keySet),
    "extension2" -> (ExtensionQueries2.queries.keySet, ExtensionQueries2.oracle.keySet),
    "extension3" -> (ExtensionQueries3.queries.keySet, ExtensionQueries3.oracle.keySet),
    "extension4" -> (ExtensionQueries4.queries.keySet, ExtensionQueries4.oracle.keySet),
    "extension5" -> (ExtensionQueries5.queries.keySet, ExtensionQueries5.oracle.keySet),
    "sketch" -> (SketchQueries.queries.keySet, SketchQueries.oracle.keySet),
    "extension6" -> (ExtensionQueries6.queries.keySet, ExtensionQueries6.oracle.keySet))

  /** The sketch-tier queries whose ESTIMATES cannot hash-match another
    * engine's sketch — rows-only by design, bounds pinned in SketchSpec.
    */
  private val sketchOnly =
    Set("q81_hll_distinct", "q82_quantile_sketch", "q83_heavy_hitters",
      "q85_set_overlap_sketch")

  test("no query-name collisions across groups (Map ++ would drop silently)") {
    val all = groups.flatMap(_._2._1)
    assert(all.size == all.distinct.size,
      s"duplicate names: ${all.diff(all.distinct)}")
    assert(SparkEntry.queries.size == all.size)
  }

  test("every oracle key names a registered query; q38's oracle appears once trained") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os.diff(qs)}")
    // the q38/q70 mirrors embed the trained centroids, so their entries
    // exist only after a query has trained the dir's model (Verify's order
    // guarantees that in the driver gate). Everything else always carries
    // its DuckDB oracle.
    assert(qs.diff(os).subsetOf(
      Set("q38_ann_ivf", "q70_semdedup", "q93_ann_ivfpq") ++ sketchOnly),
      s"unexpected rows-only queries: ${qs.diff(os)}")
    ExtensionQueries2.q38_ann_ivf(spark, "/root/testdata/sf0.001").count()
    ExtensionQueries6.q93_ann_ivfpq(spark, "/root/testdata/sf0.001").count()
    assert(SparkEntry.oracleSql.keySet == qs -- sketchOnly,
      "generated oracles missing after training (Verify would dump an incomplete map)")
    assert(SparkEntry.oracleSqlFor("/root/testdata/sf0.001").keySet == qs -- sketchOnly)
  }

  test("entry (driver smoke) returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
