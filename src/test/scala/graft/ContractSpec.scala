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
    "extension6" -> (ExtensionQueries6.queries.keySet, ExtensionQueries6.oracle.keySet),
    "extension7" -> (ExtensionQueries7.queries.keySet, ExtensionQueries7.oracle.keySet),
    "extension8" -> (ExtensionQueries8.queries.keySet, ExtensionQueries8.oracle.keySet),
    "extension9" -> (ExtensionQueries9.queries.keySet, ExtensionQueries9.oracle.keySet),
    "extension10" -> (ExtensionQueries10.queries.keySet, ExtensionQueries10.oracle.keySet),
    "extension11" -> (ExtensionQueries11.queries.keySet, ExtensionQueries11.oracle.keySet),
    "extension12" -> (ExtensionQueries12.queries.keySet, ExtensionQueries12.oracle.keySet),
    "extension13" -> (ExtensionQueries13.queries.keySet, ExtensionQueries13.oracle.keySet),
    "extension14" -> (ExtensionQueries14.queries.keySet, ExtensionQueries14.oracle.keySet),
    "extension15" -> (ExtensionQueries15.queries.keySet, ExtensionQueries15.oracle.keySet),
    "extension16" -> (ExtensionQueries16.queries.keySet, ExtensionQueries16.oracle.keySet),
    "extension17" -> (ExtensionQueries17.queries.keySet, ExtensionQueries17.oracle.keySet),
    "extension18" -> (ExtensionQueries18.queries.keySet, ExtensionQueries18.oracle.keySet),
    "extension19" -> (ExtensionQueries19.queries.keySet, ExtensionQueries19.oracle.keySet),
    "extension20" -> (ExtensionQueries20.queries.keySet, ExtensionQueries20.oracle.keySet),
    "extension21" -> (ExtensionQueries21.queries.keySet, ExtensionQueries21.oracle.keySet),
    "extension22" -> (ExtensionQueries22.queries.keySet, ExtensionQueries22.oracle.keySet),
    "extension23" -> (ExtensionQueries23.queries.keySet, ExtensionQueries23.oracle.keySet),
    "extension24" -> (ExtensionQueries24.queries.keySet, ExtensionQueries24.oracle.keySet),
    "extension25" -> (ExtensionQueries25.queries.keySet, ExtensionQueries25.oracle.keySet),
    "extension26" -> (ExtensionQueries26.queries.keySet, ExtensionQueries26.oracle.keySet),
    "extension27" -> (ExtensionQueries27.queries.keySet, ExtensionQueries27.oracle.keySet),
    "extension28" -> (ExtensionQueries28.queries.keySet, ExtensionQueries28.oracle.keySet),
    "extension29" -> (ExtensionQueries29.queries.keySet, ExtensionQueries29.oracle.keySet),
    "extension30" -> (ExtensionQueries30.queries.keySet, ExtensionQueries30.oracle.keySet),
    "extension31" -> (ExtensionQueries31.queries.keySet, ExtensionQueries31.oracle.keySet),
    "extension32" -> (ExtensionQueries32.queries.keySet, ExtensionQueries32.oracle.keySet),
    "extension33" -> (ExtensionQueries33.queries.keySet, ExtensionQueries33.oracle.keySet),
    "extension34" -> (ExtensionQueries34.queries.keySet, ExtensionQueries34.oracle.keySet),
    "extension35" -> (ExtensionQueries35.queries.keySet, ExtensionQueries35.oracle.keySet),
    "extension36" -> (ExtensionQueries36.queries.keySet, ExtensionQueries36.oracle.keySet),
    "extension37" -> (ExtensionQueries37.queries.keySet, ExtensionQueries37.oracle.keySet),
    "extension38" -> (ExtensionQueries38.queries.keySet, ExtensionQueries38.oracle.keySet),
    "extension39" -> (ExtensionQueries39.queries.keySet, ExtensionQueries39.oracle.keySet),
    "extension40" -> (ExtensionQueries40.queries.keySet, ExtensionQueries40.oracle.keySet),
    "extension41" -> (ExtensionQueries41.queries.keySet, ExtensionQueries41.oracle.keySet),
    "extension42" -> (ExtensionQueries42.queries.keySet, ExtensionQueries42.oracle.keySet),
    "extension43" -> (ExtensionQueries43.queries.keySet, ExtensionQueries43.oracle.keySet),
    "extension44" -> (ExtensionQueries44.queries.keySet, ExtensionQueries44.oracle.keySet),
    "extension45" -> (ExtensionQueries45.queries.keySet, ExtensionQueries45.oracle.keySet),
    "extension46" -> (ExtensionQueries46.queries.keySet, ExtensionQueries46.oracle.keySet),
    "extension47" -> (ExtensionQueries47.queries.keySet, ExtensionQueries47.oracle.keySet),
    "extension48" -> (ExtensionQueries48.queries.keySet, ExtensionQueries48.oracle.keySet),
    "extension49" -> (ExtensionQueries49.queries.keySet, ExtensionQueries49.oracle.keySet),
    "extension50" -> (ExtensionQueries50.queries.keySet, ExtensionQueries50.oracle.keySet),
    "extension51" -> (ExtensionQueries51.queries.keySet, ExtensionQueries51.oracle.keySet),
    "extension52" -> (ExtensionQueries52.queries.keySet, ExtensionQueries52.oracle.keySet),
    "extension53" -> (ExtensionQueries53.queries.keySet, ExtensionQueries53.oracle.keySet),
    "extension54" -> (ExtensionQueries54.queries.keySet, ExtensionQueries54.oracle.keySet),
    "extension55" -> (ExtensionQueries55.queries.keySet, ExtensionQueries55.oracle.keySet),
    "extension56" -> (ExtensionQueries56.queries.keySet, ExtensionQueries56.oracle.keySet),
    "extension57" -> (ExtensionQueries57.queries.keySet, ExtensionQueries57.oracle.keySet),
    "extension58" -> (ExtensionQueries58.queries.keySet, ExtensionQueries58.oracle.keySet),
    "extension59" -> (ExtensionQueries59.queries.keySet, ExtensionQueries59.oracle.keySet),
    "extension60" -> (ExtensionQueries60.queries.keySet, ExtensionQueries60.oracle.keySet),
    "extension61" -> (ExtensionQueries61.queries.keySet, ExtensionQueries61.oracle.keySet),
    "extension62" -> (ExtensionQueries62.queries.keySet, ExtensionQueries62.oracle.keySet),
    "extension63" -> (ExtensionQueries63.queries.keySet, ExtensionQueries63.oracle.keySet),
    "extension64" -> (ExtensionQueries64.queries.keySet, ExtensionQueries64.oracle.keySet),
    "extension65" -> (ExtensionQueries65.queries.keySet, ExtensionQueries65.oracle.keySet),
    "extension66" -> (ExtensionQueries66.queries.keySet, ExtensionQueries66.oracle.keySet),
    "extension67" -> (ExtensionQueries67.queries.keySet, ExtensionQueries67.oracle.keySet),
    "extension68" -> (ExtensionQueries68.queries.keySet, ExtensionQueries68.oracle.keySet),
    "extension69" -> (ExtensionQueries69.queries.keySet, ExtensionQueries69.oracle.keySet),
    "extension70" -> (ExtensionQueries70.queries.keySet, ExtensionQueries70.oracle.keySet),
    "extension71" -> (ExtensionQueries71.queries.keySet, ExtensionQueries71.oracle.keySet),
    "extension72" -> (ExtensionQueries72.queries.keySet, ExtensionQueries72.oracle.keySet),
    "extension73" -> (ExtensionQueries73.queries.keySet, ExtensionQueries73.oracle.keySet))

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
    // its DuckDB oracle — since round 6 that includes the sketch tier
    // (certified exact-plus-boolean rows, round-5 verdict ask #2).
    assert(qs.diff(os).subsetOf(
      Set("q38_ann_ivf", "q70_semdedup", "q93_ann_ivfpq", "q100_pca_project",
        "q112_bpe_tokens", "q54_token_packing", "q113_ann_filtered",
        "q285_ivfpq_persisted", "q286_bpe_persisted", "q287_pca_persisted",
        "q290_ivf_utilization")),
      s"unexpected rows-only queries: ${qs.diff(os)}")
    ExtensionQueries2.q38_ann_ivf(spark, "/root/testdata/sf0.001").count()
    ExtensionQueries6.q93_ann_ivfpq(spark, "/root/testdata/sf0.001").count()
    ExtensionQueries7.q100_pca_project(spark, "/root/testdata/sf0.001").count()
    ExtensionQueries10.q112_bpe_tokens(spark, "/root/testdata/sf0.001").count()
    // round-trips the persisted models, so the q285-q287 mirrors resolve
    ExtensionQueries64.q285_ivfpq_persisted(spark, "/root/testdata/sf0.001").count()
    assert(SparkEntry.oracleSql.keySet == qs,
      "generated oracles missing after training (Verify would dump an incomplete map)")
    assert(SparkEntry.oracleSqlFor("/root/testdata/sf0.001").keySet == qs)
  }

  test("entry (driver smoke) returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
