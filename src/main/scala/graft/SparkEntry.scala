package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query groups live under graft.queries; this object only aggregates them.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q01_pricing_summary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ ScoringQueries.queries ++ RelationalQueries2.queries ++ RelationalQueries3.queries ++ RelationalQueries4.queries ++ RelationalQueries5.queries ++ StreamingQueries.queries ++ ExtensionQueries.queries ++ ExtensionQueries2.queries ++ ExtensionQueries3.queries ++ ExtensionQueries4.queries ++ ExtensionQueries5.queries ++ SketchQueries.queries ++ ExtensionQueries6.queries ++ ExtensionQueries7.queries ++ ExtensionQueries8.queries ++ ExtensionQueries9.queries ++ ExtensionQueries10.queries ++ ExtensionQueries11.queries ++ ExtensionQueries12.queries ++ ExtensionQueries13.queries ++ ExtensionQueries14.queries ++ ExtensionQueries15.queries ++ ExtensionQueries16.queries ++ ExtensionQueries17.queries ++ ExtensionQueries18.queries ++ ExtensionQueries19.queries ++ ExtensionQueries20.queries ++ ExtensionQueries21.queries ++ ExtensionQueries22.queries ++ ExtensionQueries23.queries ++ ExtensionQueries24.queries ++ ExtensionQueries25.queries ++ ExtensionQueries26.queries ++ ExtensionQueries27.queries ++ ExtensionQueries28.queries ++ ExtensionQueries29.queries ++ ExtensionQueries30.queries ++ ExtensionQueries31.queries ++ ExtensionQueries32.queries ++ ExtensionQueries33.queries ++ ExtensionQueries34.queries ++ ExtensionQueries35.queries ++ ExtensionQueries36.queries ++ ExtensionQueries37.queries ++ ExtensionQueries38.queries ++ ExtensionQueries39.queries ++ ExtensionQueries40.queries ++ ExtensionQueries41.queries ++ ExtensionQueries42.queries ++ ExtensionQueries43.queries ++ ExtensionQueries44.queries ++ ExtensionQueries45.queries ++ ExtensionQueries46.queries ++ ExtensionQueries47.queries ++ ExtensionQueries48.queries ++ ExtensionQueries49.queries ++ ExtensionQueries50.queries ++ ExtensionQueries51.queries ++ ExtensionQueries52.queries ++ ExtensionQueries53.queries ++ ExtensionQueries54.queries ++ ExtensionQueries55.queries ++ ExtensionQueries56.queries ++ ExtensionQueries57.queries ++ ExtensionQueries58.queries ++ ExtensionQueries59.queries ++ ExtensionQueries60.queries ++ ExtensionQueries61.queries ++ ExtensionQueries62.queries ++ ExtensionQueries63.queries ++ ExtensionQueries64.queries ++ ExtensionQueries65.queries ++ ExtensionQueries66.queries ++ ExtensionQueries67.queries ++ ExtensionQueries68.queries ++ ExtensionQueries69.queries ++ ExtensionQueries70.queries ++ ExtensionQueries71.queries ++ ExtensionQueries72.queries ++ ExtensionQueries73.queries ++ ExtensionQueries74.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver records a weaker
    * rows-only check (reserved for non-SQL-expressible ops).
    */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ ScoringQueries.oracle ++ RelationalQueries2.oracle ++ RelationalQueries3.oracle ++ RelationalQueries4.oracle ++ RelationalQueries5.oracle ++ StreamingQueries.oracle ++ ExtensionQueries.oracle ++ ExtensionQueries2.oracle ++ ExtensionQueries3.oracle ++ ExtensionQueries4.oracle ++ ExtensionQueries5.oracle ++ SketchQueries.oracle ++ ExtensionQueries6.oracle ++ ExtensionQueries7.oracle ++ ExtensionQueries8.oracle ++ ExtensionQueries9.oracle ++ ExtensionQueries10.oracle ++ ExtensionQueries11.oracle ++ ExtensionQueries12.oracle ++ ExtensionQueries13.oracle ++ ExtensionQueries14.oracle ++ ExtensionQueries15.oracle ++ ExtensionQueries16.oracle ++ ExtensionQueries17.oracle ++ ExtensionQueries18.oracle ++ ExtensionQueries19.oracle ++ ExtensionQueries20.oracle ++ ExtensionQueries21.oracle ++ ExtensionQueries22.oracle ++ ExtensionQueries23.oracle ++ ExtensionQueries24.oracle ++ ExtensionQueries25.oracle ++ ExtensionQueries26.oracle ++ ExtensionQueries27.oracle ++ ExtensionQueries28.oracle ++ ExtensionQueries29.oracle ++ ExtensionQueries30.oracle ++ ExtensionQueries31.oracle ++ ExtensionQueries32.oracle ++ ExtensionQueries33.oracle ++ ExtensionQueries34.oracle ++ ExtensionQueries35.oracle ++ ExtensionQueries36.oracle ++ ExtensionQueries37.oracle ++ ExtensionQueries38.oracle ++ ExtensionQueries39.oracle ++ ExtensionQueries40.oracle ++ ExtensionQueries41.oracle ++ ExtensionQueries42.oracle ++ ExtensionQueries43.oracle ++ ExtensionQueries44.oracle ++ ExtensionQueries45.oracle ++ ExtensionQueries46.oracle ++ ExtensionQueries47.oracle ++ ExtensionQueries48.oracle ++ ExtensionQueries49.oracle ++ ExtensionQueries50.oracle ++ ExtensionQueries51.oracle ++ ExtensionQueries52.oracle ++ ExtensionQueries53.oracle ++ ExtensionQueries54.oracle ++ ExtensionQueries55.oracle ++ ExtensionQueries56.oracle ++ ExtensionQueries57.oracle ++ ExtensionQueries58.oracle ++ ExtensionQueries59.oracle ++ ExtensionQueries60.oracle ++ ExtensionQueries61.oracle ++ ExtensionQueries62.oracle ++ ExtensionQueries63.oracle ++ ExtensionQueries64.oracle ++ ExtensionQueries65.oracle ++ ExtensionQueries66.oracle ++ ExtensionQueries67.oracle ++ ExtensionQueries68.oracle ++ ExtensionQueries69.oracle ++ ExtensionQueries70.oracle ++ ExtensionQueries71.oracle ++ ExtensionQueries72.oracle ++ ExtensionQueries73.oracle ++ ExtensionQueries74.oracle

  /** [[oracleSql]] with generated mirrors resolved for a specific sf dir
    * (q38/q70 centroid literals are per-trained-dir; see
    * ExtensionQueries2.oracleFor). Verify uses this so a multi-dir JVM
    * never emits another dir's model.
    */
  def oracleSqlFor(dir: String): Map[String, String] =
    (oracleSql - "q38_ann_ivf" - "q70_semdedup" - "q93_ann_ivfpq" - "q100_pca_project" -
      "q112_bpe_tokens" - "q54_token_packing" - "q113_ann_filtered") ++
      ExtensionQueries2.oracleFor(dir) ++ ExtensionQueries6.oracleFor(dir) ++
      ExtensionQueries7.oracleFor(dir) ++ ExtensionQueries10.oracleFor(dir) ++ ExtensionQueries64.oracleFor(dir) ++ ExtensionQueries65.oracleFor(dir)
}
