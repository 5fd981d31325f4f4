package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{FpSafe, Tables}

/** Coverage batch 5: collection/conditional aggregates and unpivot. */
object RelationalQueries5 {
  import FpSafe._

  type Q = (SparkSession, String) => DataFrame

  /** q44: collection + conditional aggregates — sorted distinct collect
    * (collect_set is unordered; sorting pins it; array_join-serialized so
    * the result is a flat hashable column), count_if, bool and/or,
    * min_by/max_by with deterministic keys.
    */
  def q44_collection_aggs(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.groupBy(col("o_orderstatus"))
      .agg(
        array_join(array_sort(collect_set(col("o_orderpriority"))), ",").as("priorities"),
        count_if(col("o_totalprice") > 200000).as("n_big"),
        every(col("o_totalprice") > 0).as("all_positive"),
        some(col("o_totalprice") > 400000).as("any_huge"),
        // tie-proof scalar ordering key: exact cents * 2^35 + orderkey
        // (DuckDB min_by rejects struct keys; cents<2^26 so the composite stays
        // < 2^61 and stays tie-proof for orderkeys up to 2^35)
        min_by(col("o_orderkey"),
          cents(col("o_totalprice")) * 34359738368L + col("o_orderkey")).as("cheapest_key"),
        max_by(col("o_orderkey"),
          cents(col("o_totalprice")) * 34359738368L + col("o_orderkey")).as("priciest_key"))
      .orderBy(col("o_orderstatus"))
  }

  val q44Sql: String =
    """SELECT o_orderstatus,
      |  array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities,
      |  count(*) FILTER (o_totalprice > 200000) AS n_big,
      |  bool_and(o_totalprice > 0) AS all_positive,
      |  bool_or(o_totalprice > 400000) AS any_huge,
      |  min_by(o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) * 34359738368 + o_orderkey) AS cheapest_key,
      |  max_by(o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) * 34359738368 + o_orderkey) AS priciest_key
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** q45: unpivot/melt — lineitem measures wide→long, then exact per-measure
    * rollup (the reshape primitive for metric tables).
    */
  def q45_unpivot(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.select(col("l_orderkey"),
      cents(col("l_extendedprice")).as("extendedprice"),
      tenK(col("l_discount")).as("discount"),
      tenK(col("l_tax")).as("tax"))
      .unpivot(Array(col("l_orderkey")),
        Array(col("extendedprice"), col("discount"), col("tax")),
        "measure", "v")
      .groupBy(col("measure"))
      .agg(sum(col("v")).as("total"), count(lit(1)).as("n"),
        min(col("v")).as("vmin"), max(col("v")).as("vmax"))
      .orderBy(col("measure"))
  }

  val q45Sql: String =
    """WITH wide AS (
      |  SELECT l_orderkey,
      |    CAST(round(l_extendedprice*100) AS BIGINT) AS extendedprice,
      |    CAST(round(l_discount*10000) AS BIGINT) AS discount,
      |    CAST(round(l_tax*10000) AS BIGINT) AS tax
      |  FROM lineitem
      |), longf AS (
      |  SELECT l_orderkey, measure, v FROM wide
      |  UNPIVOT (v FOR measure IN (extendedprice, discount, tax))
      |)
      |SELECT measure, CAST(sum(v) AS BIGINT) AS total, count(*) AS n,
      |  CAST(min(v) AS BIGINT) AS vmin, CAST(max(v) AS BIGINT) AS vmax
      |FROM longf GROUP BY measure ORDER BY measure""".stripMargin

  /** q51: exact-decimal money aggregation — the DecimalType path (no FP
    * drift at any scale or partitioning): prices enter as exact cents,
    * become decimal(18,2) via exact decimal multiplication (never through
    * doubles), and sum/min/max exactly. The reference's CSV-flat world has
    * no decimals (SURVEY §1.2); a 100 TB money pipeline needs them.
    * Results leave as canonical fixed-scale STRINGS: the harness comparator
    * hashes cells through pandas, where parquet decimals surface as Decimal
    * objects but DuckDB decimals may surface as float64 — the same
    * cross-representation trap that made q44's arrays red in round 1.
    */
  def q51_decimal_money(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val p = (cents(col("l_extendedprice")).cast("decimal(18,0)") *
      lit(new java.math.BigDecimal("0.01"))).cast("decimal(18,2)")
    li.select(col("l_returnflag"), p.as("p"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("p")).cast("decimal(38,2)").cast("string").as("sum_price"),
        min(col("p")).cast("decimal(18,2)").cast("string").as("min_price"),
        max(col("p")).cast("decimal(18,2)").cast("string").as("max_price"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  val q51Sql: String =
    """WITH t AS (
      |  SELECT l_returnflag,
      |    CAST(CAST(CAST(round(l_extendedprice*100) AS BIGINT) AS DECIMAL(18,0))
      |         * CAST(0.01 AS DECIMAL(3,2)) AS DECIMAL(18,2)) AS p
      |  FROM lineitem
      |)
      |SELECT l_returnflag,
      |  CAST(CAST(sum(p) AS DECIMAL(38,2)) AS VARCHAR) AS sum_price,
      |  CAST(CAST(min(p) AS DECIMAL(18,2)) AS VARCHAR) AS min_price,
      |  CAST(CAST(max(p) AS DECIMAL(18,2)) AS VARCHAR) AS max_price,
      |  count(*) AS n
      |FROM t GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, Q] = Map(
    "q44_collection_aggs" -> (q44_collection_aggs _),
    "q45_unpivot" -> (q45_unpivot _),
    "q51_decimal_money" -> (q51_decimal_money _)
  )

  val oracle: Map[String, String] = Map(
    "q44_collection_aggs" -> q44Sql,
    "q45_unpivot" -> q45Sql,
    "q51_decimal_money" -> q51Sql
  )
}
