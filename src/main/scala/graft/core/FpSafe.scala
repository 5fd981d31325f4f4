package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic floating-point aggregation.
  *
  * IEEE-754 double addition is not associative, so `sum(double)` depends on
  * accumulation order. Spark merges shuffle partials in fetch order and DuckDB
  * sums in scan order, so the two engines can disagree in the last bits — which
  * breaks a hash-compared oracle. The test corpus's money-like columns
  * (`l_extendedprice`, `o_totalprice`, `*_acctbal`, `events.value`, …) are
  * 2-decimal fixed-point, and `l_quantity` is integral, so we aggregate exact
  * integer "cents" in a long and unscale once at the end. The result is
  * bit-identical in any engine, under any partitioning, at any scale — and for
  * Spark it is also *faster* than double sums (long adds, no FP pipeline
  * stalls), so the trick is production-sane for fixed-point business metrics,
  * not just an oracle workaround.
  *
  * DuckDB oracle mirror for each helper is documented inline.
  */
object FpSafe {

  /** Exact integer cents of a 2-decimal double column (long).
    * DuckDB: `CAST(round(c * 100) AS BIGINT)`.
    */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Exact sum of a 2-decimal column, as double.
    * DuckDB: `CAST(sum(CAST(round(c*100) AS BIGINT)) AS BIGINT) / 100.0`.
    */
  def moneySum(c: Column): Column = sum(cents(c)) / 100.0

  /** Exact long sum of an integral-valued double column.
    * DuckDB: `CAST(sum(CAST(round(c) AS BIGINT)) AS BIGINT)`.
    */
  def intSum(c: Column): Column = sum(round(c).cast("long"))

  /** Exact 4-decimal scaling (for 2-decimal-percent columns like l_discount).
    * DuckDB: `CAST(round(c * 10000) AS BIGINT)`.
    */
  def tenK(c: Column): Column = round(c * 10000).cast("long")

  /** The unbounded-scale tier: exact money sum as DecimalType(38,2).
    * Long cents overflow past ~9.2e16 cents (≈ 92 trillion currency units
    * summed); decimal(38) carries ~1e36 — Spark's vectorized decimal sum
    * keeps this map-side-combinable on any realistic corpus.
    * DuckDB: `sum(CAST(c AS DECIMAL(38,2)))` (DuckDB decimal casts of
    * 2-decimal doubles round to the same cents).
    * Same value as [[moneySum]] wherever both are in range (pinned in
    * PropertySpec).
    */
  def moneySumDecimal(c: Column): Column =
    sum(c.cast("decimal(38,2)"))
}
