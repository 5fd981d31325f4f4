package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Wrappers that reproduce the reference engine's pandas semantics where they
  * differ from Spark SQL defaults (see SURVEY.md §4.3). Each helper cites the
  * reference behavior it mirrors (file:line into /root/reference/).
  */
object PandasCompat {

  /** pandas groupby-sum of an all-NaN/empty group is 0.0; Spark sum is null.
    * Mirrors `etl_merge.py:672-675`, `:698-710` (GSC/GA4 sum aggregation).
    */
  def sumZero(c: Column): Column = coalesce(sum(c), lit(0.0))

  /** Null-guarded division: x/0 → null (pandas gives inf for x/0; the
    * reference's ctr recompute (`etl_merge.py:695`) explicitly maps
    * impressions==0 → NaN first, i.e. null-division semantics).
    */
  def divNull(num: Column, den: Column): Column =
    num / when(den === 0, lit(null)).otherwise(den)

  /** pandas `.clip(lower=0)` keeps NaN as NaN (`etl_merge.py:819-824`);
    * Spark `greatest(null, 0)` would return 0. Null-propagating clip.
    */
  def clipNonNeg(c: Column): Column =
    when(c.isNull, lit(null)).otherwise(greatest(c, lit(0.0)))

  /** pandas `.round(n)` is banker's rounding (HALF_EVEN); Spark `round` is
    * HALF_UP. Mirrors `etl_merge.py:860-885` (output rounding suite).
    */
  def broundN(c: Column, n: Int): Column = bround(c, n)
}
