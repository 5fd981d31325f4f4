package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Sequential global ranking for frames that are ALREADY BOUNDED — the
  * second half of the sort+limit idiom (q07): take top-k with
  * `orderBy(...).limit(k)` (TakeOrderedAndProject — per-partition top-k,
  * tiny merge), then number the k survivors.
  */
object Ranks {

  /** Window spec for ranking a bounded frame. `pmod(hash(key), 1)` is 0 for
    * every row but non-foldable, so the spec keeps an explicit partition
    * key: the single bucket is bounded by construction (callers sort+limit
    * first) and WindowExec never plans — or warns about — an unbounded
    * global window. No extra shuffle: the limit's single-partition output
    * already satisfies the clustered distribution.
    *
    * @param anyCol any existing input column (hash fodder for the
    *               non-foldable constant key)
    * @param order  total ordering — must include a tiebreaker
    */
  def bounded(anyCol: Column, order: Column*): WindowSpec =
    Window.partitionBy(pmod(hash(anyCol), lit(1))).orderBy(order: _*)
}
