package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed, mergeable aggregators (SURVEY §2 J): buffer-mergeable by
  * construction, so the same aggregator is correct under partial
  * aggregation, AQE re-planning, and streaming state merges.
  */
object Aggregators {

  /** Weighted mean with the reference's neutral-weight rule (weight <= 0 or
    * null → 1.0, `etl_merge.py:683`): a pair-of-sums buffer, exact merge.
    */
  final case class WSum(pxw: Double, w: Double)

  class WeightedMean extends Aggregator[(Double, Double), WSum, Option[Double]] {
    override def zero: WSum = WSum(0.0, 0.0)
    override def reduce(b: WSum, in: (Double, Double)): WSum = {
      val (value, weight) = in
      val w = if (weight > 0) weight else 1.0
      WSum(b.pxw + value * w, b.w + w)
    }
    override def merge(a: WSum, b: WSum): WSum = WSum(a.pxw + b.pxw, a.w + b.w)
    override def finish(r: WSum): Option[Double] =
      if (r.w > 0) Some(r.pxw / r.w) else None
    override def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
    override def outputEncoder: Encoder[Option[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
