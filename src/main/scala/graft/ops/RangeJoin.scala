package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range (interval) join: `points.pt BETWEEN intervals.start AND
  * intervals.end` as an EQUI-join. Open-source Spark plans a bare range
  * predicate as BroadcastNestedLoopJoin (or a cartesian product when
  * neither side broadcasts) — O(|P|·|I|) comparisons and a scale cliff
  * the moment the interval side outgrows the broadcast budget. The
  * standard fix (Flink's interval join, the range-bucketing trick behind
  * proprietary range-join optimizers) is to discretize time:
  *
  *  - each interval is exploded to the bucket ids its span touches
  *    (`start div width .. end div width` — factor len/width + 1 rows);
  *  - each point computes its single bucket id;
  *  - the join becomes `point.bucket = interval.bucket` — hash-joinable,
  *    shuffle-partitionable, broadcastable, AQE-skew-splittable like any
  *    equi-join — followed by the exact BETWEEN as a post-filter.
  *
  * A point matches an interval in EXACTLY ONE bucket (its own), so no
  * dedup pass is needed. Pick `width` near the p95 interval length:
  * explosion stays ~2× while candidate pairs per bucket stay sparse.
  * Integer `div` keeps the bucketing exact for epoch-ns longs (the
  * repo's cross-engine time-math contract, see q77).
  *
  * Column names must not collide across the two frames (rename before
  * calling — the join output carries both sides' columns).
  */
object RangeJoin {

  def bucketed(points: DataFrame, ptCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      width: Long): DataFrame = {
    require(width > 0, "bucket width must be positive")
    val iv = intervals.withColumn("__bucket",
      explode(sequence(expr(s"$startCol div ${width}L"), expr(s"$endCol div ${width}L"))))
    val pts = points.withColumn("__bucket", expr(s"$ptCol div ${width}L"))
    pts.join(iv, Seq("__bucket"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bucket")
  }

  /** INTERVAL × INTERVAL overlap join — the two-sided generalization of
    * [[bucketed]] (inclusive overlap: aStart ≤ bEnd AND bStart ≤ aEnd).
    * Both sides explode to the buckets their span touches and hash-join
    * on the bucket id; the subtlety two-sided bucketing adds is that an
    * overlapping pair shares EVERY bucket their intersection touches, so
    * a naive bucket join emits duplicates. Rather than a distinct (a
    * full shuffle of the pair set), each pair is emitted only in its
    * CANONICAL bucket — the bucket of max(aStart, bStart), the
    * intersection's left edge, which both sides provably cover — so the
    * output is exactly one row per overlapping pair with no dedup pass
    * (the genomics-engine interval-join trick). Same width guidance and
    * exact integer `div` contract as [[bucketed]]; column names must not
    * collide across the frames.
    */
  def bucketedOverlap(a: DataFrame, aStart: String, aEnd: String,
      b: DataFrame, bStart: String, bEnd: String, width: Long): DataFrame = {
    require(width > 0, "bucket width must be positive")
    def exploded(df: DataFrame, s: String, e: String) = df.withColumn("__bucket",
      explode(sequence(expr(s"$s div ${width}L"), expr(s"$e div ${width}L"))))
    exploded(a, aStart, aEnd).join(exploded(b, bStart, bEnd), Seq("__bucket"))
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      .filter(col("__bucket") === expr(s"greatest($aStart, $bStart) div ${width}L"))
      .drop("__bucket")
  }
}
