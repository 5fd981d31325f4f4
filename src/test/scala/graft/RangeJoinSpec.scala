package graft

import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

/** RangeJoin.bucketed must be pair-for-pair identical to the naive range
  * join (which Spark plans as BNLJ — fine as a tiny-fixture oracle here,
  * the exact plan q86 exists to avoid), across bucket-boundary geometry:
  * intervals inside one bucket, straddling buckets, exactly on the
  * boundary, zero-length, and points at both inclusive endpoints.
  */
class RangeJoinSpec extends SparkSpecBase {

  import spark.implicits._

  private def naive(points: org.apache.spark.sql.DataFrame,
      intervals: org.apache.spark.sql.DataFrame) =
    points.join(intervals,
      col("pt") >= col("lo") && col("pt") <= col("hi"))

  test("bucketed == naive on boundary geometry (width 10)") {
    val intervals = Seq(
      (1L, 2L, 7L),    // inside one bucket
      (2L, 8L, 13L),   // straddles bucket edge 10
      (3L, 10L, 20L),  // starts exactly on a boundary
      (4L, 15L, 15L),  // zero-length
      (5L, 29L, 41L)   // spans three buckets
    ).toDF("iid", "lo", "hi")
    val points = (0L to 45L).toDF("pt")
    val got = RangeJoin.bucketed(points, "pt", intervals, "lo", "hi", 10L)
      .select("pt", "iid").as[(Long, Long)].collect().toSet
    val want = naive(points, intervals)
      .select("pt", "iid").as[(Long, Long)].collect().toSet
    assert(got == want)
    // inclusive endpoints really joined
    assert(want.contains((8L, 2L)) && want.contains((13L, 2L)) && want.contains((15L, 4L)))
  }

  test("a point matching in its own bucket is emitted exactly once (no dedup needed)") {
    val intervals = Seq((1L, 0L, 100L)).toDF("iid", "lo", "hi") // spans 11 buckets
    val points = Seq(5L, 50L, 95L).toDF("pt")
    val rows = RangeJoin.bucketed(points, "pt", intervals, "lo", "hi", 10L).count()
    assert(rows == 3L, "one output row per matching point, despite the 11-bucket explosion")
  }

  test("bucketedOverlap == naive overlap join, duplicate-free, across widths") {
    // deterministic pseudo-random interval sets with many multi-bucket
    // spans and boundary touches; the canonical-bucket rule must emit
    // each overlapping pair exactly once at ANY width
    def mk(n: Int, seed: Long, sName: String, eName: String, idName: String) =
      spark.range(n)
        .select(col("id").as(idName),
          pmod(xxhash64(col("id"), lit(seed)), lit(200)).as(sName))
        .withColumn(eName,
          col(sName) + pmod(xxhash64(col(idName), lit(seed + 1)), lit(35)))
    val a = mk(60, 11L, "a_s", "a_e", "a_id")
    val b = mk(80, 29L, "b_s", "b_e", "b_id")
    val want = a.join(b, col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select("a_id", "b_id").as[(Long, Long)].collect()
      .sorted.toSeq
    assert(want.nonEmpty && want.distinct == want)
    for (w <- Seq(7L, 10L, 64L, 1000L)) {
      val got = RangeJoin.bucketedOverlap(a, "a_s", "a_e", b, "b_s", "b_e", w)
        .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
      assert(got == want, s"width $w: ${got.length} pairs vs ${want.length} " +
        s"(dups: ${got.diff(got.distinct).take(5)})")
    }
  }

  test("q86 matches the naive range join at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val ev = graft.core.Tables.events(spark, sf)
    val w = ev.filter(pmod(col("event_id"), lit(200)) === 0)
      .select(col("event_id").as("iid"), col("ts").cast("long").as("lo"),
        (col("ts").cast("long") + 30L * 60L * 1000000000L).as("hi"))
    val p = ev.select(col("ts").cast("long").as("pt"), col("event_id"))
    val wantPairs = naive(p, w).count()
    val gotAgg = graft.queries.ExtensionQueries6.q86_range_join(spark, sf)
    assert(gotAgg.agg(sum("n_events")).head().getLong(0) == wantPairs)
  }
}
