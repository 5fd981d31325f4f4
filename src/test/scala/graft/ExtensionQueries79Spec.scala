package graft

import org.apache.spark.sql.functions._

import graft.queries.{ExtensionQueries13, ExtensionQueries79}

/** Semantics pins for the batch-engineering/eval batch (q329-q331):
  * every table recomputes driver-side from the collected inputs.
  */
class ExtensionQueries79Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q329: bins conserve the corpus and rates equal the driver recompute") {
    val docs = graft.core.Tables.documents(spark, dir)
    val margins = ExtensionQueries13.hashMargin(docs, "doc_id", "text")
      .select("doc_id", "margin").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pos = docs.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> (r.getString(1) == "en")).toMap
    val n = margins.size.toLong
    // exact rank cells with ties sharing their LAST member's bin
    val byMargin = margins.values.groupBy(identity).view
      .mapValues(_.size.toLong).toSeq.sortBy(_._1)
    val cum = byMargin.scanLeft(0L)(_ + _._2).drop(1)
    val binOf = byMargin.map(_._1).zip(cum)
      .map { case (m, c) => m -> ((c - 1) * 10) / n }.toMap
    val ref = margins.toSeq.groupBy { case (_, m) => binOf(m) }
      .map { case (bin, ds) =>
        val p = ds.count { case (id, _) => pos(id) }.toLong
        bin -> (ds.size.toLong, p, p * 1000000L / ds.size)
      }
    val rows = ExtensionQueries79.q329_calibration_bins(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(5)))
      .toMap
    assert(rows == ref)
    assert(rows.values.map(_._1).sum == n, "doc conservation")
    assert(rows.keys.forall(b => b >= 0 && b <= 9))
  }

  test("q330: waste equals the driver chunking; bigger batches waste more") {
    val lens = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, n) => (-n, id) }.map(_._2)
    def refFor(b: Int) = {
      val groups = lens.grouped(b).toSeq
      val total = lens.sum
      val padded = groups.map(g => g.max * g.length).sum
      (groups.size.toLong, total, padded,
        (padded - total) * 1000000L / padded)
    }
    val rows = ExtensionQueries79.q330_padding_waste(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows(8L) == refFor(8))
    assert(rows(32L) == refFor(32))
    // sorted-by-length batching: larger batches can only pad more
    assert(rows(32L)._4 >= rows(8L)._4)
  }

  test("q331: per-dim lower median/MAD equal the driver order statistics") {
    val vecs = graft.core.Tables.embeddings(spark, dir)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val dims = vecs.head.length
    def lowerMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s(((xs.size + 1) / 2 - 1).toInt)
    }
    val rows = ExtensionQueries79.q331_embedding_robust_scale(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.size == dims)
    (0 until dims).foreach { d =>
      // HALF_UP (away from zero) to match Spark's round(double) and
      // DuckDB's half-away — Scala's math.round is floor(x+0.5), which
      // differs on negative .5 boundaries
      val vs = vecs.map(v => BigDecimal(v(d).toDouble * 1000000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      val med = lowerMedian(vs.toSeq)
      val devs = vs.map(v => math.abs(v - med))
      val mad = lowerMedian(devs.toSeq)
      val out = devs.count(_ > mad * 5).toLong
      assert(rows(d.toLong) == ((vs.length.toLong, med, mad, out)), s"dim $d")
    }
  }
}
