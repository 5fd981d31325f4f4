package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable-sketch tier (round-4 verdict ask #7): the approximate
  * complement to the exact distinct/percentile operators (q36, q08/q61).
  * The EXACT tier stays the oracle-hashed surface (a different engine's
  * sketch can never hash-match, see RelationalQueries3 q36 note); this
  * tier exists for the 100 TB regime where an exact global distinct or
  * percentile is a full-shuffle of the key universe, while a sketch is a
  * few KB per group, mergeable across partitions, days, and shards
  * without ever rescanning history. Correctness contract is therefore an
  * ERROR BOUND pinned by SketchSpec, not a DuckDB hash.
  *
  * Two families:
  *  - distinct count: Spark's built-in DataSketches HLL
  *    (`hll_sketch_agg` / `hll_union` / `hll_sketch_estimate` — codegen'd,
  *    order-independent, register-max mergeable) used directly by
  *    [[graft.queries.SketchQueries]]; nothing to reimplement.
  *  - quantiles: Spark exposes `approx_percentile` but NOT a mergeable
  *    quantile-sketch VALUE — you cannot store a group's sketch and merge
  *    it with tomorrow's. The [[QuantileSketchBytes]] /
  *    [[QuantileSketchMergeQuery]] aggregators close that gap on top of
  *    Spark's own Greenwald-Khanna implementation
  *    (`catalyst.util.QuantileSummaries`, the machinery inside
  *    `approx_percentile`/`df.stat.approxQuantile`): rank error ≤ eps·n
  *    for a single sketch, ≤ 2·eps·n after a merge (GK merge bound).
  *
  * Buffers use the Kryo encoder: `QuantileSummaries` is Serializable but
  * not a product; the buffer crosses the wire only at partial-aggregation
  * boundaries (one compressed sketch per partition per group, ~KBs).
  */
object Sketches {

  /** eps for the query surface: rank error ≤ 1% of n per sketch. */
  val DefaultEps = 0.01

  private def zeroSummary(eps: Double) =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, eps)

  /** compress() flushes the insert-side head buffer; merge/query/serialize
    * all require a compressed summary.
    */
  private def flushed(s: QuantileSummaries): QuantileSummaries =
    if (s.compressed) s else s.compress()

  /** Stored-sketch wire format, hand-rolled (version byte, eps, count,
    * then the (value, g, delta) triples). Java-serializing the internal
    * `QuantileSummaries` class would tie every STORED sketch to one
    * Spark build — an InvalidClassException time bomb for the per-day /
    * per-shard sketch archive this aggregator exists for. The triples
    * ARE the sketch's mathematical content (Greenwald-Khanna samples),
    * so this format survives any upgrade that keeps GK semantics.
    */
  private[ops] def toBytes(s: QuantileSummaries): Array[Byte] = {
    val f = flushed(s)
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeByte(1) // format version
    out.writeDouble(f.relativeError)
    out.writeLong(f.count)
    out.writeInt(f.sampled.length)
    f.sampled.foreach { st =>
      out.writeDouble(st.value); out.writeLong(st.g); out.writeLong(st.delta)
    }
    out.flush()
    bos.toByteArray
  }

  private[ops] def fromBytes(b: Array[Byte]): QuantileSummaries = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(b))
    val version = in.readByte()
    require(version == 1, s"unknown sketch format version $version")
    val eps = in.readDouble()
    val count = in.readLong()
    val n = in.readInt()
    val sampled = Array.fill(n)(
      QuantileSummaries.Stats(in.readDouble(), in.readLong(), in.readLong()))
    new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, eps, sampled, count, true)
  }

  /** Query a (flushed) summary at each probability; empty input → NaNs so
    * the output arity is stable for downstream schema contracts.
    */
  private def queryAll(s: QuantileSummaries, probs: Seq[Double]): Array[Double] = {
    val f = flushed(s)
    probs.map(p => f.query(p).getOrElse(Double.NaN)).toArray
  }

  /** Direct quantile estimates per group: one pass, rank error ≤ eps·n.
    * Use when the sketch itself doesn't need to be stored.
    */
  class QuantileSketchQuery(eps: Double, probs: Seq[Double])
      extends Aggregator[Double, QuantileSummaries, Array[Double]] {
    override def zero: QuantileSummaries = zeroSummary(eps)
    override def reduce(b: QuantileSummaries, v: Double): QuantileSummaries =
      b.insert(v)
    override def merge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
      flushed(a).merge(flushed(b))
    override def finish(r: QuantileSummaries): Array[Double] = queryAll(r, probs)
    override def bufferEncoder: Encoder[QuantileSummaries] =
      Encoders.kryo[QuantileSummaries]
    override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder()
  }

  /** The mergeable artifact: a group's quantile sketch as bytes. Store it
    * (per day, per shard); [[QuantileSketchMergeQuery]] folds any set of
    * stored sketches into combined quantiles WITHOUT rescanning the rows
    * that built them — the shape that matters at 100 TB, where "p95 over
    * the trailing 30 days" must not re-read 30 days of data.
    */
  class QuantileSketchBytes(eps: Double)
      extends Aggregator[Double, QuantileSummaries, Array[Byte]] {
    override def zero: QuantileSummaries = zeroSummary(eps)
    override def reduce(b: QuantileSummaries, v: Double): QuantileSummaries =
      b.insert(v)
    override def merge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
      flushed(a).merge(flushed(b))
    override def finish(r: QuantileSummaries): Array[Byte] = toBytes(r)
    override def bufferEncoder: Encoder[QuantileSummaries] =
      Encoders.kryo[QuantileSummaries]
    override def outputEncoder: Encoder[Array[Byte]] = ExpressionEncoder()
  }

  /** Fold serialized sketches and query the union. GK merge guarantee:
    * rank error ≤ 2·eps·n over the merged population.
    */
  class QuantileSketchMergeQuery(eps: Double, probs: Seq[Double])
      extends Aggregator[Array[Byte], QuantileSummaries, Array[Double]] {
    override def zero: QuantileSummaries = zeroSummary(eps)
    override def reduce(b: QuantileSummaries, bytes: Array[Byte]): QuantileSummaries =
      flushed(b).merge(fromBytes(bytes))
    override def merge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
      flushed(a).merge(flushed(b))
    override def finish(r: QuantileSummaries): Array[Double] = queryAll(r, probs)
    override def bufferEncoder: Encoder[QuantileSummaries] =
      Encoders.kryo[QuantileSummaries]
    override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder()
  }

  /** Misra-Gries heavy hitters (capacity k): O(k) state per partial
    * buffer regardless of input size — the frequent-token / hot-domain
    * question answered with NO shuffle of the keys themselves, only the
    * k-entry summaries (the summary-merge theorem of Agarwal et al.,
    * "Mergeable Summaries", PODS'12: merged MG summaries keep the
    * deterministic guarantee). Contract, any merge tree:
    *   true_count - n/k  <=  reported  <=  true_count
    * and every key with true_count > n/k survives in the summary.
    *
    * reduce is the textbook algorithm (hit: +1; room: insert; full:
    * decrement-all — a miss costs O(k), amortized O(1) per decrement
    * "paid for" by k prior arrivals). merge sums the two maps and, if
    * over capacity, subtracts the (k+1)-th largest count from everyone
    * (the mergeable-summaries offset trick) and drops the non-positive.
    */
  class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], key: String): Map[String, Long] =
      b.get(key) match {
        case Some(c) => b.updated(key, c + 1L)
        case None if b.size < k => b.updated(key, 1L)
        case None =>
          // decrement-all: the arriving key's own +1 cancels against the
          // shared -1, so it simply isn't inserted
          b.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
      }
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (m, (key, c)) =>
        m.updated(key, m.getOrElse(key, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        val offset = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
        sum.view.mapValues(_ - offset).filter(_._2 > 0L).toMap
      }
    }
    override def finish(r: Map[String, Long]): Map[String, Long] = r
    override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  }

  /** KMV ("k minimum values") distinct-set sketch: the k smallest
    * 63-bit hashes of the set, kept sorted. Unlike HLL it supports SET
    * ALGEBRA — union is merge-and-truncate, and an intersection ESTIMATE
    * falls out of the union sketch (the fraction of its entries present
    * in both inputs, Beyer et al. SIGMOD'07) — the "audience overlap"
    * question at corpus scale without ever materializing either set.
    * Estimator: |S| ≈ (k-1) · 2^63 / kth_smallest, RSE ≈ 1/sqrt(k-2).
    * Deterministic: bottom-k of a hash SET is insertion-order-free.
    *
    * Inputs must already be non-negative hashes (xxhash64 & Long.MaxValue
    * — 63-bit uniform); the aggregator only maintains the bottom-k.
    * After warmup an arriving hash beats the current k-th with
    * probability ~k/i, so the O(k) insertion is rare — amortized O(1).
    */
  class KmvSketch(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(b: Array[Long], h: Long): Array[Long] =
      if (b.length >= k && h >= b(b.length - 1)) b
      else {
        val i = java.util.Arrays.binarySearch(b, h)
        if (i >= 0) b // already present (sets: duplicates are one member)
        else {
          val at = -i - 1
          val grown = new Array[Long](math.min(b.length + 1, k))
          System.arraycopy(b, 0, grown, 0, at)
          grown(at) = h
          System.arraycopy(b, at, grown, at + 1,
            math.min(b.length - at, grown.length - at - 1))
          grown
        }
      }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      val merged = new Array[Long](a.length + b.length)
      System.arraycopy(a, 0, merged, 0, a.length)
      System.arraycopy(b, 0, merged, a.length, b.length)
      java.util.Arrays.sort(merged)
      merged.distinct.take(k)
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }
}
