package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** IVF (inverted-file) approximate nearest neighbor — the learned-partition
  * scale path: k-means centroids partition the corpus into `nlist` lists;
  * a probe searches only its `nprobe` nearest lists.
  *
  * Train on a SAMPLE, at the driver: the standard IVF shape (what FAISS
  * does) — a deterministic hash-sample of ≤ `maxTrain` vectors is collected
  * and Lloyd's iterations run locally in microseconds, with zero Spark jobs
  * beyond one count and one bounded collect. Fitting a distributed k-means
  * over the full corpus would scan 100 TB per iteration to move centroids
  * that a 10k-row sample already pins. The tiny centroid model then rides
  * into the plan as literal arrays; assignment and probing are pure
  * expressions over the corpus (one shuffle on list id for the candidate
  * join).
  */
object IvfIndex {

  final case class Model(centroids: Array[Array[Double]])

  /** Train centroids at the driver on a deterministic hash-sample.
    *
    * Sampling is by `xxhash64(id, seed) % step == 0` (order- and
    * partition-layout-independent, unlike `limit`); the collected sample is
    * id-sorted so init and iteration order are reproducible anywhere.
    * Init: `nlist` evenly spaced rows of the sorted sample; 10 Lloyd's
    * rounds; ties and empty lists resolved deterministically (lowest index /
    * farthest point).
    */
  def train(emb: DataFrame, idCol: String, vecCol: String, nlist: Int,
      seed: Long = 42L, maxTrain: Int = 10000, iters: Int = 10): Model = {
    val pts = sampleVectors(emb, idCol, vecCol, maxTrain, seed, minNeeded = nlist)
    Model(kmeansLocal(pts, nlist, iters))
  }

  /** The deterministic training draw, shared with [[PqIndex]]: hash-sampled
    * (order- and partition-layout-independent, unlike `limit`), id-sorted so
    * init and iteration order are reproducible anywhere, bounded by
    * `maxTrain` exactly (deterministic id-sorted prefix).
    */
  private[ext] def sampleVectors(emb: DataFrame, idCol: String, vecCol: String,
      maxTrain: Int, seed: Long, minNeeded: Int): Array[Array[Double]] = {
    val n = emb.count()
    def collectSample(step: Long): Array[(Long, Array[Double])] = {
      val sampled =
        if (step <= 1) emb
        else emb.filter(pmod(xxhash64(col(idCol), lit(seed)), lit(step)) === 0)
      sampled
        .select(col(idCol).cast("long").as("id"),
          Similarity.toDouble(col(vecCol)).as("v"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1)
    }
    val step = if (n <= maxTrain) 1L else (n + maxTrain - 1) / maxTrain
    var rows = collectSample(step)
    // the hash draw is binomial around n/step: on a pathological
    // undershoot retry once with a denser stride before giving up
    if (rows.length < minNeeded && step > 1) rows = collectSample(math.max(1L, step / 8))
    require(rows.length >= minNeeded, s"sample ${rows.length} smaller than $minNeeded")
    rows.take(maxTrain).map(_._2)
  }

  /** Driver-local Lloyd's, fully deterministic (shared with [[PqIndex]]):
    * init = evenly spaced rows of the id-sorted sample (ids are
    * hash-spread, so this is an unbiased deterministic draw); strict-<
    * argmin → lowest index wins ties; empty clusters restart at the
    * points FARTHEST from their assigned centroids — each empty cluster
    * takes the next point of the farthest-first order (distance desc,
    * index asc), so simultaneous empties never collapse onto one
    * duplicate centroid.
    */
  private[ext] def kmeansLocal(pts: Array[Array[Double]], k: Int,
      iters: Int): Array[Array[Double]] = {
    val dim = pts.head.length
    def distSq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    var centroids = Array.tabulate(k)(c => pts((c.toLong * pts.length / k).toInt).clone())
    val assign = new Array[Int](pts.length)
    var it = 0
    while (it < iters) {
      var p = 0
      while (p < pts.length) {
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < k) {
          val d = distSq(pts(p), centroids(c))
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        assign(p) = best
        p += 1
      }
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      p = 0
      while (p < pts.length) {
        val c = assign(p); counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += pts(p)(i); i += 1 }
        p += 1
      }
      lazy val farthestOrder: Iterator[Int] = pts.indices
        .sortBy(q => (-distSq(pts(q), centroids(assign(q))), q)).iterator
      centroids = Array.tabulate(k) { c =>
        if (counts(c) > 0) { val a = sums(c); var i = 0; while (i < dim) { a(i) /= counts(c); i += 1 }; a }
        else pts(farthestOrder.next()).clone()
      }
      it += 1
    }
    centroids
  }

  /** Squared-L2 distance of a double-array column to a centroid literal.
    * Codegen'd in-order fold ([[graft.functions.L2DistSq]]) — the argmin
    * evaluates nlist of these per row, so the interpreted-lambda form paid
    * 2·dim·nlist closure calls per vector.
    */
  private def distSq(vec: Column, centroid: Array[Double]): Column = {
    val c = array(centroid.map(lit): _*)
    graft.functions.VectorOps.l2sq(vec, c)
  }

  /** Nearest-list id (argmin distance over centroid literals). Implemented
    * via sort of (dist, i) structs — a chained when-fold would DUPLICATE the
    * running-min expression per step (exponential plan growth).
    */
  def listId(model: Model, vec: Column): Column =
    element_at(probeLists(model, vec, 1), 1)

  /** The probe's `nprobe` nearest list ids, as an array column. */
  def probeLists(model: Model, vec: Column, nprobe: Int): Column = {
    val pairs = array(model.centroids.zipWithIndex.map { case (c, i) =>
      struct(distSq(vec, c).as("d"), lit(i).as("i"))
    }: _*)
    transform(slice(array_sort(pairs), 1, nprobe), p => p.getField("i"))
  }

  /** IVF approximate top-k: probes search their nprobe nearest lists only.
    * Recall vs. brute force pinned in SimilaritySpec.
    */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
      isProbe: Column, k: Int, model: Model, nprobe: Int): DataFrame =
    ivfTopKFiltered(emb, idCol, vecCol, isProbe, k, model, nprobe, lit(true))

  /** FILTERED IVF top-k — "nearest k among rows WHERE <pred>", the shape
    * every production vector search takes (predicate + vector in one
    * probe). `candPred` applies to the CANDIDATE side only (probes are
    * queries; they need not satisfy it), and it applies BEFORE list
    * assignment, norms, and the probe join — so disqualified rows never
    * reach a distance computation, and a simple column predicate reaches
    * the parquet scan as a pushed filter (PlanShapeSpec pins both).
    * Same index serves every predicate (the FAISS IDSelector shape):
    * filtering is probe-time, training/assignment never re-run.
    *
    * At low selectivity the nprobe lists may hold < k qualifying rows —
    * the classical filtered-ANN recall cliff; raise `nprobe` as
    * selectivity drops (q114 certifies the floor for the q113 config).
    */
  def ivfTopKFiltered(emb: DataFrame, idCol: String, vecCol: String,
      isProbe: Column, k: Int, model: Model, nprobe: Int,
      candPred: Column): DataFrame = {
    import Similarity.{dot, norm, toDouble}
    val cands = emb.filter(candPred)
      .select(col(idCol).as("cand_id"), toDouble(col(vecCol)).as("cvec"))
      .withColumn("cnorm", norm(col("cvec")))
      .withColumn("list", listId(model, col("cvec")))
    val probes = emb.filter(isProbe)
      .select(col(idCol).as("probe_id"), toDouble(col(vecCol)).as("pvec"))
      .withColumn("pnorm", norm(col("pvec")))
      .select(col("probe_id"), col("pvec"), col("pnorm"),
        explode(probeLists(model, col("pvec"), nprobe)).as("list"))
    val scored = probes.join(cands, Seq("list"))
      .filter(col("probe_id") =!= col("cand_id"))
      .select(col("probe_id"), col("cand_id"),
        (dot(col("pvec"), col("cvec")) / (col("pnorm") * col("cnorm"))).as("cos"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }
}
