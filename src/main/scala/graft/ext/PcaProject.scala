package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sample-trained PCA projection — the dimensionality-reduction stage a
  * vector pipeline runs AHEAD of indexing (FAISS's PCAR/OPQ preprocessing
  * slot): project 64-dim embeddings onto the top-k principal components
  * and run ANN/clustering in the small space.
  *
  * Training follows the repo's IVF/PQ contract ([[IvfIndex.train]]): a
  * deterministic hash-sample of ≤ `maxTrain` vectors is collected and the
  * covariance eigendecomposition runs AT THE DRIVER (a 64×64 symmetric
  * matrix — cyclic Jacobi, microseconds), because a distributed eigensolve
  * would scan 100 TB to compute a 4 KB model the sample already pins. The
  * mean and components then ride into the plan as literal arrays;
  * projection is a per-row in-order fold (mirrorable fold-for-fold in SQL,
  * the q30/q38 oracle precedent).
  *
  * Determinism: fixed sweep order, fixed rotation formulas, and a fixed
  * sign convention (the component's largest-|x| coordinate is positive,
  * lowest index breaking ties) — the same data trains the same model on
  * any machine, so generated oracle mirrors are stable.
  */
object PcaProject {

  final case class Model(mean: Array[Double], components: Array[Array[Double]])

  def train(emb: org.apache.spark.sql.DataFrame, idCol: String, vecCol: String,
      k: Int, seed: Long = 42L, maxTrain: Int = 10000): Model = {
    val pts = IvfIndex.sampleVectors(emb, idCol, vecCol, maxTrain, seed,
      minNeeded = k + 1)
    val dim = pts.head.length
    require(k <= dim, s"k=$k exceeds dimension $dim")
    val n = pts.length
    val mean = new Array[Double](dim)
    for (p <- pts; i <- 0 until dim) mean(i) += p(i)
    for (i <- 0 until dim) mean(i) /= n
    val cov = Array.ofDim[Double](dim, dim)
    for (p <- pts) {
      var i = 0
      while (i < dim) {
        val di = p(i) - mean(i)
        var j = i
        while (j < dim) { cov(i)(j) += di * (p(j) - mean(j)); j += 1 }
        i += 1
      }
    }
    for (i <- 0 until dim; j <- i until dim) {
      cov(i)(j) /= n; cov(j)(i) = cov(i)(j)
    }
    val (vals, vecs) = jacobiEigen(cov)
    val order = vals.indices.sortBy(i => (-vals(i), i)).take(k)
    val comps = order.map { c =>
      val v = Array.tabulate(dim)(i => vecs(i)(c))
      // sign convention: largest-|x| coordinate positive, lowest index wins
      val pivot = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(pivot) < 0) v.map(x => -x) else v
    }.toArray
    Model(mean, comps)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector matrix with vectors in COLUMNS). Fixed
    * (p, q) sweep order and deterministic rotations; converges when the
    * off-diagonal Frobenius mass drops below 1e-18 (well under double
    * precision for covariance matrices of unit-norm data).
    */
  private[graft] def jacobiEigen(mIn: Array[Array[Double]],
      maxSweeps: Int = 50): (Array[Double], Array[Array[Double]]) = {
    val n = mIn.length
    val a = mIn.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var done = false
    while (sweep < maxSweeps && !done) {
      var off = 0.0
      for (p <- 0 until n; q <- p + 1 until n) off += a(p)(q) * a(p)(q)
      if (off < 1e-18) done = true
      else {
        for (p <- 0 until n; q <- p + 1 until n) {
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = (if (theta >= 0) 1.0 else -1.0) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < n) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < n) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < n) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
        }
        sweep += 1
      }
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** Projection of a double-array column onto component `j`: the strict
    * in-order fold Σ_i (v[i] − mean[i])·comp[i] — NOT dot(v,c) − dot(mean,c),
    * which is algebraically equal but floats differently; the oracle
    * mirrors this exact order.
    */
  def projectAt(model: Model, vec: Column, j: Int): Column = {
    val m = array(model.mean.map(lit).toIndexedSeq: _*)
    val c = array(model.components(j).map(lit).toIndexedSeq: _*)
    aggregate(zip_with(zip_with(vec, m, (x, mu) => x - mu), c, (d, w) => d * w),
      lit(0.0), (acc, x) => acc + x)
  }

  /** All k projections as columns p0..p{k-1}. */
  def projections(model: Model, vec: Column): Seq[Column] =
    model.components.indices.map(j => projectAt(model, vec, j).as(s"p$j"))

  /** Squared distance of `vec` to the trained mean (the denominator of the
    * explained-variance certification) — same in-order fold discipline.
    */
  def centeredSq(model: Model, vec: Column): Column = {
    val m = array(model.mean.map(lit).toIndexedSeq: _*)
    aggregate(zip_with(vec, m, (x, mu) => (x - mu) * (x - mu)),
      lit(0.0), (acc, x) => acc + x)
  }

  /** All k projections as ONE array column (the reduced vector). */
  def projectAll(model: Model, vec: Column): Column =
    array(model.components.indices.map(j => projectAt(model, vec, j)): _*)

  /** PCA-shortlist ANN with exact rerank — what the projection is FOR:
    * rank candidates by squared L2 in the k-dim projected space (k/dim of
    * the full-distance cost per pair; projections are orthonormal, so
    * projected L2 lower-bounds full L2), keep `shortlist` per probe, then
    * rerank the shortlist by exact full-dimension L2 and keep `k`. The
    * same two-stage shape as [[PqIndex]]'s ADC+rerank with the projection
    * replacing the codebook. Ties break on candidate id at both stages —
    * fully deterministic, mirrorable.
    */
  def pcaTopK(emb: org.apache.spark.sql.DataFrame, idCol: String, vecCol: String,
      isProbe: Column, k: Int, model: Model,
      shortlist: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = emb.select(col(idCol).cast("long").as("id"),
        Similarity.toDouble(col(vecCol)).as("v"))
      .withColumn("pv", projectAll(model, col("v")))
      .transform(graft.core.CacheScope.scoped)
    val probes = base.filter(isProbe)
      .select(col("id").as("probe_id"), col("v").as("qv"), col("pv").as("qp"))
    val cands = base
      .select(col("id").as("cand_id"), col("v").as("cv"), col("pv").as("cp"))
    val wShort = Window.partitionBy(col("probe_id"))
      .orderBy(col("pd"), col("cand_id"))
    // the PROBE set is the bounded side (isProbe selects a constant probe
    // set at any corpus size) — unhinted, Spark would pick the build side
    // from size stats, i.e. the corpus at scale (the q147 bug class;
    // PlanGate enforces the hint fleet-wide)
    val short = broadcast(probes).join(cands, col("probe_id") =!= col("cand_id"))
      .select(col("probe_id"), col("cand_id"), col("qv"), col("cv"),
        graft.functions.VectorOps.l2sq(col("qp"), col("cp")).as("pd"))
      .withColumn("prank", row_number().over(wShort))
      .filter(col("prank") <= shortlist)
    val wFinal = Window.partitionBy(col("probe_id"))
      .orderBy(col("d"), col("cand_id"))
    short.select(col("probe_id"), col("cand_id"),
        graft.functions.VectorOps.l2sq(col("qv"), col("cv")).as("d"))
      .withColumn("rank", row_number().over(wFinal).cast("int"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("cand_id"), col("d"))
  }
}
