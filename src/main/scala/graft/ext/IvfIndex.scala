package graft.ext

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** IVF (inverted-file) approximate nearest neighbor — the learned-partition
  * scale path: k-means centroids partition the corpus into `nlist` lists;
  * a probe searches only its `nprobe` nearest lists.
  *
  * Train once, reuse: centroids are a tiny model broadcast as literal
  * arrays; assignment and probing are pure expressions over the corpus (one
  * shuffle on list id for the candidate join). At 100 TB the train step runs
  * on a sample (KMeans over every vector is unnecessary); assignment stays a
  * full-scan projection.
  */
object IvfIndex {

  final case class Model(centroids: Array[Array[Double]])

  /** Train centroids on (a sample of) the corpus. Deterministic via seed. */
  def train(emb: DataFrame, vecCol: String, nlist: Int, seed: Long = 42L): Model = {
    val spark = emb.sparkSession
    import spark.implicits._
    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    val feats = emb.select(toVec(col(vecCol)).as("features"))
    val km = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("features")
    Model(km.fit(feats).clusterCenters.map(_.toArray))
  }

  /** Squared-L2 distance of a double-array column to a centroid literal. */
  private def distSq(vec: Column, centroid: Array[Double]): Column = {
    val c = array(centroid.map(lit): _*)
    aggregate(zip_with(vec, c, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)
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
      isProbe: Column, k: Int, model: Model, nprobe: Int): DataFrame = {
    import Similarity.{dot, norm, toDouble}
    val cands = emb
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
