package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{IvfIndex, Similarity}

/** Embedding-dedup and learned-index ANN — the remaining north-star
  * similarity operators.
  */
object ExtensionQueries2 {

  type Q = (SparkSession, String) => DataFrame

  /** q37: embedding-cosine near-dup dedup. Jittered copies of 50 vectors
    * (deterministic integer-derived perturbation) are unioned in; the
    * brute-force pair scan must recover exactly the (original, copy) pairs
    * at cos ≥ 0.98. Fully oracle-checked (the jitter construction and the
    * cosine folds mirror in SQL).
    */
  def q37_embed_dedup(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(s, dir).filter(col("vec_id") < 50)
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("vec"))
    // jitter computed BEFORE the id rename: both Spark (lateral column
    // alias resolution, 3.4+) and DuckDB would otherwise bind the renamed
    // vec_id inside the lambda — a genuinely cross-engine trap
    val jit = base.select(col("vec_id"),
      transform(sequence(lit(0), size(col("vec")) - 1),
        i => element_at(col("vec"), i + 1) + ((col("vec_id") + i) % 7 - 3) * lit(0.01))
        .as("vec"))
      .select((col("vec_id") + 100000L).as("vec_id"), col("vec"))
    val all = base.union(jit)
    val a = all.select(col("vec_id").as("id_a"), col("vec").as("va"))
      .withColumn("na", Similarity.norm(col("va")))
    val b = all.select(col("vec_id").as("id_b"), col("vec").as("vb"))
      .withColumn("nb", Similarity.norm(col("vb")))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= 0.98)
      .orderBy(col("id_a"), col("id_b"))
  }

  val q37Sql: String = {
    def fold(a: String, b: String): String =
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        s"list_transform(range(1, len($a)+1), dp_i -> $a[dp_i] * $b[dp_i])), " +
        s"(dp_x, dp_y) -> dp_x + dp_y)"
    s"""WITH base AS (
       |  SELECT vec_id, list_transform(range(1, len(embedding)+1),
       |    cv_i -> CAST(embedding[cv_i] AS DOUBLE)) AS vec
       |  FROM embeddings WHERE vec_id < 50
       |), jit AS (
       |  -- b.vec_id qualified: DuckDB lateral aliasing would otherwise bind
       |  -- the SELECT's own (vec_id + 100000) alias inside the lambda
       |  SELECT b.vec_id + 100000 AS new_id,
       |    list_transform(range(0, len(b.vec)),
       |      jt_i -> b.vec[jt_i + 1] + ((b.vec_id + jt_i) % 7 - 3) * 0.01) AS vec
       |  FROM base b
       |), a AS (SELECT vec_id, vec FROM base
       |         UNION ALL SELECT new_id AS vec_id, vec FROM jit)
       |SELECT x.vec_id AS id_a, y.vec_id AS id_b,
       |  ${fold("x.vec", "y.vec")} / (sqrt(${fold("x.vec", "x.vec")}) * sqrt(${fold("y.vec", "y.vec")})) AS cos
       |FROM a x JOIN a y ON x.vec_id < y.vec_id
       |WHERE ${fold("x.vec", "y.vec")} / (sqrt(${fold("x.vec", "x.vec")}) * sqrt(${fold("y.vec", "y.vec")})) >= 0.98
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** q38 (rows-only): IVF approximate top-k — k-means centroids partition
    * the corpus; probes search their nprobe nearest lists. Recall pinned in
    * SimilaritySpec (k-means init is seed-deterministic but engine-internal,
    * so no SQL oracle).
    */
  def q38_ann_ivf(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val model = IvfIndex.train(e, "embedding", nlist = 16)
    IvfIndex.ivfTopK(e, "vec_id", "embedding", col("vec_id") < 20, 5, model, nprobe = 4)
      .select(col("probe_id"), col("rank"), col("cand_id"), col("cos"))
      .orderBy(col("probe_id"), col("rank"))
  }

  val queries: Map[String, Q] = Map(
    "q37_embed_dedup" -> (q37_embed_dedup _),
    "q38_ann_ivf" -> (q38_ann_ivf _)
  )

  val oracle: Map[String, String] = Map(
    "q37_embed_dedup" -> q37Sql
  )
}
