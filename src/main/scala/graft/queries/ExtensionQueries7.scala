package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Dedup, TextAnalysis}

/** Round-6 additions: the incremental-index tier of the dedup family.
  * File-per-round keeps the query modules reviewable (see
  * ExtensionQueries..6 for rounds 2-5).
  */
object ExtensionQueries7 {

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- q99

  /** q99: incremental MinHash near-dup admission
    * ([[graft.ext.Dedup.incrementalMinhash]]) — "does tonight's crawl
    * batch near-duplicate anything we already hold?" answered from the
    * STORED signature index, never rescanning corpus text (the LSH
    * counterpart of q72's exact incremental dedup). Fixture: corpus =
    * docs 0-149; delta = fresh docs 150-249 plus doctored near-copies
    * (last 5 tokens dropped, the q29 construction) of both corpus docs
    * (ids +100000 → must drop against the INDEX) and the fresh delta
    * docs (ids +200000 → must drop against the EARLIER-ID delta rows).
    * Oracle: the full q29-style generated mirror — polyhash shingles,
    * 64-component affine signatures, 16-band folds, the src/id-order
    * admission rule, and the min-partner pick replay bit-exactly in
    * DuckDB.
    */
  def q99_incremental_minhash(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir)
      .filter(size(TextAnalysis.tokens(col("text"))) >= 8)
      .select(col("doc_id"), col("text"))
    val corpus = base.filter(col("doc_id") < 150)
    val fresh = base.filter(col("doc_id") >= 150 && col("doc_id") < 250)
    val toks = TextAnalysis.tokens(col("text"))
    def doctored(src: DataFrame, offset: Long) = src.select(
      (col("doc_id") + offset).as("doc_id"),
      concat_ws(" ", slice(toks, lit(1), greatest(size(toks) - 5, lit(3)))).as("text"))
    val delta = fresh
      .unionByName(doctored(corpus, 100000L))
      .unionByName(doctored(fresh, 200000L))
    def sigs(df: DataFrame) = df
      .withColumn("hashes", Dedup.shingleHashes(col("text"), 3))
      .select(col("doc_id"), Dedup.minhashFromHashes(col("hashes"), 64).as("sig"))
    Dedup.incrementalMinhash(sigs(corpus), sigs(delta), "doc_id",
        bands = 16, minEstJ = 0.4)
      .orderBy(col("id"))
  }

  val q99Sql: String = {
    val toks = "string_split(text, ' ')"
    def doctor(expr: String) =
      s"array_to_string(list_slice($toks, 1, greatest(len($toks) - 5, 3)), ' ')"
    s"""WITH base AS (
       |  SELECT doc_id, text FROM documents WHERE len($toks) >= 8
       |), corpus AS (
       |  SELECT doc_id, text FROM base WHERE doc_id < 150
       |), fresh AS (
       |  SELECT doc_id, text FROM base WHERE doc_id >= 150 AND doc_id < 250
       |), allv AS (
       |  SELECT doc_id, text, 0 AS src FROM corpus
       |  UNION ALL SELECT doc_id, text, 1 FROM fresh
       |  UNION ALL SELECT doc_id + 100000, ${doctor("text")}, 1 FROM corpus
       |  UNION ALL SELECT doc_id + 200000, ${doctor("text")}, 1 FROM fresh
       |), hs AS (
       |  SELECT doc_id, src, list_transform(
       |    list_transform(range(1, len($toks) - 1),
       |      sh_i -> array_to_string(list_slice($toks, sh_i, sh_i + 2), ' ')),
       |    sh_s -> ${ExtensionQueries.phSql("sh_s")}) AS hashes
       |  FROM allv
       |), sg AS (
       |  SELECT doc_id, src, list_transform(range(0, 64), mh_i ->
       |    list_min(list_transform(hashes, mh_h ->
       |      (mh_h * (((2*mh_i + 1) * 2654435761) % 1000000007) + (40503*mh_i + 1)) % 1000000007))) AS sig
       |  FROM hs
       |), bands AS (SELECT unnest(range(0, 16)) AS band
       |), banded AS (
       |  SELECT doc_id, src, band,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(sig, band*4 + 1, band*4 + 4)),
       |      (bk_a, bk_x) -> (bk_a*31 + bk_x) % 1000000007) AS bk
       |  FROM sg CROSS JOIN bands
       |), cand AS (
       |  SELECT DISTINCT d.doc_id AS id_d, p.doc_id AS id_p
       |  FROM banded d JOIN banded p
       |    ON d.band = p.band AND d.bk = p.bk AND d.src = 1
       |    AND (p.src = 0 OR p.doc_id < d.doc_id)
       |), est AS (
       |  SELECT id_d, id_p
       |  FROM cand JOIN sg sa ON id_d = sa.doc_id JOIN sg sb ON id_p = sb.doc_id
       |  WHERE CAST(list_sum(list_transform(range(1, 65),
       |    eq_i -> CASE WHEN sa.sig[eq_i] = sb.sig[eq_i] THEN 1 ELSE 0 END)) AS DOUBLE) / 64 >= 0.4
       |), fd AS (
       |  SELECT id_d, min(id_p) AS dup_of FROM est GROUP BY id_d
       |)
       |SELECT a.doc_id AS id, (fd.dup_of IS NULL) AS keep, fd.dup_of
       |FROM allv a LEFT JOIN fd ON a.doc_id = fd.id_d
       |WHERE a.src = 1
       |ORDER BY id""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q99_incremental_minhash" -> (q99_incremental_minhash _)
  )

  val oracle: Map[String, String] = Map(
    "q99_incremental_minhash" -> q99Sql
  )
}
