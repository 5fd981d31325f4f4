package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Content-defined chunking (CDC) + chunk-level dedup — the
  * rolling-hash segmentation used by storage deduplicators (LBFS,
  * rsync/borg family) and by dataset pipelines for shift-robust
  * near-dup detection: a chunk boundary is declared wherever the hash
  * of a small sliding token window hits a mask, so INSERTING text
  * early in a document moves every fixed-stride chunk but only the ONE
  * content-defined chunk containing the edit — identical downstream
  * content re-aligns and dedups, which fixed windows (q73) and
  * whole-document hashing (q25) both miss.
  *
  * Realization: the window hashes are [[Dedup.shingleHashes]]'s
  * single-pass codegen polyhashes (same public 31-base family the
  * whole dedup tier mirrors in SQL); a boundary fires where
  * `hash % maskMod == 0` (expected chunk length ≈ maskMod windows).
  * Chunk assembly is one running `sum(is_cut)` window per document
  * ordered by (position, cut-first) with an EXPLICIT ROWS frame;
  * chunk texts then dedup exactly like q103 spans: first owner =
  * minimum document id, later documents' matching chunks are flagged.
  * Every stage is a per-document window or a chunk-text-keyed shuffle
  * with map-side combine — nothing all-pairs, nothing collected.
  */
object CdcChunk {

  /** Chunk every document and flag chunks whose exact text already
    * occurs in a smaller-id document. Output, one row per document:
    * (idCol, n_chunks, n_dup_chunks, n_dup_tokens).
    */
  def dedupChunks(docs: DataFrame, idCol: String, textCol: String,
      window: Int, maskMod: Int): DataFrame = {
    require(window >= 2 && maskMod >= 2, s"window=$window maskMod=$maskMod")
    val toks = split(col(textCol), " ")
    val base = docs.select(col(idCol).as("__id"), toks.as("__toks"),
      Dedup.shingleHashes(col(textCol), window).as("__wh"))

    // a boundary AFTER the window that hits the mask: the next chunk
    // starts at token (windowStart + window)
    val cuts = base
      .select(col("__id"), posexplode(col("__wh")).as(Seq("wpos", "h")))
      .filter(pmod(col("h"), lit(maskMod.toLong)) === 0)
      .select(col("__id"), (col("wpos") + window).as("pos"),
        lit(1L).as("is_cut"), lit(null).cast("string").as("tok"))

    val tokens = base
      .select(col("__id"), posexplode(col("__toks")).as(Seq("pos", "tok")))
      .select(col("__id"), col("pos"), lit(0L).as("is_cut"), col("tok"))

    // cut rows sort BEFORE the same-position token row, so the token at
    // a cut position opens the new chunk; frame is explicit ROWS (the
    // q87 lesson: RANGE peers would share one running value)
    val w = Window.partitionBy(col("__id"))
      .orderBy(col("pos"), col("is_cut").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val chunks = tokens.unionByName(cuts)
      .withColumn("chunk_id", sum(col("is_cut")).over(w))
      .filter(col("is_cut") === 0)
      .groupBy(col("__id"), col("chunk_id"))
      .agg(count(lit(1)).as("n_toks"),
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").as("chunk_text"))

    val firstOwner = chunks.groupBy(col("chunk_text"))
      .agg(min(col("__id")).as("__first"))

    chunks.join(firstOwner, "chunk_text")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__id") > col("__first"), 1L).otherwise(0L)).as("n_dup_chunks"),
        sum(when(col("__id") > col("__first"), col("n_toks")).otherwise(0L))
          .as("n_dup_tokens"))
      .select(col("__id").as(idCol), col("n_chunks"), col("n_dup_chunks"),
        col("n_dup_tokens"))
  }
}
