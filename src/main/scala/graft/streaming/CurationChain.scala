package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{Contamination, Dedup, TextAnalysis}

/** Incremental text-curation ADMISSION — q496's batch chain (decontam →
  * exact dedup → near-dup → quality) recast as the per-document verdict
  * an ingestion gate evaluates against a STORED corpus (round-17
  * verdict task #5: "the batch curation chain is now certified
  * end-to-end; the streaming tier has the admission stage but not the
  * composed chain").
  *
  * Stage semantics match q496 stage-for-stage, re-pointed at admission:
  *  1. decontam — the doc shares ≥ ½ of its hashed 3-shingles with the
  *     held-out eval set ([[Contamination.overlap]], integer floor);
  *  2. exact_dup — its text is already held (stored corpus, or an
  *     earlier-id delta that passed decontam; `dup_of` = the smallest
  *     holder, the q25/q496 keep-min-id rule);
  *  3. near_dup — banded-MinHash admission against the stored index ∪
  *     earlier-id passers ([[Dedup.incrementalMinhash]] — candidates,
  *     not survivors, the q99/q115 contract; q496's exact-Jaccard stage
  *     is the batch-curation twin, the estimate is what a stored
  *     signature index can evaluate without rescanning corpus text);
  *  4. quality — q496's integer-exact floor (≥ 8 tokens, unique-token
  *     ratio ≥ ½);
  *  5. admitted.
  * The verdict is the FIRST failing stage, so per-stage counts over a
  * verdict frame reproduce q496's waterfall shape for the delta.
  *
  * Scale shape: decontam broadcasts the bounded eval shingle set; the
  * exact stage shuffles once on text (a text-partitioned window, never
  * global); near-dup shuffles on (band, key) buckets only; quality is
  * per-row codegen. State for the incremental form is the corpus frame
  * itself, disk-staged and appended per batch
  * ([[foreachBatchAdmit]]) — the materialize-to-distributed-storage
  * shape, no driver-held index.
  *
  * Stream ≡ batch: threading `corpus ∪ decontam-passers` as the next
  * batch's corpus reproduces the one-shot verdicts exactly when deltas
  * arrive in id order (the q99 admission contract). The stage-3 pool
  * nominally wants only stage-2 passers, but an exact-dup passer's
  * signature is bit-identical to its smaller-id holder's — it can never
  * change a min-partner verdict, so the single threaded pool is
  * sufficient (StreamingCurationChainSpec pins the equivalence across
  * 3 micro-batches, every stage firing).
  */
object CurationChain {

  private def toks: Column = TextAnalysis.tokens(col("text"))

  /** Per-delta-doc admission verdicts against a stored corpus:
    * (doc_id, verdict, dup_of) with verdict ∈ {decontam, exact_dup,
    * near_dup, quality, admitted} and dup_of the smallest qualifying
    * holder for the two dedup verdicts (null otherwise).
    */
  def admitBatch(delta: DataFrame, corpusDocs: DataFrame, evalDocs: DataFrame,
      bands: Int, minEstJ: Double, nSig: Int = 64): DataFrame = {
    val d = delta.select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val corpus = corpusDocs.select(col("doc_id").cast("long").as("doc_id"), col("text"))

    // stage 1 — decontam (q496 stage-1 rule, integer cross-multiplied).
    // Scoped (round-19): consumed by the stage-2 anti-join (×2 — s1m
    // executes twice, see below) and the final verdict join, and each
    // recompute re-hashes every delta shingle; the consumers join on
    // different keys, so ReuseExchange cannot dedupe them.
    val contaminated = graft.core.CacheScope.scoped(
      Contamination.overlap(d, evalDocs, "doc_id", col("text"), 3)
        .filter(col("n_shared") * 2 >= col("n_shingles"))
        .select(col("id").as("doc_id"), lit(true).as("is_contaminated")))
    val s1 = d.join(contaminated, Seq("doc_id"), "left_anti")

    // stage 2 — exact dedup vs stored texts ∪ earlier-id passers: the
    // smallest holder wins (corpus ids precede delta ids by contract;
    // min() guards fixtures where they do not)
    val corpusFirst = corpus.groupBy(col("text"))
      .agg(min(col("doc_id")).as("corpus_min"))
    val byText = Window.partitionBy(col("text"))
    // Scoped (round-19): s1m feeds the stage-3 signature pipeline (via
    // s2) AND the final verdict join — without the pin the whole
    // stage-1+2 pipeline (contamination anti-join, corpusFirst join,
    // text window) executes once per consumer.
    val s1m = graft.core.CacheScope.scoped(s1.join(corpusFirst, Seq("text"), "left")
      .withColumn("delta_min", min(col("doc_id")).over(byText))
      .withColumn("exact_dup_of",
        when(col("corpus_min").isNotNull && col("delta_min") < col("doc_id"),
          least(col("corpus_min"), col("delta_min")))
          .when(col("corpus_min").isNotNull, col("corpus_min"))
          .when(col("delta_min") < col("doc_id"), col("delta_min"))))
    val s2 = s1m.filter(col("exact_dup_of").isNull).select(col("doc_id"), col("text"))

    // stage 3 — near-dup admission against the stored signature index ∪
    // earlier-id stage-2 passers. ONE signature pipeline over the tagged
    // corpus ∪ passers union (round-19 verdict task #5): both sides'
    // signatures come from the same shingle-hash + n-min stage, so the
    // plan carries that stage once instead of once per side.
    val tagged = corpus.select(col("doc_id"), col("text"), lit(0).as("src"))
      .unionByName(s2.select(col("doc_id"), col("text"), lit(1).as("src")))
    val allSigs = tagged
      .withColumn("hashes", Dedup.shingleHashes(col("text"), 3))
      .select(col("doc_id").cast("long").as("id"),
        Dedup.minhashFromHashes(col("hashes"), nSig).as("sig"), col("src"))
    val adm = Dedup.incrementalMinhashTagged(allSigs, bands, minEstJ)
      .select(col("id").as("doc_id"), col("keep"), col("dup_of").as("near_dup_of"))

    // stage 4 — quality floor (q496 stage 4, integer-exact)
    val qualityFail = size(toks) < 8 || size(array_distinct(toks)) * 2 < size(toks)

    d.join(contaminated, Seq("doc_id"), "left")
      .join(s1m.select(col("doc_id"), col("exact_dup_of")), Seq("doc_id"), "left")
      .join(adm, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("is_contaminated"), "decontam")
          .when(col("exact_dup_of").isNotNull, "exact_dup")
          .when(!col("keep"), "near_dup")
          .when(qualityFail, "quality")
          .otherwise("admitted").as("verdict"),
        when(col("exact_dup_of").isNotNull, col("exact_dup_of"))
          .when(!col("keep"), col("near_dup_of")).as("dup_of"))
  }

  /** foreachBatch driver for [[admitBatch]]: stages the corpus to
    * `stateDir` once, runs the chain per micro-batch against the staged
    * state, hands the verdict frame to `sink`, then appends the batch's
    * decontam-passers to the state — the disk-backed incremental index
    * a long-running ingestion gate maintains. Pass the result to
    * `writeStream.foreachBatch`. */
  def foreachBatchAdmit(evalDocs: DataFrame, bands: Int, minEstJ: Double,
      stateDir: String, sink: DataFrame => Unit): (DataFrame, Long) => Unit = {
    (batch: DataFrame, _: Long) => {
      val s = batch.sparkSession
      val state = s.read.parquet(stateDir)
      val verdicts = admitBatch(batch, state, evalDocs, bands, minEstJ)
      sink(verdicts)
      batch.select(col("doc_id").cast("long").as("doc_id"), col("text"))
        .join(verdicts.filter(col("verdict") === "decontam"), Seq("doc_id"), "left_anti")
        .write.mode("append").parquet(stateDir)
    }
  }
}
