package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact duplicated-SPAN removal — the substring-level dedup of
  * "Deduplicating Training Data Makes Language Models Better" (Lee et
  * al. 2022), realized at token n-gram granularity instead of a suffix
  * array: any L-token span whose exact text already occurs in an
  * EARLIER document (smaller id) is cut out of the later document, and
  * the surviving tokens are re-joined. Document-level dedup (q25) keeps
  * or drops whole rows; this operator edits WITHIN rows, which is what
  * actually removes boilerplate license blocks / quoted tweets / server
  * headers that ride inside otherwise-unique pages.
  *
  * Scale shape (the suffix-array construction is the part that does NOT
  * distribute; the n-gram formulation is chosen because every stage is
  * a plain shuffle):
  *   - one `posexplode` per token position → (id, pos, gram) — linear
  *     in corpus tokens, no all-pairs anywhere;
  *   - first-owner resolution is a `groupBy(gram).min(id)` — one
  *     shuffle with map-side combine on the gram key;
  *   - the join back to occurrences shuffles on the same gram key (AQE
  *     handles the hot-gram skew; a stop-gram frequency cap like q26's
  *     is unnecessary because the join is 1:N against a 1-row-per-gram
  *     side, never N:M);
  *   - span→position coverage folds into ONE small per-document array
  *     (`collect_list(sequence)` → flatten → distinct) — only documents
  *     that actually contain duplicated spans reach this aggregate;
  *   - reassembly is scan-local: the covered-position array joins back
  *     to the document row (shuffle proportional to the DUPLICATED
  *     subset, not the corpus) and an indexed `filter` drops covered
  *     tokens in place — the corpus itself is never re-exploded or
  *     re-shuffled for reassembly.
  *
  * Determinism: "earlier" is the total order on the numeric id — no
  * timestamps, no partition order. A span duplicated WITHIN one
  * document is untouched (same id is not `<`), matching Lee et al.'s
  * keep-one-copy semantics at document granularity and keeping the
  * oracle mirror exact.
  */
object SpanDedup {

  /** Cut every L-token span already seen in a smaller-id document.
    *
    * Returns one row per input row: (idCol, n_tokens, n_dropped,
    * clean_text) where clean_text is the space-joined surviving tokens
    * ("" if every token was covered by a duplicated span).
    */
  def dropDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      spanLen: Int): DataFrame = {
    require(spanLen >= 2, s"spanLen must be >= 2, got $spanLen")
    val L = spanLen
    val toks = split(col(textCol), " ")
    val base = docs.select(col(idCol).as("__id"), toks.as("__toks"))

    // (id, pos, gram): 0-based start position of each L-gram. Guard the
    // short-document case — Spark's sequence(0, n-L) runs BACKWARD when
    // n < L (step defaults to -1), so it must be gated, not relied on
    // to be empty.
    val grams = base.select(col("__id"),
        posexplode(when(size(col("__toks")) >= L,
            transform(sequence(lit(0), size(col("__toks")) - L),
              i => array_join(slice(col("__toks"), i + 1, lit(L)), " ")))
          .otherwise(array().cast("array<string>"))).as(Seq("pos", "gram")))

    val firstOwner = grams.groupBy(col("gram")).agg(min(col("__id")).as("__first"))

    val dupSpans = grams.join(firstOwner, "gram")
      .filter(col("__id") > col("__first"))
      .select(col("__id"), col("pos"))

    // One small array of covered token positions per affected document —
    // rows only for documents that contain duplicated spans.
    val covered = dupSpans.groupBy(col("__id"))
      .agg(array_distinct(flatten(collect_list(
        sequence(col("pos"), col("pos") + (L - 1))))).as("__cov"))

    // Reassembly never re-shuffles the corpus: left-join the (small)
    // covered arrays and drop covered positions with an indexed filter.
    base.join(covered, Seq("__id"), "left")
      .withColumn("__cov", coalesce(col("__cov"), array().cast("array<int>")))
      .select(col("__id").as(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        size(col("__cov")).cast("long").as("n_dropped"),
        array_join(filter(col("__toks"),
          (_, i) => not(array_contains(col("__cov"), i))), " ").as("clean_text"))
  }
}
