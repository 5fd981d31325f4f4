package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing fingerprint selection — Schleimer, Wilkerson, Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting" (SIGMOD
  * 2003), the MOSS plagiarism-detector algorithm, and the standard
  * position-aware fingerprinting rung above whole-document hashing
  * (reference keeps one hash per document, `etl_merge.py` dedup key;
  * q24 mirrors that — winnowing is what replaces it when PARTIAL
  * overlap must be detectable with sublinear fingerprint counts).
  *
  * Guarantees (theorem 1 of the paper): any shared substring of length
  * ≥ w + k − 1 produces at least one common selected fingerprint, and
  * the expected density of selected positions is 2/(w+1) — the
  * document shrinks to ~2n/(w+1) position-stamped hashes that still
  * catch every sufficiently long match.
  *
  * Formulation (identical on both engines, so the oracle mirrors it
  * literally): k-gram hashes h(j) = polyhash(text[j .. j+k−1]) at every
  * position j; tie-break key  key(j) = (h(j)+1)·B − j  with B = 2^20 —
  * the window minimum of `key` IS the paper's "rightmost minimal hash"
  * (smaller hash dominates because B exceeds any position; equal
  * hashes resolve to the larger j). The +1 keeps every key strictly
  * positive even at h = 0, where integer division would otherwise
  * diverge cross-engine (Spark `div` truncates toward zero, DuckDB `//`
  * floors). Selected fingerprints are the DISTINCT window-minimum keys
  * over all n−k+1−(w−1) full windows; hash and position decode back by
  * integer division.
  *
  * Scale shape: positions explode per document (n rows per doc, the
  * same fan-out as every shingle query), ONE shuffle on the document
  * id feeds the w-row sliding window (ROWS frame, partitioned — never
  * a global window), and the distinct folds map-side within the same
  * partitioning. Nothing collects; per-document cost is linear in
  * document length. B = 2^20 bounds supported document length at ~1M
  * characters (h·B ≤ ~1.05e15 stays far inside a long); require()
  * guards the bound at runtime.
  */
object Winnowing {

  /** Position base of the tie-break key; documents must be shorter. */
  val PosBase: Long = 1L << 20

  /** Selected fingerprints per document: (id, fp, pos) — the polyhash
    * value and the 1-based position of the k-gram it stamps. Documents
    * with fewer than w k-grams (length < k + w − 1) select nothing and
    * are absent from the output, per the paper's windows-only scheme.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    require(k >= 1, s"k-gram size must be >= 1, got $k")
    require(w >= 1, s"window size must be >= 1, got $w")
    val ng = (length(col(textCol)) - (k - 1)).cast("int")
    val grams = docs
      .filter(ng >= w)
      .select(col(idCol).as("__id"), col(textCol).as("__text"), ng.as("ng"))
      .select(col("__id"), col("ng"),
        explode(sequence(lit(1), col("ng"))).as("pos"),
        col("__text"))
      .select(col("__id"), col("ng"), col("pos"),
        ((graft.functions.PolyHash.polyHash(expr(s"substring(__text, pos, $k)")) + 1)
          * PosBase - col("pos")).as("key"))
      // guard the decode bound: pos < B keeps key inside ((h-1)·B, h·B)
      .withColumn("key",
        when(col("pos") < PosBase, col("key"))
          .otherwise(raise_error(lit(s"winnowing: document longer than $PosBase"))))
    val win = Window.partitionBy("__id").orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    grams
      .withColumn("win_min", min(col("key")).over(win))
      .filter(col("pos") <= col("ng") - (w - 1)) // full windows only
      .select(col("__id"), col("win_min")).distinct()
      .select(col("__id").as(idCol),
        expr(s"win_min div $PosBase").as("fp"),
        expr(s"(win_min div $PosBase + 1) * $PosBase - win_min").as("pos"))
  }
}
