package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, language-ID heuristic, quality scoring,
  * document fingerprinting. Everything is built from codegen-friendly /
  * higher-order array expressions — no UDFs — and every op is deterministic
  * and integer-exact where it matters so DuckDB oracles can mirror it.
  *
  * Scale posture: all per-row expressions (embarrassingly parallel, no
  * shuffle); the only aggregations are whatever the caller groups by.
  */
object TextAnalysis {

  val HashMod = 1000000007L

  /** Whitespace tokens (the corpus is space-separated). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token estimate: ceil(chars/4), exact integer arithmetic.
    * (The classic ~4-chars-per-token heuristic; a real BPE would be a
    * vocabulary lookup table — out of scope for the container.)
    */
  def approxBpeCount(text: Column): Column =
    ((length(text) + 3) / lit(4)).cast("long")

  /** Count of tokens in a fixed marker list (duplicates counted). */
  def markerCount(text: Column, markers: Seq[String]): Column = {
    val arr = array(markers.map(lit): _*)
    size(filter(tokens(text), t => array_contains(arr, t)))
  }

  /** Ordered language marker lists. First list wins ties (deterministic). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "de", "que"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("de5", "shi4", "le5", "he2", "zai4"))

  /** Heuristic language ID: argmax of marker counts, first-listed language
    * wins ties, "und" when every score is zero. Backed by the codegen'd
    * single-pass [[graft.functions.LangIdExpr]] (the combinator form ran 25
    * interpreted array scans per row — one per (language, marker)).
    */
  def langId(text: Column): Column = graft.functions.LangIdExpr.langId(text)

  /** Quality signals, all exact-integer derived (deterministic doubles):
    * token count, distinct ratio, mean token length, stopword ratio, and a
    * weighted composite score.
    */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val n = tokenCount(text)
    val uniq = size(array_distinct(tokens(text)))
    val chars = length(text)
    val meanLen = (chars - (n - 1)).cast("double") / n
    val stops = markerCount(text, LangMarkers.head._2)
    val stopRatio = stops.cast("double") / n
    val uniqRatio = uniq.cast("double") / n
    val quality = uniqRatio * 0.5 + (lit(1.0) - stopRatio) * 0.3 +
      least(meanLen / 8.0, lit(1.0)) * 0.2
    Seq("n_tokens" -> n.cast("long"), "n_uniq" -> uniq.cast("long"),
      "mean_token_len" -> meanLen, "stopword_ratio" -> stopRatio,
      "uniq_ratio" -> uniqRatio, "quality" -> quality)
  }

  /** Gopher-style repetition/quality signals (Rae et al. 2021 §A1.1 shape),
    * all exact-integer derived: duplicate 2-/3-gram fractions (via the
    * codegen'd shingle-hash pass — a repeated n-gram hashes identically),
    * max token length, digit and symbol character fractions, and a composite
    * keep-flag with the classic thresholds. Per-row expressions, no shuffle.
    */
  def repetitionColumns(text: Column): Seq[(String, Column)] = {
    def dupFrac(k: Int): Column = {
      val hs = graft.functions.ShingleHashes.shingleHashes(text, k)
      val n = size(hs)
      when(n > 0, (n - size(array_distinct(hs))).cast("double") / n)
    }
    val n = tokenCount(text)
    val chars = length(text)
    val maxTok = array_max(transform(tokens(text), t => length(t)))
    val digitFrac = when(chars > 0,
      length(regexp_replace(text, "[^0-9]", "")).cast("double") / chars)
    val symbolFrac = when(chars > 0,
      length(regexp_replace(text, "[A-Za-z0-9 ]", "")).cast("double") / chars)
    val dup2 = dupFrac(2)
    val dup3 = dupFrac(3)
    val keep = n.between(2, 100000) &&
      coalesce(dup2 <= 0.4, lit(true)) && coalesce(dup3 <= 0.3, lit(true)) &&
      maxTok <= 30 && coalesce(symbolFrac <= 0.1, lit(false))
    Seq("n_tokens" -> n.cast("long"), "dup2_frac" -> dup2, "dup3_frac" -> dup3,
      "max_token_len" -> maxTok.cast("long"), "digit_frac" -> digitFrac,
      "symbol_frac" -> symbolFrac, "gopher_keep" -> keep)
  }

  /** Polynomial rolling hash over bytes, mod 1e9+7 — exact integer fold,
    * mirrorable in any engine with list folds:
    * h = fold(chars, 0, (acc, c) => (acc*31 + ascii(c)) % M).
    * Backed by a custom codegen'd Catalyst expression
    * ([[graft.functions.PolyHash]]); the equivalent combinator form
    * (transform+aggregate) interprets one lambda per character and is ~100×
    * slower on the hash-heavy dedup queries.
    */
  def polyHash(s: Column): Column = graft.functions.PolyHash.polyHash(s)

  /** Content fingerprint: polyhash of the full text (exact-dup detection
    * with 8-byte keys instead of 16-byte md5 — cheaper shuffle at scale).
    */
  def fingerprint(text: Column): Column = polyHash(text)
}
