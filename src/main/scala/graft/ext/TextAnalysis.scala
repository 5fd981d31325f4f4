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

  /** GPT-2-style pre-tokenizer regex (the segmentation step every BPE
    * runs BEFORE vocabulary merges): contraction suffixes, space-glued
    * letter runs, digit runs, punctuation runs, residual whitespace.
    * Both Java regex and RE2 (DuckDB) support this subset identically —
    * `\p{L}`/`\p{N}` classes, alternation, non-capturing groups — so the
    * segment count is cross-engine exact.
    */
  val BpeSplitPattern: String =
    """'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"""

  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpeSplitPattern), lit(0))

  def regexTokenCount(text: Column): Column = size(regexTokens(text))

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
    *
    * Frame transform (not free columns) so the expensive shingle-hash
    * arrays BIND ONCE per row per k — the inline-reference form would make
    * Catalyst re-evaluate the byte pass per consumer (the Dedup scaladoc
    * trap). Appends the signal columns; drops its scratch bindings.
    */
  def withRepetitionColumns(df: org.apache.spark.sql.DataFrame,
      text: Column): org.apache.spark.sql.DataFrame = {
    def dupFrac(h: Column): Column =
      when(size(h) > 0, (size(h) - size(array_distinct(h))).cast("double") / size(h))
    val chars = length(text)
    df.withColumn("__h2", graft.functions.ShingleHashes.shingleHashes(text, 2))
      .withColumn("__h3", graft.functions.ShingleHashes.shingleHashes(text, 3))
      .withColumn("n_tokens", tokenCount(text).cast("long"))
      .withColumn("dup2_frac", dupFrac(col("__h2")))
      .withColumn("dup3_frac", dupFrac(col("__h3")))
      .withColumn("max_token_len",
        array_max(transform(tokens(text), t => length(t))).cast("long"))
      .withColumn("digit_frac", when(chars > 0,
        length(regexp_replace(text, "[^0-9]", "")).cast("double") / chars))
      .withColumn("symbol_frac", when(chars > 0,
        length(regexp_replace(text, "[A-Za-z0-9 ]", "")).cast("double") / chars))
      .withColumn("gopher_keep", col("n_tokens").between(2, 100000) &&
        coalesce(col("dup2_frac") <= 0.4, lit(true)) &&
        coalesce(col("dup3_frac") <= 0.3, lit(true)) &&
        col("max_token_len") <= 30 && coalesce(col("symbol_frac") <= 0.1, lit(false)))
      .drop("__h2", "__h3")
  }

  /** The repetition signal column names, in output order. */
  val RepetitionColumnNames: Seq[String] = Seq("n_tokens", "dup2_frac", "dup3_frac",
    "max_token_len", "digit_frac", "symbol_frac", "gopher_keep")

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

  /** Fixed-width paragraph chunks: tokens grouped `width` at a time,
    * re-joined with spaces — the deterministic span unit for
    * [[flagBoilerplate]] over corpora without natural paragraph breaks.
    * Requires ≥ 1 token (callers filter): an empty token array would make
    * the chunk-count bound negative and `sequence` DESCENDS for
    * start > stop — a cross-engine trap (DuckDB's range yields empty).
    */
  def paragraphChunks(text: Column, width: Int): Column = {
    val toks = tokens(text)
    transform(
      sequence(lit(0), floor((size(toks) - 1) / width).cast("int")),
      i => concat_ws(" ", slice(toks, i * width + 1, lit(width))))
  }

  /** Sliding token windows — context-window chunking for pretraining /
    * retrieval: windows of `size` tokens starting every `stride` tokens
    * (overlap = size − stride preserves cross-boundary context), the final
    * window clipped at the document end. Same start-index arithmetic as
    * [[paragraphChunks]] (which is the stride == size special case), and
    * the same ≥ 1 token requirement.
    */
  def slidingChunks(text: Column, size: Int, stride: Int): Column = {
    require(size >= stride && stride >= 1, s"need size >= stride >= 1, got $size/$stride")
    val toks = tokens(text)
    transform(
      sequence(lit(0), floor((org.apache.spark.sql.functions.size(toks) - 1) / stride).cast("int")),
      i => concat_ws(" ", slice(toks, i * stride + 1, lit(size))))
  }

  /** Repeated-span (boilerplate) flagging — the RefinedWeb/CCNet-style
    * "drop spans duplicated across many documents" pass (navigation
    * chrome, cookie banners, newsletter calls-to-action survive
    * whole-document dedup because the surrounding text differs).
    *
    * Input: one row per (doc, paragraph). A paragraph is boilerplate when
    * it appears in ≥ `minDocs` DISTINCT docs. Output: the input plus a
    * `keep` flag (false = boilerplate).
    *
    * Scale shape: the distinct-doc count is one shuffle on the paragraph
    * key with partial aggregation; the surviving hot set is tiny by
    * construction (only spans repeated across ≥ minDocs docs) and rides
    * back as a broadcast join — the corpus paragraphs never shuffle a
    * second time.
    */
  def flagBoilerplate(paras: org.apache.spark.sql.DataFrame, idCol: String,
      paraCol: String, minDocs: Long): org.apache.spark.sql.DataFrame = {
    val hot = paras.groupBy(col(paraCol))
      .agg(countDistinct(col(idCol)).as("__ndocs"))
      .filter(col("__ndocs") >= minDocs)
      .select(col(paraCol), lit(true).as("__hot"))
    paras.join(broadcast(hot), Seq(paraCol), "left")
      .withColumn("keep", col("__hot").isNull)
      .drop("__hot")
  }
}
