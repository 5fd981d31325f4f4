package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Round-9 batch: calendar-native event analytics and hashed-feature
  * linear scoring.
  *
  *  - q129: day-of-week × hour activity heatmap over REAL timestamp
  *    semantics — the round-8 verdict's "widen the event tier beyond
  *    integer buckets" direction. Calendar fields (ISO weekday) cannot
  *    be derived by integer time math (weeks don't align to epoch 0);
  *    this is the first event query whose semantics NEED the timestamp
  *    type the schema-adaptive ingestion now guarantees.
  *  - q130: feature-hashing linear text classifier (the hashing trick —
  *    Weinberger et al., ICML 2009; the FastText / Vowpal Wabbit scoring
  *    shape): token → hash bucket → weight lookup → per-document margin.
  *    The LLM-pipeline quality-filter primitive one rung above q49's
  *    rule-based flags: any trained linear model scores corpora this
  *    way, and at 100 TB it is pure map-side codegen + one aggregation.
  */
object ExtensionQueries13 {

  type Q = (SparkSession, String) => DataFrame

  // --------------------------------------------------------------- q129

  /** q129: (ISO weekday, hour-of-day) activity heatmap over the events
    * table — per cell: event count, exact distinct users, exact-cents
    * value sum. Canonical LONG-nanos `ts` converts to a real TIMESTAMP
    * (µs, session TZ pinned UTC) and the calendar fields come from the
    * timestamp type; DuckDB mirrors with isodow()/hour() on its native
    * read of the same parquet.
    *
    * Scale shape: one groupBy over 168 cells — partial aggregation
    * map-side; the exact distinct-user count is the only shuffle-heavy
    * term (expands to (cell, user) pairs before the two-phase agg),
    * which is the standard exact-distinct cost; q81's HLL rollup is the
    * sketch alternative when ±2% suffices.
    */
  def q129_calendar_heatmap(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .withColumn("event_ts", timestamp_micros(expr("ts div 1000")))
    e.groupBy(
        (weekday(col("event_ts")) + 1).cast("int").as("iso_dow"), // Mon=1 .. Sun=7
        hour(col("event_ts")).cast("int").as("hour_of_day"))
      .agg(
        count(lit(1)).as("n"),
        count_distinct(col("user_id")).as("n_users"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
      .orderBy(col("iso_dow"), col("hour_of_day"))
  }

  val q129Sql: String =
    """SELECT CAST(isodow(ts) AS INT) AS iso_dow,
      |  CAST(hour(ts) AS INT) AS hour_of_day,
      |  count(*) AS n,
      |  count(DISTINCT user_id) AS n_users,
      |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY iso_dow, hour_of_day""".stripMargin

  // --------------------------------------------------------------- q130

  /** Hash-space size (buckets) and the deterministic weight surrogate.
    * A trained model would ship its weight vector exactly the way the
    * IVF centroids and BPE merge tables do — a ≤D-entry plan literal —
    * but a real training run is out of scope here, so the weights are a
    * fixed pseudo-random function of the bucket index (Knuth
    * multiplicative constant), integer in [−500, 500]: the SCORING
    * operator (hash → bucket → weight → margin) is what's under test,
    * and it is identical either way.
    */
  val HashDim = 1024
  private val WeightMul = 2654435761L // Knuth's 2^32/φ
  private val WeightMod = 1001L

  /** q130: per-document linear margin under the hashing trick. Tokens
    * (whitespace, q124's tokenizer) hash through graft_polyhash into
    * `HashDim` buckets; each bucket carries an integer weight; the
    * document's margin is the token-weight sum (term frequency weights
    * naturally — a token appearing twice contributes twice). Output:
    * margin (exact integer), token count, and the accept/reject label.
    *
    * Scale shape: everything up to the final fold is a single codegen
    * map stage (split → explode → hash → arithmetic — no join: the
    * weight function is an expression, so there isn't even a broadcast
    * to ship); the per-doc fold shuffles once on doc_id with map-side
    * partial aggregation. No driver state, no collect.
    */
  def q130_hash_classifier(s: SparkSession, dir: String): DataFrame =
    hashMargin(Tables.documents(s, dir), "doc_id", "text").orderBy(col("doc_id"))

  /** The reusable scorer: (id, margin, n_tokens, accepted) per document. */
  def hashMargin(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("tok"))
      .withColumn("bucket", graft.functions.PolyHash.polyHash(col("tok")) % HashDim)
      .withColumn("wgt", (col("bucket") * WeightMul) % WeightMod - (WeightMod - 1) / 2)
      .groupBy(col("doc_id"))
      .agg(sum(col("wgt")).as("margin"), count(lit(1)).as("n_tokens"))
      .withColumn("accepted", col("margin") > 0)

  val q130Sql: String = {
    // polyhash mirrored as the established list_reduce fold (q126's oracle
    // machinery), byte==char for the ASCII corpus contract
    val ph = "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(range(1, length(tok)+1), i -> CAST(ascii(substring(tok, i, 1)) AS BIGINT))), " +
      "(a, b) -> (a*31 + b) % 1000000007)"
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
       |), h AS (
       |  SELECT doc_id, $ph % $HashDim AS bucket FROM toks
       |), w AS (
       |  SELECT doc_id, (bucket * $WeightMul) % $WeightMod - ${(WeightMod - 1) / 2} AS wgt
       |  FROM h
       |)
       |SELECT doc_id, CAST(sum(wgt) AS BIGINT) AS margin, count(*) AS n_tokens,
       |  sum(wgt) > 0 AS accepted
       |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------- registry

  val queries: Map[String, Q] = Map(
    "q129_calendar_heatmap" -> (q129_calendar_heatmap _),
    "q130_hash_classifier" -> (q130_hash_classifier _)
  )

  val oracle: Map[String, String] = Map(
    "q129_calendar_heatmap" -> q129Sql,
    "q130_hash_classifier" -> q130Sql
  )
}
