package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY §2 I — absent from the reference,
  * built per the north star): the same transforms run in batch and
  * streaming (the standard Spark testing idiom — batch equivalence is the
  * oracle, pinned in StreamingSpec).
  *
  * Scale posture: watermarks bound state; aggregations are keyed by
  * (window, type) / (user, session) so state partitions by key; no
  * per-record driver work.
  */
object StreamOps {

  /** The canonical events schema (ts = long nanos — the form
    * [[graft.core.Tables.toLongNanos]] normalizes every parquet encoding
    * to). Engine/test-written event files use this layout; raw testdata
    * may instead carry TIMESTAMP(MICROS), which [[runToMemory]] adapts at
    * the streaming scan.
    */
  val EventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** ns-long → proper timestamp (µs precision) for event-time semantics. */
  def tsCol: Column = timestamp_micros(expr("ts div 1000"))

  /** Tumbling-window counts/sums per event type. Works on batch and
    * streaming frames alike.
    */
  def tumblingAgg(events: DataFrame, width: String): DataFrame =
    events.withColumn("event_ts", tsCol)
      .groupBy(window(col("event_ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Watermarked tumbling aggregation (SURVEY §2 I — late-data bound): in a
    * streaming query, `withWatermark` bounds state (windows finalize and
    * emit in append mode once the watermark passes their end) and DROPS
    * events arriving later than `late` behind the max observed event time.
    * In a batch query the watermark node is a no-op (Spark eliminates it),
    * so this is the standard two-hop certifiable shape: streaming==batch
    * with in-order data (late-drop pinned separately in StreamingSpec),
    * batch==DuckDB (q56).
    */
  def tumblingAggLate(events: DataFrame, width: String, late: String): DataFrame =
    events.withColumn("event_ts", tsCol)
      .withWatermark("event_ts", late)
      .groupBy(window(col("event_ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window variant. `late = Some(bound)` is the production
    * streaming shape (watermarked append — state finalizes); `None` is
    * the batch twin / complete-mode form where the watermark would no-op.
    */
  def slidingAgg(events: DataFrame, width: String, slide: String,
      late: Option[String] = None): DataFrame = {
    val base = events.withColumn("event_ts", tsCol)
    late.fold(base)(l => base.withWatermark("event_ts", l))
      .groupBy(window(col("event_ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))
  }

  /** Session windows (gap-merged) per user — Spark's native session_window;
    * equivalence with the relational gaps-and-islands form (q21) is pinned
    * in StreamingSpec.
    */
  def sessionAgg(events: DataFrame, gap: String,
      late: Option[String] = None): DataFrame = {
    val base = events.withColumn("event_ts", tsCol)
    late.fold(base)(l => base.withWatermark("event_ts", l))
      .groupBy(session_window(col("event_ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))
  }

  /** Stream-static enrichment: each event joins the (broadcast) static
    * dimension — Spark's stateless stream-static join, the standard
    * enrich-then-aggregate shape — followed by a tumbling rollup per
    * segment. The static side is re-broadcast per micro-batch by the
    * engine; events missing a dimension row survive via left join. Batch
    * equivalence pinned in StreamingSpec; DuckDB oracle in q52.
    */
  def enrichedAgg(events: DataFrame, dim: DataFrame, width: String,
      late: Option[String] = None): DataFrame = {
    val base = events.withColumn("event_ts", tsCol)
    late.fold(base)(l => base.withWatermark("event_ts", l))
      .join(broadcast(dim), col("user_id") === col("c_custkey"), "left")
      .groupBy(window(col("event_ts"), width).as("w"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
      .select(col("w.start").as("window_start"), col("c_mktsegment").as("segment"),
        col("n"), col("sum_value"))
  }

  /** Stream-stream time-interval self-join (SURVEY §2 I): attribute each
    * purchase to the same user's views in the preceding `lookbackMin`
    * minutes. Both sides carry watermarks and the join condition bounds
    * both event times, so the engine can size and expire the join state —
    * the canonical Structured Streaming stream-stream join shape. In batch
    * the watermarks are no-ops and this is a plain equi+range join.
    * Exact-µs output columns so the DuckDB oracle (q62) is bit-stable.
    */
  def purchaseAttribution(events: DataFrame, lookbackMin: Int,
      watermark: String, joinType: String = "inner"): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), tsCol.as("p_ts"))
      .withWatermark("p_ts", watermark)
    val v = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"), tsCol.as("v_ts"))
      .withWatermark("v_ts", watermark)
    // left_outer: unmatched purchases emit (view_id = null) only once the
    // watermark passes their join window — state-expiry semantics pinned in
    // StreamingSpec with a watermark-advancing sentinel
    p.join(v, col("user_id") === col("v_user")
        && col("v_ts") >= col("p_ts") - expr(s"INTERVAL $lookbackMin MINUTES")
        && col("v_ts") <= col("p_ts"), joinType)
      .select(col("user_id"), col("purchase_id"), col("view_id"),
        unix_micros(col("p_ts")).as("p_us"), unix_micros(col("v_ts")).as("v_us"))
  }

  /** Pure time-interval stream-stream join — no natural equi-key (round-5
    * verdict ask #4's positive path; the custom range-join REWRITE
    * correctly refuses streaming plans, commit 4a3ea6f). Every `everyN`-th
    * event opens a [t, t + windowMin] incident window; every event inside
    * any window joins it. Spark's symmetric streaming hash join shards
    * state by an equality key, so the interval is bucketed — the
    * [[graft.ops.RangeJoin]] geometry recomposed over native watermark
    * machinery: the window side explodes to the (≤2) bucket-wide time
    * buckets its interval overlaps, the probe side computes its single
    * bucket, and the join condition is bucket equality plus the exact
    * BETWEEN. Both event-time columns carry watermarks and the condition
    * bounds each against the other, so the engine sizes and EXPIRES the
    * join state — the property that lets this run forever at 100 TB/day.
    * In batch the watermarks are no-ops and the result is exactly the
    * relational interval join (q98's DuckDB oracle; stream == batch
    * pinned in StreamingSpec).
    */
  def incidentWindowJoin(events: DataFrame, everyN: Int = 200,
      windowMin: Int = 30, watermark: String = "1 hour"): DataFrame = {
    val winUs = windowMin * 60L * 1000000L
    val bucketUs = winUs // bucket ≈ window length → ≤2 buckets per interval
    val w = events.filter(pmod(col("event_id"), lit(everyN.toLong)) === 0)
      .select(col("event_id").as("window_id"), tsCol.as("w_ts"))
      .withWatermark("w_ts", watermark)
      .withColumn("wb", explode(array_distinct(array(
        expr(s"unix_micros(w_ts) div $bucketUs"),
        expr(s"(unix_micros(w_ts) + $winUs) div $bucketUs")))))
    val e = events.select(col("event_id").as("ev_id"), col("user_id"),
        round(col("value") * 100).cast("long").as("value_cents"), tsCol.as("e_ts"))
      .withWatermark("e_ts", watermark)
      .withColumn("eb", expr(s"unix_micros(e_ts) div $bucketUs"))
    w.join(e, col("wb") === col("eb")
        && col("e_ts") >= col("w_ts")
        && col("e_ts") <= col("w_ts") + expr(s"INTERVAL $windowMin MINUTES"))
      .select(col("window_id"), col("ev_id"), col("user_id"), col("value_cents"),
        unix_micros(col("w_ts")).as("w_us"), unix_micros(col("e_ts")).as("e_us"))
  }

  /** Stream-stream interval-OVERLAP join — the two-sided generalization
    * of [[incidentWindowJoin]] ([[graft.ops.RangeJoin.bucketedOverlap]]'s
    * geometry over native watermark machinery): every `aEveryN`-th event
    * opens an `aLenMin`-minute window on stream A, every `bEveryN`-th a
    * `bLenMin`-minute window on stream B; emit one row per overlapping
    * (A, B) pair. Both sides explode to their covered time buckets, the
    * symmetric hash join keys on the bucket, the exact overlap predicate
    * rides in the join condition (its two inequalities bound each side's
    * event time against the other, so join state expires under the
    * watermarks), and the canonical-bucket filter keeps the output
    * duplicate-free with no post-dedup — stateless except the join
    * buffers themselves.
    */
  def overlapWindowJoin(events: DataFrame, aEveryN: Int = 200, aLenMin: Int = 30,
      bEveryN: Int = 300, bLenMin: Int = 20, watermark: String = "1 hour"): DataFrame = {
    val bucketUs = 30L * 60L * 1000000L
    def side(everyN: Int, lenMin: Int, tag: String) =
      events.filter(pmod(col("event_id"), lit(everyN.toLong)) === 0)
        .select(col("event_id").as(s"${tag}_id"), tsCol.as(s"${tag}_ts"))
        .withWatermark(s"${tag}_ts", watermark)
        .withColumn(s"${tag}_end",
          col(s"${tag}_ts") + expr(s"INTERVAL $lenMin MINUTES"))
        .withColumn(s"${tag}_b", explode(sequence(
          expr(s"unix_micros(${tag}_ts) div $bucketUs"),
          expr(s"unix_micros(${tag}_end) div $bucketUs"))))
    val a = side(aEveryN, aLenMin, "a")
    val b = side(bEveryN, bLenMin, "b")
    a.join(b, col("a_b") === col("b_b")
        && col("a_ts") <= col("b_end") && col("b_ts") <= col("a_end")
        && col("a_b") === expr(s"unix_micros(greatest(a_ts, b_ts)) div $bucketUs"))
      .select(col("a_id"), col("b_id"),
        (unix_micros(least(col("a_end"), col("b_end")))
          - unix_micros(greatest(col("a_ts"), col("b_ts")))).as("overlap_us"))
  }

  /** LEFT-OUTER stream-stream interval join — every event annotated
    * with each incident window covering it, or NULL when none does (the
    * coverage-audit dual of [[incidentWindowJoin]]: that query asks
    * "what's inside each window", this one asks "which events are
    * UNcovered"). Outer interval joins need the same two ingredients as
    * the inner form — watermarks on both event-time columns and a join
    * condition bounding each against the other — plus one extra
    * geometric care: the LEFT side must map to exactly ONE bucket, or
    * an unmatched row would emit one NULL row PER bucket copy. So here
    * the probe (event) side is left — one bucket each, one NULL row
    * each — and the window side is the one that explodes to its ≤2
    * covering buckets; a window's copies live in distinct buckets, so a
    * covered event still matches each covering window exactly once.
    * NULL rows surface when the event's side of the join state expires
    * under the watermark — in batch the watermark is a no-op and the
    * result is the plain relational left interval join (q119's oracle).
    */
  def eventWindowLeftJoin(events: DataFrame, everyN: Int = 200,
      windowMin: Int = 30, watermark: String = "1 hour"): DataFrame = {
    val winUs = windowMin * 60L * 1000000L
    val bucketUs = winUs
    val w = events.filter(pmod(col("event_id"), lit(everyN.toLong)) === 0)
      .select(col("event_id").as("window_id"), tsCol.as("w_ts"))
      .withWatermark("w_ts", watermark)
      .withColumn("wb", explode(array_distinct(array(
        expr(s"unix_micros(w_ts) div $bucketUs"),
        expr(s"(unix_micros(w_ts) + $winUs) div $bucketUs")))))
    val e = events.select(col("event_id").as("ev_id"), col("user_id"), tsCol.as("e_ts"))
      .withWatermark("e_ts", watermark)
      .withColumn("eb", expr(s"unix_micros(e_ts) div $bucketUs"))
    e.join(w, col("eb") === col("wb")
        && col("e_ts") >= col("w_ts")
        && col("e_ts") <= col("w_ts") + expr(s"INTERVAL $windowMin MINUTES"),
        "left_outer")
      .select(col("ev_id"), col("user_id"), col("window_id"),
        unix_micros(col("e_ts")).as("e_us"), unix_micros(col("w_ts")).as("w_us"))
  }

  /** The roles-swapped dual of [[eventWindowLeftJoin]]: every WINDOW
    * annotated with each event it covers, or NULL when it covers none —
    * the empty-window audit ("which maintenance windows saw no
    * traffic"). The bucket geometry mirrors exactly: the LEFT side must
    * be single-bucket, and here that's the window (bucketed by its
    * START; width = the window length), so the EVENT side explodes to
    * the ≤2 buckets a covering window's start could live in
    * (eb, eb − 1): an event at e matches windows with w_ts ∈
    * [e − win, e], whose start bucket is one of those two. A window
    * matches each covered event exactly once (the event's two copies
    * live in distinct buckets and the window has one bucket).
    */
  def windowCoverageLeftJoin(events: DataFrame, everyN: Int = 200,
      windowMin: Int = 30, watermark: String = "1 hour",
      excludeSelf: Boolean = false): DataFrame = {
    val winUs = windowMin * 60L * 1000000L
    val bucketUs = winUs
    val w = events.filter(pmod(col("event_id"), lit(everyN.toLong)) === 0)
      .select(col("event_id").as("window_id"), tsCol.as("w_ts"))
      .withWatermark("w_ts", watermark)
      .withColumn("wb", expr(s"unix_micros(w_ts) div $bucketUs"))
    val e = events.select(col("event_id").as("ev_id"), tsCol.as("e_ts"))
      .withWatermark("e_ts", watermark)
      // the two start-bucket candidates are always distinct (bucket
      // width = window length), so no dedup is needed on the copies
      .withColumn("eb", explode(array(
        expr(s"unix_micros(e_ts) div $bucketUs"),
        expr(s"unix_micros(e_ts) div $bucketUs - 1"))))
    // excludeSelf must ride the JOIN condition, not a post-filter: a
    // window whose ONLY covered event is its own opener must surface as
    // an (empty) NULL row, which a filter after the join would destroy
    val base = col("wb") === col("eb") &&
      col("e_ts") >= col("w_ts") &&
      col("e_ts") <= col("w_ts") + expr(s"INTERVAL $windowMin MINUTES")
    val cond = if (excludeSelf) base && col("ev_id") =!= col("window_id") else base
    w.join(e, cond, "left_outer")
      .select(col("window_id"), col("ev_id"),
        unix_micros(col("w_ts")).as("w_us"), unix_micros(col("e_ts")).as("e_us"))
  }

  /** Idempotent re-delivery dedup: first event per (user_id, event_type).
    * Streaming: withWatermark + dropDuplicates (bounded state). Batch
    * equivalent keeps earliest (ts, event_id) via row_number.
    */
  def dedupStream(events: DataFrame, watermark: String): DataFrame =
    events.withColumn("event_ts", tsCol)
      .withWatermark("event_ts", watermark)
      .dropDuplicates("user_id", "event_type")

  /** `dropDuplicatesWithinWatermark` variant of [[dedupStream]]: the
    * dedup KEYS carry no event-time column, so plain streaming
    * dropDuplicates would hold every (user, type) key forever; the
    * within-watermark contract (Spark 3.5+) evicts a key's state once
    * the watermark passes its first-seen time + delay — the right
    * spelling for at-least-once re-delivery dedup where duplicates
    * arrive within bounded lateness but keys recur over an unbounded
    * horizon. State is O(keys active inside one watermark window), not
    * O(all keys ever seen).
    */
  def dedupWithinWatermarkStream(events: DataFrame, watermark: String): DataFrame =
    events.withColumn("event_ts", tsCol)
      .withWatermark("event_ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Daily active users as a streaming pipeline: per-(user, day) dedup
    * (watermark-bounded dropDuplicates state) feeding a tumbling daily
    * count — CHAINED stateful operators, the streaming form of the q134
    * DAU term. Append mode emits each day once its watermark passes; the
    * dedup state for a day ages out with the same watermark. In batch
    * the watermark is a no-op and this is distinct(user, day) → count.
    */
  def dailyActiveUsers(events: DataFrame, late: String): DataFrame =
    events.withColumn("event_ts", tsCol)
      .withWatermark("event_ts", late)
      .withColumn("day_start", date_trunc("day", col("event_ts")))
      .dropDuplicates("user_id", "day_start")
      .groupBy(window(col("event_ts"), "1 day"))
      .agg(count(lit(1)).as("n_dau"))
      .select(col("window.start").as("window_start"), col("n_dau"))

  final case class UserEvent(user_id: Long, event_id: Long, us: Long, vc: Long)
  final case class UserMilestone(user_id: Long, event_id: Long, total_cents: Long,
      milestone: Long)

  /** Custom keyed state via flatMapGroupsWithState: per-user cumulative
    * spend, emitting one row each time the running total crosses another
    * `stepCents` milestone. State = a single long per user (bounded);
    * events sort by event time within each micro-batch's group iterator.
    * Across micro-batches the running total is order-sensitive like any
    * cumulative sum — production pairs this with a watermark and an
    * event-time-ordered source (batch equivalence pinned in StreamingSpec).
    */
  def spendMilestones(events: DataFrame, stepCents: Long): Dataset[UserMilestone] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("us"),
        round(col("value") * 100).cast("long").as("vc"))
      .as[UserEvent]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, UserMilestone](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[UserEvent], state: GroupState[Long]) =>
          var total = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(e => (e.us, e.event_id)).flatMap { e =>
            val before = total / stepCents
            total += e.vc
            val after = total / stepCents
            if (after > before) Some(UserMilestone(user, e.event_id, total, after * stepCents))
            else None
          }
          state.update(total)
          out.iterator
      }
  }

  final case class ZEvent(event_type: String, event_id: Long, us: Long, cents: Long)
  final case class ZAlert(event_id: Long, event_type: String, cents: Long, n_window: Long)

  /** Rolling z-score anomaly alerts with BOUNDED keyed state: per key the
    * state is the last ≤ `window` observed cents values (an O(window)
    * array, never the history), and an event alerts when its value sits
    * more than 3σ from the mean of those prior values — evaluated as the
    * cross-multiplied INTEGER inequality `(n·x − S)² > 9·(n·SS − S²)`
    * (σ² and μ never materialize as floats, so streaming and the batch
    * window formulation agree bit-for-bit). Events sort by event time
    * within each micro-batch's group iterator; running S/SS update
    * incrementally on push/evict, so per-event cost is O(1).
    *
    * The group key is the DETECTOR SCOPE — here `event_type` (this
    * table's only metric dimension, 5 keys); at fleet scale the scope is
    * (tenant, metric) with key cardinality to match the cluster, and the
    * state stays O(window) per key regardless of history length.
    */
  def rollingZscoreAlerts(events: DataFrame, window: Int = 100,
      minN: Int = 30): Dataset[ZAlert] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col("event_type"), col("event_id"), expr("ts div 1000").as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[ZEvent]
    typed.groupByKey(_.event_type)
      .flatMapGroupsWithState[Array[Long], ZAlert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[ZEvent], state: GroupState[Array[Long]]) =>
          var buf = scala.collection.immutable.Queue(
            state.getOption.getOrElse(Array.empty[Long]).toSeq: _*)
          var sv = buf.sum
          var ss = buf.iterator.map(x => x * x).sum
          val out = rows.toSeq.sortBy(e => (e.us, e.event_id)).flatMap { e =>
            val n = buf.length.toLong
            val d = n * e.cents - sv
            val alert =
              if (n >= minN && d * d > 9L * (n * ss - sv * sv))
                Some(ZAlert(e.event_id, key, e.cents, n))
              else None
            buf = buf.enqueue(e.cents); sv += e.cents; ss += e.cents * e.cents
            if (buf.length > window) {
              val (old, rest) = buf.dequeue
              buf = rest; sv -= old; ss -= old * old
            }
            alert
          }
          state.update(buf.toArray)
          out.iterator
      }
  }

  final case class CusumAlert(event_id: Long, event_type: String, cents: Long,
      cusum: Long)

  /** Streaming CUSUM drift alerts (Page 1954) with O(1) keyed state: per
    * event type the state is ONE long — the current CUSUM statistic
    * `S = max(0, S + (cents − k))` — updated in event-time order and
    * alerting while S exceeds `h`. The streaming twin of q187's batch
    * form: the batch side computes the SAME alerts through the
    * scan-parallel prefix identity `S_t = P_t − min(0, min_{i≤t} P_i)`
    * (per-type windows), and StreamingSpec pins the two bit-for-bit,
    * including state carried across micro-batch boundaries. All
    * arithmetic is integer cents, so engines and executions agree
    * exactly.
    *
    * PRECONDITION (the contract the multi-batch spec pins): rows are
    * sorted in event-time order only WITHIN each micro-batch; across
    * batches the source must deliver data in event-time order (e.g. a
    * file source fed time-ordered files). CUSUM is order-dependent and
    * keeps no out-of-order buffer — a source replaying batches out of
    * event-time order silently diverges from the batch form, same as
    * the repo's other order-dependent streaming twins (rolling z-score).
    */
  def cusumAlerts(events: DataFrame, k: Long = 6000L,
      h: Long = 30000L): Dataset[CusumAlert] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col("event_type"), col("event_id"), expr("ts div 1000").as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[ZEvent]
    typed.groupByKey(_.event_type)
      .flatMapGroupsWithState[Long, CusumAlert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[ZEvent], state: GroupState[Long]) =>
          var s = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(e => (e.us, e.event_id)).flatMap { e =>
            s = math.max(0L, s + (e.cents - k))
            if (s > h) Some(CusumAlert(e.event_id, key, e.cents, s)) else None
          }
          state.update(s)
          out.iterator
      }
  }

  final case class ConvEvent(user_id: Long, event_type: String, us: Long,
      event_ts: java.sql.Timestamp)
  final case class ConvState(signup_us: Long, emitted: Boolean)
  final case class Conversion(user_id: Long, signup_us: Long, purchase_us: Long,
      latency_us: Long)

  /** CEP-style ordered-pattern detection: FIRST signup followed by the
    * FIRST purchase within `windowUs` — the 2-step conversion funnel as a
    * per-user state machine (Spark has no MATCH_RECOGNIZE; keyed state is
    * the engine's native spelling). State is one (signup_us, emitted)
    * pair per user; under EventTimeTimeout each user's state arms a
    * timeout at signup + window, so state for users who never convert is
    * DROPPED once the watermark passes their window — the property that
    * keeps a forever-running funnel's state bounded by the ACTIVE window
    * population, not the all-time user count. (In batch execution
    * timeouts never fire — Spark's documented batch semantics — and the
    * single full iterator makes them unnecessary.)
    */
  def conversionFunnel(events: DataFrame,
      windowUs: Long = 604800000000L): Dataset[Conversion] = {
    val spark = events.sparkSession
    import spark.implicits._
    // batch execution strips the watermark node, where arming a timeout
    // throws — and batch runs the full iterator once, needing none
    val isStreaming = events.isStreaming
    val typed = events
      .withColumn("event_ts", tsCol)
      .withWatermark("event_ts", "365 days")
      // keep the watermarked column through the projection: the event-time
      // timeout checker requires it in the stateful operator's child
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("us"),
        col("event_ts"))
      .as[ConvEvent]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[ConvState, Conversion](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[ConvEvent], state: GroupState[ConvState]) =>
          if (state.hasTimedOut) {
            // watermark passed signup + window with no conversion: done
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(ConvState(-1L, emitted = false))
            val out = rows.toSeq.sortBy(_.us).flatMap { e =>
              if (e.event_type == "signup" && st.signup_us < 0L) {
                st = ConvState(e.us, emitted = false)
                None
              } else if (e.event_type == "purchase" && st.signup_us >= 0L &&
                !st.emitted && e.us >= st.signup_us &&
                e.us <= st.signup_us + windowUs) {
                st = st.copy(emitted = true)
                Some(Conversion(user, st.signup_us, e.us, e.us - st.signup_us))
              } else None
            }
            state.update(st)
            if (isStreaming && st.signup_us >= 0L && !st.emitted) {
              // clamp: a timeout at-or-before the current watermark throws;
              // one tick past it preserves "expire as soon as possible"
              state.setTimeoutTimestamp(math.max(
                (st.signup_us + windowUs) / 1000L,
                state.getCurrentWatermarkMs() + 1L))
            }
            out.iterator
          }
      }
  }

  final case class BucketDistinct(bucket: Long, est_users: Double, sketch_size: Int)

  /** Running distinct-count per key across micro-batches with BOUNDED
    * state: the keyed state is a KMV bottom-k hash sketch
    * ([[graft.ops.Sketches.KmvSketch]]'s reduce is a pure function, so
    * the exact same fold runs here and in the batch aggregator), never
    * the seen-key set itself. The streaming-native answer to "distinct
    * users per shard, forever" — exact distinct state grows with the key
    * universe and eventually evicts or OOMs; sketch state is ≤k longs
    * per group no matter how much history has streamed past. Because
    * bottom-k of a set is arrival-order-free, the running estimate after
    * N batches equals the batch estimate over the same rows EXACTLY
    * (pinned in StreamingSpec). Emits the current estimate per group per
    * micro-batch (Update mode); estimates are exact below k distincts
    * and (k−1)·2⁶³/kth above.
    */
  def runningDistinctSketch(events: DataFrame, buckets: Int = 8,
      k: Int = 256): Dataset[BucketDistinct] = {
    val spark = events.sparkSession
    import spark.implicits._
    val kmv = new graft.ops.Sketches.KmvSketch(k)
    events
      .select(pmod(col("user_id"), lit(buckets.toLong)).as("bucket"),
        xxhash64(col("user_id")).bitwiseAND(lit(Long.MaxValue)).as("h"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Array[Long], BucketDistinct](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (bucket: Long, rows: Iterator[(Long, Long)], state: GroupState[Array[Long]]) =>
          val sk = rows.foldLeft(state.getOption.getOrElse(Array.emptyLongArray)) {
            (s, r) => kmv.reduce(s, r._2)
          }
          state.update(sk)
          val est =
            if (sk.length < k) sk.length.toDouble
            else (k - 1).toDouble * 9.223372036854776e18 / sk(k - 1).toDouble
          Iterator.single(BucketDistinct(bucket, est, sk.length))
      }
  }

  /** Windowed count-min sketch cells as a STANDARD streaming stateful
    * aggregation — the point of [[graft.ops.CountMin]]'s design: the
    * d×w cell grid is just a groupBy, so in streaming mode the state
    * store holds ≤ d·w counters per window regardless of stream length
    * (the watermark retires whole windows). No custom state, no
    * flatMapGroupsWithState — the engine's own incremental aggregation
    * IS the sketch merge. Works identically on batch frames (watermark
    * no-ops, the q56 two-hop certification shape).
    */
  def windowedCountMin(events: DataFrame, width: String, late: String,
      depth: Int, wBuckets: Int): DataFrame =
    events.withColumn("event_ts", tsCol)
      .withWatermark("event_ts", late)
      .select(col("event_ts"), col("user_id"))
      .withColumn("row", explode(sequence(lit(0L), lit(depth - 1L))))
      .withColumn("bucket", graft.ops.CountMin.bucket(col("user_id"), col("row"), wBuckets))
      .groupBy(window(col("event_ts"), width).as("w"), col("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("row"), col("bucket"), col("cnt"))

  /** The gated streaming surface (round-10 verdict task #7): every
    * production streaming shape this tier ships, built over a real
    * file-stream source so [[graft.plans.PlanGate.auditStream]] can
    * sweep the ANALYZED plans in CI (FleetPlanShapeSpec) — state
    * operators present, watermark present where state grows with
    * history, keyed NoTimeout state only behind a written structural
    * bound. Names prefix-match `PlanGate.StreamStateAllow` for the
    * keyed-state ops whose bound is structural rather than
    * watermark-driven. The LSH delta rides a MemoryStream (plan-shape
    * only, never started); its corpus side is a 1-row static frame —
    * the audit reads structure, not data.
    */
  def gatedStreams(spark: SparkSession, sfDir: String): Seq[(String, DataFrame)] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val ev = graft.core.Tables.toLongNanos(
      spark.readStream.schema(schema).parquet(s"$sfDir/events.parquet"))
    val dim = spark.read.parquet(s"$sfDir/customer.parquet")
    val lshDelta = MemoryStream[(Long, Long, Array[Long])]
      .toDF().toDF("doc_id", "us", "sig")
    val lshCorpus = Seq((0L, Array.fill(64)(1L))).toDF("doc_id", "sig")
    Seq(
      "s_tumbling_late" -> tumblingAggLate(ev, "1 hour", "30 minutes"),
      "s_sliding" -> slidingAgg(ev, "1 hour", "15 minutes", Some("30 minutes")),
      "s_session" -> sessionAgg(ev, "30 minutes", Some("30 minutes")),
      "s_enriched" -> enrichedAgg(ev, dim, "1 hour", Some("30 minutes")),
      "s_attribution" -> purchaseAttribution(ev, 30, "30 minutes"),
      "s_attribution_outer" -> purchaseAttribution(ev, 30, "30 minutes", "left_outer"),
      "s_incident_join" -> incidentWindowJoin(ev),
      "s_overlap_join" -> overlapWindowJoin(ev),
      "s_event_window_left" -> eventWindowLeftJoin(ev),
      "s_window_coverage" -> windowCoverageLeftJoin(ev),
      "s_dedup" -> dedupStream(ev, "30 minutes"),
      "s_dedup_wm" -> dedupWithinWatermarkStream(ev, "30 minutes"),
      "s_dau" -> dailyActiveUsers(ev, "1 hour"),
      "s_milestones" -> spendMilestones(ev, 10000L).toDF(),
      "s_milestones_v2" -> StateV2.spendMilestonesV2(ev, 10000L).toDF(),
      "s_zscore" -> rollingZscoreAlerts(ev).toDF(),
      "s_zscore_v2" -> StateV2.rollingZscoreAlertsV2(ev).toDF(),
      "s_cusum" -> cusumAlerts(ev).toDF(),
      "s_funnel" -> conversionFunnel(ev).toDF(),
      "s_funnel_v2" -> StateV2.conversionFunnelV2(ev).toDF(),
      "s_distinct_sketch" -> runningDistinctSketch(ev).toDF(),
      "s_countmin" -> windowedCountMin(ev, "1 hour", "30 minutes", 4, 64),
      "s_lsh_admission" -> graft.streaming.LshAdmit.admitStream(
        lshDelta, lshCorpus, bands = 16, minEstJ = 0.4),
      "s_lsh_admission_v2" -> StateV2.admitStreamV2(
        lshDelta, lshCorpus, bands = 16, minEstJ = 0.4),
      "s_type_counts_v2" -> StateV2.runningTypeCountsV2(ev).toDF(),
      "s_excel_drop" -> excelDropCounts(spark,
        graft.queries.ExtensionQueries67.excelDir(spark, sfDir))
    )
  }

  /** Drop-directory ingestion over the V2 Excel MicroBatchStream: each
    * newly dropped workbook becomes one input partition of the next
    * micro-batch, rolled into per-language running counts. State = one
    * count row per language (bounded key cardinality, NOT history) —
    * written bound in [[graft.plans.PlanGate.StreamStateAllow]].
    */
  def excelDropCounts(spark: SparkSession, dropDir: String): DataFrame =
    spark.readStream.format("graft.sources.excel").load(dropDir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast("long")).as("chars_sum"))

  /** Run a streaming transform over a parquet directory to completion via
    * the memory sink; returns the materialized result table.
    */
  def runToMemory(spark: SparkSession, srcDir: String, name: String,
      transform: DataFrame => DataFrame, mode: String): DataFrame = {
    // File streams need an explicit schema; take it from the files
    // themselves (one driver-side footer read), then normalize ts to the
    // canonical long nanos so transforms see one event-time encoding
    // regardless of how the parquet was written.
    val fileSchema = spark.read.parquet(srcDir).schema
    val stream = graft.core.Tables.toLongNanos(
      spark.readStream.schema(fileSchema).parquet(srcDir))
    val q = transform(stream).writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }
}
