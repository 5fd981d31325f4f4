package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState,
  ExpiredTimerInfo}

import StreamOps.{ConvEvent, ConvState, Conversion, UserEvent, UserMilestone,
  ZAlert, ZEvent}

/** The arbitrary-stateful tier re-expressed on Spark 4's
  * `transformWithState` (StatefulProcessor) API — the successor to
  * `flatMapGroupsWithState` built for the RocksDB state store: named
  * state variables instead of one opaque blob (each ValueState/ListState
  * is its own column family, so a ListState append is O(delta), not a
  * full read-modify-write of the buffer), explicit timers decoupled from
  * state (register/delete many per key), TTL per state variable, and
  * initial-state bootstrap. Reference semantics: the same per-key folds
  * as the v1 operators in [[StreamOps]] (spend milestones
  * `etl_merge.py`-style cumulative triggers, rolling z-score, funnel) —
  * certified three ways in StateV2Spec: v2 streaming == v1 streaming ==
  * the batch/oracle formulation (q46/q158/q171 rows).
  *
  * Scale notes (the reason this tier exists at 100 TB): per-key state is
  * identical to v1 (one long / O(window) longs / one pair), but the v2
  * runtime keeps it in RocksDB column families keyed by (grouping key,
  * state name) — so a hot key's ListState append never rewrites the
  * whole list, and timer storage is a separate CF that the micro-batch
  * scans by expiry prefix rather than by touching every key's state.
  * OSS Spark requires the RocksDB state-store provider for
  * transformWithState STREAMING runs ([[withRocksDb]] scopes it); batch
  * execution plans through `generateSparkPlanForBatchQueries` like any
  * object operator.
  */
object StateV2 {

  /** Runs `body` with the RocksDB state-store provider set (the only
    * provider transformWithState supports in OSS streaming runs),
    * restoring the prior setting after — session-conf hygiene for
    * suites that interleave v1 (HDFS-backed) and v2 pipelines.
    */
  def withRocksDb[T](spark: org.apache.spark.sql.SparkSession)(body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Batch transformWithState plans load a real (transient) state store,
    * and the executor-side store reports to the driver's
    * StateStoreCoordinator RPC endpoint — which Spark only creates when
    * the first STREAMING query starts. In a session that has never run
    * one, a batch v2 query dies with RpcEndpointNotFoundException; touch
    * the coordinator's lazy val up front (idempotent, driver-side only).
    */
  private def ensureBatchCoordinator(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.GraftBridge.ensureStateStoreCoordinator(spark)

  /** Per-user cumulative spend milestones — the v2 twin of
    * [[StreamOps.spendMilestones]]. State: one ValueState[Long] named
    * "total" (bounded by key cardinality). TimeMode.None: nothing here
    * is time-driven; the structural bound is the written justification
    * in PlanGate's StreamStateAllow.
    */
  private final class SpendMilestoneProcessor(stepCents: Long)
      extends StatefulProcessor[Long, UserEvent, UserMilestone] {
    @transient private var total: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      total = getHandle.getValueState[Long]("total", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[UserEvent],
        tv: TimerValues): Iterator[UserMilestone] = {
      var t = if (total.exists()) total.get() else 0L
      val out = rows.toSeq.sortBy(e => (e.us, e.event_id)).flatMap { e =>
        val before = t / stepCents
        t += e.vc
        val after = t / stepCents
        if (after > before) Some(UserMilestone(user, e.event_id, t, after * stepCents))
        else None
      }
      total.update(t)
      out.iterator
    }
  }

  def spendMilestonesV2(events: DataFrame, stepCents: Long): Dataset[UserMilestone] = {
    val spark = events.sparkSession
    import spark.implicits._
    if (!events.isStreaming) ensureBatchCoordinator(spark)
    events
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("us"),
        round(col("value") * 100).cast("long").as("vc"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .transformWithState(new SpendMilestoneProcessor(stepCents),
        TimeMode.None(), OutputMode.Append())
  }

  /** Rolling z-score alerts — the v2 twin of
    * [[StreamOps.rollingZscoreAlerts]], and the ListState showcase: the
    * ≤window ring of prior cents values lives in a ListState[Long]
    * whose per-row APPEND is an O(1) RocksDB put (v1 serializes the
    * whole array back into its single state blob every micro-batch).
    * Evictions still rewrite the list (put()), but eviction count per
    * batch ≤ row count, so amortized cost matches the append path. Same
    * cross-multiplied integer inequality as v1 — no float ever forms,
    * so all three certification hops agree bit-for-bit.
    */
  private final class RollingZscoreProcessor(window: Int, minN: Int)
      extends StatefulProcessor[String, ZEvent, ZAlert] {
    @transient private var buf: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getListState[Long]("window", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[ZEvent],
        tv: TimerValues): Iterator[ZAlert] = {
      var q = scala.collection.immutable.Queue(
        (if (buf.exists()) buf.get().toSeq else Seq.empty[Long]): _*)
      var sv = q.sum
      var ssv = q.iterator.map(v => v * v).sum
      var evicted = false
      val out = rows.toSeq.sortBy(e => (e.us, e.event_id)).flatMap { e =>
        val n = q.size.toLong
        val alert = n >= minN && {
          val d = n * e.cents - sv
          d * d > 9L * (n * ssv - sv * sv)
        }
        q = q.enqueue(e.cents); sv += e.cents; ssv += e.cents * e.cents
        buf.appendValue(e.cents)
        if (q.size > window) {
          val (h, rest) = q.dequeue
          q = rest; sv -= h; ssv -= h * h; evicted = true
        }
        if (alert) Some(ZAlert(e.event_id, key, e.cents, n)) else None
      }
      // appends alone kept state exact when nothing fell off the ring;
      // otherwise rewrite once per batch, not once per row
      if (evicted) buf.put(q.toArray)
      out.iterator
    }
  }

  def rollingZscoreAlertsV2(events: DataFrame, window: Int = 100,
      minN: Int = 30): Dataset[ZAlert] = {
    val spark = events.sparkSession
    import spark.implicits._
    if (!events.isStreaming) ensureBatchCoordinator(spark)
    events
      .select(col("event_type"), col("event_id"), expr("ts div 1000").as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[ZEvent]
      .groupByKey(_.event_type)
      .transformWithState(new RollingZscoreProcessor(window, minN),
        TimeMode.None(), OutputMode.Append())
  }

  /** First-signup → first-purchase conversion funnel — the v2 twin of
    * [[StreamOps.conversionFunnel]], showcasing v2 EVENT-TIME TIMERS:
    * the signup arms `registerTimer(signup + window)`; when the
    * watermark passes it, [[handleExpiredTimer]] drops the never-
    * converted user's state — the bounded-by-active-population property,
    * now with the timer decoupled from the state value (v1's single
    * implicit timeout per key forced the clamp dance around the current
    * watermark; v2 timers accept any future expiry and fire when due).
    * A conversion deletes the timer eagerly. In batch runs timers never
    * fire and registration is skipped (same documented batch semantics
    * as v1; the single full iterator needs no expiry).
    */
  private final class ConversionFunnelProcessor(windowUs: Long, streaming: Boolean)
      extends StatefulProcessor[Long, ConvEvent, Conversion] {
    @transient private var st: ValueState[ConvState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[ConvState]("funnel",
        Encoders.product[ConvState], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[ConvEvent],
        tv: TimerValues): Iterator[Conversion] = {
      var cur = if (st.exists()) st.get() else ConvState(-1L, emitted = false)
      val hadTimer = streaming && cur.signup_us >= 0L && !cur.emitted
      val out = rows.toSeq.sortBy(_.us).flatMap { e =>
        if (e.event_type == "signup" && cur.signup_us < 0L) {
          cur = ConvState(e.us, emitted = false)
          None
        } else if (e.event_type == "purchase" && cur.signup_us >= 0L &&
          !cur.emitted && e.us >= cur.signup_us &&
          e.us <= cur.signup_us + windowUs) {
          cur = cur.copy(emitted = true)
          Some(Conversion(user, cur.signup_us, e.us, e.us - cur.signup_us))
        } else None
      }
      st.update(cur)
      if (streaming) {
        val wantTimer = cur.signup_us >= 0L && !cur.emitted
        val expiryMs = (cur.signup_us + windowUs) / 1000L
        if (wantTimer && !hadTimer) getHandle.registerTimer(expiryMs)
        else if (hadTimer && !wantTimer) getHandle.deleteTimer(expiryMs)
      }
      out.iterator
    }

    override def handleExpiredTimer(user: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Conversion] = {
      // watermark passed signup + window with no conversion: done
      st.clear()
      Iterator.empty
    }
  }

  final case class TypeCount(user_id: Long, event_type: String, n: Long)

  /** Per-user running event-type counts on a MapState[String, Long] with
    * per-entry TTL — the MapState + TTL showcase completing the v2
    * state-variable surface (ValueState, ListState, MapState, timers,
    * initial state). Each micro-batch emits the UPDATED (user, type)
    * counts, so the max-per-(user,type) over the whole output equals the
    * batch `groupBy(user, type).count()` — the parity StateV2Spec pins.
    *
    * TTL is the third expiry mechanism the plan gate recognizes (after
    * watermarks and timers) and the only one that works per STATE ENTRY
    * rather than per key or per window: an idle user's count entries
    * age out `ttl` after their last update (RocksDB-native, TimeMode
    * .ProcessingTime required), so unbounded key universes — the
    * all-time user population — hold state only for their ACTIVE
    * window. The spec uses a 1-hour TTL so nothing expires mid-test and
    * the parity stays exact, and certifies the TTL registration through
    * the numMapStateWithTTLVars operator metric.
    *
    * CAVEAT (pinned by the spec's structure): ProcessingTime mode keeps
    * a live query permanently busy — TTL work is always potentially
    * pending, so `processAllAvailable` and even an AvailableNow drain
    * never terminate. A forever-running deployment doesn't care; tests
    * and backfills must drive it with bounded triggers (Trigger.Once
    * runs sharing a checkpoint).
    */
  private final class TypeCountProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[Long, (Long, String), TypeCount] {
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, new TTLConfig(ttl))

    override def handleInputRows(user: Long, rows: Iterator[(Long, String)],
        tv: TimerValues): Iterator[TypeCount] = {
      val touched = scala.collection.mutable.LinkedHashSet.empty[String]
      rows.foreach { case (_, t) =>
        val cur = if (counts.containsKey(t)) counts.getValue(t) else 0L
        counts.updateValue(t, cur + 1L)
        touched += t
      }
      touched.iterator.map(t => TypeCount(user, t, counts.getValue(t)))
        .toSeq.iterator
    }
  }

  def runningTypeCountsV2(events: DataFrame,
      ttl: java.time.Duration = java.time.Duration.ofHours(1)): Dataset[TypeCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    if (!events.isStreaming) ensureBatchCoordinator(spark)
    events.select(col("user_id"), col("event_type")).as[(Long, String)]
      .groupByKey(_._1)
      .transformWithState(new TypeCountProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  /** Banded-LSH near-dup admission — the v2 twin of
    * [[LshAdmit.admitStream]], showcasing
    * `StatefulProcessorWithInitialState`: the stored corpus index
    * bootstraps each (band, band-key) bucket's ListState[Member] via
    * [[StatefulProcessorWithInitialState.handleInitialState]] (v1 used
    * the `initialState` overload of flatMapGroupsWithState), and every
    * processed delta APPENDS to its buckets — in RocksDB an O(delta)
    * put per member, where v1 rewrote each bucket's whole member array
    * into its single state blob every micro-batch. Admission semantics,
    * the codegen band-key kernel, and the chained watermarked verdict
    * fold are shared with v1 bit-for-bit; state rows stay bounded by
    * bands × index size (the admission index IS the product).
    */
  private final class LshAdmitProcessor(minEstJ: Double)
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        (Int, Long), LshAdmit.BandRow, LshAdmit.Verdict, Array[LshAdmit.Member]] {
    @transient private var members: ListState[LshAdmit.Member] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[LshAdmit.Member]("members",
        Encoders.product[LshAdmit.Member], TTLConfig.NONE)

    override def handleInitialState(key: (Int, Long),
        initial: Array[LshAdmit.Member], tv: TimerValues): Unit =
      members.put(initial)

    override def handleInputRows(key: (Int, Long),
        rows: Iterator[LshAdmit.BandRow],
        tv: TimerValues): Iterator[LshAdmit.Verdict] = {
      val cur = if (members.exists()) members.get().toArray
        else Array.empty[LshAdmit.Member]
      var all = cur
      val out = rows.toSeq.sortBy(_.doc_id).map { r =>
        var best = Long.MaxValue
        var i = 0
        while (i < all.length) {
          val m = all(i)
          if ((m.corpus || m.id < r.doc_id) && m.id < best &&
            LshAdmit.estJJvm(m.sig, r.sig) >= minEstJ) best = m.id
          i += 1
        }
        val me = LshAdmit.Member(r.doc_id, corpus = false, r.sig)
        all = all :+ me
        members.appendValue(me)
        LshAdmit.Verdict(r.doc_id, r.us, best)
      }
      out.iterator
    }
  }

  /** V2 admission over a streaming delta frame against a batch corpus
    * index; same contract and output shape as [[LshAdmit.admitStream]].
    */
  def admitStreamV2(deltaSigs: DataFrame, corpusSigs: DataFrame, bands: Int,
      minEstJ: Double, window: String = "10 seconds",
      late: String = "10 seconds"): DataFrame = {
    val spark = deltaSigs.sparkSession
    import spark.implicits._

    val init = LshAdmit.banded(corpusSigs.withColumn("us", lit(0L)), bands)
      .groupByKey(r => (r.band, r.bk))
      .mapGroups((k, rows) =>
        (k, rows.map(r => LshAdmit.Member(r.doc_id, corpus = true, r.sig)).toArray))
      .groupByKey(_._1).mapValues(_._2)

    val verdicts = LshAdmit.banded(deltaSigs, bands)
      .groupByKey(r => (r.band, r.bk))
      .transformWithState(new LshAdmitProcessor(minEstJ),
        TimeMode.None(), OutputMode.Append(), init)

    verdicts
      .withColumn("event_ts", timestamp_micros(col("us")))
      .withWatermark("event_ts", late)
      .groupBy(org.apache.spark.sql.functions.window(col("event_ts"), window)
        .as("w"), col("doc_id"))
      .agg(min(col("partner")).as("__p"))
      .select(col("w.start").as("window_start"), col("doc_id"),
        (col("__p") === Long.MaxValue).as("keep"),
        when(col("__p") =!= Long.MaxValue, col("__p")).as("dup_of"))
  }

  def conversionFunnelV2(events: DataFrame,
      windowUs: Long = 604800000000L): Dataset[Conversion] = {
    val spark = events.sparkSession
    import spark.implicits._
    val isStreaming = events.isStreaming
    if (!isStreaming) ensureBatchCoordinator(spark)
    val typed = events
      .withColumn("event_ts", StreamOps.tsCol)
      .withWatermark("event_ts", "365 days")
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("us"),
        col("event_ts"))
      .as[ConvEvent]
    typed.groupByKey(_.user_id)
      .transformWithState(new ConversionFunnelProcessor(windowUs, isStreaming),
        if (isStreaming) TimeMode.EventTime() else TimeMode.None(),
        OutputMode.Append())
  }
}
