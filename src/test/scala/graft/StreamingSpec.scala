package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.streaming.StreamOps

/** Streaming correctness = batch equivalence (the standard Structured
  * Streaming testing idiom): the same transform over the same events must
  * produce identical results through the micro-batch engine.
  */
class StreamingSpec extends SparkSpecBase {

  private lazy val srcDir: String = {
    // Stage the normalized (ts = long nanos) events once; downstream
    // re-splits and EventsSchema streaming reads then see the canonical
    // encoding whatever physical type the testdata generator used.
    val dir = Files.createTempDirectory("graft_stream_src")
    graft.core.Tables.events(spark, "/root/testdata/sf0.001")
      .coalesce(1).write.mode("overwrite").parquet(dir.toString)
    dir.toString
  }
  private lazy val batchEvents = spark.read.parquet(srcDir)

  test("tumbling window agg: streaming == batch") {
    val batch = StreamOps.tumblingAgg(batchEvents, "1 hour")
      .collect().map(_.toString).sorted
    val stream = StreamOps.runToMemory(spark, srcDir, "tumbling_out",
      df => StreamOps.tumblingAgg(df, "1 hour"), "complete")
      .collect().map(_.toString).sorted
    assert(batch.nonEmpty && batch.sameElements(stream))
  }

  test("stream-static enrichment join: streaming == batch") {
    val dim = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val batch = StreamOps.enrichedAgg(batchEvents, dim, "1 hour")
      .collect().map(_.toString).sorted
    val stream = StreamOps.runToMemory(spark, srcDir, "enrich_out",
      df => StreamOps.enrichedAgg(df, dim, "1 hour"), "complete")
      .collect().map(_.toString).sorted
    assert(batch.nonEmpty && batch.sameElements(stream))
  }

  test("contamination overlap streaming == batch (extension op as stream-static join)") {
    val docsDir = Files.createTempDirectory("graft_docs_src")
    Files.copy(Paths.get("/root/testdata/sf0.001/documents.parquet"),
      docsDir.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val batchDocs = spark.read.parquet(docsDir.toString)
    val evalSet = batchDocs.filter(col("doc_id") < 10).select("doc_id", "text")
    def xform(df: org.apache.spark.sql.DataFrame) =
      graft.ext.Contamination.overlap(
        df.filter(col("doc_id") >= 10), evalSet, "doc_id", col("text"), 3)
    val batch = xform(batchDocs).collect().map(_.toString).sorted
    val q = xform(spark.readStream.schema(batchDocs.schema).parquet(docsDir.toString))
      .writeStream.format("memory").queryName("contam_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val stream = spark.table("contam_out").collect().map(_.toString).sorted
    assert(batch.nonEmpty && batch.sameElements(stream))
  }

  test("running KMV distinct state across micro-batches == batch sketch EXACTLY, state stays <= k") {
    // 3-file source → 3 real micro-batches; keyed state is the bottom-k
    // sketch, so the FINAL per-bucket estimate must equal a single batch
    // fold over the same rows (bottom-k of a set is order-free), and the
    // stored state never exceeds k longs per bucket regardless of history
    val multi = Files.createTempDirectory("graft_stream_kmv")
    val e = batchEvents.orderBy("event_id")
    val n = e.count()
    e.limit((n / 3).toInt).write.parquet(multi.resolve("p1").toString)
    e.orderBy("event_id").offset((n / 3).toInt).limit((n / 3).toInt)
      .write.parquet(multi.resolve("p2").toString)
    e.orderBy("event_id").offset(2 * (n / 3).toInt)
      .write.parquet(multi.resolve("p3").toString)
    val src = multi.resolve("all")
    Files.createDirectory(src)
    var i = 0
    for (p <- Seq("p1", "p2", "p3")) {
      import scala.jdk.CollectionConverters._
      Files.list(multi.resolve(p)).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).foreach { f =>
          Files.copy(f, src.resolve(s"part_$i.parquet")); i += 1
        }
    }
    val k = 64 // below the 1500-user universe so the estimator path runs
    val stream = spark.readStream.schema(StreamOps.EventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    val q = StreamOps.runningDistinctSketch(stream, buckets = 4, k = k)
      .writeStream.format("memory").queryName("kmv_running")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    // last emission per bucket (update mode appends one row per bucket per batch)
    val w = Window.partitionBy("bucket")
      .orderBy(monotonically_increasing_id().desc)
    val finalRows = spark.table("kmv_running")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .collect().map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Double]("est_users"), r.getAs[Int]("sketch_size"))).toMap
    val batch = StreamOps.runningDistinctSketch(batchEvents, buckets = 4, k = k)
      .collect().map(r => r.bucket -> (r.est_users, r.sketch_size)).toMap
    assert(finalRows == batch,
      s"running sketch diverged from batch fold:\n$finalRows\nvs\n$batch")
    assert(finalRows.values.forall(_._2 <= k), "state exceeded the k-long bound")
    // and the estimate is actually close to the exact distinct count
    val exact = batchEvents.groupBy(pmod(col("user_id"), lit(4L)).as("b"))
      .agg(countDistinct("user_id").as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((b, (est, _)) <- finalRows) {
      val ex = exact(b)
      assert(math.abs(est - ex) / ex <= 0.40,
        s"bucket $b: est $est vs exact $ex (k=$k → RSE ~13%, 40% ≈ 3σ)")
    }
  }

  test("windowed HLL distinct-user sketch: streaming == batch EXACTLY (register merge is order-free)") {
    // the sketch tier composes with streaming for free: hll_sketch_agg is
    // a mergeable aggregate, so per-window sketches accumulate across
    // micro-batches like any partial agg — and because HLL registers are
    // max-merged, the stream arrival order cannot change the estimate:
    // equality here is exact, not approximate
    def xform(df: org.apache.spark.sql.DataFrame) =
      df.select(timestamp_seconds(col("ts").cast("double") / 1e9).as("t"), col("user_id"))
        .groupBy(window(col("t"), "1 day"))
        .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).as("est_users"))
        .select(col("window.start").as("ws"), col("est_users"))
    val batch = xform(batchEvents).collect().map(_.toString).sorted
    val stream = StreamOps.runToMemory(spark, srcDir, "hll_win_out",
      xform, "complete").collect().map(_.toString).sorted
    assert(batch.nonEmpty && batch.sameElements(stream))
  }

  test("streaming dedup == batch keep-earliest dedup") {
    val stream = StreamOps.runToMemory(spark, srcDir, "dedup_out",
      df => StreamOps.dedupStream(df, "1 hour"), "append")
    // same cardinality and same key set as batch distinct keys
    val batchKeys = batchEvents.select("user_id", "event_type").distinct().count()
    assert(stream.count() == batchKeys)
  }

  test("session_window == gaps-and-islands sessionization") {
    val gapped = StreamOps.sessionAgg(batchEvents, "30 minutes")
    // gaps-and-islands reference (the q21 formulation, µs-exact)
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val gi = batchEvents
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("us"),
        round(col("value") * 100).cast("long").as("vc"))
      .withColumn("new_sess",
        when(col("us") - lag(col("us"), 1).over(w) > 30L * 60 * 1000000, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_sess"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_events"), (sum(col("vc")) / 100.0).as("sum_value"),
        min(col("us")).as("start_us"))
    // compare as (user, n_events, sum_value, start_us) multisets
    val a = gapped.select(col("user_id"), col("n_events"), col("sum_value"),
      unix_micros(col("session_start")).as("start_us"))
      .collect().map(_.toString).sorted
    val b = gi.select(col("user_id"), col("n_events"), col("sum_value"), col("start_us"))
      .collect().map(_.toString).sorted
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("flatMapGroupsWithState milestones: streaming == batch window formulation") {
    val step = 50000L // every 500.00 of cumulative user spend
    val stream = StreamOps.runToMemory(spark, srcDir, "milestones_out",
      df => StreamOps.spendMilestones(df, step).toDF(), "append")
      .collect().map(_.toString).sorted
    // batch reference: running sum per user, milestone rows where the
    // integer quotient increases
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val batch = batchEvents
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("us"),
        round(col("value") * 100).cast("long").as("vc"))
      .withColumn("total_cents",
        sum(col("vc")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("prev_total", coalesce(lag(col("total_cents"), 1).over(w), lit(0L)))
      .filter((col("total_cents") / step).cast("long") > (col("prev_total") / step).cast("long"))
      .select(col("user_id"), col("event_id"), col("total_cents"),
        ((col("total_cents") / step).cast("long") * step).as("milestone"))
      .collect().map(_.toString).sorted
    assert(batch.nonEmpty && batch.sameElements(stream),
      s"stream=${stream.length} batch=${batch.length}")
  }

  test("flatMapGroupsWithState rolling z-score: streaming == batch window formulation") {
    val stream = StreamOps.runToMemory(spark, srcDir, "zscore_out",
      df => StreamOps.rollingZscoreAlerts(df).toDF(), "append")
      .collect().map(_.toString).sorted
    val w = Window.partitionBy(col("event_type")).orderBy(col("us"), col("event_id"))
      .rowsBetween(-100, -1)
    val batch = batchEvents
      .select(col("event_id"), col("event_type"), expr("ts div 1000").as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sv", sum(col("cents")).over(w))
      .withColumn("ss", sum(col("cents") * col("cents")).over(w))
      .filter(col("n") >= 30 &&
        (col("n") * col("cents") - col("sv")) * (col("n") * col("cents") - col("sv")) >
          lit(9L) * (col("n") * col("ss") - col("sv") * col("sv")))
      .select(col("event_id"), col("event_type"), col("cents"),
        col("n").as("n_window"))
      .collect().map(_.toString).sorted
    assert(batch.nonEmpty && batch.sameElements(stream),
      s"stream=${stream.length} batch=${batch.length}")
  }

  test("flatMapGroupsWithState CUSUM: streaming == batch prefix-identity formulation") {
    val stream = StreamOps.runToMemory(spark, srcDir, "cusum_out",
      df => StreamOps.cusumAlerts(df).toDF(), "append")
      .collect().map(_.toString).sorted
    val (k, h) = (6000L, 30000L)
    val w = Window.partitionBy(col("event_type")).orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val batch = batchEvents
      .select(col("event_id"), col("event_type"), expr("ts div 1000").as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("psum", sum(col("cents") - lit(k)).over(w))
      .withColumn("runmin", min(col("psum")).over(w))
      .withColumn("cusum", col("psum") - least(lit(0L), col("runmin")))
      .filter(col("cusum") > h)
      .select(col("event_id"), col("event_type"), col("cents"), col("cusum"))
      .collect().map(_.toString).sorted
    assert(batch.nonEmpty && batch.sameElements(stream),
      s"stream=${stream.length} batch=${batch.length}")
  }

  test("CUSUM scalar state carries across micro-batches (time-ordered 3-file source)") {
    val multi = Files.createTempDirectory("graft_cusum_multi")
    val e = batchEvents.orderBy("event_id")
    val n = e.count()
    // n/3 truncation: with n < 3 the first two chunks would be EMPTY
    // parquet writes and the test would degenerate to single-batch —
    // fail loudly on a misconfigured testdata dir instead
    assert(n >= 3, s"events table too small to split into 3 batches (n=$n)")
    val src = multi.resolve("all")
    Files.createDirectory(src)
    var i = 0
    for (off <- Seq(0, (n / 3).toInt, 2 * (n / 3).toInt)) {
      val part = multi.resolve(s"p$i")
      val lim = if (off == 2 * (n / 3).toInt) n.toInt else (n / 3).toInt
      e.orderBy("event_id").offset(off).limit(lim)
        .coalesce(1).write.parquet(part.toString)
      import scala.jdk.CollectionConverters._
      Files.list(part).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).foreach { f =>
          Files.copy(f, src.resolve(s"part_$i.parquet")); i += 1
        }
    }
    val stream = spark.readStream.schema(StreamOps.EventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    val q = StreamOps.cusumAlerts(stream).toDF().writeStream
      .format("memory").queryName("cusum_multi").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("cusum_multi").collect().map(_.toString).sorted
    val single = StreamOps.cusumAlerts(batchEvents).toDF()
      .collect().map(_.toString).sorted
    assert(single.nonEmpty && got.sameElements(single),
      s"multi-batch=${got.length} single=${single.length}")
  }

  test("rolling z-score DEQUE state carries across micro-batches (time-ordered 3-file source)") {
    // events are time-ordered by event_id (pinned 0 inversions in the
    // testdata), so a by-id split feeds the stream in event-time order and
    // the ≤100-value deque must seamlessly span the batch boundaries
    val multi = Files.createTempDirectory("graft_zscore_multi")
    val e = batchEvents.orderBy("event_id")
    val n = e.count()
    val src = multi.resolve("all")
    Files.createDirectory(src)
    var i = 0
    for (off <- Seq(0, (n / 3).toInt, 2 * (n / 3).toInt)) {
      val part = multi.resolve(s"p$i")
      val lim = if (off == 2 * (n / 3).toInt) n.toInt else (n / 3).toInt
      e.orderBy("event_id").offset(off).limit(lim)
        .coalesce(1).write.parquet(part.toString)
      import scala.jdk.CollectionConverters._
      Files.list(part).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).foreach { f =>
          Files.copy(f, src.resolve(s"part_$i.parquet")); i += 1
        }
    }
    val stream = spark.readStream.schema(StreamOps.EventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    val q = StreamOps.rollingZscoreAlerts(stream).toDF().writeStream
      .format("memory").queryName("zscore_multi").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("zscore_multi").collect().map(_.toString).sorted
    val single = StreamOps.rollingZscoreAlerts(batchEvents).toDF()
      .collect().map(_.toString).sorted
    assert(single.nonEmpty && got.sameElements(single),
      s"multi-batch=${got.length} single=${single.length}")
  }

  test("conversionFunnel CEP state machine: streaming == batch == declarative form") {
    val stream = StreamOps.runToMemory(spark, srcDir, "conv_out",
      df => StreamOps.conversionFunnel(df).toDF(), "append")
      .collect().map(_.toString).sorted
    val batch = StreamOps.conversionFunnel(batchEvents).toDF()
      .collect().map(_.toString).sorted
    val declarative = graft.queries.ExtensionQueries25
      .q171_conversion_window(spark, "/root/testdata/sf0.001")
      .collect().map(_.toString).sorted
    assert(batch.nonEmpty && batch.sameElements(stream),
      s"stream=${stream.length} batch=${batch.length}")
    assert(batch.sameElements(declarative),
      s"declarative=${declarative.length} batch=${batch.length}")
  }

  test("state survives MULTIPLE micro-batches: 3-file source, one file per trigger") {
    // split events into 3 files so the stream runs 3 real micro-batches
    val multi = Files.createTempDirectory("graft_stream_multi")
    val e = batchEvents.orderBy("event_id")
    val n = e.count()
    e.limit((n / 3).toInt).write.parquet(multi.resolve("p1").toString)
    e.orderBy("event_id").offset((n / 3).toInt).limit((n / 3).toInt)
      .write.parquet(multi.resolve("p2").toString)
    e.orderBy("event_id").offset(2 * (n / 3).toInt)
      .write.parquet(multi.resolve("p3").toString)
    val src = multi.resolve("all")
    Files.createDirectory(src)
    var i = 0
    for (p <- Seq("p1", "p2", "p3")) {
      import scala.jdk.CollectionConverters._
      Files.list(multi.resolve(p)).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).foreach { f =>
          Files.copy(f, src.resolve(s"part_$i.parquet")); i += 1
        }
    }
    val stream = spark.readStream.schema(StreamOps.EventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    val q = StreamOps.dedupStream(stream, "365 days").writeStream
      .format("memory").queryName("multi_dedup").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    // dedup state must persist across the 3 micro-batches: same key set as batch
    val got = spark.table("multi_dedup").count()
    val expect = batchEvents.select("user_id", "event_type").distinct().count()
    assert(got == expect, s"stream kept $got keys, batch distinct = $expect")
    assert(i >= 3, "expected at least 3 source files (3 micro-batches)")
  }

  test("stream-stream interval join buffers both sides' state across micro-batches " +
    "== batch range join") {
    // one file per trigger → purchases and their matching views arrive in
    // DIFFERENT micro-batches; the join state must hold both sides
    val multi = Files.createTempDirectory("graft_ss_join")
    val e = batchEvents.orderBy("event_id")
    val n = e.count().toInt
    val src = multi.resolve("all")
    Files.createDirectory(src)
    var i = 0
    for (part <- Seq(0, 1, 2)) {
      val dir = multi.resolve(s"p$part")
      e.offset(part * (n / 3)).limit(if (part < 2) n / 3 else n - 2 * (n / 3))
        .write.parquet(dir.toString)
      import scala.jdk.CollectionConverters._
      Files.list(dir).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).foreach { f =>
          Files.copy(f, src.resolve(s"part_$i.parquet")); i += 1
        }
    }
    val stream = spark.readStream.schema(StreamOps.EventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    // long watermark: nothing is late (files are not time-ordered), state
    // simply accumulates — the cross-batch buffering is what's under test
    val q = StreamOps.purchaseAttribution(stream, 30, "365 days")
      .writeStream.format("memory").queryName("ssjoin_out").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("ssjoin_out").collect().map(_.toString).sorted
    val expect = StreamOps.purchaseAttribution(batchEvents, 30, "365 days")
      .collect().map(_.toString).sorted
    assert(i >= 3 && expect.nonEmpty && got.sameElements(expect),
      s"stream ${got.length} pairs vs batch ${expect.length}")
  }

  test("pure-interval stream-stream join (bucketed equi-key): streaming == batch " +
    "across micro-batches") {
    // q98's streaming hop: an interval join with NO natural equality key,
    // sharded through the symmetric hash join via time-bucket keys; one
    // file per trigger so windows and their member events arrive in
    // different micro-batches and the buffered state must pair them
    val multi = Files.createTempDirectory("graft_iv_join")
    val e = batchEvents.orderBy("event_id")
    val n = e.count().toInt
    val src = multi.resolve("all")
    Files.createDirectory(src)
    var i = 0
    for (part <- Seq(0, 1, 2)) {
      val dir = multi.resolve(s"p$part")
      e.offset(part * (n / 3)).limit(if (part < 2) n / 3 else n - 2 * (n / 3))
        .write.parquet(dir.toString)
      import scala.jdk.CollectionConverters._
      Files.list(dir).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).foreach { f =>
          Files.copy(f, src.resolve(s"part_$i.parquet")); i += 1
        }
    }
    val stream = spark.readStream.schema(StreamOps.EventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    val q = StreamOps.incidentWindowJoin(stream, everyN = 50, watermark = "365 days")
      .writeStream.format("memory").queryName("ivjoin_out").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("ivjoin_out").collect().map(_.toString).sorted
    val expect = StreamOps.incidentWindowJoin(batchEvents, everyN = 50, watermark = "365 days")
      .collect().map(_.toString).sorted
    assert(i >= 3 && expect.nonEmpty && got.sameElements(expect),
      s"stream ${got.length} pairs vs batch ${expect.length}")
  }

  test("q119 left-outer interval join: streaming == batch on watermark-final events") {
    // the outer side of a stream-stream interval join can only emit its
    // NULL rows when the watermark proves no matching window can still
    // arrive (w_ts <= e_ts forces wm past e_ts). Files arrive sorted by
    // event time so nothing is late-dropped; watermark 0s makes every
    // event below the final max timestamp FINAL — on that subset the
    // streamed result must equal the batch left join row-for-row.
    val multi = Files.createTempDirectory("graft_left_iv")
    val e = batchEvents.orderBy("ts")
    val n = e.count().toInt
    val src = multi.resolve("all")
    Files.createDirectory(src)
    var i = 0
    for (part <- Seq(0, 1, 2)) {
      val dir = multi.resolve(s"p$part")
      e.offset(part * (n / 3)).limit(if (part < 2) n / 3 else n - 2 * (n / 3))
        .coalesce(1).write.parquet(dir.toString)
      import scala.jdk.CollectionConverters._
      Files.list(dir).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).foreach { f =>
          Files.copy(f, src.resolve(s"part_$i.parquet")); i += 1
        }
    }
    val stream = spark.readStream.schema(StreamOps.EventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    val q = StreamOps.eventWindowLeftJoin(stream, everyN = 50, watermark = "0 seconds")
      .writeStream.format("memory").queryName("left_iv_out").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    // the GLOBAL watermark is the min across both watermark operators,
    // and the window side's sits after the %everyN filter — so it trails
    // at the last WINDOW row's event time, not the last event's. NULL
    // rows are final only below that (minus a window length of slack for
    // the engine's conservative range bound).
    val wmUs = batchEvents.filter(pmod(col("event_id"), lit(50L)) === 0)
      .agg(max(expr("ts div 1000"))).collect()(0).getLong(0)
    val finalUs = wmUs - 30L * 60L * 1000000L - 1L
    def finalRows(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("e_us") < finalUs).collect().map(_.toString).sorted
    val got = finalRows(spark.table("left_iv_out"))
    val batchAll = StreamOps.eventWindowLeftJoin(batchEvents, everyN = 50,
      watermark = "0 seconds")
    val expect = finalRows(batchAll)
    assert(i >= 3 && expect.nonEmpty && got.sameElements(expect),
      s"stream ${got.length} rows vs batch ${expect.length}")
    // and the FULL streamed output is a subset of the batch left join —
    // nothing spurious, no duplicate emissions
    val all = spark.table("left_iv_out").collect().map(_.toString)
    val batchSet = batchAll.collect().map(_.toString).toSet
    assert(all.length == all.distinct.length && all.forall(batchSet),
      "streamed rows must be unique and drawn from the batch result")
    val nulls = spark.table("left_iv_out").filter(col("window_id").isNull).count()
    assert(nulls > 0, "uncovered events must surface as NULL rows once final")
  }

  test("q123 window-coverage left join: streaming == batch on watermark-final windows") {
    // roles-swapped dual of the q119 test: the probe side is the WINDOW.
    // A window's NULL verdict is final once no matching event can still
    // arrive — events up to w_ts + windowMin qualify, so finality needs
    // the watermark PAST the window end; both watermark operators see
    // event streams whose max is the full stream's last event, minus the
    // window length of conservative slack, minus the window again for
    // the qualification bound.
    val multi = Files.createTempDirectory("graft_wcov_iv")
    val e = batchEvents.orderBy("ts")
    val n = e.count().toInt
    val src = multi.resolve("all")
    Files.createDirectory(src)
    var i = 0
    for (part <- Seq(0, 1, 2)) {
      val dir = multi.resolve(s"p$part")
      e.offset(part * (n / 3)).limit(if (part < 2) n / 3 else n - 2 * (n / 3))
        .coalesce(1).write.parquet(dir.toString)
      import scala.jdk.CollectionConverters._
      Files.list(dir).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).foreach { f =>
          Files.copy(f, src.resolve(s"part_$i.parquet")); i += 1
        }
    }
    val stream = spark.readStream.schema(StreamOps.EventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    val q = StreamOps.windowCoverageLeftJoin(stream, everyN = 50, windowMin = 5,
        watermark = "0 seconds", excludeSelf = true)
      .writeStream.format("memory").queryName("wcov_out").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    // the global watermark is the MIN across both watermark operators,
    // and the window side's (post-%50-filter) trails at the last WINDOW
    // row's time — same semantics the q119 test pins. Margin: window
    // end (+win) + engine slack (+win) + bucket rounding (+win)
    val wmUs = batchEvents.filter(pmod(col("event_id"), lit(50L)) === 0)
      .agg(max(expr("ts div 1000"))).collect()(0).getLong(0)
    val finalUs = wmUs - 3L * 5L * 60L * 1000000L - 1L
    def finalRows(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("w_us") < finalUs).collect().map(_.toString).sorted
    val batchAll = StreamOps.windowCoverageLeftJoin(batchEvents, everyN = 50,
      windowMin = 5, watermark = "0 seconds", excludeSelf = true)
    val got = finalRows(spark.table("wcov_out"))
    val expect = finalRows(batchAll)
    assert(i >= 3 && expect.nonEmpty && got.sameElements(expect),
      s"stream ${got.length} rows vs batch ${expect.length}")
    val all = spark.table("wcov_out").collect().map(_.toString)
    val batchSet = batchAll.collect().map(_.toString).toSet
    assert(all.length == all.distinct.length && all.forall(batchSet),
      "streamed rows must be unique and drawn from the batch result")
    assert(spark.table("wcov_out").filter(col("ev_id").isNull).count() > 0,
      "empty windows must surface as NULL rows once final")
  }

  test("LEFT OUTER stream-stream join emits null-view rows after watermark expiry") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ns(min: Long): Long = min * 60L * 1000000000L
    val mem = MemoryStream[(Long, Long, Long, String, Double, String)]
    val events = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = StreamOps.purchaseAttribution(events, 30, "10 minutes", "left_outer")
      .writeStream.format("memory").queryName("outer_join_out").outputMode("append").start()
    try {
      // user 1: purchase WITH a view in the 30-min window; user 2: purchase alone
      mem.addData(
        (1L, ns(10), 1L, "view", 0.0, ""),
        (2L, ns(20), 1L, "purchase", 9.99, ""),
        (3L, ns(20), 2L, "purchase", 5.00, ""))
      q.processAllAvailable()
      val matchedOnly = spark.table("outer_join_out").collect()
      // the unmatched purchase CANNOT emit yet — its window might still fill
      assert(!matchedOnly.exists(r => r.isNullAt(2)),
        s"null-view row emitted before watermark expiry: ${matchedOnly.toSeq}")
      // sentinels far in the future on BOTH inputs: the join's watermark is
      // the min over both sides, so each side needs an advancing event
      mem.addData((98L, ns(10000), 3L, "view", 0.0, ""),
        (99L, ns(10000), 4L, "purchase", 1.0, ""))
      q.processAllAvailable()
      val rows = spark.table("outer_join_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
        .toSet
      assert(rows.contains((1L, 2L, 1L)), s"matched pair missing: $rows")
      assert(rows.contains((2L, 3L, -1L)),
        s"unmatched purchase did not emit its null-view row after expiry: $rows")
    } finally q.stop()
  }

  test("watermarked tumbling window DROPS a late event beyond the watermark " +
    "across real micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ns(min: Long): Long = min * 60L * 1000000000L // minutes → epoch ns
    val mem = MemoryStream[(Long, Long, String, Double)]
    val events = mem.toDF.toDF("event_id", "ts", "event_type", "value")
    val q = StreamOps.tumblingAggLate(events, "10 minutes", "10 minutes")
      .writeStream.format("memory").queryName("wm_out").outputMode("append").start()
    try {
      // batch 1: two events in window [0, 10)
      mem.addData((1L, ns(0), "view", 1.0), (2L, ns(5), "view", 2.0))
      q.processAllAvailable()
      // batch 2: event at t=40min → watermark advances to 30min, so window
      // [0,10) finalizes and emits
      mem.addData((3L, ns(40), "view", 3.0))
      q.processAllAvailable()
      // batch 3: a LATE event for [0,10) — event time 7min is behind the
      // 30min watermark → must be dropped, not re-aggregated
      mem.addData((4L, ns(7), "view", 100.0))
      q.processAllAvailable()
      // batch 4: advance the watermark past [40,50) to flush the rest
      mem.addData((5L, ns(80), "view", 4.0))
      q.processAllAvailable()
      val rows = spark.table("wm_out")
        .select(unix_micros(col("window_start")).as("ws_us"), col("event_type"),
          col("n"), col("sum_value"))
        .collect().map(r => (r.getLong(0) / 60000000L, r.getString(1), r.getLong(2),
          r.getDouble(3)))
      // window [0,10): exactly the two on-time events; the late 100.0 is gone
      assert(rows.count(_._1 == 0L) == 1, s"expected one finalized [0,10) row in $rows")
      assert(rows.contains((0L, "view", 2L, 3.0)),
        s"late event leaked into the finalized window: $rows")
      assert(!rows.exists(_._4 == 100.0), s"late event emitted somewhere: $rows")
      // the watermark-advancing event's window [40,50) flushed too
      assert(rows.contains((40L, "view", 1L, 3.0)), s"missing [40,50) in $rows")
    } finally q.stop()
  }

  test("q56 batch formulation == unwatermarked tumbling agg (watermark is a " +
    "batch no-op)") {
    val a = StreamOps.tumblingAggLate(batchEvents, "1 hour", "30 minutes")
      .collect().map(_.toString).sorted
    val b = StreamOps.tumblingAgg(batchEvents, "1 hour")
      .collect().map(_.toString).sorted
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("checkpointed restart: dedup state survives a full query stop/start " +
    "(file sink, no reprocessing)") {
    val base = Files.createTempDirectory("graft_ckpt")
    val src = base.resolve("src"); Files.createDirectory(src)
    val ckpt = base.resolve("ckpt").toString
    val sink = base.resolve("out").toString
    import spark.implicits._
    def writeEvents(name: String, rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .repartition(1).write.parquet(base.resolve(name).toString) match { case _ =>
          import scala.jdk.CollectionConverters._
          Files.list(base.resolve(name)).iterator().asScala
            .filter(_.toString.endsWith(".parquet"))
            .foreach(f => Files.copy(f, src.resolve(s"$name.parquet")))
        }
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(StreamOps.EventsSchema).parquet(src.toString)
      val q = StreamOps.dedupStream(stream, "365 days")
        .select("event_id", "user_id", "event_type")
        .writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    val ns = 1000000000L
    writeEvents("f1", Seq((1L, 10L * ns, 1L, "view", 0.0, ""), (2L, 20L * ns, 2L, "click", 0.0, "")))
    runOnce()
    // restart from the checkpoint: the duplicate (1,"view") must be dropped
    // by RESTORED state, and file f1 must not be reprocessed
    writeEvents("f2", Seq((3L, 30L * ns, 1L, "view", 0.0, ""), (4L, 40L * ns, 3L, "buy", 0.0, "")))
    runOnce()
    val out = spark.read.parquet(sink).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(out == Set((1L, 1L, "view"), (2L, 2L, "click"), (4L, 3L, "buy")),
      s"restart broke dedup state or reprocessed input: $out")
  }

  test("sliding windows produce width/slide copies per event") {
    val slid = StreamOps.slidingAgg(batchEvents, "1 hour", "30 minutes")
    val total = slid.agg(sum("n")).collect().head.getLong(0)
    assert(total == batchEvents.count() * 2) // each event in exactly 2 windows
  }

  test("stream-stream interval-OVERLAP join (two-sided, canonical bucket): streaming == batch") {
    // the q102 geometry through the symmetric hash join: maintenance and
    // incident windows from the same source stream, matched on overlap,
    // duplicate-free via the canonical-bucket condition
    val stream = StreamOps.runToMemory(spark, srcDir, "ovjoin_out",
      df => StreamOps.overlapWindowJoin(df, aEveryN = 40, bEveryN = 60,
        watermark = "365 days"), "append")
      .collect().map(_.toString).sorted
    val batch = StreamOps.overlapWindowJoin(batchEvents, aEveryN = 40, bEveryN = 60,
        watermark = "365 days")
      .collect().map(_.toString).sorted
    assert(batch.nonEmpty && stream.sameElements(batch),
      s"stream ${stream.length} pairs vs batch ${batch.length}")
    // duplicate-freedom: (a_id, b_id) pairs are unique
    assert(batch.toSeq.distinct.size == batch.length)
  }

  test("incremental MinHash admission as a foreachBatch loop over crawl drops == one-shot batch") {
    import graft.ext.{Dedup, TextAnalysis}
    // corpus index: docs 0-149's signatures; drops: fresh docs 150-199,
    // then doctored near-copies of those fresh docs (ids +100000) — the
    // copies arrive in a LATER micro-batch, so their drops must resolve
    // against index entries accumulated from the EARLIER batch. Streaming
    // admission is ARRIVAL-order (whatever is already in the index wins);
    // it equals the one-shot greedy-by-id batch result exactly when drops
    // arrive in id order, which the fixture pins via file mtimes (the
    // file source processes oldest-first).
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(size(TextAnalysis.tokens(col("text"))) >= 8)
      .select(col("doc_id"), col("text"))
    def sigsOf(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("hashes", Dedup.shingleHashes(col("text"), 3))
      .select(col("doc_id"), Dedup.minhashFromHashes(col("hashes"), 64).as("sig"))
    val corpus = docs.filter(col("doc_id") < 150)
    val fresh = docs.filter(col("doc_id") >= 150 && col("doc_id") < 200)
    val toks = TextAnalysis.tokens(col("text"))
    val copies = fresh.select((col("doc_id") + 100000L).as("doc_id"),
      concat_ws(" ", slice(toks, lit(1), greatest(size(toks) - 5, lit(3)))).as("text"))
    val drops = Files.createTempDirectory("graft_admit")
    val src = drops.resolve("in"); Files.createDirectory(src)
    fresh.coalesce(1).write.parquet(drops.resolve("a").toString)
    copies.coalesce(1).write.parquet(drops.resolve("b").toString)
    import scala.jdk.CollectionConverters._
    val now = System.currentTimeMillis()
    for ((d, i) <- Seq("a", "b").zipWithIndex;
         f <- Files.list(drops.resolve(d)).iterator().asScala
           .filter(_.toString.endsWith(".parquet"))) {
      val dst = src.resolve(f"drop_$i%02d.parquet")
      Files.copy(f, dst)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(now - 600000L + i * 60000L))
    }
    val schema = docs.schema
    // accumulated index rows (id, sig) — in production a parquet index
    // table appended per drop; here a driver-held buffer
    var index = sigsOf(corpus).collect().toSeq
    val decisions = scala.collection.mutable.ArrayBuffer[(Long, Boolean, Any)]()
    val sigSchema = sigsOf(corpus).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val idxDf = spark.createDataFrame(
          spark.sparkContext.parallelize(index), sigSchema)
        val sigs = sigsOf(batch)
        decisions ++= Dedup.incrementalMinhash(idxDf, sigs, "doc_id", 16, 0.4)
          .collect().map(r => (r.getLong(0), r.getBoolean(1), r.get(2)))
        index = index ++ sigs.collect()
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val oneShot = Dedup.incrementalMinhash(
        sigsOf(corpus), sigsOf(fresh.unionByName(copies)), "doc_id", 16, 0.4)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.get(2))).toSet
    assert(decisions.nonEmpty && decisions.toSet == oneShot,
      s"streamed admission diverged: ${decisions.size} vs ${oneShot.size}")
    // the later batch's copies actually dropped against the EARLIER batch
    val copyDrops = decisions.filter(d => d._1 >= 100000L && !d._2)
    assert(copyDrops.nonEmpty, "no cross-batch near-dup was dropped")
  }

  test("visibility loop: two streamed GSC drops == one batch merge; replay is idempotent") {
    import graft.streaming.VisibilityLoop
    val demo = "/root/reference/data_demo"
    val root = Files.createTempDirectory("graft_vloop")
    val dropDir = Files.createDirectory(root.resolve("drops"))
    val stateDir = root.resolve("state").toString
    // split the reference's own demo GSC export into two drops
    val lines = Files.readAllLines(Paths.get(s"$demo/gsc_export.csv"))
    val header = lines.get(0)
    val body = (1 until lines.size).map(lines.get)
    val (half1, half2) = body.splitAt(body.size / 2)
    def drop(name: String, rows: Seq[String]): Unit =
      Files.write(dropDir.resolve(name), (header +: rows).mkString("\n").getBytes)
    val cfg = Pipeline.PipelineConfig(
      frogPath = s"$demo/screaming_frog_export.csv",
      gscPath = s"$demo/gsc_export.csv", // batch-comparison path; the loop ignores it
      ga4Path = s"$demo/ga4_export.csv")
    drop("drop1.csv", half1)
    val q = VisibilityLoop.start(spark, cfg, dropDir.toString, stateDir,
      headers = header.split(","))
    try {
      q.processAllAvailable()
      drop("drop2.csv", half2)
      q.processAllAvailable()
    } finally q.stop()
    def snapshot(): Seq[Seq[Any]] = spark.read.parquet(s"$stateDir/merged")
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString(""))
    val streamed = snapshot()
    val batch = Pipeline.merged(spark, cfg)
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString(""))
    assert(streamed.nonEmpty && streamed == batch,
      "accumulated streamed drops must reproduce the batch merge exactly")
    // failure re-delivery: replay batch 0 (same rows, same id) — the
    // landing overwrites the same path and the re-merge must be a no-op
    val replay = spark.read.option("header", "true")
      .schema(VisibilityLoop.dropSchema(header.split(",").toSeq))
      .csv(dropDir.resolve("drop1.csv").toString)
    VisibilityLoop.processBatch(spark, cfg, stateDir)(replay, 0L)
    assert(snapshot() == batch, "replaying a delivered batch must not change the snapshot")
  }

  test("native stateful LSH admission: 3 micro-batches == one-shot batch; " +
      "state bounded by index size") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (corpusSigs, deltaSigs) = graft.queries.ExtensionQueries7
      .q99Fixture(spark, "/root/testdata/sf0.001")
    // event time 1 s per id; three drops in id order (the q99 admission
    // contract: streaming arrival order == batch greedy id order)
    val delta = deltaSigs.withColumn("us", col("doc_id") * 1000000L)
      .select(col("doc_id"), col("us"), col("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toArray))
      .sortBy(_._1)
    val nCorpus = corpusSigs.count()
    val batches = Seq(delta.take(delta.length / 3),
      delta.slice(delta.length / 3, 2 * delta.length / 3),
      delta.drop(2 * delta.length / 3))
    // sentinel: far-future event time to expire every real verdict
    // window; its id is the largest, so it can never be anyone's partner
    val sentinel = (9000000000L, 9000000000L * 1000000L,
      Array.tabulate(64)(i => 7919L * (i + 1)))
    val mem = MemoryStream[(Long, Long, Array[Long])]
    val stream = mem.toDF.toDF("doc_id", "us", "sig")
    val q = graft.streaming.LshAdmit
      .admitStream(stream, corpusSigs, bands = 16, minEstJ = 0.4)
      .writeStream.format("memory").queryName("lsh_admit_out")
      .outputMode("append").start()
    var maxStateRows = 0L
    try {
      for (b <- batches) { mem.addData(b.toSeq); q.processAllAvailable() }
      mem.addData(sentinel); q.processAllAvailable()
      maxStateRows = q.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .filter(_.operatorName.contains("flatMapGroupsWithState"))
        .map(_.numRowsTotal).max
    } finally q.stop()
    val streamed = spark.table("lsh_admit_out")
      .filter(col("doc_id") < 9000000000L)
      .select(col("window_start"), col("doc_id"), col("keep"), col("dup_of"))
      .collect().map(_.toSeq).toSet
    val oneShot = graft.streaming.LshAdmit
      .admitStream(delta.toSeq.toDF("doc_id", "us", "sig"), corpusSigs,
        bands = 16, minEstJ = 0.4)
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty && streamed == oneShot,
      "micro-batch admission must equal the one-shot batch run exactly")
    // keyed state = occupied LSH buckets: bounded by bands × index size
    // (corpus + processed deltas + sentinel), never the raw event count
    assert(maxStateRows > 0 && maxStateRows <= 16L * (nCorpus + delta.length + 1),
      s"state rows $maxStateRows exceed the banded index bound")
  }

  test("q143 streaming DAU: chained dedup→window agg across micro-batches; " +
    "re-deliveries counted once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val DayNs = 86400000000000L
    val mem = MemoryStream[(Long, Long, Long, String, Double)]
    val events = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamOps.dailyActiveUsers(events, "1 hour")
      .writeStream.format("memory").queryName("dau_out").outputMode("append").start()
    try {
      // day 0: users 1 and 2; user 1 twice (same day → counts once)
      mem.addData((1L, 1000L, 1L, "view", 0.0), (2L, 2000L, 2L, "view", 0.0))
      q.processAllAvailable()
      mem.addData((3L, 3000L, 1L, "click", 0.0)) // re-activity, same user+day
      q.processAllAvailable()
      // day 2 event advances the watermark past day 0 → day 0 finalizes
      mem.addData((4L, 2 * DayNs + 1000L, 3L, "view", 0.0))
      q.processAllAvailable()
      // a LATE duplicate for day 0 (behind the watermark) must not re-emit
      mem.addData((5L, 4000L, 9L, "view", 0.0))
      q.processAllAvailable()
      // flush day 2 by advancing further
      mem.addData((6L, 4 * DayNs, 3L, "view", 0.0))
      q.processAllAvailable()
      val rows = spark.table("dau_out")
        .select(unix_micros(col("window_start")).as("us"), col("n_dau"))
        .collect().map(r => r.getLong(0) / 86400000000L -> r.getLong(1)).toMap
      assert(rows(0L) == 2L, s"day 0 must count users {1,2} once each: $rows")
      assert(rows(2L) == 1L, s"day 2 must count user 3: $rows")
    } finally q.stop()
    // batch formulation == plain distinct count (watermark no-op in batch)
    val a = StreamOps.dailyActiveUsers(batchEvents, "1 hour")
      .collect().map(_.toString).sorted.toSeq
    val b = batchEvents.withColumn("event_ts", StreamOps.tsCol)
      .select(col("user_id"), date_trunc("day", col("event_ts")).as("window_start"))
      .distinct()
      .groupBy(col("window_start")).agg(count(lit(1)).as("n_dau"))
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
