package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.{StateV2, StreamOps}

/** Certification of the transformWithState (StatefulProcessor v2) tier:
  * each v2 operator must equal its v1 (flatMapGroupsWithState) twin and
  * the batch formulation — and the v1 twins are themselves pinned to the
  * DuckDB-oracled batch queries (q46/q158/q171 rows) in StreamingSpec,
  * so these parities chain the v2 runtime into the same oracle gate.
  * Streaming v2 runs require the RocksDB state store (OSS constraint);
  * [[StateV2.withRocksDb]] scopes the provider per test.
  */
class StateV2Spec extends SparkSpecBase {

  private lazy val srcDir: String = {
    val dir = Files.createTempDirectory("graft_statev2_src")
    graft.core.Tables.events(spark, "/root/testdata/sf0.001")
      .coalesce(1).write.mode("overwrite").parquet(dir.toString)
    dir.toString
  }
  private lazy val batchEvents = spark.read.parquet(srcDir)

  /** Time-ordered 3-file copy of the events (the StreamingSpec
    * multi-batch idiom): with maxFilesPerTrigger=1 each file is a real
    * micro-batch, so keyed state must survive two batch boundaries.
    */
  private lazy val threeFileSrc: String = {
    val multi = Files.createTempDirectory("graft_statev2_multi")
    val e = batchEvents.orderBy("event_id")
    val n = e.count()
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
    src.toString
  }

  private def runMulti(name: String, transform: org.apache.spark.sql.DataFrame =>
      org.apache.spark.sql.DataFrame): Array[String] =
    StateV2.withRocksDb(spark) {
      val stream = spark.readStream.schema(StreamOps.EventsSchema)
        .option("maxFilesPerTrigger", "1").parquet(threeFileSrc)
      val q = transform(stream).writeStream
        .format("memory").queryName(name).outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      spark.table(name).collect().map(_.toString).sorted
    }

  test("v2 spend milestones BATCH == v1 batch (TransformWithStateExec batch path)") {
    val v1 = StreamOps.spendMilestones(batchEvents, 50000L)
      .collect().map(_.toString).sorted
    val v2 = StateV2.spendMilestonesV2(batchEvents, 50000L)
      .collect().map(_.toString).sorted
    assert(v1.nonEmpty && v1.sameElements(v2), s"v1=${v1.length} v2=${v2.length}")
  }

  test("v2 spend milestones: ValueState carries across micro-batches == batch") {
    val got = runMulti("milestones_v2_out",
      df => StateV2.spendMilestonesV2(df, 50000L).toDF())
    // .toDF() on the reference: the memory sink yields Rows, whose
    // toString differs from the case class's
    val single = StreamOps.spendMilestones(batchEvents, 50000L).toDF()
      .collect().map(_.toString).sorted
    assert(single.nonEmpty && got.sameElements(single),
      s"multi-batch=${got.length} single=${single.length}")
  }

  test("v2 rolling z-score: ListState ring carries across micro-batches == v1 batch") {
    val got = runMulti("zscore_v2_out",
      df => StateV2.rollingZscoreAlertsV2(df).toDF())
    val single = StreamOps.rollingZscoreAlerts(batchEvents).toDF()
      .collect().map(_.toString).sorted
    assert(single.nonEmpty && got.sameElements(single),
      s"multi-batch=${got.length} single=${single.length}")
  }

  test("v2 conversion funnel: streaming (event-time timers) == v1 == batch") {
    val got = runMulti("funnel_v2_out",
      df => StateV2.conversionFunnelV2(df).toDF())
    val v1Batch = StreamOps.conversionFunnel(batchEvents).toDF()
      .collect().map(_.toString).sorted
    val v2Batch = StateV2.conversionFunnelV2(batchEvents).toDF()
      .collect().map(_.toString).sorted
    assert(v1Batch.nonEmpty && got.sameElements(v1Batch),
      s"stream=${got.length} v1batch=${v1Batch.length}")
    assert(v2Batch.sameElements(v1Batch),
      s"v2batch=${v2Batch.length} v1batch=${v1Batch.length}")
  }

  test("v2 MapState+TTL running type counts: 3 single-batch runs over one checkpoint == batch count") {
    // ProcessingTime mode (which TTL requires) keeps a live query busy
    // FOREVER — TTL work is always potentially pending, so neither
    // processAllAvailable nor an AvailableNow drain ever terminates.
    // Drive it as three sequential Trigger.Once runs sharing one
    // checkpoint instead: each run is exactly one micro-batch, and the
    // MapState (TTL column families included) must RELOAD from the
    // checkpoint between runs — multi-batch carry and restart in one.
    import spark.implicits._
    val base = Files.createTempDirectory("graft_mapstate_ttl")
    val (src, out, ckpt) = (base.resolve("src"), base.resolve("out"),
      base.resolve("ckpt"))
    Files.createDirectory(src)
    var ttlVars = -1L
    StateV2.withRocksDb(spark) {
      import scala.jdk.CollectionConverters._
      val chunks = Files.list(java.nio.file.Paths.get(threeFileSrc))
        .iterator().asScala.toSeq.sortBy(_.getFileName.toString)
      assert(chunks.size == 3)
      for ((chunk, i) <- chunks.zipWithIndex) {
        Files.copy(chunk, src.resolve(chunk.getFileName.toString))
        val stream = spark.readStream.schema(StreamOps.EventsSchema)
          .parquet(src.toString)
        val q = StateV2.runningTypeCountsV2(stream).toDF().writeStream
          .format("parquet").option("path", out.toString)
          .option("checkpointLocation", ckpt.toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.Once())
          .outputMode("append").start()
        try assert(q.awaitTermination(180000L), s"run $i timed out")
        finally {
          if (i == 2) ttlVars = q.recentProgress
            .flatMap(p => Option(p.stateOperators).toSeq.flatten)
            .filter(_.operatorName.toLowerCase.contains("transformwithstate"))
            .flatMap(o => Option(o.customMetrics.get("numMapStateWithTTLVars"))
              .map(_.longValue)).max
          q.stop()
        }
      }
    }
    val got = spark.read.parquet(out.toString)
      .groupBy(col("user_id"), col("event_type"))
      .agg(max(col("n")).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = batchEvents.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(batch.nonEmpty && got == batch,
      s"streaming=${got.size} batch=${batch.size}")
    // the metric sums over state-store partitions: 1 TTL MapState var
    // per store instance
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toLong
    assert(ttlVars == parts,
      s"expected 1 TTL-backed MapState var x $parts store partitions, got $ttlVars")
  }

  test("v2 LSH admission: handleInitialState corpus bootstrap + ListState buckets == v1 batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (corpusSigs, deltaSigs) = graft.queries.ExtensionQueries7
      .q99Fixture(spark, "/root/testdata/sf0.001")
    val delta = deltaSigs.withColumn("us", col("doc_id") * 1000000L)
      .select(col("doc_id"), col("us"), col("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toArray))
      .sortBy(_._1)
    val nCorpus = corpusSigs.count()
    val batches = Seq(delta.take(delta.length / 3),
      delta.slice(delta.length / 3, 2 * delta.length / 3),
      delta.drop(2 * delta.length / 3))
    val sentinel = (9000000000L, 9000000000L * 1000000L,
      Array.tabulate(64)(i => 7919L * (i + 1)))
    StateV2.withRocksDb(spark) {
      val mem = MemoryStream[(Long, Long, Array[Long])]
      val stream = mem.toDF.toDF("doc_id", "us", "sig")
      val q = StateV2.admitStreamV2(stream, corpusSigs, bands = 16, minEstJ = 0.4)
        .writeStream.format("memory").queryName("lsh_admit_v2_out")
        .outputMode("append").start()
      var maxStateRows = 0L
      try {
        for (b <- batches) { mem.addData(b.toSeq); q.processAllAvailable() }
        mem.addData(sentinel); q.processAllAvailable()
        maxStateRows = q.recentProgress
          .flatMap(p => Option(p.stateOperators).toSeq.flatten)
          .filter(_.operatorName.toLowerCase.contains("transformwithstate"))
          .map(_.numRowsTotal).max
      } finally q.stop()
      val streamed = spark.table("lsh_admit_v2_out")
        .filter(col("doc_id") < 9000000000L)
        .select(col("window_start"), col("doc_id"), col("keep"), col("dup_of"))
        .collect().map(_.toSeq).toSet
      // v1 one-shot batch reference — itself pinned to
      // Dedup.incrementalMinhash and the q115 oracle in StreamingSpec
      val oneShot = graft.streaming.LshAdmit
        .admitStream(delta.toSeq.toDF("doc_id", "us", "sig"), corpusSigs,
          bands = 16, minEstJ = 0.4)
        .collect().map(_.toSeq).toSet
      assert(streamed.nonEmpty && streamed == oneShot,
        "v2 micro-batch admission must equal the v1 one-shot batch run exactly")
      assert(maxStateRows > 0 && maxStateRows <= 16L * (nCorpus + delta.length + 1),
        s"state rows $maxStateRows exceed the banded index bound")
    }
  }

  test("v2 funnel timers: expiry DROPS never-converted state; conversion deletes its timer") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    StateV2.withRocksDb(spark) {
      val mem = MemoryStream[(Long, String, Long)]
      // ts is the canonical long nanos; windowUs = 7 days, watermark 365 d
      val events = mem.toDF.toDF("user_id", "event_type", "ts")
      val day = 86400000000L // µs
      // base far from epoch: the initial watermark is 0, and stateful
      // operators DROP rows at-or-before it (numRowsDroppedByWatermark)
      val t0 = 1000L * day
      def ns(us: Long): Long = us * 1000L
      val q = StateV2.conversionFunnelV2(events).toDF()
        .writeStream.format("memory").queryName("funnel_timer_out")
        .outputMode("append").start()
      def ops = q.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .filter(_.operatorName.toLowerCase.contains("transformwithstate"))
      // state rows from the newest entry; timer metrics are PER-BATCH
      // counters (0 in the trailing no-data batches processAllAvailable
      // can append), so accumulate them across the run
      def stateRows = ops.lastOption.fold(-1L)(_.numRowsTotal)
      def cum(metric: String): Long =
        ops.map(o => Option(o.customMetrics.get(metric)).fold(0L)(_.longValue)).sum
      try {
        // batch 1: two signups → two armed timers at t0 + 7 d
        mem.addData((1L, "signup", ns(t0)), (2L, "signup", ns(t0)))
        q.processAllAvailable()
        assert(stateRows == 2L && cum("numRegisteredTimers") == 2L,
          s"expected 2 state rows + 2 armed timers, got rows=$stateRows " +
            s"registered=${cum("numRegisteredTimers")}")
        // batch 2: user 2 converts within the 7-day window — emits and
        // DELETES its own timer eagerly; user 1 idles
        mem.addData((2L, "purchase", ns(t0 + day)))
        q.processAllAvailable()
        assert(stateRows == 2L && cum("numDeletedTimers") == 1L,
          s"expected 2 state rows + 1 deleted timer, got rows=$stateRows " +
            s"deleted=${cum("numDeletedTimers")}")
        // batch 3: event-time jumps 373 d out → watermark (365 d lag)
        // lands at t0 + 8 d, PAST user 1's t0+7d timer. The data batch
        // adds user 3's state (briefly 3 rows), then processAllAvailable
        // runs the automatic watermark-advance batch where the expired
        // timer fires and handleExpiredTimer DROPS user 1's state —
        // users 2 and 3 remain
        mem.addData((3L, "other", ns(t0 + 373L * day)))
        q.processAllAvailable()
        assert(stateRows == 2L && cum("numExpiredTimers") == 1L,
          s"expected user 1's state dropped by its expired timer, got " +
            s"rows=$stateRows expired=${cum("numExpiredTimers")}")
      } finally q.stop()
      val out = spark.table("funnel_timer_out")
        .select(col("user_id")).collect().map(_.getLong(0)).toSeq
      assert(out == Seq(2L), s"only user 2 converts, got $out")
    }
  }
}
