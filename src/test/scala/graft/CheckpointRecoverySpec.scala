package graft

import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.streaming.StreamOps

/** Streaming checkpoint-recovery certification (round-9 verdict task #4).
  *
  * The streaming tier's batch-equivalences are proven across live
  * micro-batches elsewhere (StreamingSpec); this spec proves them across
  * a RESTART — the exactly-once property a long-running deployment
  * actually relies on. Each test runs the same file-per-trigger sequence
  * twice against a fault-tolerant parquet sink:
  *
  *   - uninterrupted: all chunk files staged up front, one query run;
  *   - interrupted: the query is stopped COLD mid-stream (no drain — an
  *     in-flight batch may abort, leaving uncommitted sink files and an
  *     unadvanced commit log), more chunk files arrive, and a NEW query
  *     restarts from the same checkpoint.
  *
  * File-source offsets, state-store recovery (dedup sets, window aggs,
  * LSH bucket members), and the sink's transaction log must make the two
  * output directories read identically: no lost windows, no duplicated
  * emissions, keyed state carried through the restart. Batch plans are
  * deterministic either way because offsets are PLANNED before execution
  * — an aborted batch replays with exactly the same file set.
  */
class CheckpointRecoverySpec extends SparkSpecBase {

  private def rmTree(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      val paths = try walk.iterator().asScala.toSeq.reverse finally walk.close()
      paths.foreach(f => Files.deleteIfExists(f))
    }
  }

  /** Strictly increasing mod-times so the file source triggers chunks in
    * the order they were staged (it lists oldest-first).
    */
  private var tick = 1700000000000L

  private def dropChunk(df: DataFrame, dst: Path, name: String): Unit = {
    import scala.jdk.CollectionConverters._
    val tmp = Files.createTempDirectory("graft_ckpt_chunk")
    try {
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).iterator().asScala
        .find(_.toString.endsWith(".parquet"))
        .getOrElse(fail(s"no parquet part written for chunk $name"))
      Files.move(part, dst.resolve(name))
      tick += 60000
      Files.setLastModifiedTime(dst.resolve(name), FileTime.fromMillis(tick))
    } finally rmTree(tmp)
  }

  /** Stop the query the hard way: wait only until at least `afterBatches`
    * batches have committed, then stop with whatever is in flight —
    * deliberately NOT processAllAvailable-then-stop.
    */
  private def stopCold(q: StreamingQuery, afterBatches: Long): Unit = {
    val deadline = System.nanoTime() + 120L * 1000000000L
    while (Option(q.lastProgress).map(_.batchId).getOrElse(-1L) < afterBatches
        && q.isActive && System.nanoTime() < deadline) Thread.sleep(50)
    q.stop()
    q.awaitTermination(30000)
  }

  private def ordered(out: Path): Seq[String] =
    spark.read.parquet(out.toString).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  /** Four event chunks in event-id order (the testdata pins event_id as
    * event-time-ordered), shared by both tests.
    */
  private lazy val eventChunks: Seq[DataFrame] = {
    val e = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
      .orderBy("event_id").localCheckpoint(true)
    val n = e.count()
    assert(n >= 4, s"events table too small to split (n=$n)")
    (0 until 4).map { i =>
      val off = (i * n / 4).toInt
      val lim = if (i == 3) (n - off).toInt else (n / 4).toInt
      e.orderBy("event_id").offset(off).limit(lim)
    }
  }

  private def runDau(src: Path, out: Path, ckpt: Path,
      drain: Boolean, coldAfter: Long = 0L): Unit = {
    val stream = spark.readStream.schema(StreamOps.EventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    val q = StreamOps.dailyActiveUsers(stream, "1 hour").writeStream
      .format("parquet").option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()
    if (drain) { try q.processAllAvailable() finally q.stop() }
    else stopCold(q, coldAfter)
  }

  test("q143 chained dedup→DAU: cold stop + restart from checkpoint == uninterrupted run") {
    val base = Files.createTempDirectory("graft_ckpt_dau")
    try {
      val (srcA, outA, ckptA) = (base.resolve("srcA"), base.resolve("outA"),
        base.resolve("ckptA"))
      val (srcB, outB, ckptB) = (base.resolve("srcB"), base.resolve("outB"),
        base.resolve("ckptB"))
      Files.createDirectory(srcA); Files.createDirectory(srcB)

      // uninterrupted reference: all 4 chunks visible from the start
      eventChunks.zipWithIndex.foreach { case (c, i) =>
        dropChunk(c, srcA, s"chunk_$i.parquet") }
      runDau(srcA, outA, ckptA, drain = true)

      // interrupted: 2 chunks land, the query is stopped cold after the
      // first commit (chunk 2's batch may be mid-flight), 2 more chunks
      // land, a NEW query recovers from the checkpoint
      eventChunks.take(2).zipWithIndex.foreach { case (c, i) =>
        dropChunk(c, srcB, s"chunk_$i.parquet") }
      runDau(srcB, outB, ckptB, drain = false, coldAfter = 1L)
      eventChunks.drop(2).zipWithIndex.foreach { case (c, i) =>
        dropChunk(c, srcB, s"chunk_${i + 2}.parquet") }
      runDau(srcB, outB, ckptB, drain = true)

      val (a, b) = (ordered(outA), ordered(outB))
      assert(a.nonEmpty, "uninterrupted run emitted nothing — watermark never advanced")
      assert(b == a,
        s"recovered run diverged: uninterrupted=${a.size} rows, recovered=${b.size}")
    } finally rmTree(base)
  }

  test("q143 DAU recovery holds on the RocksDB state store (the at-scale backend)") {
    // the default HDFSBackedStateStoreProvider keeps state on the heap;
    // a 1000-executor deployment runs RocksDB — re-certify the
    // cold-stop/restart path on the production backend (also exercises
    // RocksDB's own checkpoint/changelog recovery format)
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val base = Files.createTempDirectory("graft_ckpt_rocks")
    try {
      val (srcA, outA, ckptA) = (base.resolve("srcA"), base.resolve("outA"),
        base.resolve("ckptA"))
      val (srcB, outB, ckptB) = (base.resolve("srcB"), base.resolve("outB"),
        base.resolve("ckptB"))
      Files.createDirectory(srcA); Files.createDirectory(srcB)
      eventChunks.zipWithIndex.foreach { case (c, i) =>
        dropChunk(c, srcA, s"chunk_$i.parquet") }
      runDau(srcA, outA, ckptA, drain = true)
      eventChunks.take(2).zipWithIndex.foreach { case (c, i) =>
        dropChunk(c, srcB, s"chunk_$i.parquet") }
      runDau(srcB, outB, ckptB, drain = false, coldAfter = 1L)
      eventChunks.drop(2).zipWithIndex.foreach { case (c, i) =>
        dropChunk(c, srcB, s"chunk_${i + 2}.parquet") }
      runDau(srcB, outB, ckptB, drain = true)
      val (a, b) = (ordered(outA), ordered(outB))
      assert(a.nonEmpty && b == a,
        s"RocksDB recovery diverged: uninterrupted=${a.size}, recovered=${b.size}")
    } finally {
      rmTree(base)
      saved match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("q171 conversion funnel: EVENT-TIME TIMEOUT timers survive a cold restart") {
    // distinct recovery path from the DAU/LSH tests: the funnel's keyed
    // state arms event-time timeouts (signup + window), and those TIMERS
    // live in the state store too — a restart must restore both the
    // per-user state and its pending expirations, or non-converters
    // would linger (leak) or expire twice
    val base = Files.createTempDirectory("graft_ckpt_funnel")
    try {
      def run(src: Path, out: Path, ckpt: Path, drain: Boolean,
          coldAfter: Long = 0L): Unit = {
        val stream = graft.core.Tables.toLongNanos(
          spark.readStream.schema(StreamOps.EventsSchema)
            .option("maxFilesPerTrigger", "1").parquet(src.toString))
        // 1-hour window: tight enough that sf0.001's event span expires
        // plenty of signup timers mid-stream, in both runs
        val q = StreamOps.conversionFunnel(stream, windowUs = 3600000000L)
          .toDF().writeStream
          .format("parquet").option("path", out.toString)
          .option("checkpointLocation", ckpt.toString)
          .outputMode("append").start()
        if (drain) { try q.processAllAvailable() finally q.stop() }
        else stopCold(q, coldAfter)
      }
      val (srcA, outA, ckptA) = (base.resolve("srcA"), base.resolve("outA"),
        base.resolve("ckptA"))
      val (srcB, outB, ckptB) = (base.resolve("srcB"), base.resolve("outB"),
        base.resolve("ckptB"))
      Files.createDirectory(srcA); Files.createDirectory(srcB)

      eventChunks.zipWithIndex.foreach { case (c, i) =>
        dropChunk(c, srcA, s"chunk_$i.parquet") }
      run(srcA, outA, ckptA, drain = true)

      eventChunks.take(2).zipWithIndex.foreach { case (c, i) =>
        dropChunk(c, srcB, s"chunk_$i.parquet") }
      run(srcB, outB, ckptB, drain = false, coldAfter = 1L)
      eventChunks.drop(2).zipWithIndex.foreach { case (c, i) =>
        dropChunk(c, srcB, s"chunk_${i + 2}.parquet") }
      run(srcB, outB, ckptB, drain = true)

      val (a, b) = (ordered(outA), ordered(outB))
      assert(a.nonEmpty, "uninterrupted funnel emitted no conversions")
      assert(b == a,
        s"recovered funnel diverged: uninterrupted=${a.size}, recovered=${b.size}")
    } finally rmTree(base)
  }

  test("transformWithState v2: ValueState and v2 TIMERS survive a cold restart") {
    // the v2 runtime's recovery surface is different from v1's: named
    // state variables live in per-variable RocksDB column families and
    // timers in their own CF (not packed into one state blob), so a
    // restart must restore EACH family plus the operator metadata that
    // maps names → families. Certify both the plain-ValueState pipeline
    // (milestones) and the timer-arming one (funnel) across a cold stop.
    graft.streaming.StateV2.withRocksDb(spark) {
      for ((tag, transform) <- Seq[(String, DataFrame => DataFrame)](
          "milestones" -> (df => graft.streaming.StateV2
            .spendMilestonesV2(df, 50000L).toDF()),
          "funnel" -> (df => graft.streaming.StateV2
            .conversionFunnelV2(graft.core.Tables.toLongNanos(df),
              windowUs = 3600000000L).toDF()))) {
        val base = Files.createTempDirectory(s"graft_ckpt_v2_$tag")
        try {
          def run(src: Path, out: Path, ckpt: Path, drain: Boolean,
              coldAfter: Long = 0L): Unit = {
            val stream = spark.readStream.schema(StreamOps.EventsSchema)
              .option("maxFilesPerTrigger", "1").parquet(src.toString)
            val q = transform(stream).writeStream
              .format("parquet").option("path", out.toString)
              .option("checkpointLocation", ckpt.toString)
              .outputMode("append").start()
            if (drain) { try q.processAllAvailable() finally q.stop() }
            else stopCold(q, coldAfter)
          }
          val (srcA, outA, ckptA) = (base.resolve("srcA"), base.resolve("outA"),
            base.resolve("ckptA"))
          val (srcB, outB, ckptB) = (base.resolve("srcB"), base.resolve("outB"),
            base.resolve("ckptB"))
          Files.createDirectory(srcA); Files.createDirectory(srcB)

          eventChunks.zipWithIndex.foreach { case (c, i) =>
            dropChunk(c, srcA, s"chunk_$i.parquet") }
          run(srcA, outA, ckptA, drain = true)

          eventChunks.take(2).zipWithIndex.foreach { case (c, i) =>
            dropChunk(c, srcB, s"chunk_$i.parquet") }
          run(srcB, outB, ckptB, drain = false, coldAfter = 1L)
          eventChunks.drop(2).zipWithIndex.foreach { case (c, i) =>
            dropChunk(c, srcB, s"chunk_${i + 2}.parquet") }
          run(srcB, outB, ckptB, drain = true)

          val (a, b) = (ordered(outA), ordered(outB))
          assert(a.nonEmpty, s"uninterrupted v2 $tag run emitted nothing")
          assert(b == a,
            s"recovered v2 $tag diverged: uninterrupted=${a.size}, recovered=${b.size}")
        } finally rmTree(base)
      }
    }
  }

  test("q115 LSH admission: bucket state survives a cold restart; verdicts identical") {
    import org.apache.spark.sql.types._
    val base = Files.createTempDirectory("graft_ckpt_lsh")
    try {
      val (corpusSigs, deltaSigs) = graft.queries.ExtensionQueries7
        .q99Fixture(spark, "/root/testdata/sf0.001")
      val delta = deltaSigs.withColumn("us", col("doc_id") * 1000000L)
        .select(col("doc_id"), col("us"), col("sig"))
        .orderBy("doc_id").localCheckpoint(true)
      val n = delta.count()
      assert(n >= 3, s"delta fixture too small (n=$n)")
      // sentinel: far-future event time expires every real verdict
      // window; largest id, so never anyone's partner (StreamingSpec's
      // contract)
      import spark.implicits._
      val sentinel = Seq((9000000000L, 9000000000L * 1000000L,
        Array.tabulate(64)(i => 7919L * (i + 1)))).toDF("doc_id", "us", "sig")
      val chunks = (0 until 3).map { i =>
        val off = (i * n / 3).toInt
        val lim = if (i == 2) (n - off).toInt else (n / 3).toInt
        delta.orderBy("doc_id").offset(off).limit(lim)
      } :+ sentinel
      val schema = StructType(Seq(StructField("doc_id", LongType),
        StructField("us", LongType),
        StructField("sig", ArrayType(LongType))))

      def run(src: Path, out: Path, ckpt: Path, drain: Boolean,
          coldAfter: Long = 0L): Unit = {
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(src.toString)
        val q = graft.streaming.LshAdmit
          .admitStream(stream, corpusSigs, bands = 16, minEstJ = 0.4)
          .writeStream.format("parquet").option("path", out.toString)
          .option("checkpointLocation", ckpt.toString)
          .outputMode("append").start()
        if (drain) { try q.processAllAvailable() finally q.stop() }
        else stopCold(q, coldAfter)
      }

      val (srcA, outA, ckptA) = (base.resolve("srcA"), base.resolve("outA"),
        base.resolve("ckptA"))
      val (srcB, outB, ckptB) = (base.resolve("srcB"), base.resolve("outB"),
        base.resolve("ckptB"))
      Files.createDirectory(srcA); Files.createDirectory(srcB)

      chunks.zipWithIndex.foreach { case (c, i) =>
        dropChunk(c, srcA, s"chunk_$i.parquet") }
      run(srcA, outA, ckptA, drain = true)

      chunks.take(2).zipWithIndex.foreach { case (c, i) =>
        dropChunk(c, srcB, s"chunk_$i.parquet") }
      run(srcB, outB, ckptB, drain = false, coldAfter = 1L)
      chunks.drop(2).zipWithIndex.foreach { case (c, i) =>
        dropChunk(c, srcB, s"chunk_${i + 2}.parquet") }
      run(srcB, outB, ckptB, drain = true)

      val (a, b) = (ordered(outA), ordered(outB))
      assert(a.exists(!_.contains("9000000000")),
        "uninterrupted run emitted no real verdicts")
      assert(b == a,
        s"recovered admission diverged: uninterrupted=${a.size}, recovered=${b.size}")
    } finally rmTree(base)
  }
}
