package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import graft.sinks.Outputs

/** Scale-posture checks: observe metrics, formatted CSV sink, and the
  * bucketed co-located join (no exchange on either side — the 100 TB
  * repeated-join pattern, SURVEY §4.4).
  */
class ScaleSpec extends SparkSpecBase {

  test("observe metrics surface per-stage row counts without extra jobs") {
    val cfg = Pipeline.PipelineConfig(
      frogPath = getClass.getResource("/fixtures/frog.csv").getPath,
      gscPath = getClass.getResource("/fixtures/gsc.csv").getPath,
      ga4Path = getClass.getResource("/fixtures/ga4.csv").getPath,
      siteBase = "https://www.acme-store.com")
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      val metrics = scala.collection.concurrent.TrieMap.empty[String, Long]
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          metrics.put(name, row.getAs[Long]("rows"))
        }
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      Pipeline.merged(spark, cfg).count()
      // listener delivery is async; poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (!listener.metrics.contains("merged") && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(listener.metrics.get("frog_spine").contains(5L))
      assert(listener.metrics.get("merged").contains(5L))
    } finally spark.listenerManager.unregister(listener)
  }

  test("formatted CSV sink: %.6f doubles, no scientific notation, null = blank") {
    import spark.implicits._
    val df = Seq((1L, Some(0.0000015), Some(12345678.5)), (2L, None, Some(1.0)))
      .toDF("id", "tiny", "big")
    val out = java.nio.file.Files.createTempDirectory("graft_csv").toString + "/x"
    Outputs.writeCsvFormatted(df, out)
    val lines = spark.read.textFile(out).collect().toList
    assert(lines.exists(_.contains("0.000002"))) // %.6f, not 1.5E-6
    assert(lines.exists(_.contains("12345678.500000")))
    assert(lines.exists(_.startsWith("2,,"))) // null renders blank
    assert(!lines.exists(l => l.contains("E-") || l.contains("E+")))
  }

  test("size-governed parquet sink: bounded file count, clustered footer stats, " +
    "size cap splits a skewed partition") {
    val li = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select(col("l_orderkey"), col("l_partkey"), col("l_extendedprice"))
    val out = java.nio.file.Files.createTempDirectory("graft_sized").toString
    Outputs.writeParquetSized(li, s"$out/a", numFiles = 4, clusterBy = Seq("l_orderkey"))
    def parquetFiles(p: String): Seq[java.io.File] =
      new java.io.File(p).listFiles.toSeq.filter(_.getName.endsWith(".parquet"))
    assert(parquetFiles(s"$out/a").size == 4, "file count must equal numFiles")
    assert(spark.read.parquet(s"$out/a").count() == li.count())
    // maxRecordsPerFile splits output beyond the cap even with numFiles=1
    Outputs.writeParquetSized(li, s"$out/b", numFiles = 1,
      clusterBy = Seq("l_orderkey"), maxRecordsPerFile = 10000L)
    assert(parquetFiles(s"$out/b").size >= 6, // 60k rows / 10k cap
      s"size cap did not split: ${parquetFiles(s"$out/b").size} files")
    // clustering: each file's orderkey span is narrow vs the global span →
    // footer min/max stats prune downstream scans
    val spans = parquetFiles(s"$out/a").map { f =>
      val r = spark.read.parquet(f.getPath)
        .agg(min(col("l_orderkey")), max(col("l_orderkey"))).collect().head
      r.getLong(1) - r.getLong(0)
    }
    val global = li.agg(max(col("l_orderkey")) - min(col("l_orderkey")))
      .collect().head.getLong(0)
    assert(spans.forall(_ < global / 2),
      s"files not clustered: spans=$spans vs global=$global")
  }

  test("hive-partitioned sink: per-value directories, partition pruning in the scan") {
    val d = graft.core.Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString + "/docs"
    Outputs.writeParquetPartitioned(d, out, "lang", numFilesPerPartition = 2)
    val dirs = new java.io.File(out).listFiles.filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.sameElements(Array("lang=de", "lang=en", "lang=es", "lang=fr", "lang=zh")))
    val back = spark.read.parquet(out)
    assert(back.count() == d.count())
    // filter on the partition column must prune directories, not read+filter
    val pruned = back.filter(col("lang") === "en")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"),
      s"no partition pruning in plan:\n${scan.take(1500)}")
    assert(pruned.count() ==
      d.filter(col("lang") === "en").count())
  }

  test("JSONL ingest quarantines corrupt lines instead of crashing or nulling them") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl")
    java.nio.file.Files.writeString(dir.resolve("docs.jsonl"),
      """{"doc_id": 1, "text": "hello world"}
        |{"doc_id": 2, "text": "ok"}
        |{"doc_id": 3, "text": "truncated
        |not json at all
        |{"doc_id": 4, "text": "fine"}
        |""".stripMargin)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val (clean, quarantine) =
      graft.ingest.Sources.loadJsonlQuarantined(spark, dir.toString, schema)
    assert(clean.columns.toSeq == Seq("doc_id", "text"))
    assert(clean.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 4L))
    val bad = quarantine.collect().map(_.getString(0))
    assert(bad.length == 2 && bad.exists(_.contains("truncated")) &&
      bad.exists(_.contains("not json")), s"quarantine: ${bad.toSeq}")
  }

  test("schema-evolution parquet read: merged footers, old rows null-fill new columns") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.parquet(s"$dir/batch=1")
    Seq((3L, "c", 9.5)).toDF("id", "v", "score") // column added later
      .write.parquet(s"$dir/batch=2")
    val merged = graft.ingest.Sources.loadParquetMerged(spark, dir)
    assert(merged.columns.toSet == Set("id", "v", "score", "batch"))
    val rows = merged.select("id", "score").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows == Map(1L -> None, 2L -> None, 3L -> Some(9.5)))
    // the default (unmerged) read picks ONE footer — documents why the
    // helper exists: it can silently drop the evolved column entirely
    val plain = spark.read.parquet(dir)
    assert(plain.columns.length <= merged.columns.length)
  }

  test("schema-evolution ORC read: same merged-footer contract as parquet") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve_orc").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.orc(s"$dir/batch=1")
    Seq((3L, "c", 9.5)).toDF("id", "v", "score").write.orc(s"$dir/batch=2")
    val merged = graft.ingest.Sources.loadOrcMerged(spark, dir)
    assert(merged.columns.toSet == Set("id", "v", "score", "batch"))
    val rows = merged.select("id", "score").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows == Map(1L -> None, 2L -> None, 3L -> Some(9.5)))
  }

  test("approximate quantiles (the 100 TB tier) stay within pinned error of the " +
    "exact order statistics") {
    val li = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select(graft.core.FpSafe.cents(col("l_extendedprice")).as("cents"))
    val n = li.count()
    val approx = li.stat.approxQuantile("cents", Array(0.25, 0.5, 0.75), 0.01)
    // exact thresholds: value at rank ceil(q·n) — the q61 definition
    val exact = Seq((n + 3) / 4, (n + 1) / 2, (3 * n + 3) / 4).map { k =>
      li.orderBy(col("cents")).limit(k.toInt).agg(max(col("cents")))
        .collect().head.getLong(0)
    }
    exact.zip(approx).foreach { case (e, a) =>
      // relative-ERROR bound follows from approxQuantile's rank guarantee
      // (±1% of n ranks) on this distribution; generous 5% value tolerance
      assert(math.abs(a - e) <= math.max(0.05 * e, 1.0),
        s"approx $a too far from exact $e (exact=$exact approx=${approx.toSeq})")
    }
  }

  test("bucketed tables join without exchanges (co-located join)") {
    val s2 = spark.newSession() // warehouse dir is set (static) on the base session
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    val o = graft.core.Tables.orders(s2, "/root/testdata/sf0.001")
    val li = graft.core.Tables.lineitem(s2, "/root/testdata/sf0.001")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")
    val joined = s2.table("orders_b")
      .join(s2.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
    val plan = joined.queryExecution.executedPlan
    def exchanges(p: SparkPlan): Int =
      (if (p.getClass.getSimpleName.contains("Exchange")) 1 else 0) +
        p.children.map(exchanges).sum
    assert(exchanges(plan) == 0,
      s"bucketed join should be exchange-free:\n${plan.treeString.take(2000)}")
    assert(joined.count() > 0)
  }

  test("GraftExtensions (spark.sql.extensions entry point) registers every " +
    "custom function on a fresh session") {
    import org.apache.spark.sql.SparkSession
    val oldDefault = SparkSession.getDefaultSession
    val oldActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // new session over the SAME SparkContext, extensions applied at build
      val s2 = SparkSession.builder().master("local[2]")
        .withExtensions(new GraftExtensions()).getOrCreate()
      val r = s2.sql(
        """SELECT
          |  graft_polyhash('abc') AS ph,
          |  graft_url_normalize('HTTPS://Ex.COM/a/?utm_s=1&k=2#f') AS u,
          |  graft_lang_id('the of and is') AS lang,
          |  size(graft_shingle_hashes('a b c d e', 3)) AS nsh,
          |  graft_simhash48(graft_shingle_hashes('a b c d e', 3)) AS sh,
          |  graft_nfc('café') AS nfc,
          |  graft_hilbert(1L, 1L, 1) AS hil
          |""".stripMargin).collect().head
      val expPh = ("abc".getBytes.foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % 1000000007L))
      assert(r.getAs[Long]("ph") == expPh)
      assert(r.getAs[String]("u") == "https://ex.com/a?k=2")
      assert(r.getAs[String]("lang") == "en")
      assert(r.getAs[Int]("nsh") == 3)
      assert(r.getAs[Long]("sh") != 0L)
      assert(r.getAs[String]("nfc") == "caf\u00e9")
      assert(r.getAs[Long]("hil") == 2L) // (1,1) is the 3rd cell of the U curve
    } finally {
      SparkSession.clearDefaultSession(); SparkSession.clearActiveSession()
      oldDefault.foreach(SparkSession.setDefaultSession)
      oldActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("graft_url_normalize is SQL-callable and matches the Column API") {
    graft.functions.UrlNormalize.register(spark)
    import spark.implicits._
    Seq("HTTPS://A.Com/x/?utm_a=1&k=2#f").toDF("u").createOrReplaceTempView("urls")
    val viaSql = spark.sql(
      "SELECT graft_url_normalize(u) AS n1, graft_url_normalize(u, 'https://B.org') AS n2, " +
      "graft_url_normalize(u, '', true) AS n3 FROM urls").collect().head
    assert(viaSql.getString(0) == "https://a.com/x?k=2")
    assert(viaSql.getString(2) == "https://a.com/x")
  }
}
