package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.Layout

/** The layout operator's contract is observable on disk: range
  * clustering must produce files whose key ranges are pairwise disjoint
  * (a point predicate touches one file), and the parquet footer stats of
  * a clustered write must let the reader skip row groups a shuffled
  * write cannot.
  */
class LayoutSpec extends SparkSpecBase {

  test("clusteredWrite: per-file key ranges are pairwise disjoint and cover all rows") {
    val dir = Files.createTempDirectory("graft_layout").toString + "/li"
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    Layout.clusteredWrite(li, dir, 8, "l_orderkey")
    val ranges = Layout.fileRanges(spark, dir, "l_orderkey")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(ranges.length == 8, s"expected 8 files, got ${ranges.length}")
    assert(ranges.map(_._3).sum == li.count())
    for (Seq((_, hiA, _), (loB, _, _)) <- ranges.toSeq.sliding(2))
      assert(hiA <= loB, s"overlapping file ranges: hi $hiA > next lo $loB")
  }

  test("a point predicate on the cluster key reads one file's rows, not the table") {
    val dir = Files.createTempDirectory("graft_layout2").toString + "/li"
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    Layout.clusteredWrite(li, dir, 8, "l_orderkey")
    val key = li.agg(max("l_orderkey")).head().getLong(0) / 2
    // file-level pruning is observable through input_file_name: the rows
    // matching a point predicate all come from a single file
    val files = spark.read.parquet(dir).filter(col("l_orderkey") === key)
      .select(input_file_name()).distinct().count()
    assert(files <= 1, s"point predicate touched $files files")
  }

  test("z-order: a point predicate on EITHER column touches ~sqrt of the files; " +
    "linear clustering fails the second column") {
    // 128×128 uniform grid, 16 files: ideal Morton tiling gives each file
    // one 32×32 rectangle, so a point predicate on either axis crosses 4
    // of 16 files (√n). The range sampler's cuts land NEAR tile edges,
    // not on them — a straddling file widens its rectangle and can add
    // +1 per crossed boundary (observed 7 under suite-parallel load), so
    // the per-probe bound is half the files and the mean must stay near
    // ideal. Linear clustering on x leaves every file spanning all of
    // y — the second predicate touches everything.
    val grid = spark.range(128L * 128)
      .select((col("id") % 128).as("x"), (col("id") / 128).cast("long").as("y"))
    val zdir = Files.createTempDirectory("graft_layout_z").toString + "/g"
    Layout.zOrderedWrite(grid, zdir, 16, "x", "y")
    def touched(dir: String, c: String, v: Long): Long =
      Layout.fileRanges(spark, dir, c)
        .filter(col("lo") <= v && col("hi") >= v).count()
    val nz = Layout.fileRanges(spark, zdir, "x").count()
    assert(nz == 16, s"expected 16 z-ordered files, got $nz")
    val probes = Seq(5L, 40L, 77L, 120L)
    val counts = for (v <- probes; c <- Seq("x", "y")) yield {
      val n = touched(zdir, c, v)
      assert(n <= 8, s"$c=$v touched $n of 16 files")
      n
    }
    assert(counts.sum.toDouble / counts.size <= 6.0,
      s"mean touched ${counts.sum.toDouble / counts.size} files across probes")
    val ldir = Files.createTempDirectory("graft_layout_l").toString + "/g"
    Layout.clusteredWrite(grid, ldir, 16, "x")
    // x prunes perfectly under linear clustering...
    assert(touched(ldir, "x", 40L) <= 2)
    // ...but y cannot prune at all: every file spans the full y range
    assert(touched(ldir, "y", 40L) >= 14,
      "linear layout unexpectedly pruned the non-cluster column")
  }

  test("rank-normalized z-order keeps pruning under an outlier that kills min/max scaling") {
    // one 10^9 outlier in x: min/max normalization maps every normal x
    // (0..127) to code 0, so every file's x-range covers every normal
    // probe — pruning dead. Quantile-rank codes spread the normal values
    // over the full 8-bit space regardless of the outlier.
    val skewed = spark.range(128L * 128)
      .select(when(col("id") === 0, 1000000000L).otherwise(col("id") % 128).as("x"),
        (col("id") / 128).cast("long").as("y"))
    def touched(dir: String, c: String, v: Long): Long =
      Layout.fileRanges(spark, dir, c)
        .filter(col("lo") <= v && col("hi") >= v).count()
    val mmdir = Files.createTempDirectory("graft_layout_mm").toString + "/g"
    Layout.zOrderedWrite(skewed, mmdir, 16, "x", "y")
    val rkdir = Files.createTempDirectory("graft_layout_rk").toString + "/g"
    Layout.zOrderedWriteByRank(skewed, rkdir, 16, "x", "y")
    val probes = Seq(5L, 40L, 77L, 120L)
    val mm = probes.map(v => touched(mmdir, "x", v))
    val rk = probes.map(v => touched(rkdir, "x", v))
    // the load-bearing contrast: min/max collapse reads ~everything,
    // rank codes keep pruning (ideal 4; boundary jitter adds straddles)
    assert(mm.forall(_ >= 12),
      s"min/max scaling should have collapsed x under the outlier (touched $mm)")
    rk.zip(probes).foreach { case (n, v) =>
      assert(n <= 10, s"rank z-order: x=$v touched $n of 16 files") }
    assert(rk.sum.toDouble / rk.size <= 7.5, s"rank z-order mean touched $rk")
    // y stays prunable in the rank layout too
    assert(touched(rkdir, "y", 40L) <= 10)
  }

  test("HilbertIndex: first-quadrant order and the always-adjacent invariant") {
    import spark.implicits._
    // bits=1 base case: the standard U-shaped visit order
    val q = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)).toDF("x", "y")
      .select(graft.functions.HilbertIndex.hilbert(col("x"), col("y"), 1).as("d"))
      .collect().map(_.getLong(0)).toSeq
    assert(q == Seq(0L, 1L, 2L, 3L), s"bits=1 order was $q")
    // bits=4 (16×16): consecutive indexes must be ADJACENT cells — the
    // property Morton lacks (its seams jump diagonally) and the reason
    // Hilbert clustering prunes 2-D ranges better
    val cells = spark.range(256)
      .select((col("id") % 16).as("x"), expr("id div 16").as("y"))
      .select(col("x"), col("y"),
        graft.functions.HilbertIndex.hilbert(col("x"), col("y"), 4).as("d"))
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
      .sortBy(_._1)
    assert(cells.map(_._1).toSeq == (0L until 256L), "d must be a bijection")
    cells.map(_._2).toSeq.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-adjacent step ($x1,$y1)→($x2,$y2)")
    }
  }

  test("hilbert clustering prunes point AND small-box predicates") {
    val grid = spark.range(128L * 128)
      .select((col("id") % 128).as("x"), (col("id") / 128).cast("long").as("y"))
    val hdir = Files.createTempDirectory("graft_layout_h").toString + "/g"
    Layout.hilbertOrderedWrite(grid, hdir, 16, "x", "y")
    def ranges(c: String) = Layout.fileRanges(spark, hdir, c)
    assert(ranges("x").count() == 16)
    def touched(c: String, v: Long): Long =
      ranges(c).filter(col("lo") <= v && col("hi") >= v).count()
    val counts = for (v <- Seq(5L, 40L, 77L, 120L); c <- Seq("x", "y")) yield {
      val n = touched(c, v)
      assert(n <= 8, s"$c=$v touched $n of 16 files")
      n
    }
    assert(counts.sum.toDouble / counts.size <= 6.0, s"mean touched $counts")
    // a 16×16 box: ideal Hilbert tiling touches 1-2 files; allow straddles
    val xr = ranges("x").withColumnRenamed("lo", "xlo").withColumnRenamed("hi", "xhi")
      .select("file", "xlo", "xhi")
    val yr = ranges("y").select(col("file"), col("lo").as("ylo"), col("hi").as("yhi"))
    val boxFiles = xr.join(yr, "file")
      .filter(col("xlo") <= 55 && col("xhi") >= 40 && col("ylo") <= 55 && col("yhi") >= 40)
      .count()
    assert(boxFiles <= 6, s"16x16 box touched $boxFiles of 16 files")
  }

  test("multi-column clustering orders within files by the full key") {
    val dir = Files.createTempDirectory("graft_layout3").toString + "/li"
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    Layout.clusteredWrite(li, dir, 4, "l_returnflag", "l_orderkey")
    // within every file, (flag, orderkey) must be non-decreasing
    val viol = spark.read.parquet(dir)
      .select(input_file_name().as("f"), col("l_returnflag"), col("l_orderkey"),
        monotonically_increasing_id().as("pos"))
      .withColumn("prev_flag", lag("l_returnflag", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("f").orderBy("pos")))
      .withColumn("prev_key", lag("l_orderkey", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("f").orderBy("pos")))
      .filter(col("prev_flag").isNotNull &&
        (col("prev_flag") > col("l_returnflag") ||
          (col("prev_flag") === col("l_returnflag") && col("prev_key") > col("l_orderkey"))))
      .count()
    assert(viol == 0, s"$viol out-of-order row pairs inside clustered files")
  }
}
