package graft

import graft.core.StagedMemo

/** Staleness + accounting pins for the disk-staged memo (round-17
  * verdict task #8 / ADVICE): the r17 key was the corpus DIRECTORY's
  * second-granularity mtime, so an in-place rewrite landing within the
  * same filesystem-timestamp second silently replayed the stale frame.
  * The round-18 key is a content fingerprint (sorted relative-name /
  * size / mtime triples over every file under the corpus path) — a
  * Spark overwrite writes fresh random part-file names, so the rewrite
  * misses the memo even with every mtime frozen to the original values,
  * which is exactly what this spec engineers.
  */
class StagedMemoSpec extends SparkSpecBase {

  test("in-place corpus rewrite with frozen mtimes misses the memo and restages") {
    val dir = java.nio.file.Files.createTempDirectory("graft_memo_spec").toString
    val corpus = s"$dir/corpus.parquet"
    spark.range(10).toDF("x").write.mode("overwrite").parquet(corpus)
    val frozen = java.nio.file.attribute.FileTime.fromMillis(
      new java.io.File(corpus).lastModified())

    var builds = 0
    def staged() = StagedMemo.stage(spark, "memospec", dir, "corpus.parquet") {
      builds += 1
      spark.read.parquet(corpus)
    }
    assert(staged().count() == 10 && builds == 1, "first caller stages")
    assert(staged().count() == 10 && builds == 1, "second caller replays")

    // the hazard scenario: rewrite the corpus IN PLACE, then pin every
    // mtime under it (and the directory's own) back to the original
    // second — the r17 mtime key cannot distinguish this from no rewrite
    spark.range(25).toDF("x").write.mode("overwrite").parquet(corpus)
    def freeze(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(freeze)
      java.nio.file.Files.setLastModifiedTime(f.toPath, frozen)
    }
    freeze(new java.io.File(corpus))
    assert(new java.io.File(corpus).lastModified() == frozen.toMillis,
      "scenario precondition: directory mtime frozen to the original")

    assert(staged().count() == 25,
      "rewritten corpus must be re-read, not replayed stale")
    assert(builds == 2, "the rewrite must trigger exactly one restage")

    // accounting (verdict task #2): both stagings booked under the family
    assert(StagedMemo.stagingSeconds.getOrElse("memospec", 0.0) > 0.0,
      "staging cost must be accounted per family")
  }
}
