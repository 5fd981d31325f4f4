package graft

import org.apache.spark.sql.functions._
import graft.queries.ExtensionQueries16

/** q141 (perceptual-hash media near-dups) and q142 (cluster
  * survivorship): planted-data recall and decision checks.
  */
class ExtensionQueries16Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_eq16").toString
    rows.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q141: a 1-pixel edit is found at hamming 1; unrelated media are not paired") {
    // 'z' (122) pixels read above the mean, ' ' (32) below — one flipped
    // pixel moves exactly one hash bit (values are far from the mean, so
    // the mean shift flips nothing else)
    val base = "z" * 32 + " " * 32
    val oneFlip = " " + "z" * 31 + " " * 32
    val unrelated = ("ab" * 32).take(64) // alternating: different band pattern
    val dir = docsDir(Seq((1L, base), (2L, oneFlip), (3L, unrelated), (4L, "short")))
    val rows = ExtensionQueries16.q141_phash_neardup(spark, dir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Int]("hamming")))
    assert(rows.toSeq == Seq((1L, 2L, 1)))
  }

  test("q141: identical payloads pair at hamming 0") {
    val t = "the quick brown fox jumps over the lazy dog again and again !!!!"
    assert(t.length >= 64)
    val dir = docsDir(Seq((10L, t), (20L, t)))
    val rows = ExtensionQueries16.q141_phash_neardup(spark, dir).collect()
    assert(rows.length == 1 && rows.head.getAs[Int]("hamming") == 0)
  }

  test("aHashBands: sub-64-byte payloads are dropped; bands are 16-bit") {
    import spark.implicits._
    val media = Seq(
      graft.ext.Multimodal.MediaRecord(1L, "image", ("x" * 64).getBytes),
      graft.ext.Multimodal.MediaRecord(2L, "image", "tiny".getBytes))
      .toDS()
    val out = graft.ext.Multimodal.aHashBands(media).collect()
    assert(out.map(_.media_id).toSeq == Seq(1L))
    assert(out.head.bands.length == 4 &&
      out.head.bands.forall(k => k >= 0 && k <= 0xffff))
    // constant pixels: no pixel exceeds the mean strictly → all-zero hash
    assert(out.head.bands.forall(_ == 0))
  }

  test("q142: the original survives; truncated variants are dropped") {
    // one ≥9-token doc → q42Corpus makes {original, −3 tokens, −6 tokens},
    // all near-dups → one cluster, canonical = the original
    val text = (1 to 12).map(i => s"tok$i").mkString(" ")
    val dir = docsDir(Seq((5L, text)))
    val rows = ExtensionQueries16.q142_canonical_docs(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("rep") == 5L)
    assert(r.getAs[Long]("n_members") == 3L)
    assert(r.getAs[Long]("canonical_id") == 5L) // most tokens = untruncated
    assert(r.getAs[Long]("canonical_tokens") == 12L)
    assert(r.getAs[Long]("total_tokens") == 12L + 9L + 6L)
    assert(r.getAs[Long]("n_dropped") == 2L)
  }

  test("q144: MERGE semantics — latest update wins, tombstones drop, inserts land") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    // keys: 10 (two updates — seq 2 wins), 11 (tombstone), 12 (spawns an
    // insert under 1000012), 13 (untouched)
    Seq((10L, "a", 0, 1.00, "SEG"), (11L, "b", 0, 2.00, "SEG"),
      (12L, "c", 0, 3.00, "SEG"), (13L, "d", 0, 4.00, "SEG"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val rows = ExtensionQueries16.q144_cdc_upsert(spark, dir).collect()
      .map(r => r.getAs[Long]("c_custkey") ->
        (r.getAs[Long]("acctbal_cents"), r.getAs[String]("mktsegment"),
          r.getAs[String]("version"))).toMap
    assert(!rows.contains(11L), "tombstoned key must vanish")
    assert(rows(10L) == ((100L + 20000L, "SEG", "updated"))) // seq 2 (+200.00) wins
    assert(rows(12L) == ((300L, "SEG", "kept"))) // source of the insert, itself kept
    assert(rows(1000012L) == ((300L, "NEWSEG", "inserted")))
    assert(rows(13L) == ((400L, "SEG", "kept")))
    assert(rows.size == 4)
  }

  test("q142: every cluster's canonical is its max-token member (real corpus)") {
    val clusters = graft.queries.ExtensionQueries2.q42_dedup_clusters(spark, sfTiny)
    val toks = graft.queries.ExtensionQueries2.q42Corpus(spark, sfTiny)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("nt"))
    val best = clusters.join(toks, col("id") === col("doc_id"))
      .groupBy(col("rep")).agg(max(col("nt")).as("max_nt"))
      .collect().map(r => r.getAs[Long]("rep") -> r.getAs[Long]("max_nt")).toMap
    val got = ExtensionQueries16.q142_canonical_docs(spark, sfTiny).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("canonical_tokens") == best(r.getAs[Long]("rep")))
    }
  }
}
