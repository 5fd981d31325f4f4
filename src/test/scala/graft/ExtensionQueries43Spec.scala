package graft

import graft.queries.ExtensionQueries43

/** Property pins for the round-9 thirty-first batch (cross-engine
  * equality is the DuckDB oracle's job — these assert operator
  * SEMANTICS: broken-vector detection on planted vectors, dead-dim
  * ranking, truncation accounting).
  */
class ExtensionQueries43Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  private def embDir(prefix: String,
      rows: Seq[(Long, Array[Float], Int)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  // ------------------------------------------- q222 norm audit

  test("q222: the real corpus certifies unit-normalized with zero broken vectors") {
    val r = ExtensionQueries43.q222_embedding_norm_audit(spark, sfTiny)
      .collect()(0)
    assert(r.getLong(4) == 0L)
    assert(r.getBoolean(5), s"unit_normalized: $r")
    assert(r.getLong(1) <= r.getLong(2) && r.getLong(2) <= r.getLong(3))
  }

  test("q222: planted zero and exploded vectors break the certificate") {
    val unit = Array.fill(4)(0.5f) // norm 1
    val rows = (1L to 7L).map(i => (i, unit, 0)) ++ Seq(
      (8L, Array.fill(4)(0.0f), 0),   // zero vector
      (9L, Array.fill(4)(5.0f), 0))   // exploded
    val r = ExtensionQueries43
      .q222_embedding_norm_audit(spark, embDir("q222", rows)).collect()(0)
    assert(r.getLong(0) == 9L)
    assert(r.getLong(4) == 2L, s"broken count: $r")
    assert(!r.getBoolean(5))
  }

  // ------------------------------------------- q223 dead dims

  test("q223: a planted constant dimension ranks first with variance 0") {
    // dim 0 constant 0.5; dim 1 alternates; dim 2 wilder
    val rows = (0L until 8L).map { i =>
      (i, Array(0.5f, if (i % 2 == 0) 0.1f else 0.9f, i * 0.1f), 0)
    }
    val out = ExtensionQueries43
      .q223_dead_dimensions(spark, embDir("q223", rows)).collect()
    assert(out(0).getLong(0) == 0L) // dim 0 is deadest
    assert(out(0).getLong(2) == 0L) // exactly zero variance numerator
    // ranking is by ascending variance numerator
    val vars = out.map(_.getLong(2))
    assert(vars.sorted.sameElements(vars))
  }

  // ------------------------------------------- q224 truncation

  test("q224: hand lengths — exact doc and token loss per budget") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q224").toString
    // docs of 50, 100, and 300 tokens
    def text(n: Int) = Seq.fill(n)("w").mkString(" ")
    Seq((1L, text(50)), (2L, text(100)), (3L, text(300)))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = ExtensionQueries43.q224_truncation_loss(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    // total tokens 450
    // K=64: docs 100, 300 truncated; lost (100-64)+(300-64)=272
    assert(out(64L) == ((2L, 272L, 666666L, 604444L)))
    // K=128: doc 300 truncated; lost 172
    assert(out(128L) == ((1L, 172L, 333333L, 382222L)))
    // K=256: doc 300 truncated; lost 44
    assert(out(256L) == ((1L, 44L, 333333L, 97777L)))
  }
}
