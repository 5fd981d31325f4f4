package graft

import org.apache.spark.sql.functions._

import graft.streaming.CurationChain

/** Stream ≡ batch certificate for the COMPOSED curation chain
  * (round-17 verdict task #5): q496 certified decontam → exact dedup →
  * near-dup → quality as one batch waterfall; this spec runs the same
  * chain as an incremental ingestion gate — a documents drop stream in
  * 3 micro-batches through `foreachBatch`, the stored corpus as initial
  * state, state appended per batch — and pins that the accumulated
  * per-doc verdicts (and therefore the waterfall counts) equal the
  * one-shot batch run bit-for-bit.
  *
  * The fixture makes every stage fire, and fire ACROSS batch
  * boundaries (the cases a per-batch-only chain would get wrong):
  *  - an eval copy in batch 2 → decontam;
  *  - an exact copy of a CORPUS doc (batch 1) and of a BATCH-1 delta
  *    (batch 3) → exact_dup with dup_of across the boundary;
  *  - a truncation near-dup of a corpus doc (batch 2) and of a batch-1
  *    delta (batch 3) → near_dup against state built two batches ago;
  *  - a low-unique-ratio doc → quality;
  *  - a doc dropped by decontam whose text is then repeated by a later
  *    doc → the later doc must NOT read exact_dup of the contaminated
  *    id (decontam casualties never enter the dedup pool — q496 runs
  *    exact dedup on the post-decontam frame).
  */
class StreamingCurationChainSpec extends SparkSpecBase {

  private val Bands = 16
  private val MinEstJ = 0.4

  /** deterministic 3-char token */
  private def tok(seed: Int): String = {
    val h = (seed * 2654435761L & 0x7fffffffL).toInt
    s"${('a' + h % 26).toChar}${('a' + (h / 26) % 26).toChar}${('a' + (h / 676) % 26).toChar}"
  }
  private def text(seed: Int, n: Int = 24): String =
    (0 until n).map(p => tok(seed * 1000 + p)).mkString(" ")
  private def truncated(t: String): String =
    t.split(" ").dropRight(5).mkString(" ")

  private val evalRows = (0L until 10L).map(i => (i, text(i.toInt)))
  private val corpusRows = (10L until 20L).map(i => (i, text(i.toInt)))

  // batch 1: clean admits + an exact corpus copy
  private val batch1 = Seq(
    100L -> text(100), 101L -> text(101),
    102L -> corpusRows(2)._2) // exact copy of doc 12 → exact_dup(12)
  // batch 2: eval copy, corpus near-dup, contaminated text's first claim
  private val batch2 = Seq(
    110L -> evalRows(3)._2, // eval copy → decontam
    111L -> truncated(corpusRows(5)._2), // near-dup of 15
    112L -> text(112))
  // batch 3: cross-batch exact/near dups, quality, decontam-shadow probe
  private val batch3 = Seq(
    120L -> text(100), // exact copy of batch-1 delta 100 → exact_dup(100)
    121L -> truncated(text(101)), // near-dup of batch-1 delta 101
    122L -> (0 until 4).flatMap(_ => Seq(tok(555001), tok(555002), tok(555003), tok(555004)))
      .mkString(" "), // 16 tokens, 4 distinct → unique ratio < ½ → quality
    123L -> evalRows(3)._2) // same text as decontam-dropped 110: must read
                            // decontam itself, NOT exact_dup(110)

  test("3-micro-batch foreachBatch chain == one-shot batch chain, every stage firing") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext

    val evalDocs = evalRows.toDF("doc_id", "text")
    val corpus = corpusRows.toDF("doc_id", "text")
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_curation_state").toString + "/state"
    corpus.select(col("doc_id"), col("text"))
      .write.mode("overwrite").parquet(stateDir)

    val streamed = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF.toDF("doc_id", "text").writeStream
      .foreachBatch(CurationChain.foreachBatchAdmit(evalDocs, Bands, MinEstJ,
        stateDir, v => streamed ++= v.collect().map(_.toSeq)))
      .start()
    try {
      for (b <- Seq(batch1, batch2, batch3)) {
        mem.addData(b); q.processAllAvailable()
      }
    } finally q.stop()

    // one-shot twin over the identical delta, original corpus state
    val allDeltas = (batch1 ++ batch2 ++ batch3).toDF("doc_id", "text")
    val oneShot = CurationChain.admitBatch(allDeltas, corpus, evalDocs, Bands, MinEstJ)
      .collect().map(_.toSeq)

    assert(streamed.size == allDeltas.count(),
      "every streamed delta must get exactly one verdict")
    assert(streamed.toSet == oneShot.toSet,
      s"stream != batch:\n stream=${streamed.sortBy(_.head.toString)}\n batch=${oneShot.toSeq.sortBy(_.head.toString)}")

    // the engineered stage outcomes, including every cross-batch case
    val v = streamed.map(r => r.head.asInstanceOf[Long] ->
      ((r(1).asInstanceOf[String], Option(r(2)).map(_.asInstanceOf[Long])))).toMap
    assert(v(102L) == (("exact_dup", Some(12L))), s"corpus copy: ${v(102L)}")
    assert(v(110L) == (("decontam", None)), s"eval copy: ${v(110L)}")
    assert(v(111L) == (("near_dup", Some(15L))), s"corpus near-dup: ${v(111L)}")
    assert(v(120L) == (("exact_dup", Some(100L))), s"cross-batch exact dup: ${v(120L)}")
    assert(v(121L) == (("near_dup", Some(101L))), s"cross-batch near-dup: ${v(121L)}")
    assert(v(122L)._1 == "quality", s"low unique ratio: ${v(122L)}")
    assert(v(123L) == (("decontam", None)),
      s"contaminated text must not become an exact_dup claim: ${v(123L)}")
    Seq(100L, 101L, 112L).foreach(id =>
      assert(v(id) == (("admitted", None)), s"clean doc $id: ${v(id)}"))

    // waterfall counts (the q496 shape) agree with the one-shot chain
    val stageCounts = streamed.groupBy(_(1)).view.mapValues(_.size).toMap
    val oneShotCounts = oneShot.groupBy(_(1)).view.mapValues(_.size).toMap
    assert(stageCounts == oneShotCounts)
    assert(stageCounts(("admitted")) == 3 && stageCounts(("decontam")) == 2 &&
      stageCounts(("exact_dup")) == 2 && stageCounts(("near_dup")) == 2 &&
      stageCounts(("quality")) == 1)
  }
}
