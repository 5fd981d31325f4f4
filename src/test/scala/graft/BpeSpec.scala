package graft

import org.apache.spark.sql.functions._
import graft.ext.Bpe
import graft.queries.ExtensionQueries10

/** Pins for the round-7 BPE tokenizer (cross-engine equality is the
  * DuckDB oracle's job — these assert operator SEMANTICS).
  */
class BpeSpec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  test("training is deterministic and merges are buildable bottom-up") {
    val docs = graft.core.Tables.documents(spark, sfTiny)
    val m1 = Bpe.train(docs, "text", numMerges = 40)
    val m2 = Bpe.train(docs, "text", numMerges = 40)
    assert(m1.merges == m2.merges, "same corpus must train the same table")
    assert(m1.merges.nonEmpty)
    // every merge's parts are single chars or outputs of EARLIER merges —
    // the property the one-at-a-time/merge-all equivalence proof rests on
    val seen = scala.collection.mutable.Set.empty[String]
    for (((a, b), i) <- m1.merges.zipWithIndex) {
      assert(a.length == 1 || seen.contains(a), s"rank $i left part '$a' unbuildable")
      assert(b.length == 1 || seen.contains(b), s"rank $i right part '$b' unbuildable")
      seen += (a + b)
    }
  }

  test("hand corpus: classic low/lower/lowest merges and counts") {
    import spark.implicits._
    val docs = Seq((1L, "low low low low low lower lower newest newest newest widest"))
      .toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", numMerges = 30)
    val enc = m.encoder
    // " low" appears 4 times as a pre-token (leading space glued) and once
    // as bare "low"; with enough merges both collapse to one token each
    assert(enc.encodeWordCount(" low") == 1)
    assert(enc.encodeWordCount("low") <= 2)
    // unseen word: merges still apply partially, never below 1
    assert(enc.encodeWordCount(" lowly") >= 1)
    // empty text → zero tokens
    assert(enc.countTokens(org.apache.spark.unsafe.types.UTF8String.fromString("")) == 0L)
  }

  test("one-at-a-time leftmost merging equals the merge-all greedy loop") {
    val docs = graft.core.Tables.documents(spark, sfTiny)
    val m = Bpe.train(docs, "text", numMerges = 60)
    val rank = m.merges.zipWithIndex.toMap
    def oneAtATime(w: String): Array[String] = {
      var syms = w.map(_.toString).toArray
      var halted = false
      while (!halted) {
        val cands = (0 until syms.length - 1)
          .flatMap(i => rank.get((syms(i), syms(i + 1))).map(r => (r, i)))
        if (cands.isEmpty) halted = true
        else {
          val (r, i) = cands.min // lowest rank, then leftmost
          val (a, b) = m.merges(r)
          syms = (syms.take(i) :+ (a + b)) ++ syms.drop(i + 2)
        }
      }
      syms
    }
    val words = docs
      .select(explode(graft.ext.TextAnalysis.regexTokens(col("text"))).as("tok"))
      .distinct().collect().map(_.getString(0))
    assert(words.nonEmpty)
    val enc = m.encoder
    for (w <- words)
      assert(enc.encodeWord(w).toSeq == oneAtATime(w).toSeq,
        s"divergence on '$w' — the SQL mirror's recursion would drift")
  }

  test("q112: per-doc counts bounded by pretokens below and chars above") {
    val r = ExtensionQueries10.q112_bpe_tokens(spark, sfTiny)
      .join(graft.core.Tables.documents(spark, sfTiny)
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars")), "doc_id")
      .collect()
    assert(r.nonEmpty)
    for (row <- r) {
      val (pre, bpe, chars) = (row.getAs[Long]("n_pretok"),
        row.getAs[Long]("n_bpe"), row.getAs[Long]("n_chars"))
      assert(bpe >= pre, s"each pre-token is >= 1 BPE token: $row")
      assert(bpe <= chars, s"merging never exceeds character count: $row")
    }
    // merges must actually compress: the corpus-level ratio is well under
    // the no-merge ceiling (chars) and the table is non-trivial
    val tot = r.map(_.getAs[Long]("n_bpe")).sum.toDouble
    val chars = r.map(_.getAs[Long]("n_chars")).sum.toDouble
    assert(tot / chars < 0.5, f"BPE should at least halve char count, got ${tot / chars}%.2f")
  }
}
