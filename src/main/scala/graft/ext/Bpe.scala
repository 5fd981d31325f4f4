package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer with a corpus-trained merge table — real
  * BPE token counts for the budget/packing tier (q54/q112), replacing the
  * ceil(chars/4) heuristic (the round-6 verdict's ask). Shape follows the
  * public GPT-2 BPE (Sennrich et al. 2016; `encoder.py` in the public
  * GPT-2 release): the q96 pre-tokenizer regex segments text into words,
  * each word starts as single characters, and the learned merge rules
  * apply greedily — always the lowest-rank applicable pair, all its
  * occurrences left-to-right — until none applies. Character-level rather
  * than byte-level initial symbols (the corpus is plain text; the byte
  * fallback layer of GPT-2 exists for arbitrary bytes, out of scope).
  *
  * Training is the IVF/PQ pattern (`IvfIndex.scala`): one distributed
  * word-frequency aggregate, then a DRIVER-side merge loop over a
  * bounded top-`maxWords` word list — constant in corpus size, so the
  * model is a plan literal a 1000-executor job broadcasts for free, and
  * the generated DuckDB mirror embeds the same merges as literals.
  * Determinism: word list ordered by (freq desc, word), best pair by
  * (pair-freq desc, pair lexicographic) — integer arithmetic only, so
  * training replays bit-identically anywhere.
  *
  * ENCODE EQUIVALENCE (load-bearing for the SQL mirror): merging the
  * lowest-rank pair's occurrences one-at-a-time (leftmost first,
  * re-deciding the best pair each step — the recursive-CTE form) equals
  * the merge-all-occurrences loop, because a merge can only CREATE pairs
  * that contain its output symbol, and any rule mentioning that symbol
  * was necessarily created later in training, i.e. has a HIGHER rank —
  * so the current best pair stays best until exhausted. BpeSpec pins
  * this equivalence property-style.
  */
object Bpe {

  /** Pair-key separator (unit separator, absent from any text the
    * pre-tokenizer can emit as a symbol boundary concern).
    */
  val Sep: String = "\u001f"

  /** Ordered merge rules; rank = position. */
  final case class Model(merges: Seq[(String, String)]) {
    def encoder: Encoder = new Encoder(merges)
  }

  /** Train `numMerges` merge rules from the corpus's pre-token frequency
    * table. `maxWords` bounds the driver-side working set (the top of a
    * Zipf distribution carries essentially all pair mass).
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int = 60,
      maxWords: Int = 2000): Model = {
    require(numMerges > 0 && maxWords > 0, "numMerges and maxWords must be positive")
    val top = docs
      .select(explode(TextAnalysis.regexTokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(maxWords)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))

    var words: Array[(Array[String], Long)] =
      top.map { case (w, c) => (w.map(_.toString).toArray, c) }
    val merges = Seq.newBuilder[(String, String)]
    var k = 0
    var exhausted = false
    while (k < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        pairCounts.updateWith((syms(i), syms(i + 1)))(v => Some(v.getOrElse(0L) + c))
      if (pairCounts.isEmpty) exhausted = true
      else {
        // max count; ties break on the lexicographically smallest pair
        val best = pairCounts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head._1
        merges += best
        words = words.map { case (syms, c) => (mergeAll(syms, best._1, best._2), c) }
        k += 1
      }
    }
    Model(merges.result())
  }

  /** One left-to-right non-overlapping pass merging every (a, b). */
  private[ext] def mergeAll(syms: Array[String], a: String, b: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Serializable encoder shipped inside the Catalyst expression (a plan
    * literal — [[graft.functions.BpeTokenCountExpr]]). Word→count results
    * memoize per executor instance (natural-language corpora repeat a
    * small word set; the cache is size-capped, not an unbounded leak).
    */
  final class Encoder(val merges: Seq[(String, String)]) extends Serializable {
    private val rank: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer]()
      merges.zipWithIndex.foreach { case ((a, b), i) =>
        m.put(a + Bpe.Sep + b, Integer.valueOf(i))
      }
      m
    }

    @transient private lazy val pretok =
      java.util.regex.Pattern.compile(TextAnalysis.BpeSplitPattern)

    @transient private lazy val cache =
      new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    private val CacheCap = 1 << 16

    /** Token count of one pre-token (word) after greedy merging. */
    def encodeWordCount(w: String): Int = {
      val hit = cache.get(w)
      if (hit != null) return hit.intValue()
      val n = encodeWord(w).length
      if (cache.size < CacheCap) cache.put(w, Integer.valueOf(n))
      n
    }

    /** Full greedy encode of one word (spec/debug surface). */
    def encodeWord(w: String): Array[String] = {
      var syms = w.map(_.toString).toArray
      var done = false
      while (!done && syms.length > 1) {
        var bestRank = Int.MaxValue
        var bestA: String = null
        var bestB: String = null
        var i = 0
        while (i < syms.length - 1) {
          val r = rank.get(syms(i) + Bpe.Sep + syms(i + 1))
          if (r != null && r.intValue() < bestRank) {
            bestRank = r.intValue(); bestA = syms(i); bestB = syms(i + 1)
          }
          i += 1
        }
        if (bestA == null) done = true
        else syms = mergeAll(syms, bestA, bestB)
      }
      syms
    }

    /** Total BPE tokens of a text: pre-tokenize, sum per-word counts.
      * Static-call-friendly for the codegen path.
      */
    def countTokens(s: org.apache.spark.unsafe.types.UTF8String): Long = {
      if (s == null) return 0L
      val m = pretok.matcher(s.toString)
      var total = 0L
      while (m.find()) total += encodeWordCount(m.group())
      total
    }
  }

  /** Column API: real BPE token count under `model`. */
  def tokenCount(c: Column, model: Model): Column =
    graft.functions.BpeTokenCountExpr.bpeTokenCount(c, model.encoder)
}
