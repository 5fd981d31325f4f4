package graft

import graft.queries.ExtensionQueries72

/** Semantics pins for the ordering/packing/quota batch (q308-q310),
  * each against a driver-side recompute from first principles.
  */
class ExtensionQueries72Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private val epochA = Array(48271L, 69621L, 16807L)

  private def lcg(id: Long, e: Int): Long =
    (epochA(e) * ((48271L * (id + 1)) % 2147483647L + 1)) % 2147483647L

  private def docs() = graft.core.Tables.documents(spark, dir)
    .select("doc_id", "lang", "n_chars").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

  test("q308: each epoch head is the true min-10 of its permutation; epochs differ") {
    val rows = ExtensionQueries72.q308_epoch_order(spark, dir).collect()
    assert(rows.length == 30)
    val ids = docs().map(_._1)
    val byEpoch = rows.groupBy(_.getInt(0))
    (0 to 2).foreach { e =>
      val expect = ids.map(id => (lcg(id, e), id)).sorted.take(10)
      val got = byEpoch(e).sortBy(_.getInt(1)).map(r => (r.getLong(3), r.getLong(2))).toSeq
      assert(got == expect.toSeq, s"epoch $e head mismatch")
    }
    assert(byEpoch(0).map(_.getLong(2)).toSeq != byEpoch(1).map(_.getLong(2)).toSeq,
      "epochs must be different permutations")
  }

  test("q309: packing histogram conserves docs and chars; matches recompute") {
    val rows = ExtensionQueries72.q309_sequence_packing(spark, dir).collect()
    val ds = docs().sortBy(_._1)
    var s = 0L
    val bins = ds.map { case (_, _, n) => val b = s / 4096; s += n; (b, n) }
    val hist = bins.groupBy(_._1).values
      .groupBy(_.length).view.mapValues(g => (g.size, g.map(_.map(_._2).sum).sum))
    assert(rows.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap ==
      hist.map { case (k, (nb, cs)) => k.toLong -> (nb.toLong, cs) }.toMap)
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum == ds.length,
      "histogram must conserve the doc count")
  }

  test("q310: per-lang quota kept set is maximal, within budget, exact members") {
    val rows = ExtensionQueries72.q310_token_quota(spark, dir).collect()
    val byLang = docs().groupBy(_._2)
    assert(rows.length == byLang.size)
    rows.foreach { r =>
      val lang = r.getString(0)
      val ordered = byLang(lang).map { case (id, _, n) => (lcg(id, 0), id, n) }.sorted
      var s = 0L
      val kept = ordered.takeWhile { case (_, _, n) => s += n; s <= 10000L }
      assert(r.getLong(1) == kept.length, s"$lang n_kept")
      assert(r.getLong(2) == kept.map(_._3).sum && r.getLong(2) <= 10000L,
        s"$lang chars_kept within budget")
      assert(r.getLong(3) == kept.map(_._2).sum, s"$lang id_checksum")
      // maximality: the next doc in order would cross the budget
      if (kept.length < ordered.length)
        assert(kept.map(_._3).sum + ordered(kept.length)._3 > 10000L)
    }
  }
}
