package graft

import org.apache.spark.sql.functions._

import graft.queries.{ExtensionQueries106, ExtensionQueries89}

/** Semantics pins for the q358 scale remedy (q358b banded dedup +
  * q358c recall certificate).
  */
class ExtensionQueries106Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q358b: the banded path reproduces q358's exact pair set at sf0.001") {
    val exact = ExtensionQueries89.q358_edit_distance_dedup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val banded = ExtensionQueries106.q358b_banded_edit_dedup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(banded == exact, s"banded=$banded exact=$exact")
    assert(exact.nonEmpty) // the corpus plants near-dup prefixes; a
    // green-on-empty pin would certify nothing
  }

  test("q358c: certificate reads zero loss, and banded pairs are a subset of exact") {
    val r = ExtensionQueries106.q358c_banded_recall_cert(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    val (nExact, nCand, nPairs, nRec, recall, precision) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4), row.getLong(5))
    assert(nExact > 0)
    // subset PROOF: every banded pair appears in the exact set
    assert(nRec == nPairs, s"banded emitted a pair the exact path lacks")
    // zero loss on this corpus (measured, not assumed: 6/6 at sf0.01,
    // 77/77 at sf0.1 — see scaladoc)
    assert(recall == 1000000L, s"recall_ppm=$recall")
    // the minhash key sharpens: candidates cannot exceed the Σc² block
    // candidates q358 verifies (they measured ~30× fewer at sf0.1)
    assert(nCand <= 200L, s"n_cand=$nCand blew past the sf-scaled bound")
    assert(precision > 0)
  }
}
