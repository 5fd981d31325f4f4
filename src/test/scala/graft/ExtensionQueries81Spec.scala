package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries81

/** Semantics pins for the governance/contract batch (q335-q337). */
class ExtensionQueries81Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  test("q335: export fingerprints equal a MessageDigest recompute of the ordered history") {
    val ev = graft.core.Tables.events(spark, dir)
      .filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("us"),
        col("event_type"), round(col("value") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4)))
    val ref = ev.groupBy(_._1).map { case (u, es) =>
      val ordered = es.sortBy(e => (e._3, e._2))
      val hist = ordered.map(e => s"${e._4}|${e._3}|${e._5}").mkString("#")
      u -> (es.length.toLong, es.map(_._3).min, es.map(_._3).max,
        es.map(_._5).sum, md5hex(hist))
    }
    val rows = ExtensionQueries81.q335_subject_access_export(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))
      .toMap
    assert(rows == ref)
    // a single-record perturbation would flip the fingerprint: the md5s
    // are all distinct across subjects on this corpus
    assert(rows.values.map(_._5).toSet.size == rows.size)
  }

  test("q336: generation stats equal the driver recompute and conserve the corpus") {
    val ds = graft.core.Tables.documents(spark, dir)
      .select("doc_id", "lang", "source", "n_chars").collect()
      .map(r => (r.getLong(0) % 2, r.getString(1), r.getString(2), r.getLong(3)))
    val n = ds.length.toLong
    val rows = ExtensionQueries81.q336_schema_drift(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(5),
        r.getLong(6))).toMap
    assert(rows.keySet == Set("lang", "source", "n_chars"))
    rows.values.foreach { case (na, nb, _, _) => assert(na + nb == n) }
    def ndv(gen: Long, f: ((Long, String, String, Long)) => String) =
      ds.filter(_._1 == gen).map(f).distinct.size.toLong
    assert(rows("lang") == ((ds.count(_._1 == 0).toLong, ds.count(_._1 == 1).toLong,
      ndv(0, _._2), ndv(1, _._2))))
    assert(rows("source")._3 == ndv(0, _._3))
    assert(rows("n_chars")._4 == ndv(1, d => f"${d._4}%020d"))
  }

  test("q337: weights conserve the clustered corpus; sizes >= 2") {
    val clusters = graft.queries.ExtensionQueries2
      .q42ClustersStaged(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val sizes = clusters.groupBy(_._2).values.map(_.size.toLong)
    val ref = sizes.groupBy(identity).map { case (sz, cs) =>
      sz -> (cs.size.toLong, cs.size.toLong * sz, 1000000L / sz,
        cs.size.toLong * sz * (1000000L / sz))
    }
    val rows = ExtensionQueries81.q337_dedup_loss_weights(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows == ref)
    assert(rows.keys.forall(_ >= 2), "a near-dup cluster has >= 2 members")
    assert(rows.values.map(_._2).sum == clusters.length.toLong, "doc conservation")
  }
}
