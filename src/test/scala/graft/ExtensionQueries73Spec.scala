package graft

import graft.queries.ExtensionQueries73

/** Semantics pins for the PII/compliance batch (q311-q313): planted
  * PII is found exactly, redaction removes every match (and nothing
  * else), the anonymity histogram conserves the corpus.
  */
class ExtensionQueries73Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private val emailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""".r
  private val ipRe = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""".r
  private val phoneRe = """\+1-555-\d{4}""".r

  private def plantedText(id: Long, text: String): String =
    text +
      (if (id % 10 == 0) s" contact user$id@mail${id % 7}.example.com" else "") +
      (if (id % 17 == 0) s" from 10.${id % 256}.0.${id % 100}" else "") +
      (if (id % 23 == 0) f" call +1-555-${id % 10000}%04d" else "")

  private def corpus() = graft.core.Tables.documents(spark, dir)
    .select("doc_id", "lang", "source", "text").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2),
      plantedText(r.getLong(0), r.getString(3))))

  test("q311: detection equals a driver-side regex recompute, and finds every plant") {
    val rows = ExtensionQueries73.q311_pii_detect(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val ref = corpus().groupBy(_._3).view.mapValues { ds =>
      val e = ds.map(d => emailRe.findAllIn(d._4).size.toLong).sum
      val i = ds.map(d => ipRe.findAllIn(d._4).size.toLong).sum
      val p = ds.map(d => phoneRe.findAllIn(d._4).size.toLong).sum
      val f = ds.count(d => emailRe.findFirstIn(d._4).isDefined ||
        ipRe.findFirstIn(d._4).isDefined || phoneRe.findFirstIn(d._4).isDefined).toLong
      (e, i, p, f)
    }.toMap
    assert(rows == ref)
    // every planted email was found (plants are disjoint from base text)
    val planted = corpus().count(_._1 % 10 == 0).toLong
    assert(rows.values.map(_._1).sum >= planted, "plants must all be detected")
    assert(rows.values.map(_._4).sum > 0)
  }

  test("q312: redaction leaves zero matches and changes only flagged docs") {
    val red = corpus().map { case (id, lang, _, t) =>
      val r = phoneRe.replaceAllIn(
        ipRe.replaceAllIn(emailRe.replaceAllIn(t, "<EMAIL>"), "<IP>"), "<PHONE>")
      (id, lang, r)
    }
    red.foreach { case (_, _, r) =>
      assert(emailRe.findFirstIn(r).isEmpty && phoneRe.findFirstIn(r).isEmpty,
        "redacted text must carry no residual PII")
    }
    val rows = ExtensionQueries73.q312_pii_redact(spark, dir).collect()
    val byLang = red.groupBy(_._2)
    rows.foreach { r =>
      val ds = byLang(r.getString(0))
      assert(r.getLong(1) == ds.length)
      assert(r.getLong(2) == ds.map(_._3.length.toLong).sum, "char sum after redaction")
      val md5s = ds.map(d => java.security.MessageDigest.getInstance("MD5")
        .digest(d._3.getBytes("UTF-8")).map("%02x".format(_)).mkString)
      assert(r.getString(4) == md5s.min && r.getString(5) == md5s.max,
        s"${r.getString(0)}: md5 fingerprints diverge from driver recompute")
    }
  }

  test("q313: anonymity histogram conserves docs; small groups exist in fixture") {
    val rows = ExtensionQueries73.q313_k_anonymity(spark, dir).collect()
    val total = graft.core.Tables.documents(spark, dir).count()
    assert(rows.map(_.getLong(2)).sum == total)
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum == total,
      "size × group-count must also conserve")
    assert(rows.exists(_.getLong(0) < 5), "fixture has re-identifiable groups")
  }
}
