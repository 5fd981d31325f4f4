package graft

import graft.queries.ExtensionQueries46

/** Property pins for the round-9 thirty-fourth batch (cross-engine
  * equality is the DuckDB oracle's job — these assert operator
  * SEMANTICS: share accounting, zero chi-square under independence,
  * run counting across block edges).
  */
class ExtensionQueries46Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  // --------------------------------- q231 sample representativeness

  test("q231: share accounting closes; gaps match the two share columns") {
    val out = ExtensionQueries46
      .q231_sample_representativeness(spark, sfTiny).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(5) == math.abs(r.getLong(3) - r.getLong(4)))
      assert(r.getBoolean(6) == (r.getLong(5) < 50000L))
      assert(r.getLong(2) <= r.getLong(1))
    }
    // pop shares sum to ~1e6
    val popSum = out.map(_.getLong(3)).sum
    assert(popSum > 1000000L - out.length && popSum <= 1000000L)
  }

  // --------------------------------------- q232 r x c chi-square

  test("q232: an exactly independent table reports zero everywhere") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q232").toString
    // 2 langs x 2 sources with perfectly proportional counts:
    // en/s1=20, en/s2=10, de/s1=40, de/s2=20 -> o*t = r*c for every cell
    val rows =
      Seq.fill(20)(("en", "s1")) ++ Seq.fill(10)(("en", "s2")) ++
        Seq.fill(40)(("de", "s1")) ++ Seq.fill(20)(("de", "s2"))
    rows.zipWithIndex.map { case ((l, src), i) =>
      (i.toLong, s"doc $i", l, src, 10L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = ExtensionQueries46.q232_lang_source_chisq(spark, dir).collect()
    assert(out.length == 4)
    out.foreach(r => assert(r.getLong(3) == 0L, s"cell $r"))
  }

  test("q232: a dependent table concentrates chi-square in the skewed cells") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q232b").toString
    // en only in s1, de only in s2 -> maximal dependence
    val rows = Seq.fill(30)(("en", "s1")) ++ Seq.fill(30)(("de", "s2"))
    rows.zipWithIndex.map { case ((l, src), i) =>
      (i.toLong, s"doc $i", l, src, 10L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = ExtensionQueries46.q232_lang_source_chisq(spark, dir).collect()
    // all four grid cells present (zero cells carry mass); each
    // contributes N/4 = 15 -> total 60e6 micro = N (Cramer's phi = 1)
    assert(out.length == 4)
    assert(out.map(_.getLong(3)).sum == 60000000L)
  }

  // --------------------------------------- q233 codec advisor

  test("q233: run count matches a driver-side scan in key order") {
    val out = ExtensionQueries46.q233_codec_advisor(spark, sfTiny).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(5)))).toMap
    val rows = graft.core.Tables.orders(spark, sfTiny)
      .select("o_orderkey", "o_orderpriority", "o_orderstatus")
      .collect().sortBy(_.getLong(0))
    def runs(get: org.apache.spark.sql.Row => String): Long =
      1L + rows.sliding(2).count {
        case Array(a, b) => get(a) != get(b)
        case _ => false
      }
    assert(out("o_orderpriority")._3 == runs(_.getString(1)))
    assert(out("o_orderstatus")._3 == runs(_.getString(2)))
    out.values.foreach { case (n, ndv, nr, advice) =>
      assert(nr >= ndv.min(n) && nr <= n)
      assert(Set("RLE", "DICT", "PLAIN").contains(advice))
    }
  }
}
