package graft

import graft.queries.ExtensionQueries53

/** Property pins for the round-9 forty-first batch (cross-engine
  * equality is the DuckDB oracle's job — these assert operator
  * SEMANTICS: weight-vs-count divergence, gains monotonicity and
  * endpoints, prefix argmax ties).
  */
class ExtensionQueries53Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  // -------------------------------------------- q252 weighted median

  test("q252: heavy quantities pull the weighted median off the plain one") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q252").toString
    // 3 lines at $1/unit with qty 1; 2 lines at $9/unit with qty 100
    // plain median line price = $1; weighted (203 units, median unit
    // #102) = $9
    val rows = Seq((1L, 1.0, 1.0), (2L, 1.0, 1.0), (3L, 1.0, 1.0),
      (4L, 900.0, 100.0), (5L, 900.0, 100.0))
    rows.zipWithIndex.map { case ((o, price, qty), i) =>
      (o, i.toLong + 1, 1L, 1, qty, price, 0.0, 0.0, "N", "O",
        new java.sql.Timestamp(0L)) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = ExtensionQueries53.q252_weighted_median(spark, dir).collect()(0)
    // unit price micro: $1 -> 1_000_000? cents*1e4/qty: 100*1e4/1=1e6;
    // $900/100 units = $9/unit -> 90000*1e4/100 = 9e6
    assert(r.getLong(0) == 9000000L) // weighted median: $9/unit
    assert(r.getLong(1) == 1000000L) // plain median: the $1 line
    assert(r.getLong(2) == 203L && r.getLong(3) == 5L)
  }

  // -------------------------------------------- q253 gains curve

  test("q253: gains are monotone, end at exactly 1e6, and beat random on real data") {
    val out = ExtensionQueries53.q253_gains_curve(spark, sfTiny).collect()
      .sortBy(_.getLong(0))
    assert(out.length == 10)
    val gains = out.map(_.getLong(2))
    assert(gains.sorted.sameElements(gains))
    assert(gains.last == 1000000L)
    assert(out.map(_.getLong(3)).last == 1000000L)
    // cum buyers at 100% = all buyers
    val nb = graft.core.Tables.events(spark, sfTiny)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(out.last.getLong(1) == nb)
  }

  // -------------------------------------------- q254 completions

  test("q254: argmax completion with alphabetical tie-break and share accounting") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q254").toString
    // prefix 'app': apple x3, appla x3 (tie -> 'appla' < 'apple'),
    // appz x1; prefix 'zoo': zoom x2
    val text = (Seq.fill(3)("apple") ++ Seq.fill(3)("appla") ++
      Seq("appz") ++ Seq.fill(2)("zoom")).mkString(" ")
    Seq((1L, text, "en", "s", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = ExtensionQueries53.q254_prefix_completions(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(out("app") == (("appla", 3L, 7L, 428571L)))
    assert(out("zoo") == (("zoom", 2L, 2L, 1000000L)))
  }
}
