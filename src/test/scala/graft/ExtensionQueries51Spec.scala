package graft

import graft.queries.ExtensionQueries51

/** Property pins for the round-9 thirty-ninth batch (cross-engine
  * equality is the DuckDB oracle's job — these assert operator
  * SEMANTICS: tier accounting, spread identities, drift vs a
  * driver-side Jaccard recount).
  */
class ExtensionQueries51Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  // ------------------------------------------ q246 diversity tiers

  test("q246: tiers partition parts and revenue exactly") {
    import org.apache.spark.sql.functions._
    val out = ExtensionQueries51.q246_single_source_risk(spark, sfTiny)
      .collect()
    assert(out.nonEmpty)
    val nParts = graft.core.Tables.lineitem(spark, sfTiny)
      .select("l_partkey").distinct().count()
    assert(out.map(_.getLong(1)).sum == nParts)
    val shareSum = out.map(_.getLong(3)).sum
    assert(shareSum > 1000000L - out.length && shareSum <= 1000000L)
  }

  test("q246: planted thin-supply part lands in tier 1 with its revenue") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q246").toString
    // part 1: one supplier, $10; part 2: 10 suppliers, $20 total
    val rows = (1 to 1).map(i => (100L + i, 1L, 7L, 10.0)) ++
      (1 to 10).map(i => (200L + i, 2L, i.toLong, 2.0))
    rows.map { case (o, p, sup, price) =>
      (o, p, sup, 1, 1.0, price, 0.0, 0.0, "N", "O",
        new java.sql.Timestamp(0L)) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = ExtensionQueries51.q246_single_source_risk(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out(1L) == ((1L, 1000L)))  // LOW tier: part 1, $10
    assert(out(2L) == ((1L, 2000L)))  // MID tier: part 2, $20
  }

  // ------------------------------------------ q247 price spread

  test("q247: spread identity and ordering on real data") {
    val out = ExtensionQueries51.q247_price_dispersion(spark, sfTiny)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3))
      assert(r.getLong(4) == (r.getLong(3) - r.getLong(2)) * 1000000L / r.getLong(2))
      assert(r.getLong(1) >= 5L)
    }
    val spreads = out.map(_.getLong(4))
    assert(spreads.reverse.sorted.sameElements(spreads.reverse))
  }

  // ------------------------------------------ q248 cluster drift

  test("q248: min/max pairwise Jaccard matches a driver-side recount") {
    import org.apache.spark.sql.functions._
    val out = ExtensionQueries51.q248_cluster_drift(spark, sfTiny).collect()
    assert(out.nonEmpty)
    // recount for every >=3 cluster from raw texts
    val lbl = graft.queries.ExtensionQueries2
      .q42_dedup_clusters(spark, sfTiny).collect()
      .map(r => r.getLong(0) -> r.getLong(1)) // (id, rep)
    val bigReps = lbl.groupBy(_._2).filter(_._2.length >= 3).keySet
    val texts = graft.queries.ExtensionQueries2.q42Corpus(spark, sfTiny)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingles(id: Long): Set[String] = {
      val t = texts(id).split(" ", -1)
      if (t.length < 3) Set.empty
      else t.sliding(3).map(_.mkString(" ")).toSet
    }
    val got = out.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
      r.getLong(3)))).toMap
    assert(got.keySet == bigReps)
    got.foreach { case (rep, (nPairs, mn, mx)) =>
      val ids = lbl.filter(_._2 == rep).map(_._1)
        .filter(id => shingles(id).nonEmpty).sorted
      val js = for {
        i <- ids.indices; j <- ids.indices if i < j
      } yield {
        val (a, b) = (shingles(ids(i)), shingles(ids(j)))
        a.intersect(b).size.toLong * 1000000L / a.union(b).size
      }
      assert(nPairs == js.length, s"pairs for $rep")
      assert(mn == js.min && mx == js.max, s"bounds for $rep")
    }
  }
}
