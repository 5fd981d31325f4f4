package graft

import graft.plans.Lineage

/** Column-level lineage: golden mappings on hand-checked queries, the
  * structural rules (joins union tables, literals map empty, CTEs and
  * generators resolve), and a fleet-wide sweep proving the walker
  * handles every registered query's analyzed plan.
  */
class LineageSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  private def lin(q: String): Map[String, Set[(String, String)]] =
    Lineage.columnLineage(SparkEntry.queries(q)(spark, sf)).toMap

  test("q01 golden: aggregate columns trace to exactly their lineitem inputs") {
    val l = lin("q01_pricing_summary")
    assert(l("l_returnflag") == Set("lineitem" -> "l_returnflag"))
    assert(l("sum_qty") == Set("lineitem" -> "l_quantity"))
    assert(l("sum_disc_price") ==
      Set("lineitem" -> "l_extendedprice", "lineitem" -> "l_discount"))
    // count(*) consumes no column VALUES — value lineage is empty
    assert(l("count_order") == Set.empty)
  }

  test("q06 golden: the 3-table spine join attributes each column to its table") {
    val l = lin("q06_spine_join3")
    assert(l("o_orderkey") == Set("orders" -> "o_orderkey"))
    assert(l("qty") == Set("lineitem" -> "l_quantity"))
    assert(l("c_mktsegment") == Set("customer" -> "c_mktsegment"))
    val tables = l.values.flatten.map(_._1).toSet
    assert(tables == Set("orders", "lineitem", "customer"))
  }

  test("generators and recursive CTEs resolve through the walker") {
    // q105: explode(split(text)) — generator output must trace to text
    val toks = graft.core.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.col("text"), " ")).as("tok"))
    val lt = Lineage.columnLineage(toks).toMap
    assert(lt("tok") == Set("documents" -> "text"))
    assert(lt("doc_id") == Set("documents" -> "doc_id"))
    // q314 runs a recursive CTE (WithCTE / CTERelationRef path)
    val l = lin("q314_recursive_hierarchy")
    assert(l.nonEmpty && l.values.exists(_.nonEmpty),
      s"recursive CTE lineage came back empty: $l")
  }

  test("fleet sweep: lineage computes for every registered query and covers every table") {
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, build) =>
      val out = try Right(Lineage.columnLineage(build(spark, sf)))
      catch { case e: Throwable => Left(s"$name: ${e.toString.linesIterator.next()}") }
      name -> out
    }
    val failures = results.collect { case (_, Left(err)) => err }
    assert(failures.isEmpty, s"\n${failures.size} lineage failures:\n${failures.mkString("\n")}")
    val all = results.collect { case (_, Right(l)) => l }
    // column names line up with the frame's schema for every query
    // (columnLineage returns one entry per output column, in order)
    val sourced = all.count(_.exists(_._2.nonEmpty))
    assert(sourced * 10 >= all.size * 9,
      s"only $sourced/${all.size} queries have any sourced column")
    val tables = all.flatMap(_.flatMap(_._2.map(_._1))).toSet
    for (t <- Seq("lineitem", "orders", "customer", "part", "supplier",
        "nation", "region", "events", "documents", "embeddings"))
      assert(tables.contains(t), s"no query's lineage reached table $t (saw $tables)")
  }
}
