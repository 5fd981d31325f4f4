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

  test("expand: rollup/cube grouping columns keep their lineage (r13 advisory)") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, sf)
    val l = Lineage.columnLineage(
      docs.rollup(col("lang")).agg(sum(col("n_chars")).as("s"))).toMap
    assert(l("lang") == Set("documents" -> "lang"))
    assert(l("s") == Set("documents" -> "n_chars"))
    val lc = Lineage.columnLineage(
      docs.cube(col("lang"), col("source")).agg(count(lit(1)).as("n"))).toMap
    assert(lc("lang") == Set("documents" -> "lang"))
    assert(lc("source") == Set("documents" -> "source"))
    assert(lc("n") == Set.empty) // count(*): no column VALUES
  }

  test("uncorrelated scalar/IN subquery sources surface in the consuming column (r13 advisory)") {
    graft.core.Tables.documents(spark, sf).createOrReplaceTempView("lin_docs")
    graft.core.Tables.part(spark, sf).createOrReplaceTempView("lin_part")
    val l = Lineage.columnLineage(spark.sql(
      "SELECT doc_id + (SELECT max(p_partkey) FROM lin_part) AS x FROM lin_docs")).toMap
    assert(l("x") == Set("documents" -> "doc_id", "part" -> "p_partkey"),
      s"scalar subquery source dropped: ${l("x")}")
    // IN-subquery in a FILTER is control, not value
    val df = spark.sql(
      "SELECT doc_id FROM lin_docs WHERE source IN (SELECT p_brand FROM lin_part)")
    assert(Lineage.columnLineage(df).toMap.apply("doc_id") == Set("documents" -> "doc_id"))
    val ctl = Lineage.controlSources(df)
    assert(ctl.contains("documents" -> "source") && ctl.contains("part" -> "p_brand"),
      s"predicate subquery missing from control set: $ctl")
  }

  test("set ops: Intersect merges both sides positionally; Except is left-value, right-control") {
    import org.apache.spark.sql.functions._
    val a = graft.core.Tables.documents(spark, sf).select(col("lang"))
    val b = graft.core.Tables.part(spark, sf).select(col("p_brand"))
    val li = Lineage.columnLineage(a.intersect(b)).toMap
    assert(li("lang") == Set("documents" -> "lang", "part" -> "p_brand"),
      s"Intersect lost the right side: $li")
    val ex = a.except(b)
    assert(Lineage.columnLineage(ex).toMap.apply("lang") == Set("documents" -> "lang"))
    assert(Lineage.controlSources(ex).contains("part" -> "p_brand"))
  }

  test("control lineage: q313's quasi-identifier is invisible to value lineage, visible to control") {
    val df = SparkEntry.queries("q313_k_anonymity")(spark, sf)
    // value: the k-anonymity histogram is all counts — (near-)empty
    val value = Lineage.columnLineage(df).toMap
    assert(value("n_groups") == Set.empty)
    // control: the grouping keys ARE the quasi-identifier under review
    val ctl = Lineage.controlSources(df)
    for (c <- Seq("lang", "source", "n_chars"))
      assert(ctl.contains("documents" -> c), s"control set missing documents.$c: $ctl")
    // columnLineage(_, true) unions the control set into every column
    val both = Lineage.columnLineage(df, includeControl = true).toMap
    assert(both("n_groups").contains("documents" -> "lang"))
  }

  test("control lineage: a filter column dropped from the output still registers (PII scoping)") {
    import org.apache.spark.sql.functions._
    val df = graft.core.Tables.customer(spark, sf)
      .filter(col("c_acctbal") > 0).select(col("c_name"))
    assert(Lineage.columnLineage(df).toMap.apply("c_name") == Set("customer" -> "c_name"))
    assert(Lineage.controlSources(df) == Set("customer" -> "c_acctbal"))
    // the PII queries themselves: q311's per-source rollup touches source
    val pii = Lineage.controlSources(SparkEntry.queries("q311_pii_detect")(spark, sf))
    assert(pii.contains("documents" -> "source"), s"q311 control: $pii")
    // q335's subject-access export: the plan certifies which columns
    // SELECT the subject (the user_id filter + grouping), so the export's
    // column footprint is value lineage ∪ this set — no hand-audit
    val df335 = SparkEntry.queries("q335_subject_access_export")(spark, sf)
    val ctl335 = Lineage.controlSources(df335)
    assert(ctl335.contains("events" -> "user_id"), s"q335 control: $ctl335")
    val val335 = Lineage.columnLineage(df335).toMap
    assert(val335("history_md5").contains("events" -> "event_type"))
  }

  test("fleet sweep: lineage computes for every registered query and covers every table") {
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, build) =>
      val out = try {
        val df = build(spark, sf)
        Lineage.controlSources(df) // control walk must not throw either
        Right(Lineage.columnLineage(df))
      }
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
