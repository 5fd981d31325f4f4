package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries78

/** Semantics pins for the mixture/scripting/schema-evolution batch
  * (q326-q328).
  */
class ExtensionQueries78Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q326: temperature mixture equals the driver recompute; sqrt flattens shares") {
    val counts = graft.core.Tables.documents(spark, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = counts.view.mapValues(n => math.sqrt(n.toDouble * 1000000).toLong).toMap
    val (nTot, wTot) = (counts.values.sum, w.values.sum)
    val rows = ExtensionQueries78.q326_temperature_mixture(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    rows.foreach { case (lang, (n, nat, temp, up)) =>
      assert(n == counts(lang))
      assert(nat == n * 1000000L / nTot)
      assert(temp == w(lang) * 1000000L / wTot)
      assert(up == temp * 1000L / nat)
    }
    // T=2 moves every share toward uniform: the smallest language gains,
    // the largest loses
    val smallest = counts.minBy(c => (c._2, c._1))._1
    val largest = counts.maxBy(c => (c._2, c._1))._1
    if (counts(smallest) != counts(largest)) {
      assert(rows(smallest)._4 > 1000L, "low-resource language must upsample")
      assert(rows(largest)._4 < 1000L, "high-resource language must downsample")
    }
  }

  test("q327: the scripted schedule equals the driver loop") {
    val sched = scala.collection.mutable.ArrayBuffer((0L, 10000L))
    var (m, b) = (0L, 10000L)
    while (b < 20000) { m += 1; b = b + b * 5 / 100; sched += ((m, b)) }
    val rows = ExtensionQueries78.q327_sql_scripting(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == sched.toSeq)
    assert(rows.last._2 >= 20000L && rows.init.forall(_._2 < 20000L))
  }

  test("q328: union-by-name conserves rows and nulls land where columns are missing") {
    val d = graft.core.Tables.documents(spark, dir)
    val nEven = d.filter(col("doc_id") % 2 === 0).count()
    val nOdd = d.filter(col("doc_id") % 2 === 1).count()
    val rows = ExtensionQueries78.q328_union_by_name(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.values.map(_._1).sum == nEven + nOdd, "row conservation")
    // generation B carries no lang -> all its rows land in <missing>,
    // with zero chars (its n_chars is null-coalesced) and null source=0
    assert(rows("<missing>") == ((nOdd, 0L, 0L)))
    // generation A rows all have a null source
    rows.filter(_._1 != "<missing>").values.foreach { case (nr, nullSrc, _) =>
      assert(nr == nullSrc, "every gen-A row lacks source")
    }
  }
}
