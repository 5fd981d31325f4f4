package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries119

/** Driver-model pins for q440-q442 (lag-1 autocorrelation, degree
  * assortativity, clustering): recomputed from collected sf0.001 rows
  * with BigInt arithmetic and the same truncation conventions.
  */
class ExtensionQueries119Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  /** the shared co>=2 co-purchase edge set, built driver-side */
  private lazy val edges: Set[(Long, Long)] = {
    val lp = graft.core.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    lp.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    // NOTE: .filter(...).keySet, NOT .collect { case (e, xs) => e } — a
    // collect producing tuple keys on a Map RE-KEYS by e._1 and silently
    // collapses edges sharing an endpoint (the recurring Map-trap).
    }.toSeq.groupBy(identity).filter(_._2.size >= 2).keySet
  }

  private lazy val deg: Map[Long, Long] =
    edges.toSeq.flatMap { case (u, v) => Seq(u, v) }
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }

  test("q440: signed r2 equals the BigInt serial-correlation model") {
    val daily = graft.core.Tables.events(spark, dir)
      .groupBy(expr("ts div 1000 div 86400000000").as("day"))
      .agg(count(lit(1)).as("n_ev")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = daily.toSeq.flatMap { case (d, x) => daily.get(d + 1).map(y => (BigInt(x), BigInt(y))) }
    val n = BigInt(pairs.length)
    val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
    val sxy = pairs.map(p => p._1 * p._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val num = n * sxy - sx * sy
    val r2 = num.sign * num * num * 1000000 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    val row = ExtensionQueries119.q440_lag1_autocorrelation(spark, dir).collect().head
    assert(row.getAs[Long]("n_pairs") == pairs.length.toLong)
    assert(row.getAs[Long]("cov_num") == num.toLong)
    assert(row.getAs[Long]("r2_signed_ppm") == r2.toLong)
    assert(pairs.length >= 10, "expected a real daily series")
  }

  test("q441: assortativity equals the exact symmetrized-Pearson model") {
    val m = BigInt(edges.size)
    val sxyHalf = edges.toSeq.map { case (u, v) => BigInt(deg(u)) * deg(v) }.sum
    val sx = deg.values.map(d => BigInt(d) * d).sum
    val sxx = deg.values.map(d => BigInt(d) * d * d).sum
    val num = 2 * m * (2 * sxyHalf) - sx * sx
    val den = 2 * m * sxx - sx * sx
    val row = ExtensionQueries119.q441_degree_assortativity(spark, dir).collect().head
    assert(row.getAs[Long]("n_edges") == edges.size.toLong)
    assert(row.getAs[Long]("num") == num.toLong)
    assert(row.getAs[Long]("assortativity_ppm") == (num * 1000000 / den).toLong)
  }

  test("q442: clustering equals the brute adjacency-set model") {
    val nbrs = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    val triPerNode = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for ((a, b) <- edges; c <- nbrs(b) if b < c && edges((a, c))) {
      // a<b<c with (a,b),(b,c),(a,c) all edges
      triPerNode(a) += 1; triPerNode(b) += 1; triPerNode(c) += 1
    }
    val nodes2 = deg.filter(_._2 >= 2)
    val cSum = nodes2.map { case (n, d) =>
      BigInt(triPerNode(n)) * 2 * 1000000 / (BigInt(d) * (d - 1))
    }.sum
    val wedges = nodes2.values.map(d => BigInt(d) * (d - 1) / 2).sum
    // toSeq first: mapping a key-SET through triPerNode would dedupe
    // equal counts before the sum (the same Set/Map collapse family as
    // the edge-model note above)
    val t3 = nodes2.keys.toSeq.map(n => BigInt(triPerNode(n))).sum
    val row = ExtensionQueries119.q442_clustering_coefficient(spark, dir).collect().head
    assert(row.getAs[Long]("n_nodes") == nodes2.size.toLong)
    assert(row.getAs[Long]("n_triangles") == (t3 / 3).toLong)
    assert(row.getAs[Long]("n_wedges") == wedges.toLong)
    assert(row.getAs[Long]("avg_local_c_ppm") == (cSum / nodes2.size).toLong)
    assert(row.getAs[Long]("transitivity_ppm") == (t3 * 1000000 / wedges).toLong)
    assert(row.getAs[Long]("n_triangles") > 0L, "expected triangles in the co-purchase graph")
  }
}
