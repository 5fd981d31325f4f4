package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries86

/** Semantics pins for the write-plan/outlier/self-audit batch
  * (q350-q352).
  */
class ExtensionQueries86Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q350: file counts and rows-per-file are the exact ceil arithmetic") {
    val t = 128L * 1024 * 1024
    val g = graft.core.Tables.documents(spark, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("b")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = ExtensionQueries86.q350_write_layout_plan(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    g.foreach { case (lang, (n, b)) =>
      val files = (b + t - 1) / t
      assert(rows(lang) == ((n, b, files, (n + files - 1) / files)), lang)
    }
    // every plan respects the target: bytes per file <= target
    rows.values.foreach { case (_, b, files, _) => assert(b <= files * t) }
  }

  test("q351: the census equals a driver recompute of centi-z-squares") {
    val xs = graft.core.Tables.lineitem(spark, dir)
      .select(round(col("l_extendedprice") * 100).cast("long"),
        col("l_quantity").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = BigInt(xs.length)
    val (sx, sy) = (BigInt(xs.map(_._1).sum), BigInt(xs.map(_._2).sum))
    val sxx = xs.map(v => BigInt(v._1) * v._1).sum
    val syy = xs.map(v => BigInt(v._2) * v._2).sum
    val (dx, dy) = (n * sxx - sx * sx, n * syy - sy * sy)
    def z2c(v: Long, s: BigInt, d: BigInt): Long = {
      val u = n * v - s; ((u * u * 100) / d).toLong
    }
    val zs = xs.map { case (x, y) => (z2c(x, sx, dx), z2c(y, sy, dy)) }
    val row = ExtensionQueries86.q351_bivariate_outliers(spark, dir)
      .collect().head
    assert(row.getLong(0) == xs.length.toLong)
    assert(row.getLong(1) == zs.count(_._1 > 900).toLong)
    assert(row.getLong(2) == zs.count(_._2 > 900).toLong)
    assert(row.getLong(3) == zs.count(z => z._1 + z._2 > 900).toLong)
    assert(row.getLong(3) >= row.getLong(1) && row.getLong(3) >= row.getLong(2),
      "the joint census dominates each marginal one")
  }

  test("q352: headroom equals the driver bit arithmetic and flags nothing at sf0.001") {
    val rows = ExtensionQueries86.q352_overflow_headroom(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(rows.keySet == Set("l_extendedprice", "l_discount", "l_tax",
      "l_quantity"))
    rows.values.foreach { case (sumAbs, bits, headroom) =>
      assert(bits == java.lang.Long.toBinaryString(sumAbs).length.toLong)
      assert(headroom == 63L - bits)
      assert(headroom > 20L, "tiny SF must leave ample headroom")
    }
  }
}
