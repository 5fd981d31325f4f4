package graft

import org.apache.spark.sql.functions._
import graft.ops.{Aggregators, SkewJoin}

class OpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("salted join == plain join results under heavy key skew") {
    // 10k rows on one hot key + a spread of cold keys
    val big = (1 to 10000).map(i => (if (i <= 9000) "hot" else s"k${i % 50}", i.toLong))
      .toDF("k", "id")
    val small = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "label")
    val plain = big.join(small, Seq("k")).select("k", "id", "label")
      .collect().map(_.toString).sorted
    val salted = SkewJoin.saltedJoin(big, small, "k", col("id"), 8)
      .select("k", "id", "label").collect().map(_.toString).sorted
    assert(plain.length == salted.length && plain.sameElements(salted))
  }

  test("salted left join preserves unmatched rows exactly once") {
    val big = Seq(("a", 1L), ("b", 2L), ("b", 3L)).toDF("k", "id")
    val small = Seq(("a", "A")).toDF("k", "label")
    val out = SkewJoin.saltedJoin(big, small, "k", col("id"), 4, "left")
      .collect().map(r => (r.getString(0), r.getLong(1), Option(r.getString(2))))
    assert(out.length == 3)
    assert(out.count(_._3.isEmpty) == 2) // both b rows survive once, unmatched
  }

  test("WeightedMean aggregator: neutral weights, merge-consistency across partitions") {
    val agg = new Aggregators.WeightedMean().toColumn
    // values with weights incl. zero weight (neutral 1.0)
    val data = Seq((2.0, 24000.0), (4.0, 6000.0), (3.0, 0.0))
    for (parts <- Seq(1, 2, 3)) { // partition count must not change the result
      val ds = spark.createDataset(data).repartition(parts)
      val got = ds.select(agg).collect().head
      // (2*24000 + 4*6000 + 3*1) / (24000+6000+1)
      val expect = (2.0 * 24000 + 4.0 * 6000 + 3.0) / 30001.0
      assert(got.contains(expect), s"parts=$parts got=$got")
    }
    // empty input → None, mirrors null-on-zero-weight semantics
    assert(spark.createDataset(Seq.empty[(Double, Double)]).select(agg)
      .collect().head.isEmpty)
  }

  test("approx_count_distinct stays within its error bound (exact pinned by q36)") {
    val li = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.05).as("approx")).collect().head
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.15,
      s"approx=$approx exact=$exact")
  }

  test("as-of backward: null payload fields are not torn from older rows; null right times never match") {
    import graft.ops.AsofJoin
    val left = Seq((1L, 6L), (1L, 0L)).toDF("k", "t")
    val right = Seq((1L, Some(1L), Some("A"), "x"), (1L, Some(5L), None, "y"),
      (1L, Option.empty[Long], Some("Z"), "null-time")).toDF("k", "rt", "p", "q")
    val out = AsofJoin.backward(left, right, "k", "t", "rt", Seq("p", "q"))
      .collect().map(r => r.getLong(1) -> (Option(r.getString(2)), Option(r.getString(3)))).toMap
    // t=6 matches rt=5 whose p IS null: p must stay null (no fill from rt=1),
    // q comes from the same rt=5 row — never a torn combination
    assert(out(6L) == (None, Some("y")))
    // t=0 precedes every valid right row; the null-rt row must not match
    assert(out(0L) == (None, None))
  }

  test("salted join rejects right/full join types") {
    val big = Seq(("a", 1L)).toDF("k", "id")
    val small = Seq(("a", "A")).toDF("k", "label")
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(big, small, "k", col("id"), 4, "full")
    }
  }
}
