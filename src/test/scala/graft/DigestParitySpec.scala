package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Cross-language digest contract (ADVICE r14): Verify.digestRendered and
  * tools/check_oracle.py digest_rows must produce the SAME sha256 for the
  * same rows. Two historical divergence classes are pinned here against a
  * shared fixed vector (check_oracle.py PARITY_ROWS / `--selftest`):
  *
  *  1. ROW SORT ORDER — Java's natural String sort is UTF-16 code-unit
  *     order, Python's is code-point order; they DISAGREE on the relative
  *     order of supplementary-plane chars (U+1F600, surrogates 0xD83D..)
  *     vs BMP chars in U+E000..U+FFFF. UTF-8 byte order (what both sides
  *     now sort by) equals code-point order, so Python is unchanged and
  *     Java moved to match.
  *  2. NaN BITS — Double.doubleToLongBits canonicalizes every NaN to
  *     0x7ff8000000000000 while Python's struct.pack preserves payload
  *     bits; canon_cell now canonicalizes too.
  *
  * The pinned constant below is the output of
  * `python3 tools/check_oracle.py --selftest` — if either side's
  * canonicalization drifts, exactly one of (this spec, the selftest)
  * changes and the mismatch is caught.
  */
class DigestParitySpec extends SparkSpecBase {

  // mirror of check_oracle.py PARITY_ROWS, columns (a_s, b_i, c_d) —
  // a_s sorts first so the ROW order is decided by the string cell.
  private val rows: Seq[(String, Long, Double)] = Seq(
    ("😀 grin", 1L, 1.5),              // U+1F600 (supplementary)
    ("\ue000 private", 2L, Double.NaN),          // U+E000 (BMP private-use)
    ("ascii", 3L, -0.0),
    (null, 4L, 2.0))

  private val pythonDigest =
    "b2e80a96cee84df18aab5c8005bce3a9b53140e59dcf98472343c472214a72d0"

  private def rendered: Array[String] = rows.toArray.map { case (s, i, d) =>
    Seq(Verify.canonCell(s), Verify.canonCell(i), Verify.canonCell(d))
      .mkString("\u001f")
  }

  test("Scala digest of the parity vector equals the Python selftest constant") {
    val (h, n) = Verify.digestRendered(rendered)
    assert(n == 4L)
    assert(h == pythonDigest)
  }

  test("the vector actually exercises the UTF-16-vs-UTF-8 order divergence") {
    // the OLD implementation (natural String sort) must produce a
    // DIFFERENT digest — i.e. the emoji row really does sort on opposite
    // sides of the U+E000 row under the two orderings.
    val r = rendered.clone().asInstanceOf[Array[Object]]
    java.util.Arrays.sort(r)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    r.foreach { s =>
      md.update(s.asInstanceOf[String].getBytes("UTF-8")); md.update('\n'.toByte)
    }
    val old = md.digest().map(b => f"$b%02x").mkString
    assert(old != pythonDigest,
      "UTF-16 string sort agreed with byte sort — vector no longer covers the class")
  }

  test("canonCell canonicalizes non-canonical NaN payloads") {
    val weirdNan = java.lang.Double.longBitsToDouble(0x7ff8000000000001L)
    assert(weirdNan.isNaN)
    assert(Verify.canonCell(weirdNan) == "f:7ff8000000000000")
    assert(Verify.canonCell(Double.NaN) == "f:7ff8000000000000")
    // Float NaN routes through toDouble to the same canonical form
    assert(Verify.canonCell(Float.NaN) == "f:7ff8000000000000")
  }

  test("digest via DataFrame path matches digestRendered on the same cells") {
    val schema = StructType(Seq(
      StructField("a_s", StringType), StructField("b_i", LongType),
      StructField("c_d", DoubleType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), 2),
      schema)
    val (h, n) = Verify.digest(df)
    assert((h, n) == (pythonDigest, 4L))
  }

  test("stableSorted falls back to the unsorted frame for unorderable columns") {
    val df = spark.range(3).select(map(col("id"), col("id")).as("m"), col("id"))
    val out = Verify.stableSorted(df, "unorderable_test")
    // must NOT throw, and must still return all rows
    assert(out.count() == 3L)
    // an orderable frame gets the deterministic all-column sort
    val ordered = Verify.stableSorted(
      spark.range(5).select((lit(4) - col("id")).as("v")), "orderable_test")
    assert(ordered.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
  }
}
