package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Poly-hashes of all k-token shingles of a space-separated text, as one
  * generated pass over the raw bytes — no token arrays, no shingle string
  * allocation.
  *
  * Key identity: tokens joined by single spaces mean every k-token shingle
  * IS a contiguous byte span of the original text, so
  * `polyhash(concat_ws(" ", slice(tokens, i, k)))` equals the poly fold over
  * span [start_i, end_{i+k-1}] — including the degenerate multi-space cases,
  * because Spark's split+concat_ws round-trips empty tokens byte-exactly.
  *
  * Output order = shingle position order, duplicates kept (MinHash minima
  * and band folds over minima are multiset-insensitive; see Dedup scaladoc).
  * Bit-identical to the expression-combinator form and the DuckDB oracle
  * mirrors; ~10× on the minhash benchmark queries.
  */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes requires a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    new GenericArrayData(ShingleHashes.hashSpans(bytes, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val out = ctx.freshName("out")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long[] $out = graft.functions.ShingleHashes.hashSpans($bytes, $k);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  /** Token starts are 0 and every position after a space; token i's span
    * with token i+k-1 covers [starts(i), ends(i+k-1)). One tight loop per
    * shingle; shared by interpreted eval and generated code.
    */
  def hashSpans(bytes: Array[Byte], k: Int): Array[Long] = {
    var nTokens = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nTokens += 1; i += 1 }
    val nShingles = nTokens - k + 1
    if (nShingles <= 0 || bytes.length == 0) return Array.emptyLongArray
    val starts = new Array[Int](nTokens)
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val out = new Array[Long](nShingles)
    var s = 0
    while (s < nShingles) {
      val from = starts(s)
      val until = if (s + k < nTokens) starts(s + k) - 1 else bytes.length
      var h = 0L
      var j = from
      while (j < until) {
        h = (h * 31L + (bytes(j) & 0xff)) % 1000000007L
        j += 1
      }
      out(s) = h
      s += 1
    }
    out
  }

  def shingleHashes(text: Column, k: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), k))
}
