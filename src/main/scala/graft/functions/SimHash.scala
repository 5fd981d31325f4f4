package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** SimHash-48 over a pre-hashed token array (array<long>): bit j of each
  * hash votes ±1; output bit j is set iff the vote sum is positive.
  *
  * Semantics identical to the expression-combinator form
  * (Dedup.simhashFromHashes) and its DuckDB oracle mirror; this native
  * version replaces 48 interpreted lambda passes per row with one generated
  * Java loop (~20× on the simhash benchmark query).
  */
case class SimHash48(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash48"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash48 requires array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Long](48)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var j = 0
        while (j < 48) {
          votes(j) += (if (((h >> j) & 1L) != 0L) 1L else -1L)
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 48) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |long[] $votes = new long[48];
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  if (!$c.isNullAt($i)) {
         |    long $h = $c.getLong($i);
         |    for (int $j = 0; $j < 48; $j++) {
         |      $votes[$j] += ((($h >> $j) & 1L) != 0L) ? 1L : -1L;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < 48; $j++) {
         |  if ($votes[$j] > 0) $out |= (1L << $j);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash48 =
    copy(child = newChild)
}

object SimHash48 {
  /** Column API: simhash48 of an array<long> of token hashes. */
  def simhash48(hashes: Column): Column =
    ColumnBridge.column(SimHash48(ColumnBridge.expression(hashes)))
}
