package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen bloom-filter membership probe over a long key.
  *
  * This is the executor half of a semi-join pre-filter: the driver builds
  * a [[BloomFilter]] over the build side's join keys (a bounded sketch —
  * `DataFrame.stat.bloomFilter` merges per-partition filters by bitwise
  * OR, so the result is partitioning-independent), and this expression
  * rides the probe side's scan, discarding the ~1-fpp complement of rows
  * BEFORE they reach the join's shuffle/broadcast. At 100 TB the filter is
  * the difference between shuffling the full fact table and shuffling the
  * few percent that can possibly match; the exact join downstream removes
  * the false positives, so the final result is byte-identical to the
  * unfiltered plan (which is what the q78 oracle checks).
  *
  * The filter object is attached to the generated class as a reference
  * object (`addReferenceObj`) — deserialized once per task, probed with
  * `mightContainLong` per row, no boxing, no UDF dispatch.
  */
case class BloomMightContain(child: Expression, filter: BloomFilter)
  extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain requires bigint, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  def mightContainLong(key: Column, filter: BloomFilter): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(key), filter))
}
