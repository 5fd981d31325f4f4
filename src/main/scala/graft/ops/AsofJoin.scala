package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Backward as-of join — the classic time-series operator Spark lacks.
  *
  * Implemented with the union-and-fill technique: tag both inputs, union,
  * sort per key by (time, tag) so reference rows precede probe rows at equal
  * timestamps (inclusive match), and carry the latest reference payload
  * forward with last(ignoreNulls) over an unbounded-preceding frame.
  *
  * Scale: ONE shuffle on the join key (the union sorts within key
  * partitions) — no range cross-join, no per-probe scans; state is a single
  * carried row per key, so it survives arbitrarily large inputs. This is
  * preference-order (a) from the build brief: composed built-ins express the
  * semantics, so no custom SparkPlan is needed.
  */
object AsofJoin {

  /** For each left row, attach `payload` columns from the latest right row
    * with rightTime <= leftTime (per key). Unmatched → nulls.
    *
    * @param left      probe side (all its columns survive)
    * @param right     reference side
    * @param key       equi-key column name present on both sides
    * @param leftTime  probe event-time column (numeric/orderable)
    * @param rightTime reference event-time column
    * @param payload   right-side columns to attach (aliased as given)
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
      .select(Seq(col(key), col("__t"), col("__is_left")) ++
        leftCols.filterNot(_ == key).map(c => col(c)) ++
        Seq(lit(null).cast(structType(right, payload)).as("__p")): _*)
    // The matched row travels as ONE struct: filling payload columns
    // independently would tear values across different right rows whenever a
    // field is null. Null-timestamp right rows are excluded — a comparison
    // with NULL time never matches (ASOF semantics).
    val r = right
      .filter(col(rightTime).isNotNull)
      .withColumn("__t", col(rightTime))
      .withColumn("__is_left", lit(0))
      .select(Seq(col(key), col("__t"), col("__is_left")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).as(c)) ++
        Seq(struct(payload.map(col): _*).as("__p")): _*)
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .withColumn("__f", last(col("__p"), ignoreNulls = true).over(w))
    filled.filter(col("__is_left") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col("__f").getField(p).as(s"asof_$p")): _*)
  }

  private def structType(right: DataFrame, payload: Seq[String]) = {
    import org.apache.spark.sql.types.StructType
    StructType(payload.map(p => right.schema(p)))
  }

  /** Forward as-of: for each left row, the EARLIEST right row with
    * rightTime >= leftTime (per key). Implemented by running the backward
    * join over the negated time axis — a pure reduction, no second code
    * path to maintain.
    */
  def forward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val negL = left.withColumn(leftTime, -col(leftTime))
    val negR = right.withColumn(rightTime, -col(rightTime))
    val joined = backward(negL, negR, key, leftTime, rightTime, payload)
    val restored = joined.withColumn(leftTime, -col(leftTime))
    if (payload.contains(rightTime))
      restored.withColumn(s"asof_$rightTime", -col(s"asof_$rightTime"))
    else restored
  }
}
