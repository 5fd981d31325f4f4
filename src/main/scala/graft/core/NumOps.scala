package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric coercion helpers mirroring the reference's robust parsers
  * (SURVEY §2 F2/F3/F5). All use try_cast: invalid input → null (the
  * pd.to_numeric(errors="coerce") contract), never an ANSI runtime error.
  */
object NumOps {

  /** `to_float` (`etl_merge.py:285-286`): coerce to double, garbage → null. */
  def toDouble(c: Column): Column = c.try_cast("double")

  /** `to_float_nocomma` (`etl_merge.py:291-293`): strip thousands separators
    * and whitespace first.
    */
  def toDoubleNoComma(c: Column): Column =
    trim(regexp_replace(c, ",", "")).try_cast("double")

  /** `to_int` (`etl_merge.py:288-289`): numeric coerce → nullable long.
    * pandas raises on non-integral floats (pinned integral-input contract,
    * SURVEY §2 F5); we truncate like SQL — deviation documented there.
    */
  def toLong(c: Column): Column = c.try_cast("double").try_cast("long")
}
