package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY §4.4 / build brief "salting for
  * skew"): when one join key carries a disproportionate share of the big
  * side, a plain shuffle join lands that key on ONE reducer. Salting
  * splits each big-side key into `n` synthetic sub-keys and replicates the
  * small side n× — the hot key fans out over n reducers.
  *
  * AQE's skew-join split handles sort-merge skew automatically when stats
  * reveal it at runtime; explicit salting remains the tool when the skew is
  * known ahead (e.g. null-heavy or power-law keys) or when AQE's split
  * thresholds don't trigger. Salt derivation is deterministic (hash of a
  * disambiguating column), keeping plans replayable.
  */
object SkewJoin {

  /** Inner/left salted equi-join of `big` (skewed) with `small`.
    *
    * @param saltFrom a big-side column with enough entropy to spread rows
    *                 (any unique-ish id; NOT the join key)
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFrom: Column, n: Int, joinType: String = "inner"): DataFrame = {
    require(n > 0)
    // right/full joins are NOT salting-compatible: unmatched small-side
    // rows would surface once per salt copy
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"saltedJoin supports inner/left joins only, got $joinType")
    val bigSalted = big.withColumn("__salt", pmod(xxhash64(saltFrom), lit(n)).cast("int"))
    val smallExploded = small
      .withColumn("__salt", explode(sequence(lit(0), lit(n - 1))))
    val out = bigSalted.join(smallExploded, Seq(key, "__salt"), joinType)
    out.drop("__salt")
  }
}
