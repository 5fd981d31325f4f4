package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2D Pareto front (skyline): rows where no other row is both strictly
  * lower on `x` AND at-least-as-high on `y` — "no part is both cheaper
  * and larger". The naive spelling is an O(n²) dominance self-join; the
  * textbook 2D answer is sort-by-x + running-max-of-y, but the obvious
  * window (`ORDER BY x` with no partition) funnels the table through one
  * reducer. This operator is the SCALABLE spelling — the same two-phase
  * shape as [[DenseIds]]:
  *
  *  1. range-repartition + sort by x (equal x co-locate, so partition
  *     p's rows are strictly cheaper than p+1's);
  *  2. per-partition y-maxima (one tiny aggregate) prefix-max on the
  *     driver → each partition learns the best y among ALL
  *     strictly-cheaper partitions;
  *  3. within each partition, a __pid-partitioned RANGE window computes
  *     the running best among strictly-cheaper local rows (RANGE, not
  *     ROWS: x-ties are mutually non-dominating);
  *  4. survive if y beats both bests. All partitions work in parallel;
  *     nothing global but the ≤nPartitions driver fold.
  *
  * localCheckpoint pins one range-partitioning (sampled boundaries would
  * otherwise shift under recompute and stale the prefix maxima — the
  * DenseIds lesson).
  */
object Skyline {

  def front2D(df: DataFrame, x: Column, y: Column,
      nPartitions: Int = 16): DataFrame = {
    // Integral x and y are a PRECONDITION, enforced here (round-5 ADVICE):
    // strictness on x is implemented as RANGE ... -1 (i.e. "x ≤ cur − 1"),
    // which with fractional x would exclude a row only 0.5 cheaper from
    // the running max and let dominated rows survive; fractional y would
    // silently truncate under the long cast. Fractional inputs should be
    // scaled to integers first (cents, micros — the repo-wide contract).
    val probe = df.withColumn("__x", x).withColumn("__y", y)
    val integral = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
    for (c <- Seq("__x", "__y")) {
      val dt = probe.schema(c).dataType
      require(integral(dt),
        s"front2D requires integral ${if (c == "__x") "x" else "y"} (got $dt): " +
          "scale fractional dimensions to integers (e.g. cents) first")
    }
    val sorted = probe
      .withColumn("__y", col("__y").cast("long"))
      .repartitionByRange(nPartitions, col("__x"))
      .sortWithinPartitions(col("__x"))
      .withColumn("__pid", spark_partition_id())
      .transform(graft.core.Ckpt.eager)
    val maxima = sorted.groupBy(col("__pid")).agg(max(col("__y")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    // prefix max over strictly-earlier partitions (range partitioning
    // co-locates equal x, so earlier partitions are strictly cheaper)
    val prefix = maxima.scanLeft((0, Option.empty[Long])) {
      case ((_, acc), (pid, m)) => (pid, Some(acc.fold(m)(math.max(_, m))))
    }
    // prefix maxima return as a broadcast-joined (pid, best) frame, not a
    // folded when()-chain — the chain is O(nPartitions) deep and stresses
    // codegen at thousands of range partitions (round-5 ADVICE; same fix
    // as DenseIds). Left join: the first partition has no cheaper
    // predecessor and keeps a null prefix.
    val prefixOf = prefix.sliding(2).collect {
      case Array((_, before), (pid, _)) if before.isDefined => pid -> before.get
    }.toSeq
    val spark = df.sparkSession
    val prefixDf = spark.createDataFrame(prefixOf).toDF("__pid", "__pfx")
    val w = Window.partitionBy(col("__pid")).orderBy(col("__x"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val best = greatest(max(col("__y")).over(w), col("__pfx"))
    sorted.join(broadcast(prefixDf), Seq("__pid"), "left")
      .withColumn("__best", best)
      .filter(col("__best").isNull || col("__y") > col("__best"))
      .drop("__x", "__y", "__pid", "__pfx", "__best")
  }
}
