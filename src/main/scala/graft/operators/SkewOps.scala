package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys at 100TB scale. AQE's skew-join splitting
  * handles joins; these helpers cover the aggregation and join cases where
  * explicit salting is still the right tool (e.g. one key holding >10% of
  * all rows, which no partition split fixes for a groupBy).
  */
object SkewOps {

  /** Two-phase salted aggregation: groupBy(key, salt) computes partials on
    * `saltBuckets` sub-keys, then a second tiny groupBy(key) merges them.
    * Caller supplies per-phase aggregates (they must be decomposable —
    * sum/count/min/max — exactly the combiner-compatible set the reference's
    * aggregators were). */
  def saltedAgg(
      df: DataFrame,
      key: Column,
      saltBuckets: Int,
      partials: Seq[Column],
      finals: Seq[Column]): DataFrame = {
    val salted = df
      .withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets.toLong)))
      .groupBy(key.as("key"), col("_salt"))
      .agg(partials.head, partials.tail: _*)
    salted.groupBy("key").agg(finals.head, finals.tail: _*)
  }

  /** Salted sum/count/min/max convenience: the common case. */
  def saltedStats(df: DataFrame, key: Column, value: Column,
      saltBuckets: Int = 64): DataFrame =
    saltedAgg(df, key, saltBuckets,
      partials = Seq(
        // precision 18 keeps Decimal long-backed (see AggOps numeric policy);
        // the partial-sum result type widens to (28,6) so merging is exact
        sum(value.cast("decimal(18,6)")).as("p_sum"),
        count(lit(1)).as("p_cnt"),
        min(value).as("p_min"),
        max(value).as("p_max")),
      finals = Seq(
        sum(col("p_sum")).cast("double").as("sum_value"),
        sum(col("p_cnt")).as("cnt"),
        min(col("p_min")).as("min_value"),
        max(col("p_max")).as("max_value")))

  /** Broadcast-salt join for a skewed LEFT side against a small-ish right
    * side: replicate each right row `saltBuckets` times instead of shuffling
    * the skewed left — the classic hot-key join fix when the right side is
    * too big for a plain broadcast threshold but small enough to replicate. */
  def saltedJoin(
      skewedLeft: DataFrame, right: DataFrame, key: String,
      saltBuckets: Int = 16): DataFrame = {
    val saltedLeft = skewedLeft.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)))
    val replicatedRight = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "_salt")).drop("_salt")
  }
}
