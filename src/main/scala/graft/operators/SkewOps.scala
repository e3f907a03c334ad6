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

  /** Key-skew report — the DIAGNOSTIC that decides whether the salting
    * ops above are even needed: one row per side-wide summary with the
    * distinct key count, total rows, max and p99 per-key counts (exact,
    * rank-based), the heaviest key's share (1e-6), and the heaviest key
    * itself (smallest-key tiebreak). A max share near 1/parallelism means
    * a plain shuffle stragglers; the report is the evidence.
    *
    * Two hash aggregations (rows→key counts→summary) plus one window on
    * the count table for the exact p99 — the window runs over |keys|
    * rows, not data rows. */
  def skewReport(df: DataFrame, key: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.select(key.as("k")).filter(col("k").isNotNull)
      .groupBy("k").agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("c"))
    val ranked = counts
      .withColumn("_rn", row_number().over(w).cast("long"))
      .withColumn("_nk", count(lit(1)).over(Window.partitionBy()))
    val p99 = ranked
      .filter(col("_rn") === ceil(col("_nk") * 0.99).cast("long"))
      .select(col("c").as("p99_count"))
    val top = counts
      .agg(min_by(struct(col("k")), struct((-col("c")).as("_nc"), col("k")))
        .getField("k").cast("string").as("top_key"),
        max(col("c")).as("max_count"))
    counts.agg(count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"))
      .crossJoin(top).crossJoin(p99)
      .select(col("n_keys"), col("n_rows"), col("max_count"),
        col("p99_count"), col("top_key"),
        floor(col("max_count").cast("double") / col("n_rows") * 1e6 + 0.5)
          .cast("long").as("max_share_e6"))
  }

  /** Exact join-cardinality estimate WITHOUT running the join — the
    * shuffle-planning question ("how many rows will this equi-join
    * emit?") answered from the two sides' per-key count tables:
    * `|A ⋈ B| = Σ_k cA(k)·cB(k)`, which is exact, plus each side's
    * heaviest matching key product (the biggest single-task blowup a
    * skewed join would face). The count tables are |keys|-sized — this
    * costs two aggregations and a key-table join, never the join's
    * output. Returns one row
    * `(join_rows, n_matching_keys, max_key_product)`. */
  def joinSizeEstimate(left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column): DataFrame = {
    val ca = left.select(leftKey.as("k")).filter(col("k").isNotNull)
      .groupBy("k").agg(count(lit(1)).as("ca"))
    val cb = right.select(rightKey.as("k")).filter(col("k").isNotNull)
      .groupBy("k").agg(count(lit(1)).as("cb"))
    ca.join(cb, Seq("k"))
      .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("join_rows"),
        count(lit(1)).as("n_matching_keys"),
        coalesce(max(col("ca") * col("cb")), lit(0L))
          .as("max_key_product"))
  }
}
