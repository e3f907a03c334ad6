package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log analytics: ordered funnels, cohort retention, interval
  * merging, and transition counting. These are the queries a
  * behavior/telemetry pipeline runs right after sessionization
  * ([[GroupOps]]) — each is expressed so the only shuffles are keyed on the
  * entity id (user), never on a global ordering, so the plan shape is the
  * same at 100 TB as at the gate scale.
  */
object AnalyticsOps {

  /** Strictly-ordered funnel conversion: a user reaches step `i` iff an
    * event of `steps(i)`'s type exists strictly after the time the user
    * reached step `i-1` (the classic "view → click → purchase" funnel,
    * earliest-completion semantics). Returns one row per step:
    * `(step_idx, step, n_users)`.
    *
    * Shape: one filtered scan per step (the `step` equality predicate
    * pushes down to the source), each reduced to a per-user `min(ts)`
    * before joining — so every join is between per-user aggregates of size
    * O(|users|), keyed on the user id, and the raw event volume never
    * crosses a join. The final per-step counts reduce a single
    * O(|users|)-row frame to `steps.length` rows.
    */
  def funnel(events: DataFrame, user: Column, ts: Column,
             step: Column, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val e = events.select(user.as("u"), ts.as("t"), step.as("s"))

    var reached = e.filter(col("s") === steps.head)
      .groupBy("u").agg(min(col("t")).as("t1"))
    for (i <- 2 to steps.length) {
      val nxt = e.filter(col("s") === steps(i - 1))
        .select(col("u").as("nu"), col("t").as("nt"))
      val prev = (1 until i).map(j => min(col(s"t$j")).as(s"t$j"))
      reached = reached
        .join(nxt, reached("u") === nxt("nu") && col("nt") > col(s"t${i - 1}"), "left")
        .groupBy("u")
        .agg(prev.head, prev.tail :+ min(col("nt")).as(s"t$i"): _*)
    }
    val counts = reached.agg(
      count(col("t1")).as("n1"),
      (2 to steps.length).map(i => count(col(s"t$i")).as(s"n$i")): _*)
    // typed unpivot (no SQL-string interpolation: step names are data)
    val rows = steps.zipWithIndex.map { case (name, i) =>
      struct(lit(i + 1L).as("step_idx"), lit(name).as("step"),
        col(s"n${i + 1}").as("n_users"))
    }
    counts
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.step_idx"), col("r.step"), col("r.n_users"))
      .orderBy("step_idx")
  }

  /** Weekly cohort retention: cohort = week of a user's first event;
    * a cohort counts as retained at offset `k` if the user has any event
    * in cohort-week + k. Returns `(cohort_week, week_offset, n_users)`.
    *
    * Shape: first-seen is a per-user min (map-side partial agg), activity
    * weeks are `distinct` over (user, week) — both shuffle on the user id
    * once; the join is between two per-user frames. No windows, so no
    * per-cohort skew: a billion-user cohort is just a bigger hash
    * aggregate.
    */
  def retentionCohorts(events: DataFrame, user: Column, ts: Column): DataFrame = {
    val e = events.select(user.as("u"), ts.as("t"))
    val cohort = e.groupBy("u")
      .agg(date_trunc("week", min(col("t"))).as("cohort_week"))
    val active = e.select(col("u"), date_trunc("week", col("t")).as("aw")).distinct()
    cohort.join(active, "u")
      .select(col("cohort_week"),
        (datediff(col("aw"), col("cohort_week")) / 7).cast("long").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Gaps-and-islands interval merge: coalesce each key's overlapping or
    * touching `[start, end]` intervals into maximal islands and report
    * `(key, n_islands, covered_us)` — the deduplicated time coverage that
    * usage metering, on-call paging, and availability pipelines all need.
    *
    * Shape: one window per key ordered by (start, end) — the running
    * `max(end)` over preceding rows marks island starts, a running sum
    * turns marks into island ids, and two hash aggregations collapse
    * islands then keys. Windows are partitioned by the entity key, so the
    * frame a task must sort is one key's intervals, never the dataset;
    * coverage is summed in exact integer microseconds.
    */
  def mergeIntervals(df: DataFrame, key: Column, start: Column, end: Column): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("s"), col("e"))
    val prevMax = max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1))
    df.select(key.as("k"), start.as("s"), end.as("e"))
      .withColumn("new_island",
        when(prevMax.isNull || col("s") > prevMax, 1L).otherwise(0L))
      .withColumn("island",
        sum(col("new_island")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("k"), col("island"))
      .agg(min(col("s")).as("is"), max(col("e")).as("ie"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_islands"),
        sum(unix_micros(col("ie")) - unix_micros(col("is"))).as("covered_us"))
      .orderBy("k")
  }

  /** First-order transition counts over each user's time-ordered event
    * sequence (the Markov-chain view of a clickstream): for every adjacent
    * pair, count `from_step → to_step` and report the row-normalized
    * probability as an exact `floor(p*1e6+0.5)` integer. `tiebreak` makes
    * the within-timestamp order deterministic (pass the event id).
    *
    * Shape: one window partitioned by user (per-user frames only), then a
    * hash aggregation on the 25-ish (from, to) pairs; the probability
    * normalization is a second tiny aggregation joined back on `from_step`.
    */
  def transitions(events: DataFrame, user: Column, ts: Column,
                  step: Column, tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(col("u")).orderBy(col("t"), col("tb"))
    val pairs = events
      .select(user.as("u"), ts.as("t"), step.as("s"), tiebreak.as("tb"))
      .withColumn("nxt", lead(col("s"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("s").as("from_step"), col("nxt").as("to_step"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_step").as("tf"))
      .agg(sum(col("n")).as("tot"))
    pairs.join(totals, pairs("from_step") === totals("tf"))
      .select(col("from_step"), col("to_step"), col("n"),
        floor(col("n") * lit(1e6) / col("tot") + lit(0.5)).cast("long").as("p_e6"))
      .orderBy("from_step", "to_step")
  }
}
