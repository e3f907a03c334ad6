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
    val reached = funnelTimes(events, user, ts, step, steps)
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

  /** Per-user earliest-completion step times `(u, t1..tk)` — the funnel's
    * working frame, exposed for lag analysis. Users appear iff they
    * reached step 1; `t_i` is null beyond the last step reached. */
  def funnelTimes(events: DataFrame, user: Column, ts: Column,
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
    reached
  }

  /** Step-to-step conversion lag: for each adjacent funnel step pair, the
    * converting-user count and the exact median lag in microseconds —
    * "how long does click→purchase take?". Same join shape as [[funnel]]
    * (per-user aggregates only); the percentile reduces per step pair. */
  def funnelLags(events: DataFrame, user: Column, ts: Column,
      step: Column, steps: Seq[String]): DataFrame = {
    require(steps.length >= 2, "lag analysis needs at least two steps")
    val reached = funnelTimes(events, user, ts, step, steps)
    val lagRows = (2 to steps.length).map { i =>
      struct(lit(i.toLong).as("step_idx"),
        lit(s"${steps(i - 2)}->${steps(i - 1)}").as("transition"),
        (unix_micros(col(s"t$i")) - unix_micros(col(s"t${i - 1}"))).as("lag_us"))
    }
    reached
      .select(explode(array(lagRows: _*)).as("r"))
      .select(col("r.step_idx"), col("r.transition"), col("r.lag_us"))
      .filter(col("lag_us").isNotNull)
      .groupBy("step_idx", "transition")
      .agg(count(lit(1)).as("n_users"),
        floor(expr("percentile(lag_us, 0.5)") + lit(0.5)).cast("long")
          .as("med_lag_us"))
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

  /** Last-touch attribution: each conversion event credits the most recent
    * preceding touch event by the same user within `windowUs` microseconds
    * (the marketing-attribution staple). Returns per-channel conversion
    * counts, with conversions whose last touch is stale or absent credited
    * to 'none' — so the counts always total the conversion count.
    *
    * Shape: rides [[JoinOps.asOfJoin]] (range-partitioned merge pick, no
    * window over the full event stream); touches are deduplicated per
    * (user, ts) with a max-event-id pick so the as-of choice is unique on
    * any engine. The final rollup is a tiny hash aggregation. */
  def lastTouchAttribution(events: DataFrame, user: Column, ts: Column,
      step: Column, tiebreak: Column, conversion: String,
      windowUs: Long): DataFrame = {
    val base = events.select(user.as("key"), ts.as("t"), step.as("s"),
      tiebreak.as("tb"))
    val conv = base.filter(col("s") === conversion)
      .select(col("key"), col("t"), col("tb"))
    val touches = base.filter(col("s") =!= conversion)
      .groupBy(col("key"), col("t").as("touch_t"))
      .agg(max_by(col("s"), col("tb")).as("touch_s"))
    JoinOps.asOfJoin(conv, touches,
        key = "key", leftTime = "t", rightTime = "touch_t")
      .select(
        when(col("touch_s").isNotNull &&
          unix_micros(col("t")) - unix_micros(col("touch_t")) <= windowUs,
          col("touch_s")).otherwise(lit("none")).as("channel"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_conversions"))
      .orderBy("channel")
  }

  /** Time-weighted mean of a gauge per key — each observation holds until
    * the key's next observation (step interpolation), so irregular
    * sampling doesn't bias the average toward chatty periods; the
    * monitoring-metrics rollup. The last observation of a key carries no
    * duration and drops. Returns `(key, n_intervals, dur_us, twm_e6)`.
    *
    * Determinism: durations are integer microseconds and values quantize
    * to 1e-6 longs per interval, so both sums are exact integer decimals —
    * order-independent on any engine; one final division renders the
    * quantized mean. Windows partition by key only (lead of one row);
    * the rollup is a hash aggregation. */
  def timeWeightedMean(df: DataFrame, key: Column, ts: Column,
      value: Column, tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("tb"))
    df.select(key.as("k"), ts.as("t"), value.cast("double").as("v"),
        tiebreak.as("tb"))
      .withColumn("dur_us", unix_micros(lead(col("t"), 1).over(w)) -
        unix_micros(col("t")))
      .filter(col("dur_us").isNotNull)
      .withColumn("v_e6", floor(col("v") * lit(1e6) + lit(0.5)).cast("long"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dur_us")).as("dur_us"),
        floor(sum(col("v_e6").cast("decimal(38,0)") * col("dur_us"))
            .cast("double") / sum(col("dur_us")).cast("double") + lit(0.5))
          .cast("long").as("twm_e6"))
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

  /** Two-proportion z-test for a hash-split A/B experiment: users are
    * assigned variant `user_id mod 2`, enter the experiment at their first
    * `exposure` event, and convert if a `conversion` event lands strictly
    * after that entry and within `windowUs` microseconds of it (same
    * earliest-entry semantics as [[funnel]], same attribution-window
    * contract as [[lastTouchAttribution]]). Returns ONE row: per-variant
    * user/conversion counts and e6-scaled rates, plus the pooled-variance
    * z statistic `(p0 - p1) / sqrt(p(1-p)(1/n0 + 1/n1))` as `z_e6` (0 when
    * the pooled rate is degenerate — nobody or everybody converted — where
    * the statistic is undefined). Complements the chi-square independence
    * gate ([[QualityOps.chiSquare]]) with the directional one-degree form
    * experimentation dashboards report.
    *
    * Shape: two filtered scans (the type predicates push down), each
    * reduced to per-user aggregates before the one user-keyed join; the
    * variant rollup is 2 rows and the final stats are a driver-free
    * conditional aggregation of those 2 rows. Raw event volume never
    * crosses a join. */
  def abTest(events: DataFrame, user: Column, ts: Column, typ: Column,
      exposure: String, conversion: String, windowUs: Long): DataFrame = {
    val entered = events.filter(typ === exposure)
      .groupBy(user.as("u")).agg(min(ts).as("t0"))
    val conv = events.filter(typ === conversion)
      .select(user.as("cu"), ts.as("ct"))
    val perUser = entered.join(conv,
        col("u") === col("cu") && col("ct") > col("t0") &&
          unix_micros(col("ct")) - unix_micros(col("t0")) <= windowUs, "left")
      .groupBy(col("u")).agg(max(col("cu").isNotNull).as("converted"))
      .select(pmod(col("u"), lit(2)).cast("long").as("variant"), col("converted"))
    val byVariant = perUser.groupBy("variant")
      .agg(count(lit(1)).as("n"), sum(when(col("converted"), 1L).otherwise(0L)).as("c"))
    val one = byVariant.agg(
      sum(when(col("variant") === 0, col("n"))).as("n0"),
      sum(when(col("variant") === 0, col("c"))).as("c0"),
      sum(when(col("variant") === 1, col("n"))).as("n1"),
      sum(when(col("variant") === 1, col("c"))).as("c1"))
    val p0 = col("c0").cast("double") / col("n0")
    val p1 = col("c1").cast("double") / col("n1")
    val p = (col("c0") + col("c1")).cast("double") / (col("n0") + col("n1"))
    one.select(col("n0"), col("c0"), col("n1"), col("c1"),
      floor(p0 * lit(1e6) + lit(0.5)).as("rate0_e6"),
      floor(p1 * lit(1e6) + lit(0.5)).as("rate1_e6"),
      when(col("c0") + col("c1") === 0 ||
          col("c0") + col("c1") === col("n0") + col("n1"), lit(0L))
        .otherwise(floor((p0 - p1) / sqrt(p * (lit(1.0) - p) *
          (lit(1.0) / col("n0") + lit(1.0) / col("n1"))) * lit(1e6) + lit(0.5)))
        .as("z_e6"))
  }

  /** Time-series resampling to OHLC bars: per key × fixed time bucket,
    * the opening value (first by time), high, low, closing value (last by
    * time), count, and exact-decimal volume — the downsampling step that
    * turns a raw tick/metric stream into chartable, joinable bars.
    * First/last are made deterministic under timestamp ties by an
    * id tiebreaker (`idCol`) — a tie-broken total order, not
    * whichever-partition-won.
    *
    * Shape: one window over (key, bucket) ordered by (ts, id) to tag the
    * first/last rows, then one aggregation — both shuffle on the same
    * (key, bucket) grain, so AQE coalesces them into adjacent stages with
    * no extra exchange. Buckets are integer microsecond floors:
    * engine-portable, no timezone arithmetic. */
  def ohlcResample(df: DataFrame, keyCols: Seq[Column], tsUs: Column,
      idCol: Column, valueCol: Column, bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be > 0: $bucketUs")
    val base = df.select(keyCols ++ Seq(
      floor(tsUs.cast("long").cast("double") / lit(bucketUs)).cast("long")
        .as("bucket"),
      tsUs.cast("long").as("_ts"), idCol.as("_id"),
      valueCol.cast("double").as("_v")): _*)
      .filter(col("_ts").isNotNull && col("_v").isNotNull)
    val gCols = base.columns.takeWhile(_ != "bucket").map(col).toSeq
    val w = Window.partitionBy(gCols :+ col("bucket"): _*)
    val asc = row_number().over(w.orderBy(col("_ts"), col("_id")))
    val desc = row_number().over(w.orderBy(col("_ts").desc, col("_id").desc))
    base
      .withColumn("_ra", asc).withColumn("_rd", desc)
      .groupBy(gCols :+ col("bucket"): _*)
      .agg(
        max(when(col("_ra") === 1, col("_v"))).as("open"),
        max(col("_v")).as("high"),
        min(col("_v")).as("low"),
        max(when(col("_rd") === 1, col("_v"))).as("close"),
        count(lit(1)).as("n"),
        AggOps.sumExact(col("_v")).as("volume"))
  }

  /** Per-group ordinary-least-squares trend: slope, intercept, and R² of
    * `y ~ x` for each key — the metric-drift / forecasting primitive
    * ("is this tenant's latency trending up?") run over millions of groups
    * at once. Closed-form OLS from five moments (n, Σx, Σy, Σxy, Σx²,
    * plus Σy² for R²), each accumulated EXACTLY as a fixed-scale decimal —
    * so the moments are order-independent and engine-portable, and only
    * the final scalar arithmetic is floating point, identically evaluated
    * everywhere (the same discipline as [[graft.operators.AggOps
    * .corrExact]]). Outputs are rounded to 6 dp. Groups with < 2 points or
    * zero x-variance report null slope/intercept/r2 (undefined, not 0 —
    * a flat x axis has no trend line).
    *
    * Scale: one map-side-partial aggregation on the group key; nothing
    * else. The x·y / x² / y² products are per-row codegen'd arithmetic
    * inside the scan stage. */
  def linearTrend(df: DataFrame, groupCols: Seq[Column], x: Column,
      y: Column): DataFrame = {
    import AggOps.sumExact
    val m = df.filter(x.isNotNull && y.isNotNull)
      .groupBy(groupCols: _*)
      .agg(count(lit(1)).as("n"),
        sumExact(x).as("sx"), sumExact(y).as("sy"),
        sumExact(x * y).as("sxy"), sumExact(x * x).as("sxx"),
        sumExact(y * y).as("syy"))
    val nD = col("n").cast("double")
    val varX = nD * col("sxx") - col("sx") * col("sx")
    val varY = nD * col("syy") - col("sy") * col("sy")
    val cov = nD * col("sxy") - col("sx") * col("sy")
    val slope = cov / varX
    val defined = col("n") >= 2 && varX =!= 0.0
    m.select(groupCols.indices.map(i => col(m.columns(i))) ++ Seq(
      col("n"),
      when(defined, round(slope, 6)).as("slope"),
      when(defined, round((col("sy") - slope * col("sx")) / nD, 6))
        .as("intercept"),
      when(defined && varY =!= 0.0, round(cov * cov / (varX * varY), 6))
        .as("r2")): _*)
  }

  /** Kaplan-Meier survival estimator with right-censoring — time-to-event
    * analytics (churn, conversion latency, hardware failure) over a
    * `(duration, event)` table where `event` is true when the terminal
    * event was observed and false when the subject is censored at
    * `duration`. Returns one row per group × distinct EVENT time
    * (censor-only times shrink the at-risk set but emit no row):
    * `(groupCols..., t, n_risk, d, surv_e6)` where
    * `S(t) = Π_{s ≤ t} (1 − d_s / n_s)` is the product-limit estimate.
    *
    * Portability: the product is computed as `exp(Σ ln(1 − d/n))` with each
    * per-time log term quantized to a scaled long (1e6) BEFORE the
    * cumulative sum — the running sum is exact integer arithmetic, so the
    * curve is bit-identical across engines and partitionings (the same
    * quantize-then-exact-sum discipline as [[graft.operators.MapOps
    * .bigramSurprisal]]). A time where everyone at risk dies (d = n) has
    * `ln 0 = −∞`; it contributes the sentinel −1e9 instead, which drives
    * `exp` to exactly 0.0 — the curve is 0 from that point on, with no
    * infinity reaching the integer sum.
    *
    * Shape: one groupBy reduces subjects to per-(group, t) death/leave
    * counts; every window after that runs on the DISTINCT-TIME table
    * (bounded by the time resolution, not the subject count), partitioned
    * by group — no global ordering, no driver loop. At 100 TB the only
    * subject-sized pass is the first aggregation, which partial-aggregates
    * map-side. */
  def kaplanMeier(df: DataFrame, groupCols: Seq[Column], duration: Column,
      event: Column): DataFrame = {
    val base = df.select(groupCols ++ Seq(duration.cast("long").as("t"),
      event.cast("boolean").as("e")): _*)
      .filter(col("t").isNotNull && col("t") >= 0 && col("e").isNotNull)
    val gCols = base.columns.dropRight(2).toSeq.map(col)
    val at = base.groupBy(gCols :+ col("t"): _*)
      .agg(sum(when(col("e"), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("leave"))
    val wOrd = Window.partitionBy(gCols: _*).orderBy(col("t"))
    val wAll = Window.partitionBy(gCols: _*)
    // at risk just before t = group total minus everyone who left earlier
    val withRisk = at.withColumn("n_risk",
      sum(col("leave")).over(wAll) - coalesce(
        sum(col("leave")).over(wOrd.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val evRows = withRisk.filter(col("d") > 0)
      .withColumn("lns_e6",
        when(col("n_risk") === col("d"), lit(-1000000000L))
          .otherwise(floor(log((col("n_risk") - col("d")).cast("double") /
            col("n_risk")) * lit(1e6) + lit(0.5)).cast("long")))
    evRows.withColumn("cum_e6", sum(col("lns_e6")).over(wOrd))
      .select(gCols ++ Seq(col("t"), col("n_risk"), col("d"),
        floor(exp(col("cum_e6").cast("double") / lit(1e6)) * lit(1e6) +
          lit(0.5)).cast("long").as("surv_e6")): _*)
  }

  /** Nelson-Aalen cumulative hazard — [[kaplanMeier]]'s companion
    * estimator: `H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ` over event times, the additive
    * hazard view (KM is the multiplicative survival view; −ln S ≈ H
    * links them). Same at-risk accounting as KM; each time's hazard
    * increment quantizes to 1e-9 BEFORE the running sum, so the
    * cumulative release is an exact integer fold. Emits
    * `(group…, t, n_risk, d, h_e9)` for event rows (d > 0).
    *
    * Scale: one hash agg on (group, t), two group-keyed windows over
    * the |distinct durations| table — never over the raw rows. */
  def nelsonAalen(df: DataFrame, groupCols: Seq[Column], duration: Column,
      event: Column): DataFrame = {
    val base = df.select(groupCols ++ Seq(duration.cast("long").as("t"),
      event.cast("boolean").as("e")): _*)
      .filter(col("t").isNotNull && col("t") >= 0 && col("e").isNotNull)
    val gCols = base.columns.dropRight(2).toSeq.map(col)
    val at = base.groupBy(gCols :+ col("t"): _*)
      .agg(sum(when(col("e"), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("leave"))
    val wOrd = Window.partitionBy(gCols: _*).orderBy(col("t"))
    val wAll = Window.partitionBy(gCols: _*)
    at.withColumn("n_risk",
        sum(col("leave")).over(wAll) - coalesce(
          sum(col("leave")).over(
            wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("d") > 0)
      .withColumn("_h_e9",
        floor(col("d").cast("double") / col("n_risk") * 1e9 + 0.5)
          .cast("long"))
      .withColumn("h_e9", sum(col("_h_e9")).over(wOrd))
      .select(gCols ++ Seq(col("t"), col("n_risk"), col("d"),
        col("h_e9")): _*)
  }

  /** Period-over-period deltas — each (group, period)'s metric total
    * beside the previous period's, with absolute and relative change:
    * the week-over-week / month-over-month report every metrics
    * pipeline ends in. Totals fold through exact decimals; the relative
    * change quantizes to 1e-6 (null when the previous period is 0 or
    * missing). Periods are `⌊ts/bucketUs⌋` buckets; only observed
    * periods emit (pair with [[gapFill]] to densify first when a silent
    * period must read as zero). Emits
    * `(group…, period, total, prev_total, delta, pct_e6)`.
    *
    * Scale: one hash agg to the (group, period) table, one lag window
    * keyed on the group over that table. */
  def popDeltas(df: DataFrame, groupCols: Seq[Column], tsUs: Column,
      value: Column, bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be > 0: $bucketUs")
    val keyed = df.select(groupCols ++ Seq(
      floor(tsUs.cast("double") / bucketUs).cast("long").as("period"),
      value.cast("double").as("_v")): _*)
      .filter(col("period").isNotNull && col("_v").isNotNull)
    val gNames = keyed.columns.dropRight(2)
    val g = gNames.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col("period"))
    keyed.groupBy(g :+ col("period"): _*)
      .agg(round(sum(col("_v").cast("decimal(18,6)")).cast("double"), 6)
        .as("total"))
      .withColumn("prev_total", lag(col("total"), 1).over(w))
      .withColumn("delta", round(col("total") - col("prev_total"), 6))
      .withColumn("pct_e6",
        when(col("prev_total").isNotNull && col("prev_total") =!= 0.0,
          floor((col("total") - col("prev_total")) / col("prev_total")
            * 1e6 + 0.5).cast("long")))
  }

  /** Behavioral k-grams: every length-`k` window of consecutive event
    * types per subject, counted across the corpus — the sequential-
    * pattern complement to [[transitions]] (k=2, row-normalized) and
    * [[topPaths]] (opening prefix only): here EVERY position contributes,
    * so frequent mid-journey motifs surface. Deterministic (ts, id)
    * ordering; patterns below `minSupport` are pruned. Emits
    * `(pattern, n_occurrences, n_subjects)`.
    *
    * Shape: k−1 lead() columns over one per-subject window sort, then
    * two hash aggregations (per (subject, pattern) then per pattern) so
    * the distinct-subject count never needs a count-distinct Expand.
    * Scale: one window shuffle on the subject, one on the pattern. */
  def eventKgrams(events: DataFrame, subject: Column, ts: Column,
      id: Column, typ: Column, k: Int = 3,
      minSupport: Long = 1L): DataFrame = {
    require(k >= 2 && k <= 8, s"k must be in [2,8]: $k")
    val w = Window.partitionBy("_u").orderBy(col("_t"), col("_id"))
    val base = events
      .select(subject.as("_u"), ts.as("_t"), id.as("_id"), typ.as("_e"))
      .filter(col("_e").isNotNull && col("_t").isNotNull)
    val withLeads = (1 until k).foldLeft(base) { (d, j) =>
      d.withColumn(s"_e$j", lead(col("_e"), j).over(w))
    }
    val pattern = concat_ws(">",
      col("_e") +: (1 until k).map(j => col(s"_e$j")): _*)
    withLeads
      .filter((1 until k).map(j => col(s"_e$j").isNotNull)
        .reduce(_ && _))
      .select(col("_u"), pattern.as("pattern"))
      .groupBy("_u", "pattern").agg(count(lit(1)).as("_c"))
      .groupBy("pattern")
      .agg(sum(col("_c")).as("n_occurrences"),
        count(lit(1)).as("n_subjects"))
      .filter(col("n_occurrences") >= minSupport)
  }

  /** Ratio-to-parent shares — the reporting staple behind every drill-down
    * table: per (parent, child) cell, its exact-decimal measure total, the
    * share of its parent's total, and the share of the grand total, both
    * 1e-6-quantized. Two window sums over the CELL table (|parents·children|
    * rows, not data rows) — the fact table aggregates once and never joins
    * back. */
  def shareOfTotal(df: DataFrame, parent: Column, child: Column,
      measure: Column): DataFrame = {
    val cells = df.select(parent.as("parent"), child.as("child"),
        measure.cast("decimal(18,6)").as("_m"))
      .filter(col("_m").isNotNull)
      .groupBy("parent", "child")
      .agg(sum(col("_m")).as("_t"))
    val wp = Window.partitionBy("parent")
    val wg = Window.partitionBy()
    cells
      .withColumn("_pt", sum(col("_t")).over(wp))
      .withColumn("_gt", sum(col("_t")).over(wg))
      .select(col("parent"), col("child"),
        round(col("_t").cast("double"), 6).as("total"),
        floor(col("_t").cast("double") / col("_pt").cast("double") * 1e6
          + 0.5).cast("long").as("parent_share_e6"),
        floor(col("_t").cast("double") / col("_gt").cast("double") * 1e6
          + 0.5).cast("long").as("grand_share_e6"))
  }

  /** Temporal burstiness per group — the inter-event-gap statistic that
    * separates steady heartbeats from bursty sessions (Goh & Barabási's
    * `B = (σ−μ)/(σ+μ)`: −1 periodic, 0 Poisson, →1 bursty). Gaps are
    * exact integer microseconds per subject (ordered by ts, id; one gap
    * per consecutive pair), folded per group with exact decimal moments,
    * then the scalar B and coefficient of variation quantize to 1e-6.
    * Groups need ≥ 2 gaps for a sample σ; others drop out. Shape: one
    * subject-partitioned window + one group aggregation. */
  def burstiness(events: DataFrame, group: Column, subject: Column,
      tsUs: Column, id: Column): DataFrame = {
    val w = Window.partitionBy("_g", "_u").orderBy(col("_t"), col("_id"))
    val dec = "decimal(38,0)"
    events.select(group.as("_g"), subject.as("_u"), tsUs.as("_t"),
        id.as("_id"))
      .filter(col("_t").isNotNull)
      .withColumn("_gap", col("_t") - lag(col("_t"), 1).over(w))
      .filter(col("_gap").isNotNull)
      .groupBy(col("_g").as("g"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("_gap").cast(dec)).as("_s"),
        sum((col("_gap").cast(dec) * col("_gap")).cast(dec)).as("_ss"))
      .filter(col("n_gaps") >= 2)
      .withColumn("_mu", col("_s").cast("double") / col("n_gaps"))
      .withColumn("_sd",
        sqrt((col("_ss").cast("double")
          - col("_s").cast("double") * col("_s").cast("double")
            / col("n_gaps")) / (col("n_gaps") - 1)))
      .select(col("g"), col("n_gaps"),
        floor(col("_mu") + 0.5).cast("long").as("mean_gap_us"),
        floor(col("_sd") / col("_mu") * 1e6 + 0.5).cast("long").as("cv_e6"),
        floor((col("_sd") - col("_mu")) / (col("_sd") + col("_mu")) * 1e6
          + 0.5).cast("long").as("burstiness_e6"))
  }

  /** Peak concurrency per group: the maximum number of intervals open at
    * once — capacity planning's first question against session/interval
    * data. Classic boundary sweep: each interval emits a +1 at start and
    * a −1 at end, the running sum over the time-ordered boundary stream
    * is the live count, and its max (with the FIRST time attaining it)
    * is the answer. End-before-start at equal timestamps (the half-open
    * `[start, end)` convention), delta as the tiebreak column makes the
    * sweep order total and the result engine-independent.
    *
    * Emits `(group, peak, peak_at)`. Scale: the sweep is a window over
    * the group key — 2 rows per interval, one shuffle; the rollup
    * partial-aggregates. A group's boundary stream sorts within its
    * partition; no global sort, no driver state. */
  def maxConcurrency(df: DataFrame, groupCols: Seq[Column], start: Column,
      end: Column): DataFrame = {
    val keyed = df.select(groupCols ++ Seq(start.cast("long").as("_s"),
      end.cast("long").as("_e")): _*)
      .filter(col("_s").isNotNull && col("_e").isNotNull &&
        col("_e") > col("_s"))
    val gNames = keyed.columns.dropRight(2)
    val g = gNames.map(col)
    val bounds = keyed
      .select(g ++ Seq(explode(array(
        struct(col("_s").as("t"), lit(1).as("d")),
        struct(col("_e").as("t"), lit(-1).as("d")))).as("_b")): _*)
      .select(g ++ Seq(col("_b.t").as("_t"), col("_b.d").as("_d")): _*)
    val wOrd = Window.partitionBy(g: _*).orderBy(col("_t"), col("_d"))
    val wAll = Window.partitionBy(g: _*)
    bounds
      .withColumn("_live", sum(col("_d")).over(wOrd))
      .withColumn("_mx", max(col("_live")).over(wAll))
      .filter(col("_live") === col("_mx"))
      .groupBy(g: _*)
      .agg(max(col("_mx")).cast("long").as("peak"),
        min(col("_t")).as("peak_at"))
  }

  /** Top opening paths: the ordered sequence of each subject's first
    * `steps` event types, counted across subjects — the "how do journeys
    * begin" mining that complements [[transitions]] (memoryless pairs)
    * and [[funnel]] (one fixed target path) with the empirical path
    * distribution itself. Ordering ties break on `id`, so the path per
    * subject is unique and deterministic.
    *
    * Shape: one window (row_number per subject, top-`steps` kept), one
    * pivot-by-position (a `steps`-wide conditional aggregate — no
    * collect_list sort, stays in whole-stage codegen), one count per
    * path. A subject with fewer than `steps` events contributes its
    * shorter prefix (concat_ws skips the missing slots). Scale: two
    * shuffles (subject, then path), both hash aggregations partial
    * map-side; `steps` is a constant column width, never a per-row
    * array. */
  def topPaths(events: DataFrame, subject: Column, ts: Column, id: Column,
      typ: Column, steps: Int = 3, minSupport: Long = 1L): DataFrame = {
    require(steps >= 1 && steps <= 16, s"steps must be in [1,16]: $steps")
    val w = Window.partitionBy("_u").orderBy(col("_t"), col("_id"))
    val slots = (1 to steps).map(i =>
      max(when(col("_rn") === i, col("_e"))).as(s"_s$i"))
    events.select(subject.as("_u"), ts.as("_t"), id.as("_id"), typ.as("_e"))
      .filter(col("_e").isNotNull && col("_t").isNotNull)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= steps)
      .groupBy("_u")
      .agg(slots.head, slots.tail: _*)
      .select(concat_ws(">", (1 to steps).map(i => col(s"_s$i")): _*)
        .as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_subjects"))
      .filter(col("n_subjects") >= minSupport)
  }

  /** RFM customer scoring — recency/frequency/monetary quintiles, the
    * segmentation every CRM pipeline derives first. Each metric is
    * ranked over ALL customers by [[SortOps.globalRowNumber]] (the
    * TeraSort-rank formulation — a plain `row_number() OVER (ORDER BY …)`
    * would serialize every customer through one task), key-tiebroken so
    * the quintile cut is deterministic; score = `⌊(rank−1)·5/n⌋ + 1`
    * (1..5, higher = more recent / frequent / valuable). Emits
    * `(k, recency, frequency, monetary, r, f, m, rfm)` with
    * `rfm = 100r + 10f + m`.
    *
    * Scale: one hash agg over the fact table, then three range
    * partitions of the CUSTOMER-sized aggregate (not the facts) and
    * three equi-joins back on the key. */
  def rfmScores(orders: DataFrame, key: Column, tsUs: Column,
      amount: Column): DataFrame = {
    val agg = orders
      .filter(key.isNotNull)
      .groupBy(key.as("k"))
      .agg(max(tsUs.cast("long")).as("recency"),
        count(lit(1)).as("frequency"),
        round(sum(amount.cast("decimal(18,6)")).cast("double"), 6)
          .as("monetary"))
    val n = agg.agg(count(lit(1)).as("_n"))
    def score(metric: String, out: String) =
      SortOps.globalRowNumber(agg.select(col("k"), col(metric)),
          Seq(col(metric), col("k")), "_rn")
        .crossJoin(broadcast(n))
        .select(col("k"),
          (floor((col("_rn") - 1L) * 5L / col("_n")) + 1L).cast("long")
            .as(out))
    agg
      .join(score("recency", "r"), Seq("k"))
      .join(score("frequency", "f"), Seq("k"))
      .join(score("monetary", "m"), Seq("k"))
      .withColumn("rfm", col("r") * 100L + col("f") * 10L + col("m"))
  }

  /** Gaps-and-islands streaks — each key's LONGEST run of consecutive
    * activity days (the engagement metric): distinct active days, the
    * classic `day − row_number` island id, then per-island lengths and
    * the per-key argmax (earliest start breaks ties). Emits
    * `(k, longest_streak, streak_start)`.
    *
    * Scale: every window and aggregation partitions on the key; islands
    * never cross keys; nothing global, nothing quadratic. */
  def streaks(df: DataFrame, key: Column, day: Column): DataFrame = {
    val w = Window.partitionBy("k").orderBy(col("d"))
    df.select(key.as("k"), day.cast("long").as("d"))
      .filter(col("k").isNotNull && col("d").isNotNull)
      .distinct()
      .withColumn("_isl", col("d") - row_number().over(w))
      .groupBy(col("k"), col("_isl"))
      .agg(count(lit(1)).as("_len"), min(col("d")).as("_start"))
      .groupBy(col("k"))
      .agg(max(col("_len")).as("longest_streak"),
        min_by(col("_start"), struct((-col("_len")).as("_nl"),
          col("_start"))).as("streak_start"))
  }

  /** Market-basket association rules — pair support / confidence / lift
    * over (basket, item) facts, the co-purchase miner behind "customers
    * also bought". Items below `minSupport` baskets are pruned BEFORE
    * the pair stage (the Apriori property doubles as the hot-item cap:
    * pair enumeration is quadratic in basket size, and the support
    * floor is what keeps it tractable — same discipline as the wedge
    * cap in [[GraphOps.linkPrediction]]). Pairs below `minSupport`
    * drop too. Emits one row per unordered pair:
    * `(a, b, n_pair, n_a, n_b, conf_ab_e6, conf_ba_e6, lift_e6)` where
    * `conf(a→b) = n_pair/n_a`, `lift = n_pair·N/(n_a·n_b)`.
    *
    * Scale: distinct + two hash aggs + one per-basket self equi-join on
    * the basket id; the basket count N broadcasts as one row. */
  def associationRules(df: DataFrame, basket: Column, item: Column,
      minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1: $minSupport")
    val facts = df.select(basket.as("bk"), item.as("it"))
      .filter(col("bk").isNotNull && col("it").isNotNull)
      .distinct()
    val nB = facts.select("bk").distinct().agg(count(lit(1)).as("_nb"))
    val supp = facts.groupBy(col("it"))
      .agg(count(lit(1)).as("_cnt"))
      .filter(col("_cnt") >= minSupport)
    val kept = facts.join(supp.select("it"), Seq("it"), "left_semi")
    val pairs = kept.select(col("bk"), col("it").as("a"))
      .join(kept.select(col("bk").as("bk2"), col("it").as("b")),
        col("bk") === col("bk2") && col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minSupport)
    pairs
      .join(supp.select(col("it").as("a"), col("_cnt").as("n_a")), Seq("a"))
      .join(supp.select(col("it").as("b"), col("_cnt").as("n_b")), Seq("b"))
      .crossJoin(broadcast(nB))
      .select(col("a"), col("b"), col("n_pair"), col("n_a"), col("n_b"),
        floor(col("n_pair").cast("double") / col("n_a") * 1e6 + 0.5)
          .cast("long").as("conf_ab_e6"),
        floor(col("n_pair").cast("double") / col("n_b") * 1e6 + 0.5)
          .cast("long").as("conf_ba_e6"),
        // support-product in DOUBLE: a long·long denominator overflows
        // (ANSI: throws) once supports pass ~3e9; exact below 2^53 either
        // way, and the oracle mirrors the same double product
        floor(col("n_pair").cast("double") * col("_nb")
          / (col("n_a").cast("double") * col("n_b")) * 1e6 + 0.5)
          .cast("long").as("lift_e6"))
  }
}
