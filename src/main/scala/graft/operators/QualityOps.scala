package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality and change-data operators — the validation/maintenance
  * surface every long-lived 100 TB dataset needs around its ingest path.
  * The reference's closest analogue is validate-style jobs (TeraValidate,
  * SortValidator: reference hadoop-mapreduce-examples
  * .../terasort/TeraValidate.java:53); these generalize that idea to
  * rule-based row validation and changelog replay. */
object QualityOps {

  /** Expectation checks — validate-and-quarantine: each named rule is a
    * boolean column; a row passes iff every rule holds, and `violations`
    * lists the names of the rules it broke (empty array = pass). A rule
    * evaluating to NULL (e.g. a comparison on a null value) counts as a
    * violation — unknown is not acceptance. Pure projection, no shuffle;
    * split pass/quarantine downstream with one filter each. */
  def expect(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val tagged = array(rules.map { case (name, c) =>
      when(!coalesce(c, lit(false)), lit(name))
    }: _*)
    df.withColumn("violations", filter(tagged, v => v.isNotNull))
  }

  /** Distribution drift per shard: total-variation distance between each
    * group's categorical distribution and the corpus-wide one,
    * TV = ½·Σ_cat |p_group(cat) − p_corpus(cat)| ∈ [0, 1] — the standard
    * "did this crawl snapshot / supplier / shard drift from the mix we
    * train on" monitor. The comparison grid is the cross of groups ×
    * categories, so a category absent from a group contributes its full
    * corpus mass. Per-group folds quantize |p − q| to scaled longs (1e15),
    * making the sum exact integer addition — order-independent and
    * bit-identical across engines. Cost at 100 TB is the first aggregation
    * that reduces the corpus to (group, category) counts; everything after
    * is proportional to the tiny count grid (checkpointed once, since three
    * branches consume it). Returns (g, n, tv_e6). */
  def distributionDrift(df: DataFrame, groupCol: Column, catCol: Column): DataFrame = {
    val cell = df.groupBy(groupCol.as("g"), catCol.as("cat"))
      .agg(count(lit(1)).as("n")).localCheckpoint()
    val total = cell.agg(sum("n")).head().getLong(0).toDouble
    val byGroup = cell.groupBy("g").agg(sum("n").as("n_g"))
    val byCat = cell.groupBy("cat").agg(sum("n").as("n_c"))
    byGroup.crossJoin(byCat)
      .join(cell, Seq("g", "cat"), "left_outer")
      .select(col("g"), col("n_g"),
        (coalesce(col("n"), lit(0L)).cast("double") / col("n_g").cast("double")).as("p"),
        (col("n_c").cast("double") / lit(total)).as("q"))
      .groupBy("g")
      .agg(min("n_g").as("n"),
        sum(floor(abs(col("p") - col("q")) * lit(1e15) + lit(0.5))).as("tvq"))
      .select(col("g"), col("n"),
        floor(col("tvq").cast("double") / lit(1e15) * lit(0.5) * lit(1e6) + lit(0.5))
          .cast("long").as("tv_e6"))
  }

  /** Robust per-group outlier profile: median, MAD (median absolute
    * deviation), and the count of points deviating more than
    * `k` MADs — the outlier rule that survives the outliers themselves,
    * unlike mean/stddev z-scores which the extreme values drag.
    *
    * Two grouped percentile passes (shuffles on the group key only) with a
    * group-keyed join between them; no windows, so a giant group costs one
    * aggregation buffer, not a task-local sort. The percentiles here are
    * exact (the gate contract); at 100 TB swap `percentile` for
    * `approx_percentile` — same plan shape, bounded memory. */
  def madOutliers(df: DataFrame, groupCol: Column, xCol: Column,
      k: Double = 3.0): DataFrame = {
    val base = df.select(groupCol.as("g"), xCol.cast("double").as("x"))
    val med = base.groupBy("g").agg(expr("percentile(x, 0.5)").as("med"))
    val stats = base.join(med, "g")
      .groupBy("g")
      .agg(min(col("med")).as("med"),
        expr("percentile(abs(x - med), 0.5)").as("mad"),
        count(lit(1)).as("n"))
    base.join(stats, "g")
      .groupBy("g")
      .agg(min(col("med")).as("med_"), min(col("mad")).as("mad_"),
        min(col("n")).as("n"),
        count(when(abs(col("x") - col("med")) > lit(k) * col("mad"), 1))
          .as("n_outliers"))
      .select(col("g"), round(col("med_"), 6).as("med"),
        round(col("mad_"), 6).as("mad"), col("n"), col("n_outliers"))
  }

  /** Chi-square test of independence between two categorical columns — the
    * "did the label mix shift with the source?" statistic. Returns one row:
    * `(n, dof, chi2_e6)` with the statistic as an exact integer sum of
    * per-cell floor-quantized contributions (order-independent, so the
    * aggregation parallelizes without fp drift).
    *
    * One shuffle builds the contingency cells; margins reduce from the
    * cells (tiny), and the cross of margins is |A|x|B| rows — statistics
    * over category pairs, never over rows. Zero-observed cells contribute
    * their full expected mass, so the grid is generated from the margin
    * cross, not from observed cells alone. Rows with a NULL category are
    * excluded entirely (from `n` and the margins too — a null-keyed cell
    * would silently vanish from the equality join and skew the statistic;
    * profile null rates separately, e.g. the q_profile sweep). */
  def chiSquare(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val cells = df.select(aCol.as("a"), bCol.as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .groupBy("a", "b").agg(count(lit(1)).as("o"))
    val ma = cells.groupBy("a").agg(sum(col("o")).as("na"))
    val mb = cells.groupBy("b").agg(sum(col("o")).as("nb"))
    val tot = cells.agg(sum(col("o")).as("n"))
    ma.crossJoin(mb).crossJoin(tot)
      .join(cells, Seq("a", "b"), "left")
      .select(col("a"), col("b"), col("n"), col("na"), col("nb"),
        coalesce(col("o"), lit(0L)).as("o"))
      .withColumn("e",
        col("na").cast("double") * col("nb").cast("double") / col("n").cast("double"))
      .withColumn("contrib_e6",
        floor((col("o").cast("double") - col("e")) * (col("o").cast("double") - col("e"))
          / col("e") * lit(1e6) + lit(0.5)).cast("long"))
      .agg(min(col("n")).as("n"),
        ((count_distinct(col("a")) - 1) * (count_distinct(col("b")) - 1))
          .as("dof"),
        sum(col("contrib_e6")).as("chi2_e6"))
      .select(col("n"), col("dof"), col("chi2_e6"))
  }

  /** Hour-of-day seasonal baseline: per (key, hour) event counts scored as
    * z-values against the key's own 24-bucket profile — the first-line
    * "is tonight's traffic weird?" anomaly signal. The dense grid
    * generates from keys × 24, so silent hours surface as negative
    * anomalies instead of missing rows. Returns `(k, hour, n, z_e6)`.
    *
    * Determinism: bucket counts are integers, the mean is one exact
    * division (total/24), variance sums per-bucket floor-quantized
    * squared deviations as integers (order-independent), and IEEE sqrt is
    * correctly rounded — so z_e6 is engine-portable. A constant profile
    * (zero variance) scores 0 everywhere. One shuffle to cells; profiles
    * reduce from 24-row groups. */
  def seasonalBaseline(df: DataFrame, keyCol: Column, tsCol: Column): DataFrame = {
    val cells = df.select(keyCol.as("k"), hour(tsCol).as("hour"))
      .groupBy("k", "hour").agg(count(lit(1)).as("n"))
    val grid = cells.select(col("k")).distinct()
      .select(col("k"), explode(sequence(lit(0), lit(23))).as("hour"))
    val dense = grid.join(cells, Seq("k", "hour"), "left")
      .select(col("k"), col("hour"), coalesce(col("n"), lit(0L)).as("n"))
    val prof = dense
      .withColumn("mean_n",
        (sum(col("n")).over(Window.partitionBy(col("k"))).cast("double")) / lit(24.0))
      .withColumn("dev2_e6",
        floor((col("n") - col("mean_n")) * (col("n") - col("mean_n"))
          * lit(1e6) + lit(0.5)).cast("long"))
    val stats = prof.groupBy(col("k").as("pk"))
      .agg(sum(col("dev2_e6")).as("var24_e6"))
    prof.join(stats, col("k") === col("pk"))
      .select(col("k"), col("hour"), col("n"),
        when(col("var24_e6") === 0L, lit(0L)).otherwise(
          floor((col("n") - col("mean_n"))
            / sqrt(col("var24_e6").cast("double") / lit(1e6) / lit(24.0))
            * lit(1e6) + lit(0.5)).cast("long")).as("z_e6"))
      .orderBy("k", "hour")
  }

  /** CDC apply — replay a changelog onto a snapshot: `changes` carries the
    * base's payload columns plus an op ('I'nsert / 'U'psert / 'D'elete) and
    * a sequence number; the HIGHEST-seq operation per key wins (op as
    * tiebreak for determinism). Upserts/inserts take the change payload,
    * deletes remove the key, untouched base rows pass through. One shuffle
    * on the key — the standard incremental-snapshot maintenance step. */
  def cdcApply(base: DataFrame, changes: DataFrame, key: String,
      opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    val payload = base.columns.toSeq
    // last-op-wins as max_by over (seq, op) — both tiebreak fields maximize,
    // so the pick is one hash aggregation with map-side partial combine; a
    // hot key receiving millions of changes in one batch would serialize a
    // window's per-key sort into a single task
    val latest = changes
      .select(col(key).as("_k"), col(opCol), col(seqCol),
        struct(payload.map(col): _*).as("_c"))
      .groupBy("_k")
      .agg(max_by(struct(col(opCol).as("_op"), col("_c").as("_c")),
        struct(col(seqCol), col(opCol))).as("_m"))
      .select(col("_k"), col("_m._op").as("_op"), col("_m._c").as("_c"))
    base
      .select(col(key).as("_k"), struct(payload.map(col): _*).as("_b"))
      .join(latest, Seq("_k"), "full_outer")
      .filter(col("_op").isNull || col("_op") =!= "D")
      .select(payload.map(n =>
        when(col("_op").isNotNull, col("_c").getField(n))
          .otherwise(col("_b").getField(n)).as(n)): _*)
  }

  /** Snapshot reconciliation — classify every key of two table snapshots
    * as added / removed / changed / unchanged and report, per status, the
    * row count, a key checksum (sum of keys — order-free, engine-free),
    * and per-compared-column change counts. This is the nightly "does the
    * replica match the source" audit: one full-outer shuffle join on the
    * key, classification and per-column diffs as plain expressions, and a
    * 4-row rollup — the raw snapshots never cross more than the one join.
    * Comparisons are null-safe (`<=>`), so a NULL→value transition counts
    * as a change rather than vanishing. */
  def snapshotDiff(before: DataFrame, after: DataFrame, key: String,
      compareCols: Seq[String]): DataFrame = {
    val pack = (d: DataFrame, side: String) =>
      d.select(col(key).as(s"_k$side"), struct(compareCols.map(col): _*).as(s"_v$side"))
    val joined = pack(before, "b")
      .join(pack(after, "a"), col("_kb") === col("_ka"), "full_outer")
      .select(coalesce(col("_ka"), col("_kb")).as("k"),
        when(col("_kb").isNull, "added")
          .when(col("_ka").isNull, "removed")
          .when(col("_vb") <=> col("_va"), "unchanged")
          .otherwise("changed").as("status"),
        struct(compareCols.map(c =>
          (!(col(s"_vb.$c") <=> col(s"_va.$c")) &&
            col("_kb").isNotNull && col("_ka").isNotNull).as(c)): _*).as("_d"))
    val aggs = count(lit(1)).as("n_rows") +:
      sum(col("k")).cast("long").as("key_sum") +:
      compareCols.map(c =>
        sum(when(col(s"_d.$c"), 1L).otherwise(0L)).as(s"chg_$c"))
    joined.groupBy("status").agg(aggs.head, aggs.tail: _*).orderBy("status")
  }

  /** k-anonymity audit over a set of quasi-identifier columns: every
    * equivalence class (distinct quasi-id combination) with its row count
    * and an `at_risk` flag for classes smaller than `k` — the release
    * gate privacy review runs before publishing a dataset keyed on
    * attributes that can be linked externally. Rows in an at-risk class
    * are re-identifiable by joining public data on the quasi-identifiers;
    * the standard remedies (suppress, generalize, or drop) all start from
    * exactly this class table. One shuffle: a group-by on the quasi
    * columns with map-side partial counts; the result is bounded by the
    * quasi-id domain cross-product, not the data, so at 100 TB the audit
    * output is still tiny. Pass aliased columns for stable output names. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[Column], k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k > 1, s"k must be > 1: $k")
    df.groupBy(quasiCols: _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("at_risk", col("class_size") < k)
  }

  /** l-diversity audit — the companion check to [[kAnonymity]]: a class
    * can be large yet still leak if every row shares the same sensitive
    * value (homogeneity attack), so each quasi-id class also needs at
    * least `l` distinct sensitive values. Returns every class with its
    * size, exact distinct-sensitive count, and `below_l` flag. Exact
    * distinct-per-group costs one extra shuffle stage over the
    * (quasi, sensitive) pre-aggregation; both stages partial-aggregate
    * map-side, and the output stays domain-bounded. */
  def lDiversity(df: DataFrame, quasiCols: Seq[Column], sensitiveCol: Column,
      l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l > 1, s"l must be > 1: $l")
    val cell = df.groupBy(quasiCols :+ sensitiveCol.as("_s"): _*)
      .agg(count(lit(1)).as("_n"))
    val keys = (0 until quasiCols.length).map(i => col(cell.columns(i)))
    cell.groupBy(keys: _*)
      .agg(sum(col("_n")).as("class_size"),
        count(col("_s")).as("n_sensitive"))
      .withColumn("below_l", col("n_sensitive") < l)
  }

  /** t-closeness audit — the third rung after [[kAnonymity]] and
    * [[lDiversity]]: a class can be large and diverse yet still leak if
    * its sensitive-value DISTRIBUTION differs sharply from the corpus
    * (skewness attack: "90% of this zip code's rows say 'positive'" is a
    * disclosure even with l distinct values present). For a categorical
    * sensitive column the distance is total variation:
    * `tvd = Σ_v max(p_class(v) − p_global(v), 0)` — the one-sided sum
    * equals ½·Σ|p−q| because both distributions sum to 1, and it needs
    * only the (class, value) cells that actually occur, so absent values
    * never have to be densified. Flags classes with `tvd > t`.
    *
    * Scale: two hash aggregations (cells, then classes) plus a broadcast
    * join of the global value distribution (domain-bounded, tiny); output
    * is bounded by the quasi-id domain, not the data. The per-cell terms
    * are quantized to 1e-15 scaled longs before summing (exact integer
    * fold, order-independent) and the TVD is released as `tvd_e6` — the
    * same hash-stable discipline as [[distributionDrift]]. */
  def tCloseness(df: DataFrame, quasiCols: Seq[Column], sensitiveCol: Column,
      t: Double): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(t > 0 && t < 1, s"t must be in (0,1): $t")
    val cell = df.groupBy(quasiCols :+ sensitiveCol.as("_s"): _*)
      .agg(count(lit(1)).as("_n"))
    val keys = (0 until quasiCols.length).map(i => col(cell.columns(i)))
    // total via a 1-row crossJoin, not an empty-partition window — the
    // window form funnels every cell row through ONE partition
    val globalDist = cell.groupBy(col("_s"))
      .agg(sum(col("_n")).as("_gn"))
      .crossJoin(cell.agg(sum(col("_n")).as("_tot")))
      .select(col("_s"), (col("_gn") / col("_tot")).as("_g"))
    val classSize = cell.groupBy(keys: _*).agg(sum(col("_n")).as("class_size"))
    cell
      .join(broadcast(globalDist), "_s")
      .join(classSize, quasiCols.indices.map(i => cell.columns(i)))
      .groupBy(keys :+ col("class_size"): _*)
      .agg(floor(sum(floor(greatest(
        col("_n") / col("class_size") - col("_g"), lit(0.0)) * lit(1e15) + lit(0.5)))
          .cast("double") / lit(1e15) * lit(1e6) + lit(0.5))
        .cast("long").as("tvd_e6"))
      .withColumn("above_t", col("tvd_e6") > lit(math.floor(t * 1e6 + 0.5).toLong))
  }

  /** Differentially-private noisy counts — the RELEASE step after the
    * [[kAnonymity]]/[[lDiversity]]/[[tCloseness]] audits: per-key counts
    * with Laplace(1/ε) noise added, the standard ε-DP mechanism for a
    * count query (sensitivity 1). The noise is DETERMINISTIC given
    * (seed, key): a keyed md5 hash maps to a uniform u ∈ (−½, ½), then
    * through the Laplace inverse CDF `−(1/ε)·sgn(u)·ln(1−2|u|)` — so the
    * release is reproducible across engines, retries, and partitionings
    * with no RNG state, the same seeded-hash discipline as the sampling
    * ops. (Determinism-given-seed is exactly the cryptographic-PRF DP
    * deployment shape; rotate the seed per release.) Returns
    * `(k, noisy_e6)` with the noisy count quantized to 1e-6 so the float
    * is hash-comparable. The exact count is deliberately NOT in the
    * output — releasing it alongside the noise would void the guarantee.
    *
    * DP caveats the caller owns: sensitivity 1 assumes each individual
    * contributes at most ONE row (pre-aggregate per individual first if
    * not); and the released KEY SET here is data-dependent — a rare key's
    * mere presence leaks membership. When the key domain is not public,
    * pass `threshold > 0` to suppress keys whose noisy count falls below
    * it (the standard stability-based remedy), or densify over a public
    * domain before calling.
    *
    * Scale: one hash aggregation (map-side partials), then per-row scalar
    * math on the domain-bounded aggregate — the noise step adds zero
    * shuffles and runs on |keys| rows, not |data|. */
  def dpNoisyCounts(df: DataFrame, keyCol: Column, epsilon: Double,
      seed: String, threshold: Double = 0.0): DataFrame = {
    require(epsilon > 0, s"epsilon must be > 0: $epsilon")
    require(threshold >= 0, s"threshold must be >= 0: $threshold")
    // u ∈ (−½, ½), endpoints excluded: 32-bit hash x → (x+1)/(2^32+2) − ½
    val u = (conv(substring(md5(concat_ws("|", lit(seed), col("k"))), 1, 8),
      16, 10).cast("double") + 1.0) / 4294967298.0 - 0.5
    df.groupBy(keyCol.as("k"))
      .agg(count(lit(1)).as("n"))
      .withColumn("_u", u)
      .withColumn("noisy_e6",
        floor((col("n") - signum(col("_u")) * log(lit(1.0) - lit(2.0) * abs(col("_u")))
          / epsilon) * 1e6 + 0.5).cast("long"))
      .filter(if (threshold > 0) col("noisy_e6") >= lit(threshold * 1e6) else lit(true))
      .select(col("k"), col("noisy_e6"))
  }

  /** SCD type-2 history build — the warehouse companion to [[cdcApply]]:
    * from a change log of `(key, ts, value)` observations, produce the
    * slowly-changing-dimension history table `(key, value, valid_from,
    * valid_to, is_current)`. Consecutive observations with an UNCHANGED
    * value collapse into one validity interval (the no-op update rule —
    * null-safe, so null→null does not open a new row), `valid_to` is the
    * next change's timestamp (null while current), and ties on ts break
    * on the sequence column so replays are deterministic.
    *
    * Two windows over one (key, ts, seq) sort — change detection via
    * null-safe lag, then lead for the close timestamp — and Spark plans
    * them as a single sort. Scale: one shuffle on the key; no
    * per-key collect, no driver state; a key's history sorts within its
    * partition. */
  def scd2Build(changes: DataFrame, key: Column, ts: Column, seq: Column,
      value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("k").orderBy(col("_ts"), col("_seq"))
    changes.select(key.as("k"), ts.as("_ts"), seq.as("_seq"),
        value.as("value"))
      .filter(col("_ts").isNotNull)
      // keep only rows where the value actually changed (or first row)
      .withColumn("_prev", lag(col("value"), 1).over(w))
      .withColumn("_first", row_number().over(w) === 1)
      .filter(col("_first") || !(col("value") <=> col("_prev")))
      .withColumn("valid_from", col("_ts"))
      .withColumn("valid_to", lead(col("_ts"), 1).over(w))
      .select(col("k"), col("value"), col("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Benford first-digit audit — the forensic data-quality screen for
    * "organically grown" numeric columns (prices, populations, ledger
    * amounts): their first significant digits should follow
    * `P(d) = log₁₀(1 + 1/d)`, and fabricated or truncated data visibly
    * does not. Emits one row per digit 1-9 and group: observed count,
    * expected count (1e-6 quantized), and the digit's χ² contribution
    * `(obs − exp)²/exp` (1e-6 quantized) — per-digit rows rather than a
    * summed statistic, so no cross-digit float fold exists to disagree
    * across engines.
    *
    * Digit extraction is STRING-based on a fixed-point long (`value`
    * scaled by 10^scale and rounded): integer-to-decimal-string is
    * exact and identical everywhere, where a `log10`-based extraction
    * sits one ulp from the wrong digit at every power of ten. Zero
    * values have no first significant digit and are excluded.
    *
    * Scale: one hash aggregation on (group, digit) — 9 cells per group —
    * partial map-side; the expected/χ² math runs on the tiny aggregate. */
  def benfordAudit(df: DataFrame, groupCols: Seq[Column], value: Column,
      scale: Int = 2): DataFrame = {
    require(scale >= 0 && scale <= 6, s"scale must be in [0,6]: $scale")
    val keyed = df.select(groupCols :+
      floor(abs(value.cast("double")) * math.pow(10, scale).toLong + 0.5)
        .cast("long").as("_v"): _*)
      .filter(col("_v").isNotNull && col("_v") > 0)
    val gNames = keyed.columns.dropRight(1)
    val g = gNames.map(col)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(gNames.map(col): _*)
    keyed
      .withColumn("digit",
        substring(col("_v").cast("string"), 1, 1).cast("long"))
      .groupBy(g :+ col("digit"): _*)
      .agg(count(lit(1)).as("n_obs"))
      .withColumn("_n", sum(col("n_obs")).over(wAll))
      // ln(x)/ln(10) rather than a log10 builtin: both engines then run
      // the IDENTICAL IEEE ops, so the 1e-6 quantization can't straddle
      .withColumn("_exp",
        col("_n") * (log(lit(1.0) + lit(1.0) / col("digit"))
          / log(lit(10.0))))
      .select(g ++ Seq(col("digit"), col("n_obs"),
        floor(col("_exp") * 1e6 + 0.5).cast("long").as("expected_e6"),
        floor((col("n_obs") - col("_exp")) * (col("n_obs") - col("_exp"))
          / col("_exp") * 1e6 + 0.5).cast("long").as("chi2_e6")): _*)
  }

  /** Golden-record survivorship — the MDM merge step after entity
    * resolution: one row per key where EACH payload column independently
    * takes its most recent NON-NULL observation (last-non-null-wins per
    * field, the standard survivorship rule — a fresher row with a null
    * phone must not erase the older phone). Recency is (ts, seq) encoded
    * as one zero-padded sortable string, so the per-field pick is a
    * single `max_by` whose ordering any engine reproduces; rows where
    * the field is null contribute a null ordinate and are ignored by the
    * aggregate. Also emits `last_ts` (the key's newest observation) and
    * `n_obs`.
    *
    * One hash aggregation, partial map-side — no windows, no joins; a
    * hot key folds through combiners instead of serializing a sort.
    * Requires non-negative ts/seq (the padding contract). */
  def goldenRecord(df: DataFrame, key: Column, ts: Column, seq: Column,
      valueCols: Seq[String]): DataFrame = {
    val ord = concat(lpad(ts.cast("string"), 20, "0"), lit("|"),
      lpad(seq.cast("string"), 20, "0"))
    val base = df.select(Seq(key.as("k"), ts.as("_ts"), ord.as("_ord")) ++
      valueCols.map(col): _*)
    val picks = valueCols.map(c =>
      max_by(col(c), when(col(c).isNotNull, col("_ord"))).as(c))
    base.groupBy("k")
      .agg(picks.head,
        picks.tail ++ Seq(max(col("_ts")).as("last_ts"),
          count(lit(1)).as("n_obs")): _*)
  }

  /** Referential-integrity audit: orphan counts for a child→parent
    * foreign key — the first data-contract check any warehouse load
    * runs. `left_anti` join from the child's FK values (nulls reported
    * separately, not as orphans) against the parent's key set; emits a
    * ONE-ROW summary `(n_child, n_null_fk, n_orphans, orphan_rate_e6)`.
    *
    * Scale: the anti-join shuffles on the key (AQE broadcasts a small
    * parent); counts partial-aggregate. Nothing returns to the driver
    * but the summary row. */
  def fkOrphans(child: DataFrame, childKey: Column, parent: DataFrame,
      parentKey: Column): DataFrame = {
    val c = child.select(childKey.as("fk"))
    val nonNull = c.filter(col("fk").isNotNull)
    val orphans = nonNull
      .join(parent.select(parentKey.as("fk")).distinct(), Seq("fk"),
        "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    val totals = c.agg(count(lit(1)).as("n_child"),
      sum(when(col("fk").isNull, 1L).otherwise(0L)).as("n_null_fk"))
    totals.crossJoin(orphans)
      .withColumn("orphan_rate_e6",
        floor(col("n_orphans").cast("double")
          / greatest(col("n_child") - col("n_null_fk"), lit(1L)) * 1e6
          + 0.5).cast("long"))
  }

  /** Differentially-private mean release per key — the companion to
    * [[dpNoisyCounts]] for numeric columns. Values are CLAMPED to
    * `[lo, hi]` first (that bound, not the data, sets the sensitivity —
    * the standard bounded-mean mechanism), then sum and count are
    * released with independent Laplace noise (`(hi−lo)/εs` and `1/εc`
    * scales) and the mean is their ratio with the noisy count floored at
    * 1. Total privacy cost is εs + εc by composition.
    *
    * Noise is deterministic-given-seed exactly as in [[dpNoisyCounts]]
    * (keyed md5 → uniform → Laplace inverse CDF), with DISTINCT salts for
    * the sum and count draws — two independent mechanisms, one seed.
    * Released columns are only `(k, dp_mean_e6)`; neither the exact count
    * nor the exact sum appears. Same caveats as dpNoisyCounts: one row
    * per individual, and a data-dependent key set unless the caller
    * densifies or thresholds.
    *
    * Scale: one hash aggregation (clamped sums fold exactly as decimals,
    * map-side partials), then scalar math on |keys| rows. */
  def dpMean(df: DataFrame, keyCol: Column, valueCol: Column,
      lo: Double, hi: Double, epsSum: Double, epsCount: Double,
      seed: String): DataFrame = {
    require(hi > lo, s"need hi > lo: [$lo, $hi]")
    require(epsSum > 0 && epsCount > 0, "epsilons must be > 0")
    def unif(salt: String) =
      (conv(substring(md5(concat_ws("|", lit(seed), lit(salt), col("k"))),
        1, 8), 16, 10).cast("double") + 1.0) / 4294967298.0 - 0.5
    def lap(u: Column, scale: Double) =
      -lit(scale) * signum(u) * log(lit(1.0) - lit(2.0) * abs(u))
    df.select(keyCol.as("k"),
        least(greatest(valueCol.cast("double"), lit(lo)), lit(hi)).as("_v"))
      .filter(col("_v").isNotNull)
      .groupBy("k")
      .agg(count(lit(1)).as("_n"),
        sum(col("_v").cast("decimal(18,6)")).cast("double").as("_s"))
      .withColumn("_ds", col("_s") + lap(unif("sum"), (hi - lo) / epsSum))
      .withColumn("_dn",
        greatest(col("_n") + lap(unif("cnt"), 1.0 / epsCount), lit(1.0)))
      .select(col("k"),
        floor(col("_ds") / col("_dn") * 1e6 + 0.5).cast("long")
          .as("dp_mean_e6"))
  }

  /** Global-recoding generalization to k-anonymity for ONE numeric
    * quasi-identifier: given an ascending ladder of bin widths (each a
    * coarser generalization), pick the FINEST level at which every
    * non-empty equivalence class holds at least k rows, and release the
    * per-class histogram at that level. If no level satisfies k, the
    * coarsest ladder level is released (callers wanting suppression
    * instead should filter the result). This is the single-attribute
    * core of Mondrian-style recoding, made deterministic — no greedy
    * median cuts, so any engine derives the identical release.
    *
    * One pass: explode the L ladder levels over the data (L is small),
    * count per (level, bin), min-count per level, pick the finest valid
    * level, emit its classes. Everything aggregates map-side; no windows
    * over the data, no collect. */
  def generalizeToK(df: DataFrame, qiCol: Column, widths: Seq[Long],
      k: Long): DataFrame = {
    require(widths.nonEmpty && widths == widths.sorted,
      s"widths must be ascending: $widths")
    require(k >= 1, s"k must be >= 1: $k")
    val lv = array(widths.map(lit): _*)
    val binned = df.select(qiCol.cast("double").as("_x"))
      .filter(col("_x").isNotNull)
      .select(explode(lv).as("width"), col("_x"))
      .select(col("width"),
        (floor(col("_x") / col("width")) * col("width")).cast("long")
          .as("bin_lo"))
      .groupBy("width", "bin_lo").agg(count(lit(1)).as("n"))
    val valid = binned.groupBy("width")
      .agg(min(col("n")).as("_minn"))
      .filter(col("_minn") >= k)
      .agg(min(col("width")).as("width"))
      // no valid level -> coarsest ladder entry
      .select(coalesce(col("width"), lit(widths.last)).as("width"))
    binned.join(valid, Seq("width"))
      .select(col("width"), col("bin_lo"), col("n"))
  }

  /** Bucketed table checksums — the anti-entropy / replication-validation
    * primitive: reduce a table to `buckets` rows of
    * `(bucket, n, digest)` where `digest` is the XOR of per-row md5
    * digests, so two replicas (or a table and its restored backup, or
    * source and sink of a migration) compare by exchanging KILOBYTES, and
    * only mismatched buckets need row-level repair ([[snapshotDiff]] on
    * the affected key range). XOR is order- and partition-independent, so
    * the digest is stable under any shuffle; the row count rides along
    * because XOR alone is blind to a row duplicated an even number of
    * times. Rows are serialized `key…|value…` with nulls mapped to a
    * sentinel (concat_ws would silently drop them, colliding
    * `(x,null,y)` with `(x,y,null)`). Double columns should be quantized
    * by the caller first — engines do not agree on float-to-string
    * rendering.
    *
    * Scale: one map-side-partial aggregation to `buckets` rows; comparing
    * two 100 TB tables moves 2 × buckets rows over the network. */
  def bucketChecksums(df: DataFrame, keyCols: Seq[Column],
      valueCols: Seq[Column], buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    def str(c: Column) = coalesce(c.cast("string"), lit("<null>"))
    val rowStr = concat_ws("|", (keyCols ++ valueCols).map(str): _*)
    val keyStr = concat_ws("|", keyCols.map(str): _*)
    df.select(
        graft.functions.TextFunctions.portableBucket(keyStr, buckets)
          .as("bucket"),
        conv(substring(md5(rowStr), 1, 15), 16, 10).cast("long").as("digest"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), expr("bit_xor(digest)").as("digest"))
  }

  /** Full-outer compare of two [[bucketChecksums]] tables: the buckets
    * whose `(n, digest)` disagree — empty output means the tables match. */
  def checksumDiff(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("bucket"), col("n").as("n_a"), col("digest").as("digest_a"))
      .join(b.select(col("bucket"), col("n").as("n_b"),
        col("digest").as("digest_b")), Seq("bucket"), "full_outer")
      .filter(!(col("n_a") <=> col("n_b")) ||
        !(col("digest_a") <=> col("digest_b")))

  /** Keyed pseudonymization — deterministic tokenization of direct
    * identifiers, the de-identification step that runs BEFORE data reaches
    * the audits above ([[kAnonymity]]/[[lDiversity]] operate on
    * quasi-identifiers that remain). Each listed column is replaced in
    * place by the first 16 hex of `md5(secret|column|value)`:
    *
    *  - deterministic given the secret, so the same value maps to the same
    *    token everywhere — joins, group-bys, and dedup keyed on the column
    *    still work across tables and batches;
    *  - the COLUMN NAME is salted in, so the same raw value appearing in
    *    two different columns yields unlinkable tokens (no accidental
    *    cross-column correlation);
    *  - nulls stay null (absence is not a value to disguise);
    *  - rotating the secret rotates every token — the standard
    *    re-keying / revocation lever. Keep the secret out of the released
    *    data; with it, tokens are replayable (that is the point: it is a
    *    pseudonymization, not an anonymization — pair with the audits for
    *    the residual quasi-identifier risk).
    *
    * Scale: a zero-shuffle per-row map, codegen'd end-to-end — the
    * pseudonymization pass adds nothing to any plan shape. */
  def pseudonymize(df: DataFrame, cols: Seq[String], secret: String): DataFrame = {
    require(cols.nonEmpty, "pseudonymize: no columns listed")
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c,
        when(col(c).isNotNull,
          substring(md5(concat_ws("|", lit(secret), lit(c),
            col(c).cast("string"))), 1, 16)))
    }
  }

  /** Zone maps — the scan-pruning statistics a 100 TB table keeps per
    * bucket/partition (min/max/null-count per column), the structure
    * behind "skip 97% of files for this predicate". One row per
    * (bucket, column): `(bucket, column, n_rows, n_null, min_e6,
    * max_e6)`, numeric columns only (values quantize to 1e-6 — string
    * zone maps need collation contracts this release deliberately
    * avoids). Pair with the Z-order op: clustering tightens the ranges,
    * zone maps are where the tightening pays off.
    *
    * Scale: ONE map-side-partial hash aggregation to |buckets| rows,
    * then a per-row explode to the (bucket, column) release — the same
    * single-pass shape as [[bucketChecksums]]. */
  def zoneMaps(df: DataFrame, bucket: Column, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "zoneMaps: no columns listed")
    val base = df.select(bucket.as("bucket") +:
      cols.map(c => col(c).cast("double").as(c)): _*)
    val aggs = cols.flatMap { c =>
      Seq(min(col(c)).as(s"_mn_$c"), max(col(c)).as(s"_mx_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_z_$c"))
    }
    val one = base.groupBy("bucket").agg(count(lit(1)).as("_n"), aggs: _*)
    def e6(c: Column) =
      when(c.isNotNull, floor(c * 1e6 + 0.5).cast("long"))
    val stacked = cols.map { c =>
      struct(lit(c).as("column"), col("_n").as("n_rows"),
        col(s"_z_$c").as("n_null"),
        e6(col(s"_mn_$c")).as("min_e6"), e6(col(s"_mx_$c")).as("max_e6"))
    }
    one.select(col("bucket"), explode(array(stacked: _*)).as("_r"))
      .select(col("bucket"), col("_r.column"), col("_r.n_rows"),
        col("_r.n_null"), col("_r.min_e6"), col("_r.max_e6"))
  }

  /** Point-in-time snapshot from an SCD2 history ([[scd2Build]]'s
    * output): the rows whose validity interval covers `ts` — the
    * "rebuild the dimension as of last March" query that is the whole
    * point of keeping history. Interval semantics match scd2Build:
    * `valid_from <= ts < valid_to`, open-ended rows (null valid_to)
    * cover everything from their start. A pushed-down filter — one
    * scan, no shuffle, partition-prunable when the history is stored
    * partitioned on valid_from. */
  def asOfSnapshot(history: DataFrame, ts: Column): DataFrame =
    history.filter(col("valid_from") <= ts &&
      (col("valid_to").isNull || ts < col("valid_to")))

  /** Candidate-key profiling — the schema-discovery pass a warehouse
    * onboarding job runs first: for each listed column, exact row /
    * distinct / null counts and whether the column is a candidate key
    * (every non-null value unique AND no nulls). One row per column:
    * `(column, n_rows, n_distinct, n_null, uniqueness_e6, is_key)`,
    * where uniqueness = distinct / non-null rows (1e-6 quantized).
    *
    * All listed columns profile in ONE aggregation — Spark plans the
    * multi-column distinct set as a single Expand over the scan (k
    * streams of one pass), not k separate jobs; counts are exact longs,
    * so the release is hash-stable by construction. Scale: the expand
    * multiplies rows by k before the hash agg, the standard
    * distinct-rollup cost; partials combine map-side. */
  def keyProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "keyProfile: no columns listed")
    val aggs = cols.flatMap { c =>
      Seq(count_distinct(col(c)).as(s"_d_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_z_$c"))
    }
    val one = df.agg(count(lit(1)).as("_n"), aggs: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("column"), col("_n").as("n_rows"),
        col(s"_d_$c").as("n_distinct"), col(s"_z_$c").as("n_null"))
    }
    one.select(explode(array(stacked: _*)).as("_r"))
      .select(col("_r.column"), col("_r.n_rows"), col("_r.n_distinct"),
        col("_r.n_null"))
      .withColumn("uniqueness_e6",
        when(col("n_rows") > col("n_null"),
          floor(col("n_distinct").cast("double")
            / (col("n_rows") - col("n_null")) * 1e6 + 0.5).cast("long")))
      .withColumn("is_key",
        col("n_null") === 0L && col("n_distinct") === col("n_rows"))
      .orderBy("column")
  }

  /** Functional-dependency audit for `lhs → rhs`: does each left-hand
    * value determine exactly one right-hand value? Emits a ONE-ROW
    * summary `(n_lhs, n_violating_lhs, n_rows_in_violations,
    * max_rhs_per_lhs)` — the counts a contract check alerts on, not the
    * violating rows themselves (pair with [[expectations]] to dump
    * examples). Nulls on the left drop (no key); a null right-hand value
    * counts as a distinct image (a present-vs-missing conflict IS a
    * violation), via a sentinel under the same null discipline as
    * [[bucketChecksums]].
    *
    * Scale: two hash aggregations — (lhs, rhs) cells then lhs — both
    * map-side partial; the summary is a third fold over |lhs| rows. */
  def fdViolations(df: DataFrame, lhs: Seq[Column], rhs: Column): DataFrame = {
    require(lhs.nonEmpty, "fdViolations: empty lhs")
    val cells = df
      .filter(lhs.map(_.isNotNull).reduce(_ && _))
      .select(concat_ws("|", lhs.map(_.cast("string")): _*).as("_l"),
        coalesce(rhs.cast("string"), lit("<null>")).as("_r"))
      .groupBy(col("_l"), col("_r"))
      .agg(count(lit(1)).as("_n"))
    cells.groupBy(col("_l"))
      .agg(count(lit(1)).as("_imgs"), sum(col("_n")).as("_rows"))
      .agg(count(lit(1)).as("n_lhs"),
        sum(when(col("_imgs") > 1L, 1L).otherwise(0L))
          .as("n_violating_lhs"),
        sum(when(col("_imgs") > 1L, col("_rows")).otherwise(0L))
          .as("n_rows_in_violations"),
        max(col("_imgs")).as("max_rhs_per_lhs"))
  }
}
