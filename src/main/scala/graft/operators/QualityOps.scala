package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
