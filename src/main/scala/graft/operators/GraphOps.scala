package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph propagation over edge-list DataFrames.
  *
  * Connected components live in [[DedupOps]] (min-label propagation and the
  * large-star/small-star variant); this object holds rank-style propagation
  * where per-node state is numeric mass rather than a label.
  */
object GraphOps {

  /** PageRank over a directed edge list (`src`, `dst`), fixed iteration
    * count, with dangling-mass redistribution (nodes with no out-edges fold
    * their rank back uniformly, so total rank stays 1 and the result matches
    * the random-surfer definition rather than the mass-leaking shortcut).
    *
    * Scale design: the O(|E|) edge list is hash-partitioned by `src` once and
    * localCheckpoint'd up front; each power iteration shuffles only the
    * O(|V|) rank vector to meet it, and the new rank vector is checkpointed
    * so the two consumers of the previous one (dangling-mass fold and
    * contribution join) never recompute lineage. On a real cluster the same
    * shape holds with the edges bucketed by `src` — the corpus-sized side
    * never moves after iteration 0.
    *
    * Determinism: per-node contribution folds quantize `r/deg` to scaled
    * longs (1e15) so the aggregation is exact integer addition —
    * order-independent and bit-identical across engines, partitionings, and
    * retries. The quantization is part of the operator's definition and is
    * mirrored term-for-term by the DuckDB oracle. Individual terms are ≤ 1e15
    * and each fold sums a probability mass ≤ 1, so the long accumulator
    * cannot overflow.
    *
    * Edges are assumed distinct (parallel edges would count twice).
    */
  def pagerank(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .repartition(col("src"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count().toDouble
    val deg = e.groupBy("src")
      .agg(count(lit(1)).cast("double").as("deg"))
      .localCheckpoint()

    var ranks = nodes.select(col("id"), (lit(1.0) / lit(n)).as("r")).localCheckpoint()
    for (_ <- 1 to iters) {
      val withDeg = ranks
        .join(deg, ranks("id") === deg("src"), "left_outer")
        .select(col("id"), col("r"), col("deg"))
      // dangling mass: exact scaled-long fold of ranks with no out-edges;
      // a single scalar, so the driver-side head() is O(1)
      val danglingQ = withDeg.filter(col("deg").isNull)
        .agg(coalesce(sum(floor(col("r") * lit(1e15) + lit(0.5))), lit(0L)).as("dm"))
        .head().getLong(0)
      val dangling = danglingQ / 1e15
      val contribs = e
        .join(
          withDeg.filter(col("deg").isNotNull).withColumnRenamed("id", "src"),
          Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg((sum(floor(col("r") / col("deg") * lit(1e15) + lit(0.5))).cast("double")
          / lit(1e15)).as("contrib"))
      val next = nodes
        .join(contribs, Seq("id"), "left_outer")
        .select(col("id"),
          ((lit(1.0) - lit(damping)) / lit(n) +
            lit(damping) * (coalesce(col("contrib"), lit(0.0)) + lit(dangling) / lit(n)))
            .as("r"))
      ranks = next.localCheckpoint()
    }
    ranks
  }
}
