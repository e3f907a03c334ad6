package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Baseline: brute-force cosine top-k via a broadcast of
  * the (small) query set against the (huge) corpus — one pass over the
  * corpus, no shuffle of the corpus itself; per-partition top-k then a
  * k-merge. Scale path: LSH bucketing by random hyperplane signs so each
  * query only scans its bucket.
  */
object SimilarityOps {

  /** Sequential-fold dot product over double-cast arrays: deterministic
    * accumulation order (left fold), so results are bit-stable. Kept as the
    * composable HOF formulation; the hot path below uses the native
    * codegen'd expression. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Native Catalyst expression ([[graft.plans.CosineSimilarity]]): fused
    * codegen loop, bit-identical to the fold formulation. */
  def cosine(a: Column, b: Column): Column =
    graft.plans.NativeFunctions.cosine_similarity(a, b)

  /** Brute-force cosine top-k: for each row of `queries` (small — broadcast),
    * the k nearest corpus rows by cosine. Ranking uses the 6-dp-rounded
    * similarity with the corpus id as tiebreak, making the result set
    * deterministic under floating-point jitter. */
  def cosineTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cvec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = c
      .join(broadcast(q), col("nbr_id") =!= col("query_id"))
      .select(col("query_id"), col("nbr_id"),
        round(cosine(col("qvec"), col("cvec")), 6).as("sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Embedding-cosine near-dup: the top-k most similar distinct pairs in the
    * corpus by cosine. Brute-force all-pairs here (BroadcastNestedLoopJoin +
    * the codegen'd native cosine; fine to ~10^4 rows); at 100TB-scale
    * corpora swap the pair source for [[lshCosineTopK]]'s bucketed
    * candidates — the ranking/tiebreak logic is identical. */
  def nearDupPairs(
      corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = corpus.select(col(idCol).as("a"), col(vecCol).as("va"))
    val b = corpus.select(col(idCol).as("b"), col(vecCol).as("vb"))
    a.crossJoin(broadcast(b))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), round(cosine(col("va"), col("vb")), 6).as("sim"))
      .orderBy(col("sim").desc, col("a"), col("b"))
      .limit(k)
  }

  /** IVF (inverted-file) ANN — the other standard scale path besides LSH.
    * Coarse quantizer is deterministic ("training-free"): centroids are the
    * `nlist` lowest-id corpus vectors, every vector is assigned to its
    * nearest centroid (rounded cosine, centroid-id tiebreak — so any engine
    * reproduces the same buckets), and a query probes only its `nprobe`
    * nearest centroids' buckets. Search cost drops from |corpus| to
    * nprobe/nlist of it; a k-means-refined quantizer slots in by replacing
    * `centroids` without touching the bucket/search dataflow. */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, k: Int, nlist: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cent = corpus.filter(col(idCol) < nlist)
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"))
    def nearestBuckets(df: DataFrame, outId: String, outVec: String, n: Int) = {
      val w = Window.partitionBy(col(outId))
        .orderBy(round(cosine(col(outVec), col("cvec")), 6).desc, col("cid"))
      df.select(col(idCol).as(outId), col(vecCol).as(outVec))
        .crossJoin(broadcast(cent))
        .withColumn("_crn", row_number().over(w))
        .filter(col("_crn") <= n)
        .drop("_crn", "cvec")
    }
    val assigned = nearestBuckets(corpus, "nbr_id", "cvec2", 1)
    val probes = nearestBuckets(queries, "query_id", "qvec", nprobe)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("nbr_id"))
    probes.join(assigned, Seq("cid"))
      .filter(col("nbr_id") =!= col("query_id"))
      .select(col("query_id"), col("nbr_id"),
        round(cosine(col("qvec"), col("cvec2")), 6).as("sim"))
      // no pair dedup needed: each corpus vector lives in exactly one bucket
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Random-hyperplane LSH signature: sign bits of dot(vec, h_i) for
    * deterministic pseudo-random hyperplanes derived from (seed, i, dim) via
    * a hash — reproducible without shipping hyperplane data. Vectors landing
    * in the same signature bucket are candidate neighbors; search cost drops
    * from N to bucket size per query. */
  def hyperplaneSignature(vec: Column, dims: Int, planes: Int, seed: Int = 42): Column = {
    def planeDot(p: Int): Column =
      aggregate(
        zip_with(vec, sequence(lit(0), lit(dims - 1)), (x, d) => {
          // deterministic pseudo-random coefficient in [-1, 1): from
          // xxhash64 of (seed, plane, dim) — engine-internal only (not
          // oracle-checked), so the fast non-portable hash is fine here.
          val h = xxhash64(lit(seed), lit(p), d)
          x.cast("double") * (pmod(h, lit(2000001L)).cast("double") / 1000000.0 - 1.0)
        }),
        lit(0.0), (acc, v) => acc + v)
    concat((0 until planes).map(p => when(planeDot(p) >= 0, "1").otherwise("0")): _*)
  }

  /** Bucketed ANN: both sides keyed by LSH signature; top-k within bucket.
    * Recall < 1.0 by construction — pair with [[cosineTopK]] on a sampled
    * query set to measure recall, the standard IVF/LSH operating procedure. */
  def lshCosineTopK(
      corpus: DataFrame, queries: DataFrame, k: Int, dims: Int, planes: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cvec"),
      hyperplaneSignature(col(vecCol), dims, planes).as("sig"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      hyperplaneSignature(col(vecCol), dims, planes).as("sig"))
    val scored = c.join(q, Seq("sig"))
      .filter(col("nbr_id") =!= col("query_id"))
      .select(col("query_id"), col("nbr_id"),
        round(cosine(col("qvec"), col("cvec")), 6).as("sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
