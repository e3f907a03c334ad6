package graft.tools

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions.col

import graft.operators.SimilarityOps

/** r16 probe (VERDICT r15 item 7): recall@k of PQ top-k under the two
  * codebook seeding rules — the r15 `k lowest ids` draw vs the r16
  * portable-hash (md5-order) sample — against exact squared-L2 top-k
  * ground truth. The id-order draw is deterministic but id-CORRELATED;
  * on a corpus whose ingest order tracks content it only ever trains on
  * the oldest slice. The hash draw keeps determinism (and the oracle
  * twin) while sampling uniformly. This records the non-regression the
  * verdict asked for.
  *
  * Usage: runMain graft.tools.PqRecallProbe
  *   SPARK_GRAFT_SF_DIR overrides the corpus dir (default sf0.01);
  *   SPARK_GRAFT_PQ_KS overrides codebook sizes (default 8,64).
  */
object PqRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.session("pq-recall-probe")
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val ks = sys.env.getOrElse("SPARK_GRAFT_PQ_KS", "8,64")
      .split(",").map(_.trim.toInt).toSeq
    val topK = 5
    val emb = graft.core.Graft.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).cache()
    // mid-range ids: disjoint from the low-id codebook's training slice
    // (queries inside the codebook would hand that arm free recall) and
    // vanishingly unlikely to overlap the tiny md5 sample
    val queries = emb.filter(col("vec_id") >= 250 && col("vec_id") < 300)

    // exact ground truth: squared-L2 top-k, same rounding/tiebreaks as
    // the PQ ranking so the comparison is apples-to-apples
    def l2TopK(c: DataFrame, q: DataFrame): Map[Long, Seq[Long]] = {
      val cv = c.select(col("vec_id").as("nbr_id"),
        col("embedding").cast("array<double>").as("cv"))
      val qv = q.select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("qv"))
      val d = F.round(
        SimilarityOps.dot(col("qv"), col("qv"))
          - F.lit(2.0) * SimilarityOps.dot(col("qv"), col("cv"))
          + SimilarityOps.dot(col("cv"), col("cv")), 6)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("dist").asc, col("nbr_id"))
      cv.join(F.broadcast(qv), col("nbr_id") =!= col("query_id"))
        .select(col("query_id"), col("nbr_id"), d.as("dist"))
        .withColumn("rank", F.row_number().over(w))
        .filter(col("rank") <= topK)
        .select("query_id", "nbr_id")
        .collect().groupBy(_.getLong(0))
        .map { case (q0, rs) => q0 -> rs.map(_.getLong(1)).toSeq }
    }
    val truth = l2TopK(emb, queries)

    def recallOf(cb: Array[Array[Array[Double]]]): Double = {
      val got = SimilarityOps.pqTopK(emb, queries, topK, cb)
        .select("query_id", "nbr_id")
        .collect().groupBy(_.getLong(0))
        .map { case (q0, rs) => q0 -> rs.map(_.getLong(1)).toSet }
      val hits = truth.toSeq.map { case (q0, t) =>
        t.count(got.getOrElse(q0, Set.empty)).toDouble / t.size
      }
      hits.sum / hits.size
    }

    val points = ks.map { k =>
      // the r15 rule: train on the k lowest ids (an exactly-k frame is
      // draw-order-invariant, so this reproduces the old codebook)
      val lowId = SimilarityOps.pqCodebook(
        emb.orderBy("vec_id").limit(k), m = 4, k = k)
      // the r16 rule: portable-hash sample over the whole corpus
      val hashed = SimilarityOps.pqCodebook(emb, m = 4, k = k)
      val (rOld, rNew) = (recallOf(lowId), recallOf(hashed))
      println(f"""{"k":$k,"recall_low_id":$rOld%.4f,"recall_md5":$rNew%.4f}""")
      (k, rOld, rNew)
    }
    val summary = points.map { case (k, o, n) =>
      f""""k$k":{"low_id":$o%.4f,"md5":$n%.4f}""" }.mkString(",")
    println(s"""{"metric":"pq_recall_r16","topk":$topK,$summary,"sf":"$dir"}""")
    spark.stop()
  }
}
