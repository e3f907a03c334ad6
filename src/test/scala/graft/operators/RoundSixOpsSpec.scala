package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Round-6 operators: DSIR importance weights, k-anonymity / l-diversity
  * audits, against hand-checkable fixtures. */
class RoundSixOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("importanceWeights: target-vocabulary docs weigh above source-vocabulary docs") {
    // target docs speak 'aa bb', source docs speak 'xx yy'; a candidate in
    // target vocabulary must outscore one in source vocabulary
    val df = Seq(
      (1L, "aa bb aa bb", true), (2L, "aa bb bb aa", true),
      (3L, "xx yy xx yy", false), (4L, "yy xx yy xx", false),
      (5L, "aa bb aa bb", false), (6L, "xx yy xx yy", false))
      .toDF("doc_id", "text", "is_target")
    val w = CorpusOps.importanceWeights(df, col("doc_id"), col("text"),
        col("is_target"), nBuckets = 64, alpha = 1.0)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(w(5L) > w(6L), s"target-like doc must outscore source-like: $w")
    assert(w(1L) > 0L && w(3L) < 0L)
  }

  test("importanceWeights: n_feats counts every token") {
    val df = Seq((1L, "a b c", true), (2L, "d d", false)).toDF("id", "text", "t")
    val out = CorpusOps.importanceWeights(df, col("id"), col("text"), col("t"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(out === Map(1L -> 3L, 2L -> 2L))
  }

  test("kAnonymity: classes below k flagged, others not") {
    val df = (Seq.fill(5)(("US", "a")) ++ Seq.fill(2)(("FR", "a")))
      .toDF("country", "seg")
    val out = QualityOps.kAnonymity(df, Seq(col("country"), col("seg")), k = 3)
      .as[(String, String, Long, Boolean)].collect().toSet
    assert(out === Set(("US", "a", 5L, false), ("FR", "a", 2L, true)))
  }

  test("lDiversity: homogeneous class flagged even when large") {
    val df = (Seq.fill(6)(("US", "flu")) ++
      Seq(("FR", "flu"), ("FR", "cold"), ("FR", "covid")))
      .toDF("country", "diagnosis")
    val out = QualityOps.lDiversity(df, Seq(col("country")), col("diagnosis"), l = 2)
      .as[(String, Long, Long, Boolean)].collect().toSet
    // US: 6 rows but 1 sensitive value -> below_l; FR: 3 distinct -> ok
    assert(out === Set(("US", 6L, 1L, true), ("FR", 3L, 3L, false)))
  }

  test("lDiversity: null sensitive values do not count toward diversity") {
    val df = Seq(("US", "flu"), ("US", null), ("US", null)).toDF("c", "s")
    val out = QualityOps.lDiversity(df, Seq(col("c")), col("s"), l = 2)
      .as[(String, Long, Long, Boolean)].collect().head
    assert(out === (("US", 3L, 1L, true)))
  }

  test("semanticDedup: lowest id survives its near-dup neighborhood, cells isolate") {
    // cells along axes: c0=(1,0,0,0), c1=(0,1,0,0). Vectors 10/11/12 are
    // near-identical in cell 0 -> only 10 kept; 20 sits alone in cell 1;
    // 21 is IDENTICAL to 10 but lands in cell 1 (cell-scoped check keeps
    // it -- the documented approximation vs all-pairs)
    val cents = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)), (1L, Seq(0.0, 1.0, 0.0, 0.0)))
      .toDF("cid", "cvec")
    val vecs = Seq(
      (10L, Seq(1.0, 0.1, 0.0, 0.0)),
      (11L, Seq(1.0, 0.11, 0.0, 0.0)),
      (12L, Seq(0.99, 0.1, 0.0, 0.0)),
      (20L, Seq(0.0, 1.0, 0.3, 0.0)),
      (21L, Seq(0.1, 1.0, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val out = SimilarityOps.semanticDedup(vecs, cents, tau = 0.99)
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(10L) === ((0L, true)))
    assert(out(11L) === ((0L, false)))
    assert(out(12L) === ((0L, false)))
    assert(out(20L) === ((1L, true)))
    assert(out(21L) === ((1L, true)))
  }

  test("semanticDedup: tau above every similarity keeps everything") {
    val cents = Seq((0L, Seq(1.0, 0.0))).toDF("cid", "cvec")
    val vecs = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val out = SimilarityOps.semanticDedup(vecs, cents, tau = 1.0)
      .as[(Long, Long, Boolean)].collect()
    assert(out.forall(_._3), s"orthogonal vectors must both survive: ${out.toSeq}")
  }

  test("temperatureMix: n^alpha rates — rare groups keep all, the head downsamples") {
    // A: 100 docs, B: 4 docs, alpha 0.5, target 50%:
    //   s_A = 10e6, s_B = 2e6, W = 12e6, N = 104
    //   rate_A = min(1, 0.5*104*10e6 / (12e6*100)) = 0.43333…  -> 433333 e6-floored
    //   rate_B = min(1, 0.5*104*2e6  / (12e6*4))   = 1.0       -> 1000000
    val docs = ((1 to 100).map(i => (i.toLong, "A")) ++
      (201 to 204).map(i => (i.toLong, "B"))).toDF("id", "g")
    val kept = CorpusOps.temperatureMix(docs, col("g"), col("id"),
      alpha = 0.5, targetFraction = 0.5)
    val rates = kept.select(col("g"), col("rate_e6")).distinct()
      .as[(String, Long)].collect().toMap
    assert(rates("A") === 433333L)
    assert(rates("B") === 1000000L)
    assert(kept.filter(col("g") === "B").count() === 4,
      "a rate-1 group keeps every row")
    val nA = kept.filter(col("g") === "A").count()
    assert(nA > 20 && nA < 70, s"the head samples at ~43%: $nA")
    // deterministic: the same call keeps the same exact set
    val again = CorpusOps.temperatureMix(docs, col("g"), col("id"), 0.5, 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(again === kept.select("id").as[Long].collect().sorted.toSeq)
  }
}
