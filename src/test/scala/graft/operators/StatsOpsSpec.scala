package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** MAD outliers, chi-square, and token entropy against hand computations. */
class StatsOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("madOutliers: median survives the outlier, z-score would not") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 100.0))
      .toDF("g", "x")
    val out = QualityOps.madOutliers(df, col("g"), col("x"))
      .as[(String, Double, Double, Long, Long)].collect().toSeq
    // median 3, devs [2,1,0,1,97] -> mad 1 -> only 97 exceeds 3*mad
    assert(out === Seq(("a", 3.0, 1.0, 5L, 1L)))
  }

  test("chiSquare: perfect dependence on a 2x2 diagonal") {
    val rows = Seq.fill(10)(("a1", "b1")) ++ Seq.fill(10)(("a2", "b2"))
    val out = QualityOps.chiSquare(rows.toDF("a", "b"), col("a"), col("b"))
      .as[(Long, Long, Long)].collect().head
    // e=5 in every cell: chi2 = 4 * 25/5 = 20
    assert(out === ((20L, 1L, 20000000L)))
  }

  test("chiSquare: independence gives zero") {
    val rows = for (a <- Seq("a1", "a2"); b <- Seq("b1", "b2"); _ <- 1 to 5)
      yield (a, b)
    val out = QualityOps.chiSquare(rows.toDF("a", "b"), col("a"), col("b"))
      .as[(Long, Long, Long)].collect().head
    assert(out === ((20L, 1L, 0L)))
  }

  test("tokenEntropy: uniform two-token corpus scores ln 2") {
    val df = Seq(("s", "a a b b")).toDF("src", "text")
    val out = CorpusOps.tokenEntropy(df, col("src"), col("text"))
      .as[(String, Long, Long, Long)].collect().head
    // two terms of -0.5*ln(0.5) -> floor(346573590.28) each
    assert(out === (("s", 4L, 2L, 693147180L)))
  }

  test("tokenEntropy: single-token source has zero entropy") {
    val df = Seq(("s", "a a a a")).toDF("src", "text")
    val out = CorpusOps.tokenEntropy(df, col("src"), col("text"))
      .as[(String, Long, Long, Long)].collect().head
    assert(out === (("s", 4L, 1L, 0L)))
  }
}
