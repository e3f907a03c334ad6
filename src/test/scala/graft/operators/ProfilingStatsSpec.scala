package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Relational-profiling + rank/variance statistics: Spearman rho, one-way
  * ANOVA F, candidate-key profiling, functional-dependency audit —
  * hand-checkable fixtures. */
class ProfilingStatsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("spearman: monotone association is ±1, constant side is null") {
    val df = Seq(
      ("a", 1.0, 1.0), ("a", 2.0, 4.0), ("a", 3.0, 9.0), ("a", 4.0, 16.0),
      ("b", 1.0, 5.0), ("b", 2.0, 4.0), ("b", 3.0, 3.0),
      ("c", 1.0, 1.0), ("c", 1.0, 2.0), ("c", 1.0, 3.0))
      .toDF("g", "x", "y")
    val out = StatsOps.spearman(df, Seq(col("g")), col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    assert(out("a") === ((4L, Some(1.0))), "nonlinear but monotone -> 1")
    assert(out("b") === ((3L, Some(-1.0))))
    assert(out("c") === ((3L, None)), "constant x has zero rank variance")
  }

  test("spearman: midrank ties match the textbook value") {
    // x: 1,2,2,3 -> midranks 1, 2.5, 2.5, 4 ; y strictly increasing
    val df = Seq((1.0, 10.0), (2.0, 20.0), (2.0, 30.0), (3.0, 40.0))
      .toDF("x", "y").withColumn("g", lit("t"))
    val rho = StatsOps.spearman(df, Seq(col("g")), col("x"), col("y"))
      .collect()(0).getDouble(2)
    // Pearson over ranks (1,2.5,2.5,4) vs (1,2,3,4) = 15/(sqrt(4.5)*sqrt(5))
    // doubled-midrank moments are exact; 6-dp release
    assert(math.abs(rho - 0.948683) < 1e-9)
  }

  test("anovaF: textbook two-cohort fixture scores F = 54") {
    val df = Seq(
      ("A", 1.0), ("A", 2.0), ("A", 3.0),
      ("B", 7.0), ("B", 8.0), ("B", 9.0))
      .toDF("c", "x").withColumn("g", lit("t"))
    val r = StatsOps.anovaF(df, Seq(col("g")), col("c"), col("x")).collect()(0)
    assert(r.getLong(1) === 6L)
    assert(r.getLong(2) === 2L)
    assert(r.getLong(3) === 54000000L, "SSB=54, SSW=4, df=(1,4) -> F=54")
  }

  test("anovaF: zero within-cohort variance yields null F") {
    val df = Seq(("A", 5.0), ("A", 5.0), ("B", 9.0), ("B", 9.0))
      .toDF("c", "x").withColumn("g", lit("t"))
    val r = StatsOps.anovaF(df, Seq(col("g")), col("c"), col("x")).collect()(0)
    assert(r.isNullAt(3), "SSW = 0 has no defined F")
  }

  test("keyProfile: unique non-null column is a key, dup/null ones are not") {
    val df = Seq((1L, Some("x")), (2L, Some("x")), (3L, None))
      .toDF("id", "name")
    val out = QualityOps.keyProfile(df, Seq("id", "name"))
      .collect().map(r => r.getString(0) -> r).toMap
    val id = out("id")
    assert((id.getLong(1), id.getLong(2), id.getLong(3)) === ((3L, 3L, 0L)))
    assert(id.getBoolean(5), "id is a candidate key")
    assert(id.getLong(4) === 1000000L)
    val nm = out("name")
    assert((nm.getLong(1), nm.getLong(2), nm.getLong(3)) === ((3L, 1L, 1L)))
    assert(!nm.getBoolean(5))
    assert(nm.getLong(4) === 500000L, "1 distinct over 2 non-null rows")
  }

  test("fdViolations: counts violating lhs values; null lhs drops") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), Some("a")),
      (Some(2L), Some("a")), (Some(2L), Some("b")),
      (Some(3L), None), (None, Some("c")))
      .toDF("k", "v")
    val r = QualityOps.fdViolations(df, Seq(col("k")), col("v")).collect()(0)
    assert(r.getLong(0) === 3L, "lhs values 1,2,3 (null dropped)")
    assert(r.getLong(1) === 1L, "only k=2 maps to two images")
    assert(r.getLong(2) === 2L)
    assert(r.getLong(3) === 2L)
  }

  test("fdViolations: a clean dependency reports zero violations") {
    val df = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("k", "v")
    val r = QualityOps.fdViolations(df, Seq(col("k")), col("v")).collect()(0)
    assert(r.getLong(1) === 0L)
    assert(r.getLong(3) === 1L)
  }

  test("holtLinear: two-point series matches the hand fold") {
    val df = Seq((1L, 100L, 1L, 10.0), (1L, 200L, 2L, 12.0))
      .toDF("k", "t", "i", "x")
    val r = StatsOps.holtLinear(df, col("k"), col("t"), col("i"), col("x"),
      alpha = 0.5, beta = 0.5).collect()(0)
    // l1=10,b1=0; l2=.5*12+.5*10=11; b2=.5*(11-10)+.5*0=0.5; fc=11.5
    assert(r.getLong(1) === 2L)
    assert(r.getLong(2) === 11000000L)
    assert(r.getLong(3) === 500000L)
    assert(r.getLong(4) === 11500000L)
  }

  test("holtLinear: singleton series releases its own value, zero trend") {
    val df = Seq((7L, 1L, 1L, 3.25)).toDF("k", "t", "i", "x")
    val r = StatsOps.holtLinear(df, col("k"), col("t"), col("i"), col("x"),
      alpha = 0.3, beta = 0.1).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((1L, 3250000L, 0L, 3250000L)))
  }

  test("holtLinear: order comes from (ts, id), not input order") {
    val df = Seq((1L, 200L, 2L, 12.0), (1L, 100L, 1L, 10.0))
      .toDF("k", "t", "i", "x")
    val r = StatsOps.holtLinear(df, col("k"), col("t"), col("i"), col("x"),
      alpha = 0.5, beta = 0.5).collect()(0)
    assert(r.getLong(2) === 11000000L, "reversed input must sort first")
  }
}
