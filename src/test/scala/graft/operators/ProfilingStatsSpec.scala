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

  test("ols2 recovers an exact planar fit") {
    // y = 2 + 3*x1 - 0.5*x2 exactly on a non-degenerate design
    val pts = Seq((0.0, 0.0), (1.0, 0.0), (0.0, 2.0), (1.0, 2.0), (2.0, 1.0))
    val df = pts.map { case (a, b) => ("g", a, b, 2.0 + 3.0 * a - 0.5 * b) }
      .toDF("g", "x1", "x2", "y")
    val r = StatsOps.ols2(df, Seq(col("g")), col("x1"), col("x2"),
      col("y")).collect()(0)
    assert(r.getLong(1) === 5L)
    assert(r.getLong(2) === 2000000L)
    assert(r.getLong(3) === 3000000L)
    assert(r.getLong(4) === -500000L)
  }

  test("ols2: collinear regressors release null coefficients") {
    val df = (1 to 6).map(i => ("g", i.toDouble, 2.0 * i, i * 5.0))
      .toDF("g", "x1", "x2", "y")
    val r = StatsOps.ols2(df, Seq(col("g")), col("x1"), col("x2"),
      col("y")).collect()(0)
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
  }

  test("nelsonAalen: hand-checked hazard on a 4-subject cohort") {
    // durations: 1 (event), 2 (event), 2 (censored), 3 (event)
    // t=1: d=1 n=4 -> 0.25 ; t=2: d=1 n=3 -> +1/3 ; t=3: d=1 n=1 -> +1
    val df = Seq((1L, true), (2L, true), (2L, false), (3L, true))
      .toDF("t", "e").withColumn("g", lit("c"))
    val out = AnalyticsOps.nelsonAalen(df, Seq(col("g")), col("t"),
      col("e")).collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) === ((4L, 1L, 250000000L)))
    assert(out(2L) === ((3L, 1L, 250000000L + 333333333L)))
    assert(out(3L) === ((1L, 1L, 250000000L + 333333333L + 1000000000L)))
  }

  test("popDeltas: lag-1 totals, deltas, and percent change") {
    val df = Seq(("a", 0L, 10.0), ("a", 5L, 10.0), ("a", 10L, 30.0),
      ("a", 25L, 15.0), ("b", 3L, 7.0))
      .toDF("g", "ts", "v")
    val out = AnalyticsOps.popDeltas(df, Seq(col("g")), col("ts"),
      col("v"), bucketUs = 10L).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(2),
          if (r.isNullAt(5)) None else Some(r.getLong(5))))).toMap
    assert(out(("a", 0L)) === ((20.0, None)))
    assert(out(("a", 1L)) === ((30.0, Some(500000L))), "+50%")
    assert(out(("a", 2L)) === ((15.0, Some(-500000L))), "-50%")
    assert(out(("b", 0L)) === ((7.0, None)))
  }

  test("quantileTransform: min 0, max 1, ties share the min rank") {
    val df = Seq(("g", 1L, 5.0), ("g", 2L, 7.0), ("g", 3L, 7.0),
      ("g", 4L, 9.0), ("h", 5L, 3.0)).toDF("grp", "id", "v")
    val out = StatsOps.quantileTransform(df, Seq(col("grp")), col("id"),
      col("v")).collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(out(1L) === 0L)
    assert(out(2L) === 333333L, "(rank 2 - 1)/(4 - 1)")
    assert(out(3L) === 333333L, "tie shares the min rank")
    assert(out(4L) === 1000000L)
    assert(out(5L) === 0L, "singleton group scores 0")
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
