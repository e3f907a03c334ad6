package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Gini / EWMA / autocorrelation / CUSUM / Mann-Whitney / weighted
  * quantile against hand computations. */
class DistStatsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("gini: equal values score 0, maximal concentration scores (n-1)/n scaled") {
    val df = Seq(("eq", 1.0), ("eq", 1.0), ("eq", 1.0), ("eq", 1.0),
      ("con", 0.0), ("con", 0.0), ("con", 0.0), ("con", 4.0))
      .toDF("g", "x")
    // eq: 2*(1+2+3+4)/(4*4) - 5/4 = 0 ; con: 2*(4*4)/(4*4) - 5/4 = 0.75
    val m = StatsOps.gini(df, Seq(col("g")), col("x"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(m("eq") === ((4L, 0.0)))
    assert(m("con") === ((4L, 0.75)))
  }

  test("gini: zero-total group yields null gini") {
    val df = Seq(("z", 0.0), ("z", 0.0)).toDF("g", "x")
    val r = StatsOps.gini(df, Seq(col("g")), col("x")).collect().head
    assert(r.getLong(1) === 2L && r.isNullAt(2))
  }

  test("ewmaTrailing: head rows renormalize over existing terms only") {
    val df = Seq(("a", 1L, 10L, 1.0), ("a", 2L, 11L, 2.0))
      .toDF("g", "t", "id", "x")
    val out = StatsOps.ewmaTrailing(df, col("g"), col("t"), col("id"),
        col("x"), BigDecimal("0.5"), k = 2)
      .orderBy("t").select("ewma").as[Double].collect().toSeq
    // row1: 1/1 ; row2: (2 + 0.5*1)/1.5 = 1.666667
    assert(out === Seq(1.0, 1.666667))
  }

  test("autocorr: a strictly linear series has lag-1 correlation 1") {
    val df = (1 to 5).map(i => ("a", i.toLong, i.toLong, i.toDouble))
      .toDF("g", "t", "id", "x")
    val out = StatsOps.autocorr(df, Seq(col("g")), col("t"), col("id"),
        col("x"), lagK = 1)
      .as[(String, Long, Double)].collect().head
    assert(out === (("a", 4L, 1.0)))
  }

  test("cusum: level shift is the max excursion at the last row") {
    val xs = Seq(0.0, 0.0, 0.0, 10.0, 10.0, 10.0)
    val df = xs.zipWithIndex.map { case (x, i) => ("a", i.toLong, i.toLong, x) }
      .toDF("g", "t", "id", "x")
    val out = StatsOps.cusum(df, Seq(col("g")), col("t"), col("id"), col("x"))
      .as[(String, Long, Double, Long)].collect().head
    // s = [-5,-10,-15,-10,-5,0]; excursion over running min peaks at 15
    assert(out === (("a", 6L, 15.0, 6L)))
  }

  test("mannWhitneyU: disjoint cohorts give U=0 and the textbook z") {
    val df = Seq(("g", true, 1.0), ("g", true, 2.0),
      ("g", false, 3.0), ("g", false, 4.0)).toDF("grp", "a", "x")
    val out = StatsOps.mannWhitneyU(df, Seq(col("grp")), col("a"), col("x"))
      .as[(String, Long, Long, Double, Double)].collect().head
    // R1 = 3, U = 0; var = 4/12*5 = 5/3; z = -2/sqrt(5/3) = -1.549193
    assert(out === (("g", 2L, 2L, 0.0, -1.549193)))
  }

  test("mannWhitneyU: all-tied values give z null (zero variance)") {
    val df = Seq(("g", true, 1.0), ("g", false, 1.0)).toDF("grp", "a", "x")
    val r = StatsOps.mannWhitneyU(df, Seq(col("grp")), col("a"), col("x"))
      .collect().head
    assert(r.isNullAt(4))
  }

  test("kmvDistinct is exact below k and deterministic above") {
    val small = Seq(("g", "a"), ("g", "b"), ("g", "a"), ("g", "c"))
      .toDF("grp", "v")
    val exact = AggOps.kmvDistinct(small, col("grp"), col("v"), k = 8,
      seed = "s").as[(String, Long, Long)].collect().head
    assert(exact === (("g", 3L, 3L))) // 3 distinct < k: sketch is exact
    val big = (1 to 500).map(i => ("g", s"v$i")).toDF("grp", "v")
    val est1 = AggOps.kmvDistinct(big, col("grp"), col("v"), k = 64,
      seed = "s").as[(String, Long, Long)].collect().head
    assert(est1._2 === 64L)
    // KMV standard error is ~1/sqrt(k-1) ≈ 13%: the estimate must land
    // in a generous band around 500, and replay identically
    assert(est1._3 > 300L && est1._3 < 800L)
    val est2 = AggOps.kmvDistinct(big, col("grp"), col("v"), k = 64,
      seed = "s").as[(String, Long, Long)].collect().head
    assert(est1 === est2)
  }

  test("kmvOverlap is exact set algebra below k") {
    val df = Seq(("A", "a"), ("A", "b"), ("A", "c"),
      ("B", "b"), ("B", "c"), ("B", "d")).toDF("g", "v")
    val out = AggOps.kmvOverlap(df, col("g"), col("v"), k = 8, seed = "s")
      .as[(String, String, Long, Long, Long, Long)].collect().head
    // complete sketches: union 4, common 2, J = 1/2, inter = 2
    assert(out === (("A", "B", 2L, 500000L, 4L, 2L)))
  }

  test("rollingAnomalies flags a spike against its trailing baseline only") {
    // 10 alternating baseline rows (nonzero variance), then a spike
    val xs = (1 to 10).map(i => if (i % 2 == 0) 2.0 else 1.0) :+ 100.0
    val df = xs.zipWithIndex.map { case (x, i) =>
      ("a", i.toLong, i.toLong, x)
    }.toDF("g", "t", "id", "x")
    val out = StatsOps.rollingAnomalies(df, col("g"), col("t"), col("id"),
        col("x"), k = 5, threshold = 3.0)
      .as[(String, Long, Long, Double, Long)].collect().toSeq
    assert(out.map(_._2) === Seq(10L)) // only the spike row
    assert(out.head._4 === 100.0 && out.head._5 > 3000000L)
  }

  test("rollingAnomalies skips rows without a full baseline window") {
    val df = Seq(("a", 1L, 1L, 1.0), ("a", 2L, 2L, 2.0), ("a", 3L, 3L, 99.0))
      .toDF("g", "t", "id", "x")
    // k=5 never fills: nothing can be scored
    assert(StatsOps.rollingAnomalies(df, col("g"), col("t"), col("id"),
      col("x"), k = 5, threshold = 1.0).count() === 0L)
  }

  test("mode breaks count ties on the smaller value") {
    val df = Seq(("g", "b"), ("g", "b"), ("g", "a"), ("g", "a"), ("g", "c"))
      .toDF("grp", "v")
    val out = StatsOps.mode(df, Seq(col("grp")), col("v"))
      .as[(String, String, Long)].collect().head
    assert(out === (("g", "a", 2L))) // a and b tie at 2; a < b
  }

  test("trimmedMean drops exactly the ceil(n*t) tails") {
    // n=10, t=0.2 -> cut 2 each side: keep ranks 3..8
    val df = (1 to 10).map(i => ("g", i.toDouble)).toDF("grp", "x")
    val out = StatsOps.trimmedMean(df, Seq(col("grp")), col("x"), 0.2)
      .as[(String, Long, Double)].collect().head
    assert(out === (("g", 6L, 5.5))) // mean of 3..8
    // too-small group drops out entirely
    val tiny = Seq(("g", 1.0), ("g", 2.0)).toDF("grp", "x")
    assert(StatsOps.trimmedMean(tiny, Seq(col("grp")), col("x"), 0.4)
      .count() === 0L)
  }

  test("eventKgrams counts every window position across subjects") {
    val ev = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "a"),
      (1L, 4L, 4L, "b"),
      (2L, 1L, 5L, "a"), (2L, 2L, 6L, "b"), (2L, 3L, 7L, "a")
    ).toDF("u", "t", "id", "e")
    val out = AnalyticsOps.eventKgrams(ev, col("u"), col("t"), col("id"),
        col("e"), k = 3, minSupport = 1L)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // u1: aba, bab; u2: aba -> aba occurs 2x over 2 subjects
    assert(out === Map("a>b>a" -> ((2L, 2L)), "b>a>b" -> ((1L, 1L))))
  }

  test("interpolateMissing lerps interior gaps, leaves edges null") {
    val df = Seq(
      ("g", 0L, 0L, Option.empty[Double]),           // leading: no left
      ("g", 1L, 1L, Some(1.0)),
      ("g", 2L, 2L, Option.empty[Double]),           // interior gap
      ("g", 4L, 3L, Some(4.0)),
      ("g", 9L, 4L, Option.empty[Double])            // trailing: no right
    ).toDF("grp", "t", "id", "v")
    val out = GroupOps.interpolateMissing(df, col("grp"), col("t"),
        col("id"), col("v"))
      .orderBy("t")
      .select("value_filled", "was_interpolated")
      .as[(Option[Double], Boolean)].collect().toSeq
    // t=2 sits 1/3 of the way from (1,1.0) to (4,4.0): 1 + 3*(1/3) = 2
    assert(out === Seq((None, false), (Some(1.0), false),
      (Some(2.0), true), (Some(4.0), false), (None, false)))
  }

  test("seasonalNaiveError scores buckets against one season earlier") {
    // buckets 0..3 with values 10,20,12,21; season 2: preds for b2=10, b3=20
    val df = Seq(("g", 500L, 10.0), ("g", 1500L, 20.0), ("g", 2500L, 12.0),
      ("g", 3500L, 21.0)).toDF("k", "t", "v")
    val out = StatsOps.seasonalNaiveError(df, col("k"), col("t"), col("v"),
        bucketUs = 1000L, season = 2)
      .as[(String, Long, Long)].collect().head
    // |12-10| = 2, |21-20| = 1 -> MAE 1.5
    assert(out === (("g", 2L, 1500000L)))
  }

  test("woeEncode: symmetric categories get opposite-sign WOE") {
    val df = Seq(("a", true), ("a", true), ("a", false),
      ("b", true), ("b", false), ("b", false)).toDF("c", "p")
    val out = StatsOps.woeEncode(df, col("c"), col("p"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // symmetric setup: ps/ns for a is ns/ps for b
    assert(out("a")._4 === -out("b")._4)
    assert(out("a")._4 > 0 && out("a")._5 > 0) // a skews positive; IV >= 0
  }

  test("wilsonInterval brackets the rate and stays inside [0,1]") {
    val df = (1 to 40).map(i => ("g", i <= 10)).toDF("grp", "s")
    val out = StatsOps.wilsonInterval(df, Seq(col("grp")), col("s"))
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    assert(out._3 === 10L && out._4 === 250000L)
    assert(out._5 < 250000L && out._6 > 250000L) // bounds bracket p
    assert(out._5 > 0L && out._6 < 1000000L)     // Wilson never escapes [0,1]
  }

  test("ksTest: disjoint supports give D = 1 at the lower sample's max") {
    val df = Seq(("g", true, 1.0), ("g", true, 2.0),
      ("g", false, 3.0), ("g", false, 4.0)).toDF("grp", "a", "x")
    val out = StatsOps.ksTest(df, Seq(col("grp")), col("a"), col("x"))
      .as[(String, Long, Long, Long, Double)].collect().head
    assert(out === (("g", 2L, 2L, 1000000L, 2.0)))
  }

  test("ksTest: identical cohorts have D = 0") {
    val df = Seq(("g", true, 1.0), ("g", false, 1.0),
      ("g", true, 2.0), ("g", false, 2.0)).toDF("grp", "a", "x")
    val out = StatsOps.ksTest(df, Seq(col("grp")), col("a"), col("x"))
      .as[(String, Long, Long, Long, Double)].collect().head
    assert(out._4 === 0L)
  }

  test("mutualInformation: perfect dependence scores ln(2), independence 0") {
    val dep = (Seq.fill(10)(("a", "1")) ++ Seq.fill(10)(("b", "2")))
      .toDF("x", "y")
    val mi = StatsOps.mutualInformation(dep, col("x"), col("y"))
      .as[(Long, Long, Long)].collect().head
    assert(mi._1 === 20L && mi._2 === 2L)
    assert(math.abs(mi._3 - math.floor(math.log(2.0) * 1e9 + 0.5)) <= 1L)
    val ind = Seq(("a", "1"), ("a", "2"), ("b", "1"), ("b", "2"))
      .toDF("x", "y")
    assert(StatsOps.mutualInformation(ind, col("x"), col("y"))
      .as[(Long, Long, Long)].collect().head._3 === 0L)
  }

  test("weightedQuantile: median honors weights, not row counts") {
    val df = Seq(("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 2.0))
      .toDF("grp", "x", "w")
    val out = StatsOps.weightedQuantile(df, Seq(col("grp")), col("x"),
        col("w"), q = 0.5)
      .as[(String, Double, Double)].collect().head
    // cumulative weights 1,2,4 of total 4: first >= 2 is x=2
    assert(out === (("g", 2.0, 4.0)))
  }
}
