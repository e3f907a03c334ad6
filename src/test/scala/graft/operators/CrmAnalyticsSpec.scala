package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** RFM scoring, activity streaks, association rules — hand-checkable
  * fixtures. */
class CrmAnalyticsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("rfmScores: five customers split cleanly into quintiles") {
    // customer i has i orders of amount 10*i, newest at ts = 1000*i
    val orders = (1L to 5L).flatMap(i => (1L to i).map(j =>
      (i, 1000L * i - j, 10.0 * i))).toDF("c", "t", "amt")
    val out = AnalyticsOps.rfmScores(orders, col("c"), col("t"), col("amt"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    // all three metrics rank customers identically: i gets score i
    (1L to 5L).foreach { i =>
      assert(out(i) === ((i, i, i, i * 100 + i * 10 + i)), s"customer $i")
    }
  }

  test("rfmScores: monetary is the exact decimal sum") {
    val orders = Seq((1L, 1L, 0.1), (1L, 2L, 0.2), (2L, 3L, 9.9))
      .toDF("c", "t", "amt")
    val m = AnalyticsOps.rfmScores(orders, col("c"), col("t"), col("amt"))
      .select("k", "monetary").as[(Long, Double)].collect().toMap
    assert(m(1L) === 0.3, "0.1 + 0.2 folds through decimal, not float")
    assert(m(2L) === 9.9)
  }

  test("streaks: longest run wins, earliest start breaks ties") {
    // user 1: days 1,2,3 then 7,8 -> longest 3 starting at 1
    // user 2: two 2-day runs -> earliest start 10
    val df = Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 7L), (1L, 8L),
      (2L, 10L), (2L, 11L), (2L, 20L), (2L, 21L)).toDF("u", "d")
    val m = AnalyticsOps.streaks(df, col("u"), col("d")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m(1L) === ((3L, 1L)))
    assert(m(2L) === ((2L, 10L)))
  }

  test("streaks: duplicate observations within a day collapse") {
    val df = Seq((1L, 5L), (1L, 5L), (1L, 6L)).toDF("u", "d")
    val m = AnalyticsOps.streaks(df, col("u"), col("d")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) === 2L)
  }

  test("modularity: two clean cliques score near-maximal terms") {
    // two triangles, labels split exactly on them: Q = 2*(3/6 - (6/12)^2) = 0.5
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
      .toDF("src", "dst")
    val labels = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "b"),
      (6L, "b")).toDF("node", "label")
    val out = GraphOps.modularity(edges, labels).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("a") === ((3L, 3L, 6L, 250000000L)), "3/6 - (6/12)^2 = 0.25")
    assert(out("b") === ((3L, 3L, 6L, 250000000L)))
  }

  test("modularity: a random-cut partition scores ~zero") {
    // one triangle split across labels: e_in(a)=0 for the singleton side
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val labels = Seq((1L, "a"), (2L, "b"), (3L, "b")).toDF("node", "label")
    val out = GraphOps.modularity(edges, labels).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    // a: 0/3 - (2/6)^2 = -1/9; b: 1/3 - (4/6)^2 = -1/9
    assert(out("a") === -111111111L)
    assert(out("b") === -111111111L)
  }

  test("zScores: symmetric pair scores ±1/sqrt(2)... exact sample z") {
    // group with values 1, 3: mean 2, sample var 2, z = ±1/sqrt(2)
    val df = Seq(("g", 1L, 1.0), ("g", 2L, 3.0)).toDF("grp", "id", "v")
    val out = StatsOps.zScores(df, Seq(col("grp")), col("id"), col("v"))
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out(1L) === Some(-707107L))
    assert(out(2L) === Some(707107L))
  }

  test("zScores: singleton and constant groups release null z") {
    val df = Seq(("s", 1L, 5.0), ("c", 2L, 7.0), ("c", 3L, 7.0))
      .toDF("grp", "id", "v")
    val out = StatsOps.zScores(df, Seq(col("grp")), col("id"), col("v"))
      .collect()
    assert(out.forall(_.isNullAt(3)))
  }

  test("targetEncode: own fold's targets are excluded from its encoding") {
    // category c spread over folds; check enc(c,f) uses other folds only
    val df = (1L to 400L).map(i => ("c", i, if (i % 2 == 0) 1.0 else 0.0))
      .toDF("cat", "id", "y")
    val out = StatsOps.targetEncode(df, col("cat"), col("id"), col("y"),
      folds = 4, smoothing = 0.0)
    val rows = out.collect().map(r => r.getInt(1) ->
      ((r.getLong(2), r.getLong(3)))).toMap
    assert(rows.keySet.subsetOf(Set(0, 1, 2, 3)))
    // with smoothing 0: enc(c,f) = (S - S_f)/(n - n_f); global mean 0.5,
    // so each fold's encoding is the out-of-fold mean — near 0.5 but
    // computed from the complement, never exactly the own-fold mean
    rows.foreach { case (f, (n, enc)) =>
      assert(n > 0 && enc > 300000L && enc < 700000L, s"fold $f: $enc")
    }
    val sumN = rows.values.map(_._1).sum
    assert(sumN === 400L)
  }

  test("targetEncode: unsmoothed single-fold category releases null, not NaN") {
    // one category whose rows all hash into one fold: out-of-fold stats
    // are empty, smoothing 0 -> 0/0 -> null
    val ids = (1L to 50L).filter(i =>
      graft.TestSpark.spark.range(1).select(
        graft.functions.TextFunctions.portableBucket(lit(i), 4))
        .head().getLong(0) == 0L).take(3)
    val df = ids.map(i => ("solo", i, 1.0)).toDF("cat", "id", "y")
    val out = StatsOps.targetEncode(df, col("cat"), col("id"), col("y"),
      folds = 4, smoothing = 0.0).collect()
    assert(out.length === 1)
    assert(out(0).isNullAt(3), "0/0 must release null")
  }

  test("systematicSample takes exactly every k-th row in order") {
    val df = (1L to 20L).map(i => (i, s"r$i")).toDF("id", "s")
    val out = SortOps.systematicSample(df, Seq(col("id")), k = 5)
      .select("id").as[Long].collect().sorted
    assert(out.toSeq === Seq(1L, 6L, 11L, 16L))
    val off = SortOps.systematicSample(df, Seq(col("id")), k = 5, offset = 2)
      .select("id").as[Long].collect().sorted
    assert(off.toSeq === Seq(3L, 8L, 13L, 18L))
  }

  test("associationRules: confidence and lift from a hand basket set") {
    // baskets: {a,b} x3, {a} x1, {b} x1, {a,c} x1  (6 baskets)
    val rows = Seq(
      (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "a"), (3L, "b"),
      (4L, "a"), (5L, "b"), (6L, "a"), (6L, "c"))
    val df = rows.toDF("bk", "it")
    val out = AnalyticsOps.associationRules(df, col("bk"), col("it"),
      minSupport = 2L).collect()
    assert(out.length === 1, "only (a,b) clears the support floor")
    val r = out(0)
    assert((r.getString(0), r.getString(1)) === (("a", "b")))
    assert(r.getLong(2) === 3L)
    assert((r.getLong(3), r.getLong(4)) === ((5L, 4L)))
    assert(r.getLong(5) === 600000L, "conf a->b = 3/5")
    assert(r.getLong(6) === 750000L, "conf b->a = 3/4")
    assert(r.getLong(7) === 900000L, "lift = 3*6/(5*4) = 0.9")
  }
}
