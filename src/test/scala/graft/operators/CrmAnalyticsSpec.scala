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
