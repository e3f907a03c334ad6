package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Funnel / retention / interval-merge / transitions against hand-computed
  * fixtures. */
class AnalyticsOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(minute * 60000L)

  test("funnel requires strictly increasing step times per user") {
    val ev = Seq(
      // user 1 completes all three in order
      (1L, ts(0), "view"), (1L, ts(1), "click"), (1L, ts(2), "purchase"),
      // user 2 clicks BEFORE viewing: reaches view only
      (2L, ts(5), "click"), (2L, ts(6), "view"),
      // user 3 views and clicks, purchase precedes click: stops at click
      (3L, ts(0), "view"), (3L, ts(2), "click"), (3L, ts(1), "purchase"),
      // user 4 never views
      (4L, ts(0), "purchase")
    ).toDF("user_id", "t", "step")
    val out = AnalyticsOps
      .funnel(ev, col("user_id"), col("t"), col("step"), Seq("view", "click", "purchase"))
      .as[(Long, String, Long)].collect().toSeq
    assert(out === Seq((1L, "view", 3L), (2L, "click", 2L), (3L, "purchase", 1L)))
  }

  test("retention counts a user once per active week against its first week") {
    def day(d: Int) = new Timestamp(d * 86400000L)
    val ev = Seq(
      (1L, day(0)), (1L, day(1)),          // week 0 twice -> one offset-0 row
      (1L, day(14)),                       // week 2
      (2L, day(7)), (2L, day(14))          // cohort week 1, offsets 0 and 1
    ).toDF("user_id", "t")
    val out = AnalyticsOps.retentionCohorts(ev, col("user_id"), col("t"))
      .select(col("week_offset"), col("n_users"))
      .as[(Long, Long)].collect().toSeq
    // epoch day 0 is a Thursday; date_trunc(week) makes users 1 and 2 share
    // offset structure: u1 -> offsets 0,2 ; u2 -> offsets 0,1
    assert(out.filter(_._1 == 0L).map(_._2).sum === 2L)
    assert(out.map(_._2).sum === 4L)
  }

  test("mergeIntervals coalesces overlapping and touching spans") {
    val iv = Seq(
      // key 1: [0,10] + [5,15] overlap -> [0,15]; [20,30] separate
      (1L, ts(0), ts(10)), (1L, ts(5), ts(15)), (1L, ts(20), ts(30)),
      // key 2: touching endpoints merge
      (2L, ts(0), ts(10)), (2L, ts(10), ts(20))
    ).toDF("k", "s", "e")
    val rows = AnalyticsOps.mergeIntervals(iv, col("k"), col("s"), col("e"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows === Seq((1L, 2L, 25L * 60000000L), (2L, 1L, 20L * 60000000L)))
  }

  test("funnelLags reports the median step-to-step time") {
    val ev = Seq(
      (1L, ts(0), "a", 1L), (1L, ts(10), "b", 2L),   // lag 10 min
      (2L, ts(0), "a", 3L), (2L, ts(30), "b", 4L),   // lag 30 min
      (3L, ts(0), "a", 5L)                           // never converts
    ).toDF("user_id", "t", "step", "event_id")
    val out = AnalyticsOps.funnelLags(ev, col("user_id"), col("t"),
        col("step"), Seq("a", "b"))
      .as[(Long, String, Long, Long)].collect().toSeq
    // median of {10, 30} minutes interpolates to 20 min
    assert(out === Seq((2L, "a->b", 2L, 20L * 60000000L)))
  }

  test("seasonalBaseline: flat profiles score zero, spikes score high") {
    def atHour(h: Int, m: Int) = new Timestamp((h * 60L + m) * 60000L)
    val flat = (0 until 24).map(h => ("flat", atHour(h, 0)))
    // spike: 1 event every hour plus 23 extra in hour 5
    val spiky = (0 until 24).map(h => ("spiky", atHour(h, 0))) ++
      (1 to 23).map(m => ("spiky", atHour(5, m)))
    val df = (flat ++ spiky).toDF("k", "t")
    val out = QualityOps.seasonalBaseline(df, col("k"), col("t"))
      .as[(String, Int, Long, Long)].collect()
    assert(out.length == 48)
    assert(out.filter(_._1 == "flat").forall(_._4 == 0L))
    val spikeRow = out.find(r => r._1 == "spiky" && r._2 == 5).get
    assert(spikeRow._3 == 24L && spikeRow._4 > 4000000L) // z > 4
    // off-peak hours of the spiky key sit below the mean
    assert(out.count(r => r._1 == "spiky" && r._4 < 0L) == 23)
  }

  test("lastTouchAttribution credits the latest in-window touch or none") {
    val ev = Seq(
      // user 1: click 5 min before purchase -> click wins over older view
      (1L, ts(0), "view", 1L), (1L, ts(25), "click", 2L), (1L, ts(30), "purchase", 3L),
      // user 2: only touch is 40 min stale -> none
      (2L, ts(0), "view", 4L), (2L, ts(40), "purchase", 5L),
      // user 3: no touch at all -> none
      (3L, ts(10), "purchase", 6L)
    ).toDF("user_id", "t", "step", "event_id")
    val out = AnalyticsOps.lastTouchAttribution(ev, col("user_id"), col("t"),
        col("step"), col("event_id"), "purchase", windowUs = 30L * 60000000L)
      .as[(String, Long)].collect().toSeq
    assert(out === Seq(("click", 1L), ("none", 2L)))
  }

  test("timeWeightedMean holds each value until the next observation") {
    // key a: 10 for 10 min then 20 for 30 min -> twm = (10*10+20*30)/40 = 17.5
    val ev = Seq(
      ("a", ts(0), 10.0, 1L), ("a", ts(10), 20.0, 2L), ("a", ts(40), 99.0, 3L),
      ("b", ts(0), 5.0, 4L) // single observation: no interval, key drops
    ).toDF("k", "t", "v", "id")
    val out = AnalyticsOps.timeWeightedMean(ev, col("k"), col("t"), col("v"), col("id"))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out === Seq(("a", 2L, 40L * 60000000L, 17500000L)))
  }

  test("transitions counts adjacent pairs with deterministic tie order") {
    val ev = Seq(
      (1L, ts(0), "a", 1L), (1L, ts(1), "b", 2L), (1L, ts(2), "a", 3L),
      (2L, ts(0), "a", 4L), (2L, ts(1), "b", 5L)
    ).toDF("user_id", "t", "step", "event_id")
    val out = AnalyticsOps
      .transitions(ev, col("user_id"), col("t"), col("step"), col("event_id"))
      .as[(String, String, Long, Long)].collect().toSeq
    // a->b twice, b->a once; P(a->b)=1.0, P(b->a)=1.0
    assert(out === Seq(("a", "b", 2L, 1000000L), ("b", "a", 1L, 1000000L)))
  }

  test("abTest: windowed conversion, strict after-entry, pooled z") {
    val ev = Seq(
      (0L, ts(0), "view"), (0L, ts(1), "purchase"),  // variant 0, converts
      (2L, ts(0), "view"),                           // variant 0, no purchase
      (4L, ts(0), "view"), (4L, ts(0), "purchase"),  // same instant: NOT after
      (1L, ts(0), "view"), (1L, ts(10), "purchase"), // outside 2-min window
      (3L, ts(0), "purchase")                        // never exposed: excluded
    ).toDF("user_id", "t", "step")
    val out = AnalyticsOps.abTest(ev, col("user_id"), col("t"), col("step"),
        exposure = "view", conversion = "purchase", windowUs = 120000000L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    // n0=3 c0=1, n1=1 c1=0; p=1/4 => z = (1/3)/sqrt(3/16 * 4/3) = 2/3
    assert(out === ((3L, 1L, 1L, 0L, 333333L, 0L, 666667L)))
  }

  test("abTest: degenerate pooled rate reports z = 0") {
    val ev = Seq(
      (0L, ts(0), "view"), (0L, ts(1), "purchase"),
      (1L, ts(0), "view"), (1L, ts(1), "purchase")
    ).toDF("user_id", "t", "step")
    val out = AnalyticsOps.abTest(ev, col("user_id"), col("t"), col("step"),
        "view", "purchase", windowUs = 120000000L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(out === ((1L, 1L, 1L, 1L, 1000000L, 1000000L, 0L)))
  }
}
