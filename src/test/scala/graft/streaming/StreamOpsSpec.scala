package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp
import graft.TestSpark

class StreamOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedAgg aggregates tumbling windows incrementally") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val out = StreamOps.windowedAgg(
      input.toDF.toDF("ts", "event_type", "value"),
      "ts", "event_type", "value", "1 hour", "2 hours")
    val q = out.writeStream.format("memory").queryName("win")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(
        (ts("2024-01-01 00:10:00"), "click", 1.0),
        (ts("2024-01-01 00:50:00"), "click", 2.0),
        (ts("2024-01-01 01:10:00"), "view", 5.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 00:20:00"), "click", 4.0)) // in-watermark late row
      q.processAllAvailable()
      val rows = spark.table("win")
        .groupBy("window_start", "event_type")
        .agg(org.apache.spark.sql.functions.max("cnt").as("cnt"),
          org.apache.spark.sql.functions.max("sum_value").as("sum"))
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(rows == Set(
        (ts("2024-01-01 00:00:00"), "click", 3L, 7.0),
        (ts("2024-01-01 01:00:00"), "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("intervalJoin: a tight watermark drops late rows (state stays bounded)") {
    implicit val sqlCtx = spark.sqlContext
    val lefts = MemoryStream[(Long, Long, Timestamp)]
    val rights = MemoryStream[(Long, Long, Timestamp)]
    val joined = StreamOps.intervalJoin(
      lefts.toDF.toDF("click_id", "cu", "click_time"), "click_time",
      rights.toDF.toDF("purchase_id", "pu", "purchase_time"), "purchase_time",
      org.apache.spark.sql.functions.expr(
        """cu = pu AND purchase_time >= click_time AND
           purchase_time <= click_time + interval 1 hour"""),
      watermark = "1 minute")
    val q = joined.select("click_id", "purchase_id").writeStream
      .format("memory").queryName("ivj").outputMode(OutputMode.Append).start()
    try {
      lefts.addData((1L, 7L, ts("2024-01-01 00:00:00")))
      rights.addData((100L, 7L, ts("2024-01-01 00:00:30")))
      q.processAllAvailable()
      assert(spark.table("ivj").as[(Long, Long)].collect().toSet ==
        Set((1L, 100L)))
      // a second pair twelve hours on advances the watermark far past T0
      lefts.addData((2L, 8L, ts("2024-01-01 12:00:00")))
      rights.addData((200L, 8L, ts("2024-01-01 12:00:30")))
      q.processAllAvailable()
      // this pair WOULD match, but arrives hours below the watermark:
      // both rows must be dropped as late, emitting nothing
      lefts.addData((3L, 7L, ts("2024-01-01 00:05:00")))
      rights.addData((300L, 7L, ts("2024-01-01 00:05:10")))
      q.processAllAvailable()
      assert(spark.table("ivj").as[(Long, Long)].collect().toSet ==
        Set((1L, 100L), (2L, 200L)))
    } finally q.stop()
  }

  test("closedSessions emits a record only when a session closes") {
    implicit val sqlCtx = spark.sqlContext
    import StreamOps._
    val m = 60L * 1000000
    // event-times must sit above the initial watermark (epoch 0), as any
    // real event-time does — rows at-or-below the watermark are dropped
    val base = 1000 * m
    val input = MemoryStream[SessionEvent]
    val out = closedSessions(input.toDS(), gapMicros = 30 * m)
    val q = out.writeStream.format("memory").queryName("closed")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(SessionEvent(1, base), SessionEvent(1, base + 10 * m))
      q.processAllAvailable()
      assert(spark.table("closed").count() == 0) // session still open
      input.addData(SessionEvent(1, base + 100 * m)) // gap -> closes first session
      q.processAllAvailable()
      val rows = spark.table("closed")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(rows == Set((1L, base, base + 10 * m, 2L)))
    } finally q.stop()
  }

  test("closedSessions flushes an idle session via event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    import StreamOps._
    val m = 60L * 1000000
    val base = 1000 * m
    val input = MemoryStream[SessionEvent]
    val out = closedSessions(input.toDS(), gapMicros = 30 * m,
      watermarkDelay = "1 minute")
    val q = out.writeStream.format("memory").queryName("closed_idle")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(SessionEvent(1, base))
      q.processAllAvailable()
      assert(spark.table("closed_idle").count() == 0)
      // a far-future event on ANOTHER key advances the watermark past
      // key 1's gap deadline -> its idle session must flush and evict
      input.addData(SessionEvent(2, base + 500 * m))
      q.processAllAvailable()
      input.addData(SessionEvent(2, base + 501 * m)) // one more batch so timeouts fire
      q.processAllAvailable()
      val rows = spark.table("closed_idle")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(rows.contains((1L, base, base, 1L)))
    } finally q.stop()
  }

  test("sessionCounts keeps O(1) state per key across batches") {
    implicit val sqlCtx = spark.sqlContext
    import StreamOps._
    val input = MemoryStream[SessionEvent]
    val out = sessionCounts(input.toDS(), gapMicros = 30L * 60 * 1000000)
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Update).start()
    try {
      val m = 60L * 1000000
      input.addData(SessionEvent(1, 0), SessionEvent(1, 10 * m))
      q.processAllAvailable()
      input.addData(SessionEvent(1, 100 * m), SessionEvent(2, 0)) // gap -> new session
      q.processAllAvailable()
      val last = spark.table("sess")
        .groupBy("userId")
        .agg(org.apache.spark.sql.functions.max("nSessions").as("s"),
          org.apache.spark.sql.functions.max("nEvents").as("e"))
        .as[(Long, Long, Long)].collect().toSet
      assert(last == Set((1L, 2L, 3L), (2L, 1L, 1L)))
    } finally q.stop()
  }

  test("anomalyCounts: spike flagged against all-history integer state") {
    val spark2 = graft.TestSpark.spark
    import spark2.implicits._
    // alternating 1.0/2.0 baseline (ids 1..29), then a 100.0 spike (id 30)
    val evs = ((1 to 29).map(i =>
      graft.streaming.StreamOps.AnomEvent("g", i.toLong,
        if (i % 2 == 0) 2000L else 1000L)) :+
      graft.streaming.StreamOps.AnomEvent("g", 30L, 100000L)).toDS()
    val out = graft.streaming.StreamOps
      .anomalyCounts(evs, minPrior = 20L, threshold = 3L)
      .collect().head
    // ids 21..30 scored (10); only the spike exceeds 3 sigma
    assert(out === graft.streaming.StreamOps.AnomUpdate("g", 30L, 10L, 1L))
  }

  test("anomalyCounts: zero-variance baseline never divides by zero") {
    val spark2 = graft.TestSpark.spark
    import spark2.implicits._
    val evs = (1 to 25).map(i =>
      graft.streaming.StreamOps.AnomEvent("g", i.toLong, 1000L)).toDS()
    val out = graft.streaming.StreamOps
      .anomalyCounts(evs, minPrior = 20L, threshold = 3L)
      .collect().head
    assert(out.nScored === 5L && out.nFlagged === 0L)
  }
}
