package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface. The reference is a pure batch engine
  * (SURVEY §2.13) — this package is the forward-looking extension the
  * prompt asks for: the same operators (windowed aggregation,
  * sessionization) in incremental form, so a pipeline built on the batch
  * ops can be pointed at a stream without rewriting its logic.
  */
object StreamOps {

  /** State-store configuration for LARGE keyed state. The default
    * HDFSBackedStateStoreProvider holds every live key's state as JVM heap
    * objects — at 100x event volume (stream-stream outer-join buffers,
    * millions of open sessions) executor heap becomes the ceiling and GC
    * the failure mode. RocksDB keeps state off-heap on local disk with
    * heap only for the working set, and changelog checkpointing uploads
    * per-batch deltas instead of full snapshots — the production
    * configuration for big state. Semantics are identical; only the state
    * backend changes, so any gate can run under either provider. */
  val rocksDbStateConfs: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
      "true")

  /** Run `body` with the RocksDB state store provider active, restoring
    * the previous provider config afterwards (the provider is read at
    * query START, so set it around `.start()`). */
  def withRocksDbState[T](spark: org.apache.spark.sql.SparkSession)(body: => T): T = {
    val saved = rocksDbStateConfs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    rocksDbStateConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Tumbling-window counts + sums per key with a watermark: the streaming
    * twin of the batch q_tumbling_window query. State is bounded by the
    * watermark — late rows beyond it are dropped, windows older than it are
    * finalized and evicted. */
  def windowedAgg(
      events: DataFrame, tsCol: String, keyCol: String, valueCol: String,
      windowDuration: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration), col(keyCol))
      .agg(count(lit(1)).as("cnt"), sum(col(valueCol)).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col(keyCol), col("cnt"), col("sum_value"))

  /** Stream-stream interval join with event-time watermarks on BOTH sides —
    * the state-bounded form. The watermark is the state-retention contract:
    * each side buffers only rows newer than (max event time - `watermark`),
    * and inputs older than that are dropped as late; the default keeps
    * state finite in a real deployment. `cond` should carry the equi-key
    * AND the event-time range (e.g. `right_ts BETWEEN left_ts AND left_ts +
    * interval 1 hour`) — the range is what lets Spark evict join state as
    * the watermark advances.
    *
    * `joinType` "inner" emits matches as they arrive and, over a bounded
    * replay, needs an explicitly opted-in effectively-infinite watermark
    * for exhaustive batch-equal results. "left_outer"/"right_outer"
    * additionally emit null-padded rows once the watermark PROVES no match
    * can still arrive — outer results are only complete up to the
    * watermark, so on a bounded replay push it past the last real deadline
    * (e.g. a far-future sentinel row) or the tail's outer rows never
    * emit. */
  def intervalJoin(
      left: DataFrame, leftTsCol: String,
      right: DataFrame, rightTsCol: String,
      cond: org.apache.spark.sql.Column,
      watermark: String = "1 hour",
      joinType: String = "inner"): DataFrame =
    left.withWatermark(leftTsCol, watermark)
      .join(right.withWatermark(rightTsCol, watermark), cond, joinType)

  final case class SessionEvent(userId: Long, tsMicros: Long)
  final case class SessionState(nEvents: Long, lastTsMicros: Long, nSessions: Long)
  final case class SessionUpdate(userId: Long, nSessions: Long, nEvents: Long)

  final case class ClosedSession(
      userId: Long, startMicros: Long, endMicros: Long, nEvents: Long)

  final case class OpenSession(start: Long, last: Long, n: Long)

  /** flatMapGroupsWithState variant: emits one record per CLOSED session.
    * A session closes when a later event arrives beyond the gap, OR when the
    * event-time watermark passes the session's gap deadline (EventTimeTimeout)
    * — so a key's final session is flushed without waiting for another event
    * and idle-key state is evicted, keeping state bounded on a long-running
    * stream. Zero-or-many outputs per group per batch — the generator-shaped
    * stateful operator the mapGroups form can't express. */
  def closedSessions(
      events: Dataset[SessionEvent],
      gapMicros: Long,
      watermarkDelay: String = "10 minutes"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withColumn("eventTime", timestamp_micros(col("tsMicros")))
      .withWatermark("eventTime", watermarkDelay)
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (userId, evs, state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap with no new events: the open session
            // is definitively closed; evict the key's state
            val out = state.getOption
              .map(o => ClosedSession(userId, o.start, o.last, o.n))
            state.remove()
            out.iterator
          } else {
            val sorted = evs.map(_._2).toSeq.sorted
            val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
            var open = state.getOption
            sorted.foreach { t =>
              open match {
                case Some(o) if t - o.last <= gapMicros =>
                  open = Some(o.copy(last = t, n = o.n + 1))
                case Some(o) =>
                  closed += ClosedSession(userId, o.start, o.last, o.n)
                  open = Some(OpenSession(t, t, 1))
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { o =>
              state.update(o)
              // fire when the watermark passes the gap deadline (ms); must
              // stay strictly above the current watermark to be accepted
              state.setTimeoutTimestamp(math.max(
                o.last / 1000 + gapMicros / 1000,
                state.getCurrentWatermarkMs() + 1))
            }
            closed.iterator
          }
      }
  }

  /** Stateful sessionization via mapGroupsWithState — the streaming twin of
    * GroupOps.sessionize. Per-key state is O(1) (last timestamp + counters),
    * so 100TB-scale key cardinality is bounded by the state store, not the
    * data volume. */
  def sessionCounts(
      events: Dataset[SessionEvent],
      gapMicros: Long): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .mapGroupsWithState[SessionState, SessionUpdate](GroupStateTimeout.NoTimeout) {
        case (userId, evs, state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(_.tsMicros)
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L))
          sorted.foreach { e =>
            val newSession = st.lastTsMicros == Long.MinValue ||
              e.tsMicros - st.lastTsMicros > gapMicros
            st = SessionState(
              st.nEvents + 1, e.tsMicros,
              st.nSessions + (if (newSession) 1 else 0))
          }
          state.update(st)
          SessionUpdate(userId, st.nSessions, st.nEvents)
      }
  }

  /** One observation on a keyed value stream, quantized to 1e-3. */
  case class AnomEvent(key: String, id: Long, valueE3: Long)
  /** Welford-equivalent EXACT integer state: count, Σx and Σx² of the
    * 1e-3-quantized values seen so far, plus scored/flagged counters.
    * Longs suffice for the sums (|x_e3| ≤ 1e6 ⇒ Σx² ≤ 1e12·n); the
    * per-row test runs in BigInt so nothing inside overflows either. */
  case class AnomState(n: Long, sE3: Long, ssE6: Long,
      scored: Long, flagged: Long)
  case class AnomUpdate(key: String, nSeen: Long, nScored: Long,
      nFlagged: Long)

  /** Streaming anomaly counting via mapGroupsWithState — the stateful
    * twin of StatsOps.rollingAnomalies with an UNBOUNDED (all-history)
    * baseline, the shape a production alerting pipeline runs: per key the
    * state is three integers (exact count/sum/sum-of-squares — O(1), not
    * a window buffer), each arriving event is tested against the state
    * BEFORE folding in (an anomaly must not mask itself), and the test
    * `z² > threshold²` is evaluated in EXACT integer arithmetic
    * (`(x·n − s)²·(n−1) > t²·n·(n·ss − s²)` via BigInt), so a replay in
    * any engine — including the SQL oracle's prefix-sum formulation —
    * flags the identical rows. Events sort by id within each batch;
    * cross-batch order is the feed's batch order, which the caller pins
    * (file-per-trigger fixtures). Scoring starts after `minPrior`
    * observations. */
  def anomalyCounts(events: Dataset[AnomEvent], minPrior: Long,
      threshold: Long): Dataset[AnomUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .mapGroupsWithState[AnomState, AnomUpdate](GroupStateTimeout.NoTimeout) {
        case (key, evs, state: GroupState[AnomState]) =>
          var st = state.getOption.getOrElse(AnomState(0L, 0L, 0L, 0L, 0L))
          evs.toSeq.sortBy(_.id).foreach { e =>
            val x = e.valueE3
            var scored = st.scored
            var flagged = st.flagged
            if (st.n >= minPrior) {
              scored += 1
              val n = BigInt(st.n); val s = BigInt(st.sE3)
              val ss = BigInt(st.ssE6)
              val varTerm = n * ss - s * s
              val dev = BigInt(x) * n - s
              if (varTerm > 0 &&
                  dev * dev * (n - 1) > BigInt(threshold * threshold) * n * varTerm)
                flagged += 1
            }
            st = AnomState(st.n + 1, st.sE3 + x, st.ssE6 + x * x,
              scored, flagged)
          }
          state.update(st)
          AnomUpdate(key, st.n, st.scored, st.flagged)
      }
  }
}
