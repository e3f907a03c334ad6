package graft.tools

import org.apache.spark.sql.functions._

import graft.sources.TxLog
import graft.streaming.ProbeSink

/** r14 probe: the streaming sink's per-trigger idempotence probe cost,
  * measured across a LIVE-FILE-COUNT decade — the numbers behind the
  * BENCH_SCALE `sink_probe_r14` row (VERDICT r13 item 4: the old probe
  * scanned `liveFiles` every trigger, the one O(table) cost in an
  * otherwise O(delta) loop; the new probe reads the commit log's own
  * txn mark backward from the head — one small manifest read).
  *
  * Shape: per file count (64 / 256 / 1024) build a table of that many
  * live batch entries (log-only commits — the probe never opens data
  * files, so the log is the honest cost surface), land one real sink
  * batch (which carries the mark), checkpoint (the steady-state shape
  * of a maintained 100 TB table), then measure per arm (min of REPEAT):
  *
  *   1. `mark_probe_s`   — `TxLog.txnVersion` (the new probe)
  *   2. `replay_skip_s`  — a full replayed `addBatch` short-circuit
  *   3. `scan_probe_s`   — the legacy arm: `liveFiles(dir).exists(...)`
  *                         string scan (what every trigger used to pay)
  *
  * Claim: `mark_probe_s` and `replay_skip_s` stay flat across the 16×
  * decade while `scan_probe_s` tracks the live-file count.
  *
  * Usage: SPARK_GRAFT_FILES=64,256,1024 SPARK_GRAFT_REPEAT=5 \
  *   sbt -batch "runMain graft.tools.SinkProbe"
  */
object SinkProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.session("sink-probe")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val counts = sys.env.getOrElse("SPARK_GRAFT_FILES", "64,256,1024")
      .split(",").map(_.trim.toInt).toSeq
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "5").toInt

    def timed[T](body: => T): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    val points = counts.map { n =>
      val root = s"/tmp/graft_sinkprobe_$n"
      TxLog.destroy(root)
      // n live entries in FEW commits (batched 64 per commit — commit
      // count is not what the probe scales in; live-set size is)
      (0 until n).grouped(64).foreach { g =>
        TxLog.commit(root, g.map(i => s"$root/data/bulk_$i").toSeq)
      }
      // the maintained-table steady state: a checkpoint covers the bulk
      // history and the sink's trigger commits land ABOVE it — the mark
      // walk then reads the sink's own (one-line) manifest, never the
      // O(files) checkpoint body
      TxLog.checkpoint(root)
      TxLog.expireManifests(root) // log retention bounds the dir listing
      val sink = ProbeSink.make(spark, root, "probe")
      sink.addBatch(0, Seq((1L, 1.0)).toDF("id", "v"))
      val markS = (1 to repeat).map(_ =>
        timed(TxLog.txnVersion(root, "graft-sink-probe"))).min
      val replayS = (1 to repeat).map(_ =>
        timed(sink.addBatch(0, Seq((1L, 1.0)).toDF("id", "v")))).min
      val scanS = (1 to repeat).map(_ => timed {
        val suffix = "/data/sink_probe_b0"
        TxLog.liveFiles(root).exists(p =>
          p.endsWith(suffix) || p.contains(suffix + "_r") ||
            p.contains(suffix + "/"))
      }).min
      val row = Map(
        "live_files" -> TxLog.liveFiles(root).size,
        "mark_probe_s" -> math.round(markS * 100000) / 100000.0,
        "replay_skip_s" -> math.round(replayS * 100000) / 100000.0,
        "scan_probe_s" -> math.round(scanS * 100000) / 100000.0)
      println(s"POINT $row")
      TxLog.destroy(root)
      row
    }
    val json = points.map(p => p.map { case (k, v) =>
      s""""$k": $v""" }.mkString("   {", ", ", "}"))
      .mkString("[\n", ",\n", "\n  ]")
    println("SINK_PROBE_R14 " + json)
    spark.stop()
  }
}
