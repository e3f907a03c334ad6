package graft.tools

import graft.sources.TxLog

/** r15/r16 probe: the driver-resident TxLog snapshot state measured across a
  * LIVE-FILE decade into the million-file regime — the numbers behind
  * the BENCH_SCALE `manifest_state_r15` row (VERDICT r14 item 1, the
  * round's highest-leverage unknown: [[TxLog.replayInto]] accumulates
  * the live map in a driver LinkedHashMap, and every read and commit
  * resolves through it; measured through 65k files in r14, unproven at
  * the ~10⁶ files a 100 TB table implies).
  *
  * Shape: per live-file count (default 65536 / 262144 / 1048576) build a
  * log of that many entries (log-only commits with realistic two-column
  * stats blobs — the probe never opens data files, the log IS the cost
  * surface), then measure (min of REPEAT):
  *
  *   1. `checkpoint_s` — collapse the live set into one checkpoint file
  *                       (streamed write; re-measured by deleting the
  *                       checkpoint between repeats)
  *   2. `resolve_s`    — a full checkpoint-seeded snapshot resolution
  *                       (`liveEntries`: streamed read + map build)
  *   3. `commit_s`     — one more 1-entry append at that table size
  *                       (claim: O(log-dir listing), flat in live files)
  *   4. `heap_mb`      — retained driver bytes of ONE resolved snapshot
  *                       (double-GC delta while holding the entries Seq)
  *
  * Claim: commit_s flat across the 16× decade; checkpoint_s/resolve_s
  * linear in live files with a per-entry constant small enough that the
  * million-file point stays in single-digit seconds; heap_mb linear with
  * a documented bytes/entry bound far under the driver heap.
  *
  * Usage: SPARK_GRAFT_FILES=65536,262144,1048576 SPARK_GRAFT_REPEAT=3 \
  *   sbt -batch "runMain graft.tools.ManifestProbe"
  */
object ManifestProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.session("manifest-probe")
    spark.sparkContext.setLogLevel("WARN")
    val counts = sys.env.getOrElse("SPARK_GRAFT_FILES",
      "65536,262144,1048576").split(",").map(_.trim.toInt).toSeq
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "3").toInt

    def timed[T](body: => T): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    val rt = Runtime.getRuntime
    def settledUsed(): Long = {
      System.gc(); Thread.sleep(200); System.gc(); Thread.sleep(200)
      rt.totalMemory() - rt.freeMemory()
    }

    val points = counts.map { n =>
      val root = s"/tmp/graft_manifestprobe_$n"
      TxLog.destroy(root)
      // n live entries in 4096-add commits; every entry carries the
      // two-column stats blob a partitioned/ANALYZEd table's would
      (0 until n).grouped(4096).foreach { g =>
        TxLog.commitWithStats(root, g.map { i =>
          s"$root/data/batch_${i / 4096}/leaf_$i" ->
            Some(s"value;$i.0;${i + 1}.5,ts;1.7040E9;1.7041E9")
        }.toSeq)
      }
      val checkpointS = (1 to repeat).map { _ =>
        // idempotent per version: drop BOTH artifacts so the claim and
        // the parquet twin (r16) re-land — checkpoint_s is the honest
        // full checkpoint cost, resolve + text + twin write
        val v = TxLog.latestVersion(root)
        val cp = new org.apache.hadoop.fs.Path(
          s"$root/_txlog", f"c$v%08d.json")
        val tw = new org.apache.hadoop.fs.Path(
          s"$root/_txlog", f"c$v%08d.entries.parquet")
        val fs = cp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(cp, false)
        fs.delete(tw, true)
        timed(TxLog.checkpoint(root))
      }.min
      TxLog.expireManifests(root) // the maintained-table steady state
      val resolveS = (1 to repeat).map(_ =>
        timed(require(TxLog.liveEntries(root).size == n))).min
      // the r16 twin path: scan-time survivor selection as a
      // DISTRIBUTED filter over the checkpoint's parquet entry table —
      // the driver collects matches (a ~2-entry stats window here),
      // never the live set. This is the planning number that must stay
      // near-flat while the driver-resident resolve_s grows linearly.
      val twinPruneS = (1 to repeat).map(_ => timed {
        val hits = TxLog.prunedEntryCount(spark, root, "value", 8.0, 9.0)
        require(hits.exists(h => h >= 1 && h <= 4),
          s"twin survivor selection off: $hits")
      }).min
      val commitS = (1 to repeat).map { r =>
        timed(TxLog.commitWithStats(root,
          Seq(s"$root/data/extra_$r" -> Some(s"value;-1.0;-0.5"))))
      }.min
      // the catalog consults the evolved spec on EVERY table load: its
      // backward-walk resolution must stay O(1) in live files (vs the
      // full resolve_s above)
      val partspecS = (1 to repeat).map(_ =>
        timed(TxLog.partitionSpec(root))).min
      val before = settledUsed()
      var held: Seq[(String, Option[String])] = TxLog.liveEntries(root)
      require(held.size >= n)
      val after = settledUsed()
      held = null
      val heapMb = (after - before) / 1048576.0
      val row = Map[String, Any](
        "live_files" -> n,
        "checkpoint_s" -> math.round(checkpointS * 1000) / 1000.0,
        "resolve_s" -> math.round(resolveS * 1000) / 1000.0,
        "twin_prune_s" -> math.round(twinPruneS * 1000) / 1000.0,
        "commit_s" -> math.round(commitS * 100000) / 100000.0,
        "partspec_s" -> math.round(partspecS * 100000) / 100000.0,
        "heap_mb" -> math.round(heapMb * 10) / 10.0,
        "bytes_per_entry" -> math.round((after - before).toDouble / n))
      println(s"POINT $row")
      TxLog.destroy(root)
      row
    }
    val json = points.map(p => p.map { case (k, v) =>
      s""""$k": $v""" }.mkString("   {", ", ", "}"))
      .mkString("[\n", ",\n", "\n  ]")
    println("MANIFEST_STATE_R16 " + json)
    spark.stop()
  }
}
