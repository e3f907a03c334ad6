package graft.tools

import graft.sources.TxLog

/** r15 probe: scan-PLANNING cost of a many-leaf table — the numbers
  * behind the BENCH_SCALE `scan_listing_r15` row (VERDICT r14 item 1
  * watch item, second half: `GraftScanBridge.statsPrunedParquet` lists
  * every batch dir on the driver to build the stats-aware FileIndex;
  * serial, that is one getFileStatus + listStatus round-trip per leaf —
  * the planning bottleneck of a 10⁴–10⁶-leaf table on an object store).
  *
  * Shape: per dir count, build a table of that many REAL one-file batch
  * dirs (one tiny parquet written once, byte-copied per leaf — the
  * listing cost is the probe's surface, not parquet decode), all entries
  * stats-bearing so the scan takes the stats-aware FileIndex path, then
  * measure min-of-REPEAT `plan_s`: `TxLog.read(...).queryExecution
  * .executedPlan` — snapshot resolution + the full dir listing + plan
  * build, no job run.
  *
  * Claim: with the 16-thread parallel listing the per-leaf constant
  * drops ~an order of magnitude on local FS (and bounds object-store
  * round-trips at 16 in flight); the serial arm is the pre-r15 code
  * (A/B via a worktree at the pre-fix commit).
  *
  * Usage: SPARK_GRAFT_DIRS=1024,4096,16384 SPARK_GRAFT_REPEAT=3 \
  *   sbt -batch "runMain graft.tools.ListingProbe"
  */
object ListingProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.session("listing-probe")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val counts = sys.env.getOrElse("SPARK_GRAFT_DIRS", "1024,4096,16384")
      .split(",").map(_.trim.toInt).toSeq
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "3").toInt

    def timed[T](body: => T): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    val points = counts.map { n =>
      val root = s"/tmp/graft_listingprobe_$n"
      TxLog.destroy(root)
      // one real parquet part, byte-copied into n single-file leaf dirs
      val seedDir = s"$root/seed"
      Seq((1L, 1.0)).toDF("id", "value").coalesce(1)
        .write.parquet(seedDir)
      val seed = new java.io.File(seedDir).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      (0 until n).foreach { i =>
        val d = new java.io.File(s"$root/data/leaf_$i")
        d.mkdirs()
        java.nio.file.Files.copy(seed,
          d.toPath.resolve("part-00000.parquet"))
      }
      (0 until n).grouped(4096).foreach { g =>
        TxLog.commitWithStats(root, g.map(i =>
          s"$root/data/leaf_$i" -> Some(s"id;$i.0;$i.0")).toSeq)
      }
      TxLog.checkpoint(root)
      TxLog.expireManifests(root)
      val planS = (1 to repeat).map(_ => timed {
        TxLog.read(spark, root).queryExecution.executedPlan
      }).min
      val row = Map[String, Any](
        "dirs" -> n,
        "plan_s" -> math.round(planS * 1000) / 1000.0,
        "us_per_dir" -> math.round(planS * 1e6 / n))
      println(s"POINT $row")
      TxLog.destroy(root)
      row
    }
    val json = points.map(p => p.map { case (k, v) =>
      s""""$k": $v""" }.mkString("   {", ", ", "}"))
      .mkString("[\n", ",\n", "\n  ]")
    println("SCAN_LISTING_R15 " + json)
    spark.stop()
  }
}
