package graft.tools

import org.apache.spark.sql.functions._

import graft.sources.TxLog

/** r13 probe: the scan-planning file-skipping claims
  * (GraftStatsFileIndex via `TxLog.read` — the q_txlog_scan_prune
  * mechanism), measured across a file-count decade instead of argued —
  * the numbers behind the BENCH_SCALE `scan_prune_r13` row.
  *
  * Shape: ONE partitioned ingest ([[TxLog.commitPartitioned]]) lands a
  * bucket-banded table of `files` single-file value leaves (50k rows
  * each) at leaf counts 16 / 64 / 256; then per count:
  *
  *   1. `plan_all_files`  — the FileIndex's own listFiles with no
  *                          filter (sanity: every leaf planned)
  *   2. `plan_point_s`    — construct + plan a point-filtered read and
  *                          interrogate its scan's FileIndex (zero
  *                          jobs): the PLANNING cost of skipping, and
  *                          `plan_point_files` must stay 1 while the
  *                          table grows 16×
  *   3. `query_on_s`      — point-filter aggregate wall time, skipping
  *                          ON (min of REPEAT)
  *   4. `query_off_s`     — same query, `spark.graft.scanPrune=false`
  *                          (the contrast arm that reads every footer
  *                          and every row group the filter can't stop)
  *
  * Claim: `query_on_s` stays ~flat across the decade (O(matching
  * files)) while `query_off_s` tracks total file count; planning cost
  * is driver-side O(files) listing — visible, small, and the honest
  * price of skipping without a directory service.
  *
  * Usage: SPARK_GRAFT_LEAVES=16,64,256 SPARK_GRAFT_REPEAT=3 \
  *   sbt -batch "runMain graft.tools.ScanPruneProbe"
  */
object ScanPruneProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.session("scan-prune-probe")
    spark.sparkContext.setLogLevel("WARN")
    val leaves = sys.env.getOrElse("SPARK_GRAFT_LEAVES", "16,64,256")
      .split(",").map(_.trim.toInt).toSeq
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "3").toInt
    val rowsPerLeaf = 50000

    def timed[T](body: => T): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    def plannedFiles(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
            .map(_.files.size).sum
      }.sum

    val points = leaves.map { n =>
      val root = s"/tmp/graft_spprobe_$n"
      TxLog.destroy(root)
      val df = spark.range(n.toLong * rowsPerLeaf)
        .select(col("id"),
          (col("id") % n).cast("int").as("bucket"),
          (col("id") * 7 % 1000).cast("double").as("v"))
        .repartition(col("bucket"))
      TxLog.commitPartitioned(spark, root, "p0", df, "bucket")
      val target = n / 2
      def filtered = TxLog.read(spark, root)
        .filter(col("bucket") === target)
      val planAllFiles = plannedFiles(TxLog.read(spark, root))
      var planPointS = Double.MaxValue
      var planPointFiles = -1
      (1 to repeat).foreach { _ =>
        var f = 0
        val t = timed { f = plannedFiles(filtered) }
        planPointS = math.min(planPointS, t)
        planPointFiles = f
      }
      def runQuery(): Long =
        filtered.agg(sum("v"), count(lit(1))).head().getLong(1)
      val onS = (1 to repeat).map(_ => timed(runQuery())).min
      spark.conf.set("spark.graft.scanPrune", "false")
      val offS =
        try (1 to repeat).map(_ => timed(runQuery())).min
        finally spark.conf.unset("spark.graft.scanPrune")
      val row = Map(
        "leaves" -> planAllFiles,
        "table_rows" -> n.toLong * rowsPerLeaf,
        "plan_point_files" -> planPointFiles,
        "plan_point_s" -> math.round(planPointS * 1000) / 1000.0,
        "query_on_s" -> math.round(onS * 1000) / 1000.0,
        "query_off_s" -> math.round(offS * 1000) / 1000.0)
      println(s"POINT $row")
      TxLog.destroy(root)
      row
    }
    val json = points.map(p => p.map { case (k, v) =>
      s""""$k": $v""" }.mkString("   {", ", ", "}"))
      .mkString("[\n", ",\n", "\n  ]")
    println("SCAN_PRUNE_R13 " + json)
    spark.stop()
  }
}
