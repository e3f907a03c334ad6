package graft.tools

import org.apache.spark.sql.functions._

import graft.sources.TxLog

/** r15 probe: REPLACE WHERE write cost across a FILE-COUNT decade — the
  * numbers behind the BENCH_SCALE `replace_where_r15` row (VERDICT r14
  * item 7: the verb's PRUNE behavior is gate-REQUIREd
  * (q_txlog_replace_where: stats-disjoint band files never rewrite);
  * its write cost as the untouched-file population grows was
  * unmeasured).
  *
  * Shape: per file count F (default 16 / 64 / 256) build a table of F
  * value-band leaves in ONE partitioned write (band b holds `rowsPer`
  * rows with value ∈ [b, b+1), exact dirname-derived min/max stats per
  * leaf), then repeat REPLACE WHERE `value ∈ [0,1)` with a fresh
  * same-size reload and report the min wall time plus the rewritten
  * file count per repeat.
  *
  * Claim: the replace touches exactly the window's file(s) at every F
  * (stats pruning on the delete probe), so its cost is FLAT in the
  * untouched-file population across the 16× decade — the same
  * touched-bytes story as update_partition_r11.
  *
  * Usage: SPARK_GRAFT_FILES=16,64,256 SPARK_GRAFT_ROWS=50000 \
  *   SPARK_GRAFT_REPEAT=3 sbt -batch "runMain graft.tools.ReplaceWhereProbe"
  */
object ReplaceWhereProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.session("replace-where-probe")
    spark.sparkContext.setLogLevel("WARN")
    val counts = sys.env.getOrElse("SPARK_GRAFT_FILES", "16,64,256")
      .split(",").map(_.trim.toInt).toSeq
    val rowsPer = sys.env.getOrElse("SPARK_GRAFT_ROWS", "50000").toLong
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "3").toInt

    def timed[T](body: => T): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    val points = counts.map { f =>
      val root = s"/tmp/graft_replwprobe_$f"
      TxLog.destroy(root)
      // F band leaves in ONE partitioned write; value = band + frac,
      // deterministic, so each leaf's exact stats are band ≤ v < band+1
      val staging = s"$root/staging"
      spark.range(f * rowsPer)
        .select(col("id"),
          (col("id") % f).cast("int").as("band"),
          ((col("id") % f).cast("double") +
            (col("id") % 1000).cast("double") / 1000.0).as("value"))
        .write.partitionBy("band").parquet(staging)
      (0 until f).grouped(512).foreach { g =>
        TxLog.commitWithStats(root, g.map(b =>
          s"$staging/band=$b" -> Some(s"value;$b.0;${b + 1}.0")).toSeq)
      }
      val before = TxLog.liveFiles(root).size
      // fresh reload of the [0,1) window, same shape and size
      val reload = spark.range(rowsPer)
        .select(col("id"), lit(0).as("band"),
          ((col("id") % 997).cast("double") / 997.0).as("value"))
      val window = col("value") >= 0.0 && col("value") < 1.0
      var rewritten = -1
      val replaceS = (1 to repeat).map { r =>
        val liveBefore = TxLog.liveFiles(root).toSet
        val dt = timed(TxLog.replaceWhere(spark, root, s"reload_$r",
          reload, window, autoStatsCols = 2))
        val liveAfter = TxLog.liveFiles(root).toSet
        rewritten = (liveBefore -- liveAfter).size
        dt
      }.min
      val row = Map[String, Any](
        "files" -> before,
        "rows" -> f * rowsPer,
        "replace_s" -> math.round(replaceS * 1000) / 1000.0,
        "files_rewritten_per_repeat" -> rewritten,
        "untouched_files" -> (before - 1))
      println(s"POINT $row")
      TxLog.destroy(root)
      row
    }
    val json = points.map(p => p.map { case (k, v) =>
      s""""$k": $v""" }.mkString("   {", ", ", "}"))
      .mkString("[\n", ",\n", "\n  ]")
    println("REPLACE_WHERE_R15 " + json)
    spark.stop()
  }
}
