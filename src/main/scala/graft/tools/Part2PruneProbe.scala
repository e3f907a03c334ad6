package graft.tools

import org.apache.spark.sql.functions._

import graft.sources.TxLog

/** r14 probe: COMPOSITE partition pruning at scan planning, measured
  * across a tuple-leaf-count decade — the numbers behind the
  * BENCH_SCALE `part2_prune_r14` row (the q_sql_partitioned2 mechanism
  * at scale: per-LEVEL range+bloom stats on nested `__pv=a/__pv1=b`
  * leaves, so a filter on ANY partition column prunes, not just a
  * path prefix).
  *
  * Shape: per grid size n (4x4 / 8x8 / 16x16 tuple leaves, 50k rows per
  * leaf) ONE composite ingest ([[TxLog.commitPartitionedCols]]); then:
  *
  *   1. `plan_pair_files`   — (a, b) point filter must plan exactly 1
  *   2. `plan_b_files`      — b-only (NON-prefix) filter must plan n
  *   3. `query_pair_s`      — point-filtered aggregate wall (min of REPEAT)
  *   4. `query_b_s`         — b-only aggregate wall
  *   5. `query_b_off_s`     — the same b-only query with scan pruning
  *                            disabled (reads all n*n leaves)
  *
  * Claim: `query_pair_s` stays flat across the 16x leaf-count decade
  * (O(1 leaf)); `query_b_s` tracks its n matching leaves while the
  * OFF arm tracks n*n — the second partition column prunes exactly
  * like the first.
  *
  * Usage: SPARK_GRAFT_GRIDS=4,8,16 SPARK_GRAFT_REPEAT=3 \
  *   sbt -batch "runMain graft.tools.Part2PruneProbe"
  */
object Part2PruneProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.session("part2-prune-probe")
    spark.sparkContext.setLogLevel("WARN")
    val grids = sys.env.getOrElse("SPARK_GRAFT_GRIDS", "4,8,16")
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

    val points = grids.map { n =>
      val root = s"/tmp/graft_p2probe_$n"
      TxLog.destroy(root)
      val df = spark.range(n.toLong * n * rowsPerLeaf)
        .select(col("id"),
          (col("id") % n).cast("int").as("a"),
          ((col("id") / n) % n).cast("int").as("b"),
          (col("id") * 7 % 1000).cast("double").as("v"))
        .repartition(col("a"), col("b"))
      TxLog.commitPartitionedCols(spark, root, "p0", df, Seq("a", "b"))
      val ta = n / 2; val tb = n / 3
      def pair = TxLog.read(spark, root)
        .filter(col("a") === ta && col("b") === tb)
      def bOnly = TxLog.read(spark, root).filter(col("b") === tb)
      val pairFiles = plannedFiles(pair)
      val bFiles = plannedFiles(bOnly)
      def run(q: => org.apache.spark.sql.DataFrame): Double =
        (1 to repeat).map(_ => timed(
          q.agg(sum("v"), count(lit(1))).head())).min
      val pairS = run(pair)
      val bS = run(bOnly)
      spark.conf.set("spark.graft.scanPrune", "false")
      val bOffS =
        try run(bOnly)
        finally spark.conf.unset("spark.graft.scanPrune")
      val row = Map(
        "leaves" -> n * n,
        "table_rows" -> n.toLong * n * rowsPerLeaf,
        "plan_pair_files" -> pairFiles,
        "plan_b_files" -> bFiles,
        "query_pair_s" -> math.round(pairS * 1000) / 1000.0,
        "query_b_s" -> math.round(bS * 1000) / 1000.0,
        "query_b_off_s" -> math.round(bOffS * 1000) / 1000.0)
      println(s"POINT $row")
      TxLog.destroy(root)
      row
    }
    val json = points.map(p => p.map { case (k, v) =>
      s""""$k": $v""" }.mkString("   {", ", ", "}"))
      .mkString("[\n", ",\n", "\n  ]")
    println("PART2_PRUNE_R14 " + json)
    spark.stop()
  }
}
