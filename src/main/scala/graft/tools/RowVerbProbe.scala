package graft.tools

import org.apache.spark.sql.functions._

import graft.sources.TxLog

/** r11 probe: the file-pruning claim of the row-level verbs
  * ([[graft.sources.TxLog.deleteWhere]] / [[graft.sources.TxLog.merge]]),
  * measured instead of asserted — the number behind the BENCH_SCALE
  * `row_verbs_r11` row.
  *
  * Shape: lineitem lands as 16 key-range batches (each with l_orderkey
  * manifest stats, the layout a range-ingested table has naturally). A
  * DELETE whose predicate lives in one batch's key range and a MERGE
  * whose source keys live in one batch must each rewrite ~1 of 16 files;
  * the contrast arm is OPTIMIZE(4) — the full-table rewrite a system
  * without row verbs would need. Run at sf0.1 and scale10: the verb
  * costs should track the TOUCHED bytes (~flat + one probe scan whose
  * untouched files are parquet-footer-only reads, thanks to pushdown on
  * range-disjoint files), while the full rewrite tracks TABLE bytes
  * (~10x).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_REPEAT=3 \
  *   sbt -batch "runMain graft.tools.RowVerbProbe"
  */
object RowVerbProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.session("rowverb-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "3").toInt
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val rows = li.count()
    val maxKey = li.agg(max("l_orderkey")).head().getLong(0)
    val width = maxKey / 16 + 1
    val root = "target/rowverb_probe_tx"

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    (1 to repeat).foreach { r =>
      TxLog.destroy(root)
      (0 until 16).foreach { b =>
        val batch = li.filter(floor(col("l_orderkey") / width) === b)
        TxLog.commitWithStats(root,
          Seq(TxLog.writeBatch(batch, root, s"b$b") ->
            TxLog.columnStats(batch, "l_orderkey")))
      }
      // DELETE confined to batch 3's key range (half its part keys)
      val (vDel, tDel) = timed(TxLog.deleteWhere(spark, root, s"del$r",
        col("l_orderkey") >= 3 * width && col("l_orderkey") < 4 * width &&
          col("l_partkey") % 2 === 0))
      val delRewrites = TxLog.liveFiles(root).count(_.contains(s"del${r}_"))
      // MERGE whose source keys live in batch 5, plus out-of-range inserts
      val src = li.filter(floor(col("l_orderkey") / width) === 5 &&
          col("l_partkey") % 7 === 0)
        .groupBy("l_orderkey").agg(max("l_partkey").as("l_partkey"),
          sum("l_quantity").as("l_quantity"))
        .withColumn("l_quantity", col("l_quantity") + 1.0)
      val inserts = src.limit(1000)
        .withColumn("l_orderkey", col("l_orderkey") + maxKey + 1)
      val (vM, tMerge) = timed(TxLog.merge(spark, root, s"m$r",
        src.unionByName(inserts), Seq("l_orderkey")))
      val mergeRewrites = TxLog.liveFiles(root).count(_.contains(s"m${r}_d"))
      // UPDATE confined to batch 7's key range — same 1/16 claim
      val (vU, tUpd) = timed(TxLog.updateWhere(spark, root, s"u$r",
        col("l_orderkey") >= 7 * width && col("l_orderkey") < 8 * width &&
          col("l_partkey") % 2 === 0,
        Seq("l_quantity" -> (col("l_quantity") + 1.0))))
      val updRewrites = TxLog.liveFiles(root).count(_.contains(s"u${r}_d"))
      // contrast: the full-table rewrite the verbs exist to avoid
      val (vO, tOpt) = timed(TxLog.optimize(spark, root, s"opt$r",
        targetFiles = 4))
      println(f"[rowverb] dir=$dir rows=$rows repeat=$r " +
        f"delete_s=$tDel%.2f delete_rewrote=$delRewrites/16 " +
        f"merge_s=$tMerge%.2f merge_rewrote=$mergeRewrites/16 " +
        f"update_s=$tUpd%.2f update_rewrote=$updRewrites/16 " +
        f"full_rewrite_s=$tOpt%.2f (versions $vDel/$vM/$vU/$vO)")
    }
    TxLog.destroy(root)

    // partitioned ingest: point-probe cost should track PARTITION bytes
    // (one leaf of 16 per batch), full-scan cost tracks table bytes
    val proot = "target/rowverb_probe_part"
    (1 to repeat).foreach { r =>
      TxLog.destroy(proot)
      val tenant = li.withColumn("tenant", col("l_partkey") % 16)
      val (_, tIngest) = timed(
        TxLog.commitPartitioned(spark, proot, "p1", tenant, "tenant"))
      val (fullN, tFull) = timed(
        TxLog.read(spark, proot).agg(sum("l_quantity")).head().getDouble(0))
      val (prunedN, tPoint) = timed(
        TxLog.readPruned(spark, proot, "tenant", 3, 3).get
          .filter(col("tenant") === 3)
          .agg(sum("l_quantity")).head().getDouble(0))
      val leaves = TxLog.liveFiles(proot).length
      println(f"[partprobe] dir=$dir rows=$rows repeat=$r leaves=$leaves " +
        f"ingest_s=$tIngest%.2f full_scan_s=$tFull%.2f " +
        f"point_probe_s=$tPoint%.2f (sums $fullN%.1f/$prunedN%.1f)")
    }
    TxLog.destroy(proot)
    spark.stop()
  }
}
