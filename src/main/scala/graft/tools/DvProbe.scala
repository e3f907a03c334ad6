package graft.tools

import org.apache.spark.sql.functions._

import graft.sources.TxLog

/** r11 probe: the merge-on-read cost-model claim of
  * [[graft.sources.TxLog.deleteWhereDV]], measured instead of asserted —
  * the number behind the BENCH_SCALE `dv_delete_r11` row.
  *
  * Shape: lineitem lands as 16 key-range batches, then a GDPR-shaped
  * DELETE runs — a predicate whose matches are SMEARED ACROSS EVERY
  * batch (`l_partkey % 199 == 0`, one "tenant" in ~199), the worst case
  * for copy-on-write because file pruning saves nothing: every file
  * holds a match, so CoW rewrites the whole table to drop ~0.5% of its
  * rows. The DV verb writes one sidecar of matched coordinates and
  * rebinds — table bytes never move. Three arms per repeat:
  *
  *   1. `dv_s`      — deleteWhereDV (sidecar write + bind commit)
  *   2. `masked_s`  — full-scan aggregate THROUGH the mask (the read
  *                    amplification merge-on-read pays until maintenance)
  *   3. `cow_s`     — deleteWhere on an identical fresh table (the
  *                    rewrite-everything contrast arm)
  *
  * plus `clean_s`, the same aggregate on the CoW result (= the read
  * price after OPTIMIZE materializes the vector). At a table-size
  * decade (sf0.1 → scale10) the claim is: `dv_s` tracks MATCHED rows
  * (~flat in table size for a fixed-rate tenant it still grows with the
  * match count, but never with unmatched bytes), `cow_s` tracks TABLE
  * bytes (~10×), and `masked_s / clean_s` stays a small constant factor.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_REPEAT=3 \
  *   sbt -batch "runMain graft.tools.DvProbe"
  */
object DvProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.session("dv-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "3").toInt
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val rows = li.count()
    val maxKey = li.agg(max("l_orderkey")).head().getLong(0)
    val width = maxKey / 16 + 1
    val pred = col("l_partkey") % 199 === 0

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def ingest(root: String): Unit = {
      TxLog.destroy(root)
      (0 until 16).foreach { b =>
        val batch = li.filter(floor(col("l_orderkey") / width) === b)
        TxLog.commitWithStats(root,
          Seq(TxLog.writeBatch(batch, root, s"b$b") ->
            TxLog.columnStats(batch, "l_orderkey")))
      }
    }
    def scanAgg(root: String): Double =
      TxLog.read(spark, root).agg(sum("l_quantity")).head().getDouble(0)

    (1 to repeat).foreach { r =>
      val dvRoot = "target/dv_probe_mor"
      val cowRoot = "target/dv_probe_cow"
      ingest(dvRoot)
      ingest(cowRoot)
      val matches = li.filter(pred).count()
      val (_, tDv) = timed(TxLog.deleteWhereDV(spark, dvRoot, s"dv$r", pred))
      val dvBound = TxLog.liveDvs(dvRoot).size
      val (aggMasked, tMasked) = timed(scanAgg(dvRoot))
      val (_, tCow) = timed(TxLog.deleteWhere(spark, cowRoot, s"cow$r", pred))
      val cowRewrote =
        TxLog.liveFiles(cowRoot).count(_.contains(s"cow${r}_d"))
      val (aggClean, tClean) = timed(scanAgg(cowRoot))
      require(math.abs(aggMasked - aggClean) < 1e-6 * math.abs(aggClean),
        s"mask and rewrite must agree: $aggMasked vs $aggClean")
      println(f"[dvprobe] dir=$dir rows=$rows matches=$matches repeat=$r " +
        f"dv_s=$tDv%.2f dv_bound=$dvBound/16 " +
        f"masked_s=$tMasked%.2f cow_s=$tCow%.2f " +
        f"cow_rewrote=$cowRewrote/16 clean_s=$tClean%.2f")
      TxLog.destroy(dvRoot)
      TxLog.destroy(cowRoot)
    }
    spark.stop()
  }
}
