package graft.tools

import org.apache.spark.sql.functions._

import graft.sources.TxLog
import graft.streaming.TxLogChangeStream

/** r13 probe: the change-feed subscription cost claims
  * ([[graft.streaming.TxLogChangeStream]] /
  * [[graft.streaming.GraftSourceProvider]]), measured instead of argued
  * (VERDICT r12 item 4) — the numbers behind the BENCH_SCALE
  * `txlog_subscription_r13` row.
  *
  * Shape: lineitem lands as 8 key-range batches at table-size factors
  * 1 / 10 / … (key-offset replication, distinct keys per replica), then
  * per repeat, against a FIXED-SIZE delta (~1/8 of the BASE table,
  * constant across factors):
  *
  *   1. `idle_s`    — one caught-up poll (the no-change discovery cost:
  *                    a log LISTING, no data read, no manifest replay)
  *   2. `append_s`  — deliver one append-commit window (readChanges →
  *                    noop sink; the O(delta) claim: new bytes only)
  *   3. `dv_s`      — deliver one deletion-vector window whose bind is
  *                    CONFINED to the delta file (retractions read the
  *                    changed file, not the table)
  *   4. `snapshot_s`— full snapshot aggregate (the contrast arm that
  *                    SHOULD track table size)
  *
  * Claim: 1–3 stay ~flat across the decade while 4 tracks table bytes.
  * Honest boundary (documented in the row): the DV-delta grain reads
  * the FILES whose binding changed — a delete smeared across every file
  * costs O(touched files' bytes) in the window, same as the verb
  * itself; "O(delta)" is exact for appends and file-confined changes.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_FACTORS=1,10 \
  *   SPARK_GRAFT_REPEAT=3 sbt -batch "runMain graft.tools.SubscriptionProbe"
  */
object SubscriptionProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.session("subscription-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "3").toInt
    val factors = sys.env.getOrElse("SPARK_GRAFT_FACTORS", "1,10")
      .split(",").map(_.trim.toInt).toSeq
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val baseRows = li.count()
    val maxKey = li.agg(max("l_orderkey")).head().getLong(0) + 1

    def timed[T](body: => T): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    factors.foreach { factor =>
      val root = s"/tmp/graft_subprobe_f$factor"
      TxLog.destroy(root)
      val scaled = (0 until factor).map { r =>
        if (r == 0) li
        else li.withColumn("l_orderkey", col("l_orderkey") + lit(r * maxKey))
      }.reduce(_ unionByName _)
      val width = factor * maxKey / 8 + 1
      (0 until 8).foreach { b =>
        TxLog.commit(root, Seq(TxLog.writeBatch(
          scaled.filter(floor(col("l_orderkey") / width) === b),
          root, s"b$b")))
      }
      val tableRows = baseRows * factor
      // fixed delta, constant across factors: ~1/8 of the BASE table,
      // keys offset past every replica so the delta file is disjoint
      val deltaKeyBase = (factor.toLong + 1000) * maxKey
      val delta = li.filter(col("l_orderkey") % 8 === 3)
        .withColumn("l_orderkey", col("l_orderkey") + lit(deltaKeyBase))
      val deltaRows = delta.count()

      val results = (1 to repeat).map { rep =>
        val sub = new TxLogChangeStream(spark, root,
          startAfter = TxLog.latestVersion(root))
        val idleS = timed { require(sub.advanceOnce((_, _, _) => ()).isEmpty) }
        TxLog.commit(root, Seq(TxLog.writeBatch(delta, root, s"d$rep")))
        val appendS = timed {
          val n = sub.drain { (df, _, _) =>
            df.write.mode("overwrite").format("noop").save()
          }
          require(n == 1, s"expected one append window, got $n")
        }
        // DV delete CONFINED to the delta file: ~1/5 of its rows
        val dvPred = col("l_orderkey") >= deltaKeyBase &&
          col("l_partkey") % 5 === 0
        require(TxLog.deleteWhereDV(spark, root, s"dv$rep", dvPred) > 0)
        val dvS = timed {
          val n = sub.drain { (df, _, _) =>
            df.write.mode("overwrite").format("noop").save()
          }
          require(n == 1, s"expected one dv window, got $n")
        }
        val snapshotS = timed {
          TxLog.read(spark, root).agg(sum(col("l_quantity"))).head()
        }
        (idleS, appendS, dvS, snapshotS)
      }
      def mins(f: ((Double, Double, Double, Double)) => Double): Double =
        results.map(f).min
      println(f"""[subprobe] {"factor":$factor,"table_rows":$tableRows,""" +
        f""""delta_rows":$deltaRows,"idle_s":${mins(_._1)}%.3f,""" +
        f""""append_window_s":${mins(_._2)}%.3f,""" +
        f""""dv_window_s":${mins(_._3)}%.3f,""" +
        f""""snapshot_s":${mins(_._4)}%.3f}""")
      TxLog.destroy(root)
    }
    spark.stop()
  }
}
