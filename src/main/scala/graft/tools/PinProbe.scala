package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** r10 probe (VERDICT r9 item 4): prove or retire the r9 claim that pinning
  * the two-level templates' range sort (one `localCheckpoint`, both passes
  * read the pinned blocks) saves the second sort execution at the scale
  * where the sort dominates.
  *
  * Runs the two double-pass template consumers — spearman (two
  * globalRowNumber midrank maps) and weightedQuantile (globalCumSums) — on
  * a lineitem table (point it at target/scale10 for the 10× fat-group
  * shape) under `spark.graft.pinnedSort` true vs false, reporting min wall
  * time and the Spark job count of one execution. The job count is the
  * mechanism check: unpinned re-executes the range sort per pass, pinned
  * materializes it once. */
object PinProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.session("pin-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/scale10")
    val li = graft.core.Graft.table(spark, dir, "lineitem")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    spark.range(1000000).selectExpr("sum(id)")
      .write.format("noop").mode("overwrite").save()
    def run(label: String, pinned: Boolean)(
        f: => org.apache.spark.sql.DataFrame): Unit = {
      spark.conf.set("spark.graft.pinnedSort", pinned.toString)
      val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "3").toInt
      val stats = (1 to repeat).map { _ =>
        val j0 = jobs.get
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        System.gc()
        (dt, jobs.get - j0)
      }
      println(f"[pinprobe] $label pinned=$pinned " +
        f"min=${stats.map(_._1).min}%.2f " +
        f"all=${stats.map(s => f"${s._1}%.2f").mkString(",")} " +
        s"jobs=${stats.map(_._2).distinct.mkString("/")}")
    }
    val which = sys.env.getOrElse("SPARK_GRAFT_PROBE_ONLY", "spearman,weighted_quantile")
      .split(",").toSet
    for (p <- Seq(true, false)) {
      if (which("spearman"))
        run("spearman", p)(graft.operators.StatsOps.spearman(
          li, Seq(col("l_returnflag")), col("l_quantity"),
          col("l_extendedprice")))
      if (which("weighted_quantile"))
        run("weighted_quantile", p)(graft.operators.StatsOps.weightedQuantile(
          li, Seq(col("l_returnflag")), col("l_extendedprice"),
          col("l_quantity"), q = 0.5))
    }
    spark.stop()
  }
}
