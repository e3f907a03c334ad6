package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe (r9): gini fat-group scale point on lineitem (3 groups). */
object EdProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.session("probe")
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    for (dir <- Seq("/root/testdata/sf0.1", "target/scale10")) {
      val li = graft.core.Graft.table(spark, dir, "lineitem")
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.operators.StatsOps.gini(li, Seq(col("l_returnflag")),
          col("l_extendedprice")).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        dt
      }
      println(f"[probe] gini $dir min=${times.min}%.2f all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
