package graft.tools

import graft.Queries
import graft.core.Graft

/** Dump formatted physical plans for plan-quality review:
  * runMain graft.tools.Explain [sfDir] [q1,q2,...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.lift(1).map(_.split(",").toSet)
    val spark = Graft.session("explain")
    Queries.all
      .filter(q => only.forall(_.contains(q.name)))
      .foreach { q =>
        println(s"\n========== ${q.name} ==========")
        try println(q.run(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable => println(s"(explain failed: $e)") }
      }
    spark.stop()
  }
}
