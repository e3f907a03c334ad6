package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Graft
import graft.operators.DedupOps

/** Repeated-invocation profiler: prints per-iteration wall time plus JVM
  * memory-pool telemetry to find progressive session degradation. */
object ProfileLoop {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("profile-loop")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(8)
    val docs = Graft.table(spark, dir, "documents")
    import scala.jdk.CollectionConverters._
    def pools(): String =
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(p => p.getName.contains("CodeHeap") || p.getName.contains("Metaspace"))
        .map(p => f"${p.getName.replace("CodeHeap ", "")}=${p.getUsage.getUsed / 1048576}%dM")
        .mkString(" ")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      DedupOps.minhashLsh(docs, col("doc_id"), col("text"), 5, 4, 2, 0.2)
        .write.mode("overwrite").format("noop").save()
      println(f"[loop] iter $i%2d  ${(System.nanoTime() - t0) / 1e9}%7.2f s  ${pools()}")
    }
    spark.stop()
  }
}
