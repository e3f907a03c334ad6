package graft.tools

import graft.Queries

/** Repeated-invocation profiler: runs NAMED registry queries solo, printing
  * per-iteration wall time plus JVM memory-pool telemetry. Separates real
  * operator regressions from in-suite position noise (GC debt, C2 compiler
  * queueing, metaspace growth from 190 preceding plans): a query that is slow
  * in the full Bench sweep but flat-fast here is suffering the suite, not
  * its own plan.
  *
  * Usage: runMain graft.tools.ProfileLoop [reps] [query...]
  *   SPARK_GRAFT_SF_DIR overrides the data dir (default sf0.1).
  */
object ProfileLoop {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.session("profile-loop")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q_dedup_minhash")
    val byName = Queries.all.map(q => q.name -> q).toMap
    import scala.jdk.CollectionConverters._
    def pools(): String =
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(p => p.getName.contains("CodeHeap") || p.getName.contains("Metaspace"))
        .map(p => f"${p.getName.replace("CodeHeap ", "")}=${p.getUsage.getUsed / 1048576}%dM")
        .mkString(" ")
    names.foreach { name =>
      val q = byName.getOrElse(name,
        sys.error(s"unknown query '$name'; known: ${byName.keys.toSeq.sorted.take(10).mkString(",")}..."))
      val times = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        q.run(spark, dir).write.mode("overwrite").format("noop").save()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[loop] $name iter $i%2d  $s%7.2f s  ${pools()}")
        s
      }
      println(f"[solo] $name min=${times.min}%.2f s median=${times.sorted.apply(times.length / 2)}%.2f s")
    }
    spark.stop()
  }
}
