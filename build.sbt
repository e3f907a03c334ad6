ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hadoopprototypespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The bench driver parses the LAST stdout line as one JSON object
// (PERF_r15/r16 came back `parsed: null` two rounds running because sbt
// wrapped the summary in "[info] " and appended a "[success]" footer).
// Raw pass-through for forked `run` output and no success footer keep the
// bench's compact summary as the final, undecorated stdout line. Command
// success stays detectable via the exit code (the driver records rc).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command loop, not by a task — exclude
// it from the unused-key lint so every sbt invocation stays warning-free
Global / excludeLintKeys += showSuccess
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g beats 48g for this workload: G1 mixed-collection pauses grow with
  // heap size and showed up as multi-second per-query spikes at 48g
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // many-query sessions generate thousands of codegen classes; the default
  // 240m code cache fills, the JIT disables itself, and hot loops fall back
  // to the interpreter (10-40x slowdowns late in a run)
  "-XX:ReservedCodeCacheSize=1g",
) ++ sys.env.get("SPARK_GRAFT_JVM_EXTRA").toSeq.flatMap(_.split("\\s+"))
