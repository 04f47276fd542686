ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "legatepandasspark"
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
// Pass the forked process's stdout straight through instead of wrapping
// every line in "[info] " — the Bench/Verify contract is a bare JSON line
// on stdout, which the log-prefixed form breaks for downstream parsers.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // Heap defaults to 8g and GC is left to the JVM's own ergonomics
  // (r14, reverting r13's unconditional -XX:+UseParallelGC + 16g
  // default): the ParallelGC flag was A/B'd warm at an 8-16 GiB heap
  // only, but the bench contract runs with SPARK_DRIVER_MEM overridden
  // to a much larger heap, where ParallelGC's stop-the-world young-gen
  // collections regressed 25/30 headline queries 1.7x and made 8 cores
  // beat 32 (VERDICT r13). Perf-affecting JVM flags need a cold-JVM
  // A/B at the driver's heap size/core count; experiment via
  // SPARK_GRAFT_JVM_OPTS below, never an unconditional default.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++ sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))
