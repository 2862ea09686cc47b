ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "simplefeaturesspark"
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
// Forked run output goes straight to stdout/stderr, NOT through sbt's
// logger: the bench/verify mains print ONE machine-readable JSON line
// that the driver parses; sbt's default LogOutput prefixes it with
// "[info] " which breaks the parse (BENCH_r01.json had parsed:null).
run / outputStrategy := Some(StdoutOutput)
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
) ++ sys.env.get("GRAFT_GC_LOG").map(f => s"-Xlog:gc*:file=$f:time,uptime").toSeq ++
  sys.env.get("GRAFT_GC").map(g => s"-XX:+Use${g}GC").toSeq
// Benchmark/Verify runs (run scope): fixed, pre-touched heap — lazy heap
// growth page-faults in the kernel mid-benchmark (observed 88%-sys-time
// stalls); pay the zeroing cost once at JVM start instead. 24g, not
// 48g: the timed scaling samples run in forked children with their own
// heaps, and the host sporadically enters a kernel-side paging
// pathology where pre-touching 48g burned 15+ min of 70%-sys-time
// across all GC threads before main() even started.
run / javaOptions ++= Seq(
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  "-XX:+AlwaysPreTouch",
)
// Tests: modest lazy heap — a 48g pre-touch per forked test JVM costs
// minutes of page zeroing and starves concurrent JVMs.
Test / javaOptions ++= Seq("-Xmx8g")
