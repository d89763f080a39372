ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etlearthquakegcpspark"
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
// The bench/verify contract is "last line of stdout is one JSON metric
// line". Two sbt behaviors break that: the "[success] Total time ..."
// footer prints after the forked JVM exits (so a last-line parse reads
// the footer, not the metric), and forked stdout is re-logged through
// sbt's logger with an "[info] " prefix (so even a found line isn't raw
// JSON). Silence the footer and pass fork output through untouched.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess // consumed by the command layer, not a task
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
  // local[32] on a 128 GiB box: 8g forced constant GC on the array-heavy
  // dedup queries once 90+ queries shared one JVM (measured 2x inflation
  // in-bench vs isolated); 24g keeps the working set resident. The larger
  // code cache stops the JIT from flushing whole-stage-codegen classes
  // across a 96-query registry run.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  "-XX:ReservedCodeCacheSize=512m",
)
