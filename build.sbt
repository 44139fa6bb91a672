ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dataengineeringhsspark"
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
// The driver parses the LAST stdout line of `sbt runMain graft.Bench`
// as JSON; sbt's "[success] Total time..." banner prints after the
// forked JVM's output and has kept BENCH_rNN.json.parsed null for two
// rounds. Suppress it globally (the exit code still reports failure),
// and pass the forked JVM's stdout through RAW — the default
// LoggedOutput strategy prefixes every line with "[info] ", which is
// just as fatal to a JSON parse as the banner was.
Global / showSuccess := false
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
)
// The mains (Bench/Verify/QBench) get a harness-sized heap: the bench's
// widened scale tiers run THREE data scales (sf0.1 + 10x + 32x + a 64x
// point) through one JVM, and the 8g cap that was fine for one tier
// provably killed the SparkContext mid-32x-tier (OOM-induced stop) once
// all 25 heavies ran there. The box has 128 GiB; 24g is still a
// conservative stand-in for one real executor's share.
run / javaOptions += s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}"
// Tests keep the smaller heap ON PURPOSE: suites assert spill-adjacent
// behavior (salting, skew, sketch memory) that a huge heap would mask.
Test / javaOptions += s"-Xmx${sys.env.getOrElse("SPARK_TEST_MEM", "8g")}"
