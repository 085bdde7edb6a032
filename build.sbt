ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dataengtaxiibisdagsterspark"
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
// Forked `run` output must reach stdout UNPREFIXED: the bench driver
// parses the JSON metrics line from the process tail, and sbt's default
// LoggedOutput wraps every line in "[info] " which breaks that parse.
run / outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
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
  // 32 executor threads at sf0.1 allocate fast; an 8g heap spent the
  // round-1 driver bench in GC (mid-run queries 8-18x their recorded
  // cost with identical plans). The box has 125 GiB; give the single
  // local[32] JVM real headroom so timings measure plans, not GC.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  "-XX:+UseG1GC",
)
// Soak suites (tri-scale oracle runs, minutes each) are tagged
// graft.SlowTest and excluded from the default `sbt test`; run them
// with: sbt "testOnly graft.OracleSoakSpec -- -n graft.SlowTest"
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-l", "graft.SlowTest")
// local-cluster[...] tests (LocalClusterSpec): worker-launched executor
// JVMs boot from SPARK_HOME's jars; SPARK_SCALA_VERSION is normally
// exported by bin/load-spark-env.sh, which the in-JVM worker's command
// builder never runs — without it executor launch dies with "Cannot
// find any build directories".
Test / envVars ++= Map(
  "SPARK_HOME" -> "/opt/spark",
  "SPARK_SCALA_VERSION" -> "2.13",
)
