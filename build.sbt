ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mondayetlspark"
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
// Forked-run output goes STRAIGHT to this process's stdout/stderr instead
// of through sbt's logger, which prefixes every line with [info]/[error].
// The driver's bench parser reads a bounded stdout tail and needs the
// summary JSON as a BARE line (r10 VERDICT: BENCH_r10.json parsed null
// because the line carried sbt's logger prefix); Spark's own logging is
// on stderr and stays there.
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
  // 16g: the bench runs 300+ query executions in one JVM; at 8g the
  // localCheckpoint blocks + shuffle buffers of earlier keys kept later
  // keys GC-bound (suite timings ran 2-3x the isolated timings)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
// keep sbt's "[success] Total time" trailer out of the log tail the
// driver's bench parser reads — the JSON summary line must stay last
ThisBuild / showSuccess := false
Global / excludeLintKeys += showSuccess
