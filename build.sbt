ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "simbaspark"
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
// The driver invokes `sbt "runMain graft.Bench"` and parses the bench's
// one-line JSON from the captured output. sbt's default LoggedOutput
// relays the forked JVM's stdout through the logger with an "[info] "
// prefix, which has made the line unparseable in every round's BENCH
// artifact (r16 verdict #2). StdoutOutput hands the forked process
// sbt's own stdout/stderr directly: program stdout stays raw and
// program stderr (Spark logs) stays on stderr instead of being folded
// into stdout as "[error] " lines.
run / outputStrategy := Some(StdoutOutput)
// ...and suppress the "[success] Total time" trailer so the bench's
// JSON line is the LAST stdout line of the sbt invocation.
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, not by another task —
// exclude it from the unused-key lint
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
