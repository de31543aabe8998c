ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "embulkexecutormapreducespark"
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
// Driver bench contract (VERDICT r18 task 1): the driver parses the LAST
// stdout line of `sbt "runMain graft.Bench"` as JSON. With the default
// LoggedOutput strategy, sbt prefixes every forked-process stdout line
// with "[info] " — corrupting the JSON — and appends its own
// "[success] Total time: ..." line after it. StdoutOutput inherits the
// parent stdout (no prefix); showSuccess := false drops the trailer, so
// the bench's JSON line is genuinely the last line of stdout.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is read by sbt's command engine, not by settings/tasks —
// the unused-key lint false-positives on it and its [warn] block would
// pollute the stdout the driver parses
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
) ++
  // ad-hoc instrumentation passthrough (e.g. event logging for stage-level
  // probe forensics): space-separated -D/-X flags for the forked JVM.
  // LIMITATION: split is on whitespace, so option VALUES must not contain
  // spaces (-Dfoo="a b" would become two bogus flags) — fine for the
  // -Dspark.*/-X flags this hook exists for; quote-aware parsing is not
  // worth the complexity here
  sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS").toSeq
    .flatMap(_.split("\\s+").filter(_.nonEmpty))
// one shared SparkSession across suites; Spark local mode dislikes
// concurrent contexts in one JVM
Test / parallelExecution := false
