ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "nludatawarehouse_projectspark"
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
// Forked run/runMain output inherits this process's stdout/stderr
// VERBATIM instead of going through sbt's logger, which prefixes every
// line with "[info] " — that prefix is what kept the driver's
// BENCH parsed field null for 13 rounds (Bench's final line is valid
// JSON but arrived as "[info] {...}"). With StdoutOutput the last
// stdout line starts with '{' and parses directly.
// (Compile/run scope feeds the forkOptions used by both run and runMain.)
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// …and suppress sbt's "[success] Total time" epilogue, which otherwise
// lands AFTER the forked main's output and becomes the final stdout
// line. With both settings, `sbt -batch "runMain graft.Bench"` ends
// stdout with Bench's bare JSON summary. Success/failure is still
// unambiguous via the exit code (sbt -batch exits non-zero on failure);
// don't grep for "[success]".
Global / showSuccess := false
// showSuccess is read by sbt's command engine, not by a task — silence
// the false-positive lintUnused warning.
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
  // Heap guidance (measured, round 13): keep local drivers at 8–16g.
  // A cold 64 GiB heap made the SAME query 5–18× slower on this host
  // (G1 region/promotion pathology: q285 747 s at 64g vs 60 s at 8g,
  // controlled singles) — more heap is NOT safer here. The sf1.0 sweep
  // scripts pin 16g for the same reason; see SCALE.md "64g GC artifact".
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
