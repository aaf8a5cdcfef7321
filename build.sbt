ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dwphbasetomongoexportspark"
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
// Forked-run output normally routes through sbt's logger, which
// prefixes every line with "[info] " — that prefix is what broke the
// driver's last-line JSON parse of Bench/Verify stdout in every
// shipped BENCH_r*.json. StdoutOutput inherits the parent stdout
// directly: no prefix, no re-buffering.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// The bench/verify drivers parse the LAST stdout line as JSON; sbt's
// trailing "[success] Total time ..." banner lands after our printed
// line and defeats that parse (every shipped BENCH_r*.json carries
// `parsed: null`). Suppress the banner so the program's own final
// println IS the last line of stdout.
Global / showSuccess := false
Global / showTiming := false
Global / excludeLintKeys ++= Set(showSuccess, showTiming)
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
  // 40 queries incl. cached LSH signatures + interpreted HOF folds run
  // in ONE driver JVM at local[32]; 8g thrashed GC (uniform ~2x bench
  // slowdowns, worst on allocation-heavy queries). 24g is comfortable
  // on the 128 GiB box.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
