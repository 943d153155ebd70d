ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "duckdbcloudflarespark"
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
// Forked run output goes straight to stdout, NOT through sbt's logger:
// the logger prepends "[info] " to every line, which breaks any consumer
// that parses the final JSON line of graft.Bench / graft.Verify output
// (the round driver keeps a ~2000-char stdout tail and JSON-parses the
// last line that parses; a prefixed line never does).
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
  // single-JVM local[32] driver+executor heap. 8g GC-thrashed the bench
  // (warm q01 at sf1 measured 2.6 s vs 0.8 s at 32g — warm runs slower
  // than cold, the classic allocation-pressure signature); the box has
  // 128 GiB and the DuckDB baseline is measured against the same box,
  // so a third of it is the honest single-node config.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
