ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dwwdatapipelinespark"
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
// Pass the forked process's stdout/stderr straight through instead of
// routing them through sbt's logger: the logger prefixes every line with
// "[info] "/"[error] ", which breaks consumers that json-parse the Bench
// line from the process tail (BENCH_r{2..5} all show "parsed": null).
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
  // 24g default (host has 128 GiB): at sf0.1 the md5-heavy proof queries
  // and near-dup joins GC-thrash inside 8g, which is the likely cause of
  // the 3-10x per-query inflation seen only in driver-side bench runs.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // JIT-level twin of the spark.sql.codegen.cache.maxEntries=10000 fix:
  // a 238-plan registry × whole-stage codegen compiles far more native
  // code than the 240m default reserve, so the sweeper silently flushes
  // cold methods between suite passes and hot giant expressions (w6d's
  // fused KML chain) re-pay C2 every pass — no "CodeCache is full"
  // warning ever fires because flushing keeps it from filling. A 512m
  // reserve is the standard setting for codegen-heavy Spark drivers.
  "-XX:ReservedCodeCacheSize=512m",
)
