ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hanabqbeamconnectorspark"
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
// Forked run output must NOT go through sbt's logger: the driver parses the
// bench metric JSON line from stdout, and the logger's "[info] " prefix broke
// that parse in round 1 (BENCH_r01.json "parsed": null).
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Round-13 measured A/B (interleaved pairs, full 288-query suite,
  // iters=2): the JDK-17 default 240m code cache runs its profiled
  // segment at ~75% occupancy by suite end, and the sweeper's flushing
  // re-profiles long-lived generated kernels late in the suite — the
  // in-suite "JVM aging" tax. 512m: 244.2 -> 232.6 s avg (-4.8%), wins
  // concentrated in the late composite lanes (curation_incr -0.74,
  // triangle_count -0.73, rec_eval -0.63, dedup_jaccard -0.46), both
  // pairs agreeing per-lane. full_count=0 either way — this is sweeper
  // pressure, not exhaustion. See SCALE.md round-13.
  "-XX:ReservedCodeCacheSize=512m",
) ++
  // Diagnostics hook: extra JVM flags (e.g. -Xlog:gc) without editing the
  // build — used to chase the round-5 local[32] bench cliff.
  sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq.flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
