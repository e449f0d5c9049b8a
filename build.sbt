ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "azurekustoparquetconvspark"
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
// The driver parses the ONE JSON line Bench/Verify print from stdout;
// sbt's default LoggedOutput would prefix it with "[info] " and break
// the parse (BENCH_r01.json: parsed=null). StdoutOutput passes the
// forked JVM's stdout through verbatim.
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
  // Heap + collector for the forked local-mode JVM (driver == executor):
  // at -Xmx8g the unified memory region was 4.6 GiB shared by 32 task
  // threads plus the StageMemo checkpoint blocks, and G1 stalled the
  // late-suite queries in GC (measured r16: q262 26.4 s task-attributed
  // GC on a 6.5 s query, q130 11.3 s — cpu/run 0.13–0.49). 24g keeps
  // compressed oops (a 32g probe LOST them and ran 30% slower) and
  // ParallelGC trades pause latency — irrelevant in batch — for
  // throughput: the GC-stalled set dropped 2–4x (q130 10.0->2.7 s,
  // q262 6.5->2.6, q223 2.2->0.8, q124 3.7->1.6; full sweep in
  // OPTIMIZATION_r16.md). SPARK_DRIVER_MEM still overrides the size;
  // cluster deployments size executors via spark-submit, not this.
  // NOTE: the 24g default assumes >=32 GiB of host RAM (ADVICE r16);
  // on smaller dev machines set SPARK_DRIVER_MEM=8g. The collector is
  // likewise overridable via SPARK_GC (e.g. SPARK_GC=G1GC) — the r17
  // A/B re-measured ParallelGC vs G1 at 24g on the full suite before
  // keeping the default below.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  s"-XX:+Use${sys.env.getOrElse("SPARK_GC", "ParallelGC")}",
)
