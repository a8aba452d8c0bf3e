ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "distributedvectorsearchsystemspark"
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
// Forked run inherits raw stdout/stderr — without this, sbt decorates
// every line with [info]/[error] and the driver's JSON parse of the
// Bench metric line fails ("parsed": null in BENCH_r01/r02).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Test / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // A long-lived SQL-serving JVM compiles thousands of generated
  // (Janino whole-stage) classes; at the JDK default 240 MB the code
  // cache fills mid-suite and UseCodeCacheFlushing silently evicts
  // cold nmethods, so later queries re-enter interpreted/deopt churn
  // (r19 baseline: single queries 10-25x their isolated cost with
  // cpu≈wall and nothing in jit/gc/sched). Sized like the codegen
  // plan cache (spark.sql.codegen.cache.maxEntries=4096): to the
  // workload, not the JDK default. Bench reports codecache_peak_mb
  // so the headroom stays auditable.
  "-XX:ReservedCodeCacheSize=1g",
)
// Extra forked-JVM options from the environment (diagnostics, or
// enabling the persisted index store in Verify:
// GRAFT_EXTRA_JVM_OPTS="-Dgraft.indexStoreDir=target/graft_index_store").
// sbt's own JVM does not forward -D flags to forked run/test JVMs.
javaOptions ++= sys.env.get("GRAFT_EXTRA_JVM_OPTS").toSeq
  .flatMap(_.split("\\s+").toSeq.filter(_.nonEmpty))
