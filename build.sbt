ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mapreduce_weather_analysisspark"
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
// Default heap: a quarter of physical RAM, clamped to [2g, 24g] — on
// the 128 GiB bench sandbox this is the same 24g as before (driver
// comparability preserved), while a constrained machine no longer gets
// a JVM that cannot start. SPARK_DRIVER_MEM stays authoritative.
// Rationale for the 24g ceiling: local[N] packs driver + all executors
// + every fixture/memory-sink into ONE heap; at 8g the 234-query bench
// pass ran GC-bound by its measured phase.
val defaultHeap: String = {
  val gb = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    .getTotalMemorySize / (1L << 30)
  s"${math.max(2L, math.min(24L, gb / 4))}g"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", defaultHeap)}",
  // GC visibility for bench-window forensics (cheap, file-scoped);
  // %p = one log per JVM, so concurrent forked runs (tests, bench,
  // probe mains) stop clobbering each other's rotation set
  "-Xlog:gc:file=/tmp/graft_gc_%p.log:time,uptime:filecount=2,filesize=10m",
  // The 234-query catalog pass JIT-compiles thousands of generated
  // (janino/codegen) methods; at the JDK-17 default 240m the code
  // cache fills mid-pass, the sweeper starts flushing hot methods and
  // late-pass queries re-run partly interpreted — measured as
  // end-of-pass sessions reading 2-4x over an identical fresh JVM.
  // 1g keeps the whole pass compiled (simply reserved address space;
  // committed only as used).
  "-XX:ReservedCodeCacheSize=1g",
)
