ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "proxspark"
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // English month/day names must match DuckDB's monthname()/dayname()
  // (belt to Sessions.tune's Locale.setDefault suspenders).
  "-Duser.language=en", "-Duser.country=US",
  // local[32] keeps 32 task threads allocating concurrently; at 8g the
  // allocation-heavy operators (array-building projections) spend more time
  // in GC than in tasks (measured 5x slowdown on the LSH queries). The
  // bench/verify host has 128 GiB; leave headroom for the sbt JVM + duckdb.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // Start the heap at its max so ParallelGC never full-GCs just to grow
  // it mid-query ("Ergonomics" pauses), and raise the initial metaspace
  // trigger above what Spark+codegen load at startup ("Metadata GC
  // Threshold" caused 4 full GCs in the first seconds of every run).
  // Xms tracks the same env knob as Xmx — a fixed value would refuse to
  // start the JVM whenever SPARK_DRIVER_MEM is set below it.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  "-XX:MetaspaceSize=512m",
  // Throughput collector: batch queries care about total GC time, not
  // pauses; parallel old-gen collection absorbs the allocation bursts of
  // 32 concurrent task threads better than G1's pause-target heuristics.
  "-XX:+UseParallelGC",
)
