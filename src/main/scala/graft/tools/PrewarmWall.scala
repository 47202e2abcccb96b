package graft.tools

import org.apache.spark.sql.SparkSession

/** Times the bench preamble's full prewarm wall under the admission-width
  * knob (`GRAFT_PREWARM_WIDTH` / `graft.stream.prewarm.width`) — the r15
  * measurement for choosing the default. One fresh JVM per data point
  * (the builds are memoized per process).
  *
  * Usage: GRAFT_PREWARM_WIDTH=6 SPARK_GRAFT_CPUS=32
  *   runMain graft.tools.PrewarmWall [sfDir] */
object PrewarmWall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = graft.engine.Sessions.local(cpus.toInt, "graft-prewarmwall")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("graft.stream.prewarm", "1")
    spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_regionkey").count().count()
    spark.range(1000000L).selectExpr("sum(id * 2) AS s").count()
    val t0 = System.nanoTime()
    graft.streaming.EventsStream.prewarmAll(spark, sfDir)
    println(f"[pwall] width=${sys.env.getOrElse("GRAFT_PREWARM_WIDTH", "(default)")} wall ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
