package graft.streaming

import org.apache.spark.sql.SparkSession

import graft.engine.{IndexMaintenance, Sessions}

/** Round-15 measurement harness (guide §1): attribute ONE streaming
  * lineage's build wall (the q202 as-of replay — the slowest lineage at
  * 38 s serial) to its phases, and measure how the per-micro-batch fixed
  * cost scales with the state-partition count (stateful exec cannot use
  * AQE, so `spark.sql.shuffle.partitions` at checkpoint-create time IS
  * the state shard count for the replay).
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.streaming.StreamProfile [sfDir] */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = Sessions.local(cpus.toInt, "graft-streamprofile")
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sp] $what%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    // warmup
    spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_regionkey").count().count()
    val inDir = time("writeTimeSlices (flush heartbeat)") {
      EventsStream.writeTimeSlices(spark, sfDir, "sprof", flushHeartbeat = true)
    }
    Seq(cpus.toInt, 8, 4).foreach { p =>
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", p.toString)
      val outDir = IndexMaintenance.scratchIndexDir(s2, s"sprof-out-$p")
      val ckpt = IndexMaintenance.scratchIndexDir(s2, s"sprof-ckpt-$p")
      time(s"asof backward drain, statePartitions=$p") {
        val q = AsOfStream.clickPurchaseAsOf(s2, inDir,
            Some(AsOfStream.SS_TOL_US), "backward",
            filesPerTrigger = Some(1)).toDF
          .writeStream
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
            AsOfStream.landAsOf(batch, batchId, s"$outDir/direction=backward")
          }
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      val n = s2.read.parquet(outDir).count()
      println(s"[sp]   rows landed: $n")
    }
    spark.stop()
  }
}
