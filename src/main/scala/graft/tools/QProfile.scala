package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB wall attribution for one registered query (guide §1/§7):
  * runs the query (repeatable) with a listener that records every Spark
  * job's duration + description + stage/task counts, so a multi-second
  * query's wall decomposes into "which driver-submitted jobs cost what"
  * — the local-mode stand-in for the UI's Jobs page.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.QProfile <sfDir> <query> [reps] */
object QProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val qname = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = graft.engine.Sessions.local(cpus.toInt, "graft-qprofile")
    spark.sparkContext.setLogLevel("ERROR")
    // warmup (codegen/JIT) — the Bench preamble's shape
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_regionkey").count().count()
    spark.range(1000000L).selectExpr("sum(id * 2) AS s").count()

    case class J(id: Int, desc: String, t0: Long, var dt: Double = -1,
      var nTasks: Int = 0)
    val jobs = mutable.ArrayBuffer[J]()
    val byId = mutable.HashMap[Int, J]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(e.stageInfos.lastOption.map(_.name)).getOrElse("?")
        val j = J(e.jobId, d.take(140), e.time,
          nTasks = e.stageInfos.map(_.numTasks).sum)
        jobs += j; byId(e.jobId) = j
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
        byId.get(e.jobId).foreach(j => j.dt = (e.time - j.t0) / 1e3)
      }
    }
    val fn = graft.SparkEntry.queries(qname)
    (1 to reps).foreach { r =>
      jobs.clear(); byId.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      System.gc()
      println(f"[qprof] === $qname rep $r: wall $wall%.2f s, ${jobs.size} jobs, job-sum ${jobs.map(_.dt).filter(_ > 0).sum}%.2f s")
      jobs.sortBy(-_.dt).take(25).foreach { j =>
        println(f"[qprof]   ${j.dt}%7.3f s  ${j.nTasks}%4d tasks  job${j.id}%-4d ${j.desc}")
      }
    }
    spark.stop()
  }
}
