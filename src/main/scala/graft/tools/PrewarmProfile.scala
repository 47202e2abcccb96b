package graft.tools

import org.apache.spark.sql.SparkSession

import graft.engine.Sessions
import graft.streaming._

/** Round-15 measurement harness (guide §1: measure first): time each
  * one-time streaming/v2 lineage build ISOLATED and SERIAL (prewarm
  * concurrency off), so the bench's prewarm wall can be attributed —
  * is the concurrent wall max(lineage), or is 17-way concurrency on one
  * local[32] driver slower than a bounded pool / serial order?
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.PrewarmProfile [sfDir] */
object PrewarmProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = Sessions.local(cpus.toInt, "graft-prewarmprofile")
    spark.sparkContext.setLogLevel("ERROR")
    def time(what: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[pp] $what%-10s ${dt}%7.2f s")
      dt
    }
    val family: Seq[(String, () => Unit)] = Seq(
      "v2" -> (() => { graft.engine.V2Demo.ensure(spark, sfDir); () }),
      "curated" -> (() => { DocsStream.streamCuratedProbe(spark, sfDir).count(); () }),
      "neardup" -> (() => { DedupStream.streamNearDupProbe(spark, sfDir).count(); () }),
      "hourly" -> (() => { EventsStream.streamHourlyProbe(spark, sfDir).count(); () }),
      "sessions" -> (() => { EventsStream.streamSessionsProbe(spark, sfDir).count(); () }),
      "asof" -> (() => { AsOfStream.streamAsOfProbe(spark, sfDir).count(); () }),
      "sesswin" -> (() => { EventsStream.streamSessionWindowsProbe(spark, sfDir).count(); () }),
      "asink" -> (() => { AsOfStream.streamAsOfSinkProbe(spark, sfDir).count(); () }),
      "ti" -> (() => { TermIndexStream.streamTermIndexProbe(spark, sfDir).count(); () }),
      "vec" -> (() => { VecIndexStream.streamVecIndexProbe(spark, sfDir).count(); () }),
      "dcells" -> (() => { DriftStream.streamDriftCellsProbe(spark, sfDir).count(); () }),
      "ivj" -> (() => { EventsStream.streamIntervalJoinProbe(spark, sfDir).count(); () }),
      "drift" -> (() => { EventsStream.streamDriftProbe(spark, sfDir).count(); () }),
      "dedup" -> (() => { EventsStream.streamDedupProbe(spark, sfDir).count(); () }),
      "loj" -> (() => { EventsStream.streamOuterJoinProbe(spark, sfDir).count(); () }),
      "foj" -> (() => { EventsStream.streamFullOuterJoinProbe(spark, sfDir).count(); () }))
    val total = family.map { case (tag, f) => time(tag)(f()) }.sum
    println(f"[pp] SERIAL TOTAL ${total}%7.2f s")
    spark.stop()
  }
}
