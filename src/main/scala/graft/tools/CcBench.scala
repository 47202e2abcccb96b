package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{Dedup, Sessions}

/** Measures the incremental-CC merge against the full recompute it
  * replaces: build labels from 2/3 of the near-dup pairs, merge the
  * remaining third as an increment, and time both paths. The merge's
  * cost is bounded by the increment's edges (graph contraction), so the
  * gap widens with corpus size — the number SCALE_r08.md records. */
object CcBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus.toInt, "graft-ccbench")
    // measurement knob (r15): isolate the shuffle-partition count's share
    // of the per-round cost without touching the shared Sessions default
    sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS").foreach(p =>
      spark.conf.set("spark.sql.shuffle.partitions", p))
    spark.sparkContext.setLogLevel("ERROR")
    val pairs = Dedup.minhashNearDup(spark, sfDir)
      .select("doc_a", "doc_b").localCheckpoint()
    val seed = pairs.filter((col("doc_a") + col("doc_b")) % 3 =!= 0)
    val inc = pairs.filter((col("doc_a") + col("doc_b")) % 3 === 0)
    println(s"[ccbench] pairs=${pairs.count()} increment=${inc.count()}")
    val dir = java.nio.file.Files.createTempDirectory("ccbench").toString
    Dedup.buildClusterLabels(seed, s"$dir/labels")
    def time[A](what: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[ccbench] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("incremental merge") {
      Dedup.mergeClusterIncrement(spark, s"$dir/labels", inc)
    }
    time("full recompute") {
      Dedup.buildClusterLabels(pairs, s"$dir/labels_full")
    }
    spark.stop()
  }
}
