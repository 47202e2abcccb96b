package graft.tools

import org.apache.spark.sql.SparkSession

import graft.engine.{Dedup, Sessions}

/** Measures the steady-state label-lifecycle consumers against the full
  * in-plan recomputes they replace: the keep-list and the cluster-aware
  * split served from the persisted label table (one bounded join) vs
  * recomputing the LSH pair graph + transitive closure per run (the
  * 193 s / 299 s sf10 lines in SCALE_r08.md). The label bootstrap is
  * timed separately — a daily pipeline pays it once and then maintains
  * the table by increment merges (CcBench measures that half).
  *
  * Usage: runMain graft.tools.LifecycleBench [sfDir] */
object LifecycleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = Sessions.local(cpus.toInt, "graft-lifecyclebench")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("lifecyclebench").toString
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[lifecycle] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    time("label bootstrap (build once, amortized)") {
      Dedup.buildClusterLabels(
        Dedup.minhashNearDup(spark, sfDir).select("doc_a", "doc_b"),
        s"$dir/labels")
    }
    val fullKeep = time("keep-list FULL recompute (q134 path)") {
      Dedup.dedupKeepList(spark, sfDir).collect().map(_.toString).toSeq
    }
    val lifeKeep = time("keep-list from labels (steady state)") {
      Dedup.dedupKeepListFrom(spark, sfDir, s"$dir/labels")
        .collect().map(_.toString).toSeq
    }
    println(s"[lifecycle] keep-list match: ${fullKeep == lifeKeep}")
    val fullSplit = time("cluster split FULL recompute (q142 path)") {
      Dedup.clusterAwareSplit(spark, sfDir).collect().map(_.toString).toSeq
    }
    val lifeSplit = time("cluster split from labels (steady state)") {
      Dedup.clusterAwareSplitFrom(spark, sfDir, s"$dir/labels")
        .collect().map(_.toString).toSeq
    }
    println(s"[lifecycle] split match: ${fullSplit == lifeSplit}")
    spark.stop()
  }
}
