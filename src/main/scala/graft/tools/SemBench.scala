package graft.tools

import org.apache.spark.sql.SparkSession

import graft.engine.{Sessions, Sim, Tables}

/** Serve-vs-recompute receipt for the semantic-dedup audit
  * ([[graft.engine.Sim.semanticDedupFromIndex]], q166's serve half) —
  * [[LifecycleBench]]'s protocol applied to the embedding modality:
  * build the IVF index ONCE over the full corpus (the amortized cost a
  * pipeline pays at ingest, maintained incrementally thereafter), then
  * time the in-plan q76 audit (N×K assignment every run) against the
  * from-index serve (two scans of the stored assignment). Over the FULL
  * corpus the index's frozen centroids are exactly `ivfAssign`'s stride
  * centroids, so the two audits must be bit-equal — printed as
  * `match: true` next to the timings. */
object SemBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = Sessions.local(cpus.toInt, "graft-sembench")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("sembench").toString
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sem] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    time("index build (once, amortized)") {
      Sim.buildIvfIndex(
        Tables.embeddings(spark, sfDir).select("vec_id", "embedding"),
        s"$dir/index")
    }
    val full = time("semantic audit FULL recompute (q76 path)") {
      Sim.semanticDedup(spark, sfDir).collect().map(_.toString).toSeq
    }
    val served = time("semantic audit from index (q166 serve path)") {
      Sim.semanticDedupFromIndex(spark, s"$dir/index")
        .collect().map(_.toString).toSeq
    }
    println(s"[sem] match: ${full == served} (${served.length} cells)")
    spark.stop()
  }
}
