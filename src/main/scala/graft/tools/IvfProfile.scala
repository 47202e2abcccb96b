package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{IndexMaintenance, Sessions, Sim, Tables}

/** Round-15 measurement harness (guide §1): attribute the IVF / IVF-PQ
  * lifecycle queries' wall (q129/q131/q136/q149/q166 — the top of the
  * sf0.1 bench) to their phases: centroid train+write, cell-partitioned
  * index write (build), append, probe/audit. Also reports the parquet
  * file count the write laid down — the small-files suspect (guide §6).
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.IvfProfile [sfDir] */
object IvfProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = Sessions.local(cpus.toInt, "graft-ivfprofile")
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ivfp] $what%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    def files(dir: String): Long = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(p)) return -1
      val it = fs.listFiles(p, true)
      var n = 0L
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    // warmup (codegen/JIT)
    spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_regionkey").count().count()
    spark.range(1000000L).selectExpr("sum(id * 2) AS s").count()

    val e = Tables.embeddings(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism)
    val idx = IndexMaintenance.scratchIndexDir(spark, "ivfprofile-pq")
    time("ivfpq build (4/5 corpus)") {
      Sim.buildIvfPqIndex(e.filter(col("vec_id") % Sim.ANN_DELTA_MOD =!= 0), idx,
        avoid = Sim.ANN_DELTA_MOD)
    }
    println(s"[ivfp]   vectors files after build: ${files(s"$idx/vectors")}")
    time("ivfpq append (1/5 delta)") {
      Sim.appendIvfPqIndex(e.filter(col("vec_id") % Sim.ANN_DELTA_MOD === 0), idx,
        increment = 1L)
    }
    println(s"[ivfp]   vectors files after append: ${files(s"$idx/vectors")}")
    time("ivfpq probe") {
      Sim.probeIvfPqIndex(
        e.filter(col("vec_id") < Sim.PQ_PROBES)
          .select(col("vec_id").as("probe_id"), col("embedding")), idx).count()
    }
    val idx2 = IndexMaintenance.scratchIndexDir(spark, "ivfprofile-ivf")
    time("ivf build (4/5 corpus)") {
      Sim.buildIvfIndex(e.filter(col("vec_id") % Sim.ANN_DELTA_MOD =!= 0), idx2,
        avoid = Sim.ANN_DELTA_MOD)
    }
    println(s"[ivfp]   vectors files after build: ${files(s"$idx2/vectors")}")
    time("ivf append (1/5 delta)") {
      Sim.appendIvfIndex(e.filter(col("vec_id") % Sim.ANN_DELTA_MOD === 0), idx2,
        increment = 1L)
    }
    time("ivf probe") {
      Sim.probeIvfIndex(
        e.filter(col("vec_id") < Sim.N_PROBES)
          .select(col("vec_id").as("probe_id"), col("embedding")), idx2).count()
    }
    time("semdedup audit from index") {
      Sim.semanticDedupFromIndex(spark, idx2).count()
    }
    spark.stop()
  }
}
