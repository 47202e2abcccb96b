package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{IndexMaintenance, Sessions, Sim, Tables}

/** Round-15 micro-experiments (guide §1): decompose the IVF build into
  * compute (noop-sunk passes) vs layout (partitioned write) so the
  * optimization targets the real cost. Throwaway measurement harness —
  * asserts nothing, changes nothing.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.OptExperiments [sfDir] */
object OptExperiments {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = Sessions.local(cpus.toInt, "graft-optexp")
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[optexp] $what%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warmup
    spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_regionkey").count().count()
    spark.range(1000000L).selectExpr("sum(id * 2) AS s").count()

    val eAll = Tables.embeddings(spark, sfDir)
    println(s"[optexp] embeddings rows = ${eAll.count()}")
    val base = eAll.filter(col("vec_id") % Sim.ANN_DELTA_MOD =!= 0)

    (1 to 2).foreach { rep =>
      println(s"[optexp] --- rep $rep")
      val idx = IndexMaintenance.scratchIndexDir(spark, "optexp-ivf")
      time("full buildIvfIndex (write)") {
        Sim.buildIvfIndex(base, idx, avoid = Sim.ANN_DELTA_MOD)
      }
      // the same build's pieces, noop-sunk
      val e = base.select(col("vec_id"), col("embedding"),
        sqrt(graft.functions.VecFns.norm2(col("embedding"))).as("nrm"))
      time("  withNorm scan only (noop)") { noop(e) }
      val cents = spark.read.parquet(s"$idx/centroids")
      // assignWithVec's exact body (private in Sim) inlined for the probe
      def assignWithVec(e: DataFrame): DataFrame =
        e.join(broadcast(cents), lit(true))
          .select(col("vec_id"), col("embedding"), col("nrm"), col("cent_id"),
            (graft.functions.VecFns.dot(col("embedding"), col("cv")) /
              (col("nrm") * col("cnrm"))).as("cos"))
          .groupBy("vec_id")
          .agg(max_by(struct(col("cent_id"), col("cos")),
              struct(col("cos"), -col("cent_id"))).as("best"),
            first(col("embedding")).as("embedding"),
            first(col("nrm")).as("nrm"))
          .select(col("vec_id"), col("embedding"), col("nrm"),
            col("best.cent_id").as("cell"))
      time("  assignWithVec (noop)") {
        noop(assignWithVec(e))
      }
      time("  assign, no payload carry (noop)") {
        noop(e.join(broadcast(cents), lit(true))
          .select(col("vec_id"), col("cent_id"),
            (graft.functions.VecFns.dot(col("embedding"), col("cv")) /
              (col("nrm") * col("cnrm"))).as("cos"))
          .groupBy("vec_id")
          .agg(max_by(struct(col("cent_id"), col("cos")),
            struct(col("cos"), -col("cent_id"))).as("best")))
      }
      val assigned = assignWithVec(e)
        .withColumn("increment", lit(0L)).localCheckpoint()
      time("  partitionBy(increment,cell) write") {
        assigned.write.partitionBy("increment", "cell")
          .mode("overwrite").parquet(s"$idx/vectors_flatA")
      }
      time("  flat write (no partitionBy)") {
        assigned.write.mode("overwrite").parquet(s"$idx/vectors_flatB")
      }
      time("  repartition(cell)+partitionBy write") {
        assigned.repartition(col("cell"))
          .write.partitionBy("increment", "cell")
          .mode("overwrite").parquet(s"$idx/vectors_flatC")
      }
    }
    spark.stop()
  }
}

/** q158 phase decomposition: clone / forget / serve. */
object ForgetExperiment {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = Sessions.local(cpus.toInt, "graft-forgetexp")
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[fexp] $what%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_regionkey").count().count()
    spark.range(1000000L).selectExpr("sum(id * 2) AS s").count()
    import graft.engine.Dedup
    time("lifecycleLabels (maintained build)") {
      Dedup.lifecycleLabels(spark, sfDir)
    }
    (1 to 2).foreach { rep =>
      println(s"[fexp] --- rep $rep")
      val labelDir = IndexMaintenance.scratchIndexDir(spark, "labels-fexp")
      time("cloneDir") {
        IndexMaintenance.cloneDir(spark,
          Dedup.lifecycleLabels(spark, sfDir), labelDir)
      }
      val d = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      time("forgetClusterMembers") {
        Dedup.forgetClusterMembers(spark, labelDir,
          d.filter(col("doc_id") % 13L === 0).select(col("doc_id")),
          d.filter(col("doc_id") % 13L =!= 0))
      }
      time("serve (read+sizes+join)") {
        val labels = Dedup.readClusterLabels(spark, labelDir)
        val sizes = labels.groupBy("label").agg(count(lit(1)).as("cluster_size"))
        labels.join(sizes, "label")
          .select(col("id").as("doc_id"), col("label").as("cluster_id"),
            col("cluster_size"))
          .orderBy("doc_id").count()
      }
    }
    spark.stop()
  }
}
