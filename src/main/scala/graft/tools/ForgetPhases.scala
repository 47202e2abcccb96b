package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Finer q158 decomposition (round-15 measurement): the
  * [[Dedup.forgetClusterMembers]] body re-run step-by-step with a timer
  * around each phase — locate/members, the banded LSH re-pass, the CC
  * rebuild, and the bucket rewrite. Lives in graft.engine for access to
  * the private helpers; throwaway harness, asserts nothing.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.engine.ForgetPhases [sfDir] */
object ForgetPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = Sessions.local(cpus.toInt, "graft-forgetphases")
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[fph] $what%-44s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_regionkey").count().count()
    spark.range(1000000L).selectExpr("sum(id * 2) AS s").count()
    val src = Dedup.lifecycleLabels(spark, sfDir)
    (1 to 2).foreach { rep =>
      println(s"[fph] --- rep $rep")
      val labelDir = IndexMaintenance.scratchIndexDir(spark, "labels-fph")
      IndexMaintenance.cloneDir(spark, src, labelDir)
      val dd = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      val ids = dd.filter(col("doc_id") % Dedup.FORGET_MOD === 0)
        .select(col("doc_id"))
      val remainingDocs = dd.filter(col("doc_id") % Dedup.FORGET_MOD =!= 0)
      // ---- forgetClusterMembers body, phase-timed
      val l = time("read labels") {
        spark.read.parquet(labelDir).select(col("id"), col("label"), col("lb"))
      }
      val affected = time("affected locate + count") {
        val a = l.join(broadcast(ids.select(col("doc_id").as("id"))), Seq("id"),
            "left_semi")
          .select(col("label")).distinct().localCheckpoint()
        a.count(); a
      }
      val members = time("members + survivors + memberDocs") {
        val m = l.join(broadcast(affected), Seq("label"), "left_semi")
          .select(col("id")).localCheckpoint()
        m
      }
      val survivors = members
        .join(broadcast(ids.select(col("doc_id").as("id"))), Seq("id"),
          "left_anti")
      val memberDocs = remainingDocs
        .join(broadcast(survivors.select(col("id").as("doc_id"))),
          Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("text"))
      val pairs = time("LSH re-pass (nearDupPairsOf, checkpoint)") {
        val p = Dedup.nearDupPairsOf(memberDocs)
          .select(col("doc_a"), col("doc_b")).localCheckpoint()
        p.count(); p
      }
      val rebuilt = time("CC rebuild") {
        Dedup.connectedComponents(
          p2u(pairs)).localCheckpoint()
      }
      val touched = time("touched collect") {
        members.select(pmod(col("id"), lit(64L)).cast("int").as("lb"))
          .distinct().collect().map(_.getInt(0)).toSeq
      }
      val out = time("anti+union checkpoint") {
        val part = l.filter(col("lb").isin(touched: _*))
        part.join(broadcast(members.withColumnRenamed("id", "mid")),
            col("id") === col("mid"), "left_anti")
          .select(col("id"), col("label"))
          .unionByName(rebuilt.select(col("id"), col("label")))
          .withColumn("lb", pmod(col("id"), lit(64L)).cast("int"))
          .localCheckpoint()
      }
      time("bucket rewrite (dynamic overwrite)") {
        out.repartition(col("lb")).sortWithinPartitions("label")
          .write.partitionBy("lb")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite").parquet(labelDir)
      }
      time("kept-bucket diff + deletes") {
        val keptBuckets = out.select(col("lb")).distinct()
          .collect().map(_.getInt(0)).toSet
        val fs = new org.apache.hadoop.fs.Path(labelDir)
          .getFileSystem(spark.sessionState.newHadoopConf())
        touched.filterNot(keptBuckets).foreach { b =>
          fs.delete(new org.apache.hadoop.fs.Path(s"$labelDir/lb=$b"), true)
        }
      }
    }
    spark.stop()
  }

  private def p2u(pairs: org.apache.spark.sql.DataFrame) =
    pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
}
