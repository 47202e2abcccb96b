package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.engine.Sim

/** Streaming ingest for the persisted IVF index — closes the set: all
  * three index modalities (MinHash bands via [[DedupStream]], postings
  * via [[TermIndexStream]], vector cells here) now run the same
  * steady-state stream shape: one idempotent `increment=<batchId+1>`
  * partition per micro-batch against FROZEN artifacts, probes servable
  * between batches, maintenance off the ingest path.
  *
  * The maintenance hook here is the drift policy rather than a file
  * count: after each append, [[Sim.maintainIvfIndex]] measures per-cell
  * occupancy drift of the accumulated increments against the build
  * partition (from the index's own partitions — no corpus read) and
  * retrains + reassigns ONLY if it exceeds `driftThresholdPpm`. A feed
  * that stays in distribution accrues increments indefinitely (cheap,
  * correct); a feed that genuinely moved triggers one atomic swap.
  * foreachBatch is sequential, so no probe in this stream races the
  * swap; external probes see old-or-new atomically.
  *
  * Delivery: the append is exactly-once under micro-batch retry
  * (batch-keyed dynamic overwrite). A crash between a recluster and
  * the batch checkpoint replays the batch as a re-append onto the
  * reclustered index — still idempotent because the recluster NEVER
  * folds the newest increment (the only partition a replay can
  * rewrite; [[Sim.maintainIvfIndex]]'s replay-safety contract): the
  * replayed append re-assigns against the now-persisted new centroids
  * and dynamic-overwrites that same partition with bit-identical rows.
  * Folding it would strand the batch's vectors in `increment=0` AND
  * re-land them under `increment=batchId+1` on replay — the
  * duplication the exclusion exists to prevent.
  *
  * OWNERSHIP CONTRACT (all three index streams): batch ids are unique
  * only within one checkpoint lineage, so an index is owned by exactly
  * one ingest stream. Restarting with the SAME checkpoint continues
  * the lineage (ids keep rising — correct); pointing a FRESH
  * checkpoint at an index that already holds live increments restarts
  * ids at 0 and the new stream's `increment=1` would silently REPLACE
  * the old stream's. Compact first (folds everything to increment=0,
  * which batch appends never collide with) if an index must change
  * hands. */
object VecIndexStream {

  /** Start the vector-index ingest over an embedding stream (needs
    * `vec_id`, `embedding`). `driftThresholdPpm = 0` disables the
    * maintenance hook (append-only ingest). */
  def indexSink(vecs: DataFrame, indexDir: String, checkpointDir: String,
      driftThresholdPpm: Long = 0L): StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Sim.appendIvfIndex(batch, indexDir, increment = batchId + 1L)
        if (driftThresholdPpm > 0L) {
          Sim.maintainIvfIndex(batch.sparkSession, indexDir,
            driftThresholdPpm)
          ()
        }
      }
      .start()

  /** The SERVING half as a stream — probe batches arrive continuously
    * and each micro-batch is answered from the persisted index
    * ([[Sim.probeIvfIndexObserved]]: DPP-pruned cells, serving metrics
    * riding the probe job): top-k results land at `$outDir/results`
    * and the per-batch metrics row (assignment_rows, cells_probed) at
    * `$outDir/metrics`, both under `batch=<id+1>` dynamic overwrite —
    * a replayed probe batch re-lands identically ([[landProbeBatch]]
    * is the retry unit, spec-pinned idempotent).
    *
    * Visibility vs a concurrent ingest stream: an append commits its
    * increment's (increment, cell) partitions at job commit; a probe
    * planned mid-commit can see a PREFIX of the new increment's cells
    * (never partial files, never mixed generations — maintenance
    * rewrites still swap atomically). Probes therefore serve
    * read-committed-per-partition data: the new increment becomes
    * fully visible at the next planning after its commit. */
  def probeSink(probes: DataFrame, indexDir: String, outDir: String,
      checkpointDir: String, k: Int = Sim.IVF_TOP_K,
      nprobe: Int = 1): StreamingQuery =
    probes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        landProbeBatch(batch, indexDir, outDir, batchId + 1L, k, nprobe)
      }
      .start()

  /** One probe micro-batch: serve + land results and metrics, batch-
    * keyed (the retry unit — dynamic overwrite replaces both sinks). */
  def landProbeBatch(batch: DataFrame, indexDir: String, outDir: String,
      increment: Long, k: Int, nprobe: Int): Unit = {
    import org.apache.spark.sql.functions.lit
    val spark = batch.sparkSession
    val (res, obs) = Sim.probeIvfIndexObserved(
      batch.select("probe_id", "embedding"), indexDir, k, nprobe)
    res.withColumn("batch", lit(increment))
      .write.partitionBy("batch")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(s"$outDir/results")
    import spark.implicits._
    Seq((obs.get("assignment_rows").asInstanceOf[Long],
        obs.get("cells_probed").asInstanceOf[Long]))
      .toDF("assignment_rows", "cells_probed")
      .withColumn("batch", lit(increment))
      .coalesce(1)
      .write.partitionBy("batch")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(s"$outDir/metrics")
  }
}
