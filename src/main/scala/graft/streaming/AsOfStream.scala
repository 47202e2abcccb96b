package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming as-of (temporal) join — the canonical production consumer of
  * "latest rate ≤ event time" is a stream, not a batch (Flink calls this a
  * temporal table join; kdb runs `aj` against a ticker feed). The
  * stream-static form here bridges each micro-batch through the native
  * broadcast as-of strategy ([[graft.plans.BroadcastAsOfJoinExec]]):
  *
  *  - the probe side is the unbounded stream — per micro-batch it is a
  *    plain DataFrame, probed map-side with NO shuffle and NO sort, which
  *    is exactly the broadcast strategy's contract;
  *  - the static side is a bounded reference table (rates, config epochs,
  *    dimension versions); it is re-planned per micro-batch, so a slowly
  *    changing reference picks up updates between batches without a query
  *    restart — the cheap half of a Flink temporal join, with the
  *    broadcast row guard ([[graft.plans.AsOf.BROADCAST_MAX_ROWS_KEY]])
  *    keeping it honest;
  *  - all three directions and the tolerance knob pass straight through
  *    to the operator, so stream ≡ batch row-for-row on the same data
  *    (StreamingSpec pins all three directions against the batch run).
  *
  * Delivery is exactly-once under micro-batch retry: each batch lands
  * under its own `batch=<id>` partition with dynamic partition
  * overwrite, so a replayed batch replaces itself instead of
  * re-appending — the same batch-id-keyed idempotence device as
  * [[DedupStream]] (StreamingSpec simulates the retry). Readers that
  * don't care about provenance just read `outDir`; `batch` is one more
  * hive column. */
object AsOfStream {

  /** The landing half of [[asOfSink]], exposed for retry simulation:
    * idempotent per (batchId, outDir). */
  private[graft] def landAsOf(enriched: DataFrame, batchId: Long,
      outDir: String): Unit =
    enriched
      .withColumn("batch", org.apache.spark.sql.functions.lit(batchId))
      .write.partitionBy("batch")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(outDir)

  /** Start a stream-static as-of join landing batch-partitioned parquet
    * at `outDir`. `probe` must be a streaming DataFrame; `reference` a
    * batch (static) one. Key/time/tie/direction/tolerance semantics are
    * those of [[graft.plans.AsOf.joinMulti]]. */
  def asOfSink(probe: DataFrame, reference: DataFrame,
               keys: Seq[(String, String)],
               leftTime: String, rightTime: String, rightTie: String,
               direction: String = "backward",
               tolerance: Option[Long] = None,
               outDir: String = null, checkpointDir: String = null)
      : StreamingQuery =
    probe.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        landAsOf(
          graft.plans.AsOf.joinMulti(batch, reference, keys,
            leftTime, rightTime, rightTie, direction, tolerance,
            broadcastRight = true),
          batchId, outDir)
      }
      .start()
}
