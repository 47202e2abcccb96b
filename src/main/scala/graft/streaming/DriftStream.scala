package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.engine.Sim

/** Streaming embedding-distribution drift monitor — the stream form of
  * [[graft.engine.Sim.embeddingDrift]]: a live vector feed is assigned
  * per micro-batch against FROZEN baseline centroids (the monitor never
  * retrains them — retraining would hide exactly the shift being
  * measured), and each batch lands its per-cell histogram (occupancy +
  * fixed-point cosine mass) keyed by batch id.
  *
  * Shape per batch: one N×K broadcast assignment (K capped by
  * IVF_MAX_CELLS), one ≤K-row aggregate — no streaming state at all;
  * the histogram pile IS the monitor's time series, and summing it over
  * batches equals the batch histogram of everything streamed
  * (StreamingSpec pins both, plus replay idempotence).
  *
  * Delivery: exactly-once under micro-batch retry via the library-wide
  * device — `batch=<id>`-keyed partitions under dynamic partition
  * overwrite, so a replayed batch replaces its own histogram. */
object DriftStream {

  /** The landing half, exposed for retry simulation: the batch's ≤K-row
    * cell histogram lands as partition `batch=<batchId>`. */
  private[graft] def landDriftCells(batch: DataFrame, batchId: Long,
      cents: DataFrame, out: String): Unit =
    Sim.cellHistogram(Sim.assignTo(Sim.withNorm(batch), cents))
      .withColumn("batch", lit(batchId))
      .coalesce(1)
      .write.partitionBy("batch")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(out)

  /** Start the drift monitor over a vector stream (needs `vec_id`,
    * `embedding`); one histogram partition lands per micro-batch. */
  def driftSink(vecs: DataFrame, cents: DataFrame, out: String,
      checkpointDir: String): StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        landDriftCells(batch, batchId, cents, out)
      }
      .start()
}
