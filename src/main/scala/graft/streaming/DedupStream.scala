package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming incremental near-dup — the steady state of a training-data
  * ingest pipeline as a STREAM: documents arrive continuously, and each
  * micro-batch is deduplicated against everything ever indexed (the
  * build-time corpus plus every earlier batch) without recomputing a
  * single corpus signature, then joins the index itself.
  *
  * Per micro-batch ([[graft.engine.Dedup.dedupIncrement]]):
  *  - the batch's MinHash band rows broadcast into the persisted band
  *    index — only matching band buckets are read (file-level band
  *    min/max pruning), the index is never shuffled or re-hashed;
  *  - within-batch pairs come from a broadcast banded self-join over the
  *    same persisted band rows;
  *  - verified pairs land append-only at `outDir`;
  *  - the batch's band rows are appended as index partition
  *    `increment=<batchId+1>` (the build is increment 0) via dynamic
  *    partition overwrite, so a RETRIED micro-batch replaces its own
  *    increment instead of duplicating it — the index is exactly-once.
  *
  * The pairs sink itself is at-least-once on retry (append parquet, the
  * same delivery contract as [[AsOfStream]]); pairs are globally unique
  * across batches in normal operation because a pair is emitted only by
  * the batch containing its LATER document. StreamingSpec pins the
  * accumulated stream output equal to the full-corpus batch recompute
  * restricted to pairs touching the streamed delta — cross-batch pairs
  * exist only if the per-batch index appends actually happened. */
object DedupStream {

  /** Start the incremental near-dup stream: probe + self-dedup each
    * micro-batch of `docs` (needs `doc_id`, `text`) against the band
    * index at `indexDir`, landing verified pairs at `outDir`.
    * `appendToIndex=false` degrades to probe-only against a frozen
    * index (no cross-batch pairs, no index growth). */
  def nearDupSink(docs: DataFrame, indexDir: String, outDir: String,
                  checkpointDir: String, appendToIndex: Boolean = true)
      : StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.engine.Dedup.dedupIncrement(batch, indexDir,
          increment = batchId + 1L, outDir = outDir,
          appendToIndex = appendToIndex)
      }
      .start()
}
