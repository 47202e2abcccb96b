package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.engine.IndexMaintenance

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
  *  - verified pairs land at `outDir` under partition `batch=<batchId+1>`
  *    via dynamic partition overwrite;
  *  - the batch's band rows are appended as index partition
  *    `increment=<batchId+1>` (the build is increment 0) the same way.
  *
  * Delivery contract: BOTH sinks are exactly-once under micro-batch
  * retry — each is keyed by the batch id and dynamic partition overwrite
  * replaces rather than appends, so a replayed batch lands once no matter
  * how many times it runs (StreamingSpec simulates the retry and asserts
  * both sinks unchanged). Pairs are globally unique across batches
  * because a pair is emitted only by the batch containing its LATER
  * document. StreamingSpec pins the accumulated stream output equal to
  * the full-corpus batch recompute restricted to pairs touching the
  * streamed delta — cross-batch pairs exist only if the per-batch index
  * appends actually happened. */
object DedupStream {

  /** Start the incremental near-dup stream: probe + self-dedup each
    * micro-batch of `docs` (needs `doc_id`, `text`) against the band
    * index at `indexDir`, landing verified pairs at `outDir`.
    *
    * `appendToIndex=false` degrades to probe-only against a frozen
    * index (no cross-batch pairs, no index growth).
    *
    * `compactEvery > 0` arms the compaction trigger policy: once the
    * index holds more than `compactEvery` delta increments beyond the
    * build, [[graft.engine.Dedup.compactMinhashIndex]] folds them into
    * `increment=0` before the next batch — bounding the probe-side file
    * count at (compactEvery + 1) increments' worth regardless of stream
    * length. The check is one directory listing; the fold runs inside
    * foreachBatch, which is sequential, so no probe in THIS stream races
    * the staging swap (external readers see old-or-new atomically — the
    * [[IndexMaintenance.rewrite]] contract). Probe results are
    * bit-identical across the fold (spec-pinned mid-stream). If the
    * process dies between a compaction and the batch's checkpoint, the
    * replayed batch re-appends band rows that were already folded —
    * duplicate index rows, which cost storage until the next fold but
    * cannot change output: pair emission dedups on (doc_a, doc_b). */
  /** `labelDir` (optional, empty = off) keeps the GLOBAL cluster state
    * current as pairs stream: after each batch's pairs land, they merge
    * into the persisted labels via
    * [[graft.engine.Dedup.mergeClusterIncrement]] — cost bounded by the
    * batch's edges, never the corpus. Seed the labels from the build
    * corpus's internal pairs ([[graft.engine.Dedup.buildClusterLabels]]);
    * every corpus pair is then base-internal (seeded), cross-batch, or
    * within-batch (both streamed), so the label state after the stream
    * equals the full-corpus transitive closure (spec-pinned). A
    * replayed batch re-merges edges that are now internal — the merge's
    * documented no-op path, so label maintenance is idempotent too. */
  /** `headDir`/`contOutDir` (optional, both empty = off) arm the
    * CONTAINMENT channel in the same micro-batch: the batch probes the
    * persisted head-fingerprint index
    * ([[graft.engine.Dedup.containmentIncrement]]) and appends its own
    * head rows — so a truncation/prefix copy arriving in an increment
    * pairs with its source (a case the band channel's J ≈ 0.5 geometry
    * misses) through the same batch-keyed exactly-once sinks. */
  /** `winnowDir`/`winnowOutDir` (optional, both empty = off) arm the
    * WINNOW channel the same way
    * ([[graft.engine.Dedup.winnowIncrement]]): embedded-paragraph copies
    * — shared mid-document spans the band channel dilutes and the head
    * channel's first-tokens hash misses — pair with their sources in the
    * increment that delivers them, through identical batch-keyed
    * exactly-once sinks. */
  def nearDupSink(docs: DataFrame, indexDir: String, outDir: String,
                  checkpointDir: String, appendToIndex: Boolean = true,
                  compactEvery: Int = 0, labelDir: String = "",
                  headDir: String = "", contOutDir: String = "",
                  winnowDir: String = "", winnowOutDir: String = ""): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        if (compactEvery > 0 &&
            IndexMaintenance.incrementCount(spark, indexDir) > compactEvery + 1L)
          graft.engine.Dedup.compactMinhashIndex(spark, indexDir)
        graft.engine.Dedup.dedupIncrement(batch, indexDir,
          increment = batchId + 1L, outDir = outDir,
          appendToIndex = appendToIndex)
        if (headDir.nonEmpty && contOutDir.nonEmpty)
          graft.engine.Dedup.containmentIncrement(batch, headDir,
            increment = batchId + 1L, outDir = contOutDir,
            appendToIndex = appendToIndex)
        if (winnowDir.nonEmpty && winnowOutDir.nonEmpty)
          graft.engine.Dedup.winnowIncrement(batch, winnowDir,
            increment = batchId + 1L, outDir = winnowOutDir,
            appendToIndex = appendToIndex)
        if (labelDir.nonEmpty) {
          // the just-landed batch partition, file-pruned by the batch key
          import org.apache.spark.sql.functions.col
          graft.engine.Dedup.mergeClusterIncrement(spark, labelDir,
            spark.read.parquet(outDir)
              .filter(col("batch") === batchId + 1L)
              .select("doc_a", "doc_b"))
        }
      }
      .start()
}
