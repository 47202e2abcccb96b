package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.engine.{IndexMaintenance, TermIndex}

/** Streaming ingest for the persisted inverted index — the lexical twin
  * of [[DedupStream]] (MinHash band index) and the third index modality
  * to get the streaming lifecycle: each micro-batch of documents lands
  * as its own `increment=<batchId+1>` postings partition plus a stats
  * sidecar row, so retrieval probes ([[graft.engine.TermIndex
  * .probeTermIndex]]) serve the corpus-so-far between batches with the
  * BM25 constants always in sync with the postings.
  *
  * Delivery: exactly-once under micro-batch retry — both the postings
  * and the stats sidecar are batch-keyed partitions under dynamic
  * overwrite ([[TermIndex.appendTermIndex]]'s contract), so a replayed
  * batch replaces itself in BOTH (a stats row landing twice would skew
  * every score's n_docs/avg-length).
  *
  * `compactEvery > 0` arms the same trigger policy as the dedup
  * stream: once the increment pile exceeds the threshold,
  * [[TermIndex.compactTermIndex]] folds it into the build partition
  * through the staging swap before the next batch — probe results
  * bit-identical, file count bounded at (compactEvery + 1) increments'
  * worth regardless of stream length. foreachBatch is sequential, so
  * no probe in this stream races the swap; external probes see
  * old-or-new atomically. */
object TermIndexStream {

  /** Start the index ingest over a document stream (needs `doc_id`,
    * `text`). */
  def indexSink(docs: DataFrame, indexDir: String, checkpointDir: String,
      compactEvery: Int = 0): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        if (compactEvery > 0 && IndexMaintenance.incrementCount(spark,
            s"$indexDir/postings") > compactEvery + 1L)
          TermIndex.compactTermIndex(spark, indexDir)
        TermIndex.appendTermIndex(batch, indexDir, increment = batchId + 1L)
      }
      .start()
}
