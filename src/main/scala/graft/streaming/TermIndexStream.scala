package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.engine.{IndexMaintenance, TermIndex, TextOps}

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
    * `text`). `availableNow = true` runs it as a DRAIN: the production
    * restart pattern a SCHEDULED ingest uses — process exactly the
    * backlog that exists at start (micro-batched by the source's own
    * maxFilesPerTrigger sizing, so bounded batches, same exactly-once
    * landing), then stop on its own; the next scheduled run resumes
    * from the checkpoint and drains only what arrived since
    * (StreamingSpec pins both halves). */
  def indexSink(docs: DataFrame, indexDir: String, checkpointDir: String,
      compactEvery: Int = 0, availableNow: Boolean = false): StreamingQuery = {
    val w = docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        if (compactEvery > 0 && IndexMaintenance.incrementCount(spark,
            s"$indexDir/postings") > compactEvery + 1L)
          TermIndex.compactTermIndex(spark, indexDir)
        TermIndex.appendTermIndex(batch, indexDir, increment = batchId + 1L)
      }
    (if (availableNow)
      w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    else w).start()
  }

  /** Probe terms of the q211 streamed-ingest gate — distinct from
    * TI_TERMS/PROBE_TERMS so its posting lists differ from q139/q81's. */
  val ST_TERMS: Seq[String] = Seq("data", "spark")

  /** (index dir) of each materialized streamed term-index ingest. */
  private[graft] val probeState =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** q211: the term-index INGEST STREAM oracle-gated end-to-end — the
    * lexical analog of q197's gated band-index lineage. Build the base
    * index over the `doc_id % 4 == 0` slice, stream the other three
    * quarters through the REAL [[indexSink]] in pinned arrival order
    * (single-file micro-batches), with `compactEvery = 1` so a REAL
    * mid-stream compaction (staging swap, increments folded into the
    * build partition) also sits on the gated path. Serve [[ST_TERMS]]
    * from the resulting store.
    *
    * The oracle scores the WHOLE corpus in one pass and never mentions
    * increments, batches, or layout — so a lost append, a stats sidecar
    * row landing twice (n_docs/avg-len skew every score), or a
    * compaction that dropped/duplicated postings all hash-mismatch. */
  def streamTermIndexProbe(spark: SparkSession, dir: String): DataFrame = {
    val warm = EventsStream.prewarmSiblings(spark, dir, except = "ti")
    val idx = probeState.computeIfAbsent(dir, _ => runIngestLineage(spark, dir))
    EventsStream.joinPrewarm(spark, warm)
    TermIndex.probeTermIndex(spark, ST_TERMS, idx, TextOps.RETRIEVAL_TOP_K)
  }

  private def runIngestLineage(spark: SparkSession, dir: String): String = {
    import graft.engine.Tables
    import org.apache.hadoop.fs.Path
    val indexDir = IndexMaintenance.scratchIndexDir(spark, "stream-ti-index")
    val inDir = IndexMaintenance.scratchIndexDir(spark, "stream-ti-in")
    val ckpt = IndexMaintenance.scratchIndexDir(spark, "stream-ti-ckpt")
    // base-index build on the size-derived session too (r15 §1)
    val bs = EventsStream.buildSession(spark, s"$dir/documents.parquet")
    val docs = Tables.documents(bs, dir).select("doc_id", "text")
    TermIndex.buildTermIndex(docs.filter(col("doc_id") % 4 === 0), indexDir)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(inDir).getFileSystem(conf)
    fs.mkdirs(new Path(inDir))
    (1 to 3).foreach { s =>
      val tmp = IndexMaintenance.scratchIndexDir(spark, s"stream-ti-slice$s")
      docs.filter(col("doc_id") % 4 === s)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = fs.globStatus(new Path(s"$tmp/part-*.parquet"))(0).getPath
      val dst = new Path(s"$inDir/slice-$s.parquet")
      fs.rename(part, dst)
      fs.delete(new Path(tmp), true)
      fs.setTimes(dst, 1000000L + s * 60000L, -1L) // pinned arrival order
    }
    val schema = bs.read.parquet(inDir).schema
    val stream = bs.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    val q = indexSink(stream, indexDir, ckpt, compactEvery = 1)
    try q.processAllAvailable() finally q.stop()
    indexDir
  }
}
