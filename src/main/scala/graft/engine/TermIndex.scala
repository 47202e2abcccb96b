package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Persisted inverted-index lifecycle — the lexical twin of the MinHash
  * band index ([[Dedup.buildMinhashIndex]]) and the IVF cell index
  * ([[Sim.buildIvfIndex]]): build once, append each ingest as its own
  * idempotent increment, serve retrieval probes that touch only the
  * probe terms' postings, compact the increment pile off the ingest
  * path. Completes the index-lifecycle story across all three retrieval
  * modalities (near-dup, dense, lexical) — [[TextOps.hybridRetrieval]]'s
  * lexical half gets the same indexed drop-in its dense half already has.
  *
  * Layout: `indexDir/postings` holds one row per (term, doc_id) with the
  * term frequency and the document's token length, partitioned by
  * `increment` and term-sorted within files so parquet min/max stats
  * prune a probe's scan to files covering its terms; `indexDir/stats`
  * holds one row per increment with the corpus-level scoring constants
  * (doc count, total tokens) so a probe never aggregates the corpus.
  *
  * Scale shape: the probe reads ONLY postings whose term is in the probe
  * set — the filter is pushed into the parquet scan (spec-pinned via
  * PushedFilters) and the term-clustered layout turns it into file-level
  * pruning, so probe cost tracks the probed terms' document frequency,
  * never index size. Scoring constants come from the stats sidecar
  * (|increments| rows). The BM25-family scoring is [[TextOps
  * .retrievalTopK]]'s exactly — the oracle twin proves a lifecycle probe
  * (build + appended increment) bit-equals the one-pass corpus
  * retrieval, so a probe that misses an increment, or an append that
  * double-counts a document, hash-mismatches.
  */
object TermIndex {
  import Tables._

  /** Postings rows of a document batch: (term, doc_id, tf, len). The
    * groupBy shuffles on (term, doc_id) with map-side combine; len rides
    * along functionally determined by doc_id. */
  private def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TextFns.tokens(col("text")).as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("len"),
        explode(col("w")).as("term"))
      .groupBy("term", "doc_id", "len")
      .agg(count(lit(1)).as("tf"))

  /** Build-once half: persist `docs`' postings as increment 0. STATIC
    * overwrite — a rebuild must clear stale increments from a previous
    * lifecycle (same contract as [[Dedup.buildMinhashIndex]]). */
  def buildTermIndex(docs: DataFrame, indexDir: String): Unit =
    writeIncrement(docs, indexDir, increment = 0L)

  /** Append-an-increment half: `delta`'s postings land as partition
    * `increment=<n>` under DYNAMIC overwrite — a retried append REPLACES
    * its increment instead of duplicating it (exactly-once under
    * micro-batch retry, the [[Dedup.appendMinhashIndex]] device).
    *
    * PRECONDITION: increments must be doc-disjoint — a doc_id appears in
    * at most one increment. A retried batch satisfies this (it replaces
    * itself); an upstream RE-DELIVERY under a new batch id does not, and
    * nothing here can detect it (the increment write never reads the
    * others). Under violation, probe idf stays exact (df counts distinct
    * doc_ids — [[probeTermIndex]]) but the duplicate (tf, len) rows and
    * the stats sidecar's n_docs/total_tokens double-count the document. */
  def appendTermIndex(delta: DataFrame, indexDir: String,
      increment: Long): Unit =
    writeIncrement(delta, indexDir, increment)

  private def writeIncrement(docs: DataFrame, indexDir: String,
      increment: Long): Unit = IndexMaintenance.withWriterLease(
      docs.sparkSession, indexDir, s"term-index increment=$increment") {
    val mode = if (increment == 0L) "static" else "dynamic"
    postings(docs).withColumn("increment", lit(increment))
      .repartition(col("term"))
      .sortWithinPartitions(col("term"))
      .write.partitionBy("increment")
      .option("partitionOverwriteMode", mode)
      .mode("overwrite")
      .parquet(s"$indexDir/postings")
    // Scoring constants, derived from the increment's just-written
    // postings (a columnar (doc_id, tf) read — the text is never
    // re-tokenized): sum(tf) over a doc's postings IS its token count,
    // so total_tokens = sum(tf) and n_docs = distinct doc_id. One row
    // per increment; probes sum the sidecar instead of the corpus.
    docs.sparkSession.read.parquet(s"$indexDir/postings")
      .filter(col("increment") === increment)
      .agg(count_distinct(col("doc_id")).as("n_docs"),
        sum("tf").as("total_tokens"))
      .withColumn("increment", lit(increment))
      .coalesce(1)
      .write.partitionBy("increment")
      .option("partitionOverwriteMode", mode)
      .mode("overwrite")
      .parquet(s"$indexDir/stats")
  }

  /** Fold every increment back into `increment=0`, preserving the
    * term-clustered file layout — probe results bit-identical (postings
    * are a bag of (term, doc_id, tf, len) rows; only file layout
    * changes), stats sidecar re-summed to one row. Runs off the ingest
    * path through [[IndexMaintenance.rewrite]]'s staging swap. */
  def compactTermIndex(spark: SparkSession, indexDir: String): Unit =
    IndexMaintenance.rewrite(spark, indexDir) { staging =>
      spark.read.parquet(s"$indexDir/postings")
        .select(col("term"), col("doc_id"), col("tf"), col("len"))
        .withColumn("increment", lit(0L))
        .repartition(col("term"))
        .sortWithinPartitions(col("term"))
        .write.partitionBy("increment")
        .mode("overwrite")
        .parquet(s"$staging/postings")
      spark.read.parquet(s"$indexDir/stats")
        .agg(sum("n_docs").as("n_docs"),
          sum("total_tokens").as("total_tokens"))
        .withColumn("increment", lit(0L))
        .coalesce(1)
        .write.partitionBy("increment")
        .mode("overwrite")
        .parquet(s"$staging/stats")
    }

  /** Serve a retrieval probe from the persisted index: BM25-family
    * scoring ([[TextOps.retrievalTopK]]'s exact arithmetic — ratio idf,
    * (1 + len/avglen) length penalty, term contributions folded in
    * sorted term order so the double sum is partition-order-free) over
    * ONLY the probed terms' postings. df(term) counts DISTINCT doc_ids
    * among the term's fetched postings, so a document RE-DELIVERED in a
    * later increment (a violated doc-disjointness precondition — see
    * [[appendTermIndex]]) cannot skew idf; its duplicate (tf, len) rows
    * and the stats sidecar's n_docs/total_tokens still double-count —
    * residual skew only doc-disjoint increments fully remove. */
  def probeTermIndex(spark: SparkSession, terms: Seq[String],
      indexDir: String, k: Int): DataFrame =
    probeTermIndexObserved(spark, terms, indexDir, k)._1

  /** [[probeTermIndex]] with the serving metrics a production lexical
    * index reports per probe batch ([[Sim.probeIvfIndexObserved]]'s
    * discipline — metrics ride the probe job via `observe`, zero extra
    * jobs): `postings_rows` = postings actually fetched (the probe-cost
    * unit — everything outside the probed terms' lists is pruned from
    * the scan, spec-pinned via PushedFilters), `terms_hit` = distinct
    * probe terms with at least one posting (|terms| − terms_hit probed
    * terms were vacuous — the complement an operator alerts on). */
  def probeTermIndexObserved(spark: SparkSession, terms: Seq[String],
      indexDir: String, k: Int)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val post = spark.read.parquet(s"$indexDir/postings")
      .filter(col("term").isin(terms: _*))
    val corpus = spark.read.parquet(s"$indexDir/stats")
      .agg(sum("n_docs").cast("long").as("n_docs"),
        sum("total_tokens").cast("long").as("total_tokens"))
    val df = post.groupBy("term").agg(count_distinct(col("doc_id")).as("df"))
    val obs = new org.apache.spark.sql.Observation("term_probe")
    val contrib = post
      .join(broadcast(df), "term")
      .crossJoin(broadcast(corpus))
      .observe(obs, count(lit(1)).as("postings_rows"),
        size(collect_set(col("term"))).cast("long").as("terms_hit"))
      .select(col("doc_id"),
        struct(col("term"),
          (col("tf").cast("double") *
            (col("n_docs").cast("double") / col("df").cast("double")) /
            (lit(1.0) + col("len").cast("double") /
              (col("total_tokens").cast("double") / col("n_docs").cast("double"))))
            .as("c")).as("tc"))
    val ranked = contrib
      .groupBy("doc_id")
      .agg(array_sort(collect_list(col("tc"))).as("cs"))
      .select(col("doc_id"),
        aggregate(transform(col("cs"), s => s.getField("c")),
          lit(0.0), (acc, x) => acc + x).as("score"),
        size(col("cs")).cast("long").as("n_terms_hit"))
      // TakeOrderedAndProject; the rank window sees only the k survivors
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id").asc))
        .cast("long"))
      .select(col("rank"), col("doc_id"), col("n_terms_hit"),
        Num.round6(col("score")).as("score"))
      .orderBy("rank")
    (ranked, obs)
  }

  /** Deletion's reach into the lexical index ([[graft.engine
    * .CurationLoop.forget]]'s device for the third modality): drop the
    * ids' postings by rewriting only increments that contain them, and
    * RE-DERIVE the stats sidecar for exactly those increments — df is
    * deletion-proof already (count-distinct at probe time), but n_docs
    * and total_tokens are per-increment constants that would keep
    * counting the deleted docs' tokens in every later score. Emptied
    * increment partitions are deleted explicitly (both stores). Returns
    * postings rows removed. */
  def forgetDocs(spark: SparkSession, ids: DataFrame,
      indexDir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/postings")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p) ||
        IndexMaintenance.parquetFileCount(spark, p.toString) == 0L) return 0L
    val post = spark.read.parquet(s"$indexDir/postings")
    val idc = broadcast(ids.select(col("doc_id")))
    val touched = post.join(idc, Seq("doc_id"), "left_semi")
      .select(col("increment")).distinct().collect().map(_.get(0))
    if (touched.isEmpty) return 0L
    val part = post.filter(col("increment").isin(touched: _*))
      .localCheckpoint()
    val kept = part.join(idc, Seq("doc_id"), "left_anti").localCheckpoint()
    val removed = part.count() - kept.count()
    kept.repartition(col("term")).sortWithinPartitions(col("term"))
      .write.partitionBy("increment")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(s"$indexDir/postings")
    // stats re-derived from the REWRITTEN postings of the touched
    // increments only (the writeIncrement device)
    val stats = spark.read.parquet(s"$indexDir/postings")
      .filter(col("increment").isin(touched: _*))
      .groupBy("increment")
      .agg(count_distinct(col("doc_id")).as("n_docs"),
        sum("tf").as("total_tokens"))
      .select(col("n_docs"), col("total_tokens"), col("increment"))
      .coalesce(1)
      .localCheckpoint()
    stats.write.partitionBy("increment")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(s"$indexDir/stats")
    // drop emptied partitions in both stores
    val keptIncs = kept.select(col("increment")).distinct()
      .collect().map(_.get(0)).toSet
    touched.filterNot(keptIncs).foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(
        s"$indexDir/postings/increment=$v"), true)
      fs.delete(new org.apache.hadoop.fs.Path(
        s"$indexDir/stats/increment=$v"), true)
    }
    removed
  }

  /** Doc-disjointness AUDIT — the scheduled invariant check for
    * [[appendTermIndex]]'s documented precondition (a doc_id may appear
    * in at most one increment), which the append itself cannot enforce
    * (an increment write never reads the others) and which an upstream
    * RE-DELIVERY under a new batch id silently violates: probe idf
    * stays exact (count-distinct df), but the duplicate (tf, len) rows
    * and the stats sidecar's n_docs/total_tokens double-count the
    * document in every score. [[CurationLoop.auditLabels]]' discipline
    * applied to the postings store: the daily path never pays this; a
    * schedule runs it and pages on a nonempty result BEFORE the skew
    * reaches scoring. Output: one row per violating doc with the
    * increments it spans and its duplicated posting mass.
    *
    * Scale shape: one (doc_id, increment) columnar projection of the
    * postings, aggregated per doc with map-side combine — no text, no
    * probe path, no stats read. */
  def auditTermIndex(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(s"$indexDir/postings")
      .select(col("doc_id"), col("increment").cast("long"), col("tf"))
      .groupBy("doc_id")
      .agg(countDistinct("increment").as("n_increments"),
        array_sort(collect_set(col("increment"))).as("increments"),
        sum("tf").as("posting_mass"))
      .filter(col("n_increments") > 1)
      .orderBy("doc_id")

  /** Probe terms of the q139 lifecycle demonstration — distinct from
    * [[TextOps.PROBE_TERMS]] so the two queries exercise different
    * posting lists. */
  val TI_TERMS: Seq[String] = Seq("data", "query", "filter")

  /** q159: the lexical index's decremental path end-to-end — snapshot
    * the maintained index ([[maintainedTermIndex]]) into a private
    * mutable copy, [[forgetDocs]] every [[Dedup.FORGET_MOD]]-th
    * document, serve [[TI_TERMS]]. Seeding by snapshot is the
    * deployment shape: a forget mutates the maintained index (here a
    * copy, so the shared one stays read-only for concurrent probes) —
    * it never re-derives it from the corpus. The oracle scores a corpus
    * the deleted docs were never in — a purge that left postings behind
    * OR a stats sidecar still counting deleted tokens (n_docs,
    * total_tokens skew every score) hash-mismatches. */
  def termForgetProbe(spark: SparkSession, dir: String): DataFrame = {
    val indexDir = IndexMaintenance.scratchIndexDir(spark, "term-forget")
    IndexMaintenance.cloneDir(spark, maintainedTermIndex(spark, dir), indexDir)
    forgetDocs(spark,
      spread(documents(spark, dir))
        .filter(col("doc_id") % Dedup.FORGET_MOD === 0).select("doc_id"),
      indexDir)
    probeTermIndex(spark, TI_TERMS, indexDir, TextOps.RETRIEVAL_TOP_K)
  }

  /** The demo corpus's MAINTAINED inverted index: built once per
    * (JVM, corpus dir) — base build over docs with doc_id %
    * [[Dedup.DELTA_MOD]] != 0, the rest appended as increment 1 — and
    * shared by every consumer thereafter (q139 probes it; q159 clones
    * it before mutating). `computeIfAbsent` gives build-once semantics
    * under concurrent demands; consumers are read-only. Keyed on the
    * corpus dir, immutable for a session (the testdata contract). */
  private val maintainedTermIndexes =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def maintainedTermIndex(spark: SparkSession,
      dir: String): String =
    maintainedTermIndexes.computeIfAbsent(dir, _ => {
      val d = spread(documents(spark, dir))
      val indexDir = IndexMaintenance.scratchIndexDir(spark, "term-index")
      buildTermIndex(d.filter(col("doc_id") % Dedup.DELTA_MOD =!= 0), indexDir)
      appendTermIndex(d.filter(col("doc_id") % Dedup.DELTA_MOD === 0),
        indexDir, increment = 1L)
      indexDir
    })

  /** q139: the lexical index lifecycle end-to-end — build over docs with
    * doc_id % [[Dedup.DELTA_MOD]] != 0, append the rest as increment 1
    * (both once per session: [[maintainedTermIndex]]), serve
    * [[TI_TERMS]] from the persisted index. The oracle recomputes
    * the same scoring in one pass over the WHOLE corpus, so a probe that
    * misses the appended increment (stale df / n_docs) or double-counts
    * a retried append hash-mismatches. */
  def termIndexProbe(spark: SparkSession, dir: String): DataFrame =
    probeTermIndex(spark, TI_TERMS, maintainedTermIndex(spark, dir),
      TextOps.RETRIEVAL_TOP_K)
}
