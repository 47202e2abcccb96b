package graft

import org.apache.spark.sql.functions._

import graft.engine.{Dedup, IndexMaintenance, Tables, TermIndex, TextOps}

/** Persisted inverted-index lifecycle invariants (q139): probes read only
  * the probed terms' postings, appends are idempotent, compaction is
  * invisible to probes. */
class TermIndexSpec extends SparkSpecBase {

  private def docs = Tables.documents(spark, sf)

  test("probe pushes the term filter into the postings scan; " +
      "lifecycle probe equals a fresh full-corpus build") {
    val indexDir = tmpDir("graft-term-ndx") + "/index"
    TermIndex.buildTermIndex(docs.filter(col("doc_id") % 3 =!= 0), indexDir)
    TermIndex.appendTermIndex(docs.filter(col("doc_id") % 3 === 0), indexDir,
      increment = 1L)
    val probe = TermIndex.probeTermIndex(spark, TermIndex.TI_TERMS, indexDir,
      TextOps.RETRIEVAL_TOP_K)
    val rows = probe.collect().map(_.toString).toSeq
    // the term filter must reach the parquet scan as a pushed filter —
    // with the term-sorted file layout that is what makes probe cost
    // track df(term), not index size
    probe.collect() // ensure executed plan is final
    val scanStr = probe.queryExecution.executedPlan.toString
    assert(scanStr.contains("PushedFilters") &&
      scanStr.contains("In(term"),
      s"probe must push the term filter into the postings scan")
    // lifecycle (build + append) ≡ one-shot build over the whole corpus
    val fullDir = tmpDir("graft-term-ndx-full") + "/index"
    TermIndex.buildTermIndex(docs, fullDir)
    val full = TermIndex.probeTermIndex(spark, TermIndex.TI_TERMS, fullDir,
      TextOps.RETRIEVAL_TOP_K).collect().map(_.toString).toSeq
    assert(rows == full, "append increment must be indistinguishable from " +
      "having built over the full corpus")
  }

  test("doc-disjointness audit: a clean lifecycle audits empty; a " +
      "re-delivered doc is flagged with exactly its increments") {
    val indexDir = tmpDir("graft-term-audit") + "/index"
    TermIndex.buildTermIndex(docs.filter(col("doc_id") % 3 =!= 0), indexDir)
    TermIndex.appendTermIndex(docs.filter(col("doc_id") % 3 === 0),
      indexDir, increment = 1L)
    assert(TermIndex.auditTermIndex(spark, indexDir).count() == 0,
      "disjoint increments must audit clean")
    // upstream re-delivery: two already-indexed docs arrive again under
    // a NEW batch id — the violation the append cannot detect
    val redelivered = docs.filter(col("doc_id").isin(3L, 6L))
    TermIndex.appendTermIndex(redelivered, indexDir, increment = 2L)
    val flagged = TermIndex.auditTermIndex(spark, indexDir).collect()
    assert(flagged.map(_.getLong(0)).toSeq == Seq(3L, 6L),
      s"audit must flag exactly the re-delivered docs: ${flagged.toSeq}")
    flagged.foreach { r =>
      assert(r.getAs[Long]("n_increments") == 2)
      val incs = r.getSeq[Long](2)
      assert(incs.contains(2L) && incs.length == 2,
        s"flag must name the spanning increments: $r")
    }
  }

  test("probe serving metrics ride the job and match the index geometry") {
    import graft.functions.TextFns
    val indexDir = tmpDir("graft-term-obs") + "/index"
    TermIndex.buildTermIndex(docs.filter(col("doc_id") % 3 =!= 0), indexDir)
    TermIndex.appendTermIndex(docs.filter(col("doc_id") % 3 === 0), indexDir,
      increment = 1L)
    // probe a present-terms + vacuous-term mix so both metric legs move
    val terms = TermIndex.TI_TERMS :+ "zqxjkvbn_no_such_term"
    val (q, obs) = TermIndex.probeTermIndexObserved(spark, terms, indexDir,
      TextOps.RETRIEVAL_TOP_K)
    assert(q.collect().nonEmpty)
    val m = obs.get
    // the exact geometry, recomputed independently of the index: one
    // postings row per (term, doc) pair with tf >= 1
    val expected = docs
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("term").agg(countDistinct("doc_id").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(m("postings_rows") == expected.values.sum,
      s"postings_rows ${m("postings_rows")} != ${expected.values.sum}")
    assert(m("terms_hit") == expected.size.toLong,
      s"terms_hit ${m("terms_hit")} != ${expected.size}")
    // the vacuous probe term is the pruned complement
    assert(expected.size == TermIndex.TI_TERMS.size,
      "the planted no-hit term must not appear in the corpus")
  }

  test("append is idempotent; rebuild clears stale increments; " +
      "stats sidecar tracks the corpus") {
    val indexDir = tmpDir("graft-term-ndx-idem") + "/index"
    val base = docs.filter(col("doc_id") % Dedup.DELTA_MOD =!= 0)
    val delta = docs.filter(col("doc_id") % Dedup.DELTA_MOD === 0)
    TermIndex.buildTermIndex(base, indexDir)
    TermIndex.appendTermIndex(delta, indexDir, increment = 1L)
    val once = spark.read.parquet(s"$indexDir/postings").count()
    TermIndex.appendTermIndex(delta, indexDir, increment = 1L)
    val twice = spark.read.parquet(s"$indexDir/postings").count()
    assert(once == twice, s"retried append duplicated postings: $once -> $twice")
    // the stats sidecar must account every doc exactly once
    val stats = spark.read.parquet(s"$indexDir/stats")
      .agg(sum("n_docs")).collect()(0).getLong(0)
    assert(stats == docs.count(), "stats sidecar must count build + delta docs")
    // rebuild (static overwrite) clears the increment pile
    TermIndex.buildTermIndex(base, indexDir)
    val incs = spark.read.parquet(s"$indexDir/postings")
      .select(col("increment").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq
    assert(incs == Seq(0L), s"rebuild must clear old increments: $incs")
    val statIncs = spark.read.parquet(s"$indexDir/stats")
      .select(col("increment").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq
    assert(statIncs == Seq(0L), s"rebuild must clear stale stats: $statIncs")
  }

  test("forgetDocs purges postings AND re-derives the stats sidecar: " +
      "probes equal an index the docs were never in") {
    val indexDir = tmpDir("graft-term-forget") + "/index"
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val delta = docs.filter(col("doc_id") % 3 === 0)
    TermIndex.buildTermIndex(base, indexDir)
    TermIndex.appendTermIndex(delta, indexDir, increment = 1L)
    // delete a slice of the delta
    val deadIds = delta.filter(col("doc_id") % 2 === 0).select("doc_id")
    val removed = TermIndex.forgetDocs(spark, deadIds, indexDir)
    assert(removed > 0)
    // gold standard: the purged index must score EXACTLY like one the
    // deleted docs were never appended to — this fails if the stats
    // sidecar still counts the deleted docs' tokens
    val cleanDir = tmpDir("graft-term-forget-clean") + "/index"
    TermIndex.buildTermIndex(base, cleanDir)
    TermIndex.appendTermIndex(delta.filter(col("doc_id") % 2 =!= 0),
      cleanDir, increment = 1L)
    val purged = TermIndex.probeTermIndex(spark, TermIndex.TI_TERMS,
      indexDir, TextOps.RETRIEVAL_TOP_K).collect().map(_.toString).toSeq
    val clean = TermIndex.probeTermIndex(spark, TermIndex.TI_TERMS,
      cleanDir, TextOps.RETRIEVAL_TOP_K).collect().map(_.toString).toSeq
    assert(purged == clean,
      "purged index must be indistinguishable from never-ingested")
    // replay: nothing left to remove
    assert(TermIndex.forgetDocs(spark, deadIds, indexDir) == 0L)
  }

  test("compaction folds increments; probes bit-identical, fewer files") {
    val indexDir = tmpDir("graft-term-ndx-compact") + "/index"
    TermIndex.buildTermIndex(docs.filter(col("doc_id") % 3 === 0), indexDir)
    TermIndex.appendTermIndex(docs.filter(col("doc_id") % 3 === 1), indexDir,
      increment = 1L)
    TermIndex.appendTermIndex(docs.filter(col("doc_id") % 3 === 2), indexDir,
      increment = 2L)
    def top(): Seq[String] = TermIndex.probeTermIndex(spark,
        TermIndex.TI_TERMS, indexDir, TextOps.RETRIEVAL_TOP_K)
      .collect().map(_.toString).toSeq
    val before = top()
    val rowsBefore = spark.read.parquet(s"$indexDir/postings").count()
    val filesBefore =
      IndexMaintenance.parquetFileCount(spark, s"$indexDir/postings")
    TermIndex.compactTermIndex(spark, indexDir)
    assert(top() == before, "probe results changed across compaction")
    assert(spark.read.parquet(s"$indexDir/postings").count() == rowsBefore,
      "compaction lost or duplicated postings")
    val filesAfter =
      IndexMaintenance.parquetFileCount(spark, s"$indexDir/postings")
    assert(filesAfter < filesBefore,
      s"compaction must shrink the file pile: $filesBefore -> $filesAfter")
    val incs = spark.read.parquet(s"$indexDir/postings")
      .select(col("increment").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq
    assert(incs == Seq(0L), s"increments must fold into the build: $incs")
    // the stats sidecar folds to one row with the same sums
    val s = spark.read.parquet(s"$indexDir/stats").collect()
    assert(s.length == 1, "compacted stats must be a single row")
  }

  test("streaming index ingest: probes after the stream equal a " +
      "full-corpus build; mid-stream compaction leaves probes identical") {
    import graft.streaming.TermIndexStream
    val indexDir = tmpDir("graft-term-stream") + "/index"
    val base = docs.filter(col("doc_id") % Dedup.DELTA_MOD =!= 0)
    val delta = docs.filter(col("doc_id") % Dedup.DELTA_MOD === 0)
    TermIndex.buildTermIndex(base, indexDir)
    val inDir = tmpDir("graft-term-stream-in")
    delta.select("doc_id", "text").repartition(3)
      .write.mode("overwrite").parquet(inDir)
    val schema = spark.read.parquet(inDir).schema
    val ckpt = tmpDir("graft-term-stream-ckpt")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    // compactEvery=1: the trigger must fire at least once mid-stream
    val q = TermIndexStream.indexSink(stream, indexDir, ckpt,
      compactEvery = 1)
    try q.processAllAvailable() finally q.stop()
    val streamed = TermIndex.probeTermIndex(spark, TermIndex.TI_TERMS,
      indexDir, TextOps.RETRIEVAL_TOP_K)
      .collect().map(_.toString).toSeq
    val fullDir = tmpDir("graft-term-stream-full") + "/index"
    TermIndex.buildTermIndex(docs, fullDir)
    val full = TermIndex.probeTermIndex(spark, TermIndex.TI_TERMS, fullDir,
      TextOps.RETRIEVAL_TOP_K).collect().map(_.toString).toSeq
    assert(streamed == full,
      "streamed increments must serve exactly the full-corpus retrieval")
    // the compaction policy actually folded: the pile is bounded, not
    // one increment per micro-batch
    val incs = IndexMaintenance.incrementCount(spark, s"$indexDir/postings")
    assert(incs <= 3, s"compaction trigger must bound the pile: $incs")
    // stats sidecar stayed in sync through ingest + compaction
    val statDocs = spark.read.parquet(s"$indexDir/stats")
      .agg(sum("n_docs")).collect()(0).getLong(0)
    assert(statDocs == docs.count(),
      "stats sidecar must count every doc exactly once after the stream")
  }
}
