package graft

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** A library serves concurrent callers on one SparkSession. This spec runs a
  * mixed batch of queries in parallel — including the ones that mutate
  * session state (temp views in q35/q50, function registration in q50) —
  * and pins every result to its sequential baseline. Catches races a
  * sequential bench never sees (view name collisions, registry clobbering,
  * conf mutation from loaders).
  */
class ConcurrencySpec extends SparkSpecBase {

  test("parallel query mix matches sequential results on a shared session") {
    val names = Seq("q02_top5_suppliers", "q35_sql_over_views",
      "q50_sql_text_functions", "q56_set_ops", "q21_text_stats",
      "q66_latest_event",
      // round-8 additions: q148 exercises the UUID-named IVF corpus
      // temp view under concurrency; the others are stateless gates
      "q148_cell_coverage_sample", "q141_temperature_sample",
      "q151_token_budget_mixture", "q152_phrase_search",
      // round-9 additions: the index-lifecycle queries mutate scratch
      // index state — invocation-unique since the round-9 fix
      // (IndexMaintenance.scratchIndexDir); a shared fixed path let a
      // concurrent build wipe another invocation's increments mid-probe
      "q128_incremental_neardup", "q129_ivf_index_probe",
      "q139_term_index_probe", "q149_ivfpq_index_probe",
      // label-lifecycle + head-index representatives (scratch label
      // dirs and head indexes under concurrent mutation)
      "q153_lifecycle_keep_list", "q155_containment_increment",
      // decremental representatives: concurrent forget lifecycles must
      // not cross-contaminate each other's scratch state
      "q158_forget_clusters", "q159_term_forget_probe",
      // round-9 late additions: q166 mutates a scratch IVF index; the
      // label-lifecycle consumers (q162/q164) share the per-corpus demo
      // label store and must serve identically while it's hot
      "q162_curation_funnel", "q164_quality_keep_list",
      "q165_weighted_mixture", "q166_lifecycle_semdedup",
      // round-9 final additions: q173 mutates a scratch winnow index;
      // q171's driver-loop collect must not cross-talk between callers
      "q170_winnow_neardup", "q171_bpe_merges", "q173_winnow_increment",
      // round-10 additions: q182 mutates a scratch hash store; q180
      // shares the per-corpus streaming-lineage cache (computeIfAbsent
      // must hand every concurrent caller ONE materialized lineage);
      // the rest are stateless calibration reads
      "q174_weighted_sample", "q176_source_overlap", "q177_dsir_weights",
      "q178_image_decode", "q180_stream_curated", "q182_hash_index_probe",
      // round-10 late additions: stateless perceptual/sketch reads whose
      // localCheckpointed corpora must not cross-talk between callers
      "q194_audio_pdup_pairs", "q195_kmv_distinct", "q196_video_pdup_pairs",
      // round-11 additions: the replay probes share the per-(corpus,
      // flush-variant) SLICE cache and their own lineage caches —
      // concurrent callers must get ONE slicing pass and ONE lineage
      // each (q201/q208/q215 exercise three different slice variants);
      // q211's ingest cache mutates a scratch postings store; q213 is a
      // stateless window/join read
      "q201_stream_sessions", "q208_stream_interval_join",
      "q210_stream_drift", "q211_stream_term_index",
      "q213_sorted_neighbourhood", "q215_stream_dedup")
    val qs = names.map(n => n -> SparkEntry.queries(n))
    val sequential = qs.map { case (n, fn) =>
      n -> fn(spark, sf).collect().map(_.toSeq).toSeq
    }.toMap

    val pool = Executors.newFixedThreadPool(names.size)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      // two interleaved wavefronts to stress view/registry re-registration
      (1 to 2).foreach { _ =>
        val parallel = Future.sequence(qs.map { case (n, fn) =>
          Future(n -> fn(spark, sf).collect().map(_.toSeq).toSeq)
        })
        Await.result(parallel, 5.minutes).foreach { case (n, rows) =>
          assert(rows == sequential(n), s"$n diverged under concurrency")
        }
      }
    } finally pool.shutdown()
  }

  // ------------------- single-writer index-ownership lease (round 12) --

  import java.util.concurrent.{CountDownLatch, CyclicBarrier}

  import org.apache.spark.sql.functions.col

  import graft.engine.{Dedup, IndexMaintenance, Sim, Tables, TermIndex}
  import graft.engine.IndexMaintenance.ConcurrentWriterException

  private def docs = Tables.documents(spark, sf)

  /** Hold `indexDir`'s lease on a daemon thread until `release` counts
    * down; `held` fires once the lease is actually acquired. */
  private def holdLease(indexDir: String, held: CountDownLatch,
      release: CountDownLatch): Thread = {
    val t = new Thread(() =>
      IndexMaintenance.withWriterLease(spark, indexDir, "spec-holder") {
        held.countDown(); release.await()
      })
    t.setDaemon(true); t.start(); t
  }

  test("writer lease: appends and compactions against a held index fail " +
      "cleanly; the index and its audit are untouched") {
    val indexDir = tmpDir("graft-lease-term") + "/index"
    TermIndex.buildTermIndex(docs.filter(col("doc_id") % 3 =!= 0), indexDir)
    val (held, release) = (new CountDownLatch(1), new CountDownLatch(1))
    val holder = holdLease(indexDir, held, release)
    held.await()
    try {
      assert(IndexMaintenance.writerLeaseHeld(spark, indexDir))
      // the loser errors CLEANLY — a ConcurrentWriterException naming the
      // holder, not interleaved increments detected post-hoc by the audit
      val e1 = intercept[ConcurrentWriterException] {
        TermIndex.appendTermIndex(docs.filter(col("doc_id") % 3 === 0),
          indexDir, increment = 1L)
      }
      assert(e1.getMessage.contains("spec-holder"))
      intercept[ConcurrentWriterException] {
        TermIndex.compactTermIndex(spark, indexDir)
      }
    } finally { release.countDown(); holder.join(30000) }
    // the loser wrote NOTHING: probe identical, no increment=1 partition
    assert(IndexMaintenance.maxIncrement(spark,
      s"$indexDir/postings") == 0L)
    assert(!IndexMaintenance.writerLeaseHeld(spark, indexDir),
      "lease must be released when the holder finishes")
    // with the lease free the same append goes through and audits clean
    TermIndex.appendTermIndex(docs.filter(col("doc_id") % 3 === 0),
      indexDir, increment = 1L)
    assert(TermIndex.auditTermIndex(spark, indexDir).count() == 0)
    assert(IndexMaintenance.maxIncrement(spark,
      s"$indexDir/postings") == 1L, "post-release append must land")
  }

  test("writer lease guards the IVF and MinHash index families too") {
    val e = Tables.embeddings(spark, sf)
    val ivfDir = tmpDir("graft-lease-ivf") + "/index"
    Sim.buildIvfIndex(e.filter(col("vec_id") % Sim.ANN_DELTA_MOD =!= 0),
      ivfDir, avoid = Sim.ANN_DELTA_MOD)
    // ONE canonical lease path per family — the index ROOT: a hold on
    // it must reject appends AND the recluster/compaction root swap
    // (r12's sub-path key let maintainIvfIndex rename the index out
    // from under a leased /vectors append undetected)
    val (h1, r1) = (new CountDownLatch(1), new CountDownLatch(1))
    val t1 = holdLease(ivfDir, h1, r1)
    h1.await()
    try {
      intercept[ConcurrentWriterException] {
        Sim.appendIvfIndex(e.filter(col("vec_id") % Sim.ANN_DELTA_MOD === 0),
          ivfDir, increment = 1L)
      }
      intercept[ConcurrentWriterException] {
        Sim.maintainIvfIndex(spark, ivfDir, thresholdPpm = -1L)
      }
      intercept[ConcurrentWriterException] {
        Sim.compactIvfIndex(spark, ivfDir)
      }
    } finally { r1.countDown(); t1.join(30000) }
    assert(Sim.auditIvfIndex(spark, ivfDir).count() == 0)

    val mhDir = tmpDir("graft-lease-mh") + "/index"
    Dedup.buildMinhashIndex(docs.filter(col("doc_id") % Dedup.DELTA_MOD
      =!= 0), mhDir)
    val (h2, r2) = (new CountDownLatch(1), new CountDownLatch(1))
    val t2 = holdLease(mhDir, h2, r2)
    h2.await()
    try intercept[ConcurrentWriterException] {
      Dedup.appendMinhashIndex(docs.filter(col("doc_id") % Dedup.DELTA_MOD
        === 0), mhDir, increment = 1L)
    } finally { r2.countDown(); t2.join(30000) }
  }

  test("writer lease: two racing appenders — at most one wins the race " +
      "window, the loser's exception is clean, the index audits empty") {
    val indexDir = tmpDir("graft-lease-race") + "/index"
    TermIndex.buildTermIndex(docs.filter(col("doc_id") % 3 === 1), indexDir)
    val barrier = new CyclicBarrier(2)
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[Either[
      Throwable, Long]]()
    val threads = Seq(1L, 2L).map { inc =>
      val t = new Thread(() => {
        barrier.await()
        try {
          // doc sets disjoint from the build (%3===1) and each other
          TermIndex.appendTermIndex(
            docs.filter(col("doc_id") % 3 === ((inc + 1) % 3)), indexDir,
            inc)
          outcomes.add(Right(inc))
        } catch { case e: Throwable => outcomes.add(Left(e)) }
      })
      t.start(); t
    }
    threads.foreach(_.join(120000))
    import scala.jdk.CollectionConverters._
    val (losers, winners) = outcomes.asScala.toSeq.partition(_.isLeft)
    assert(winners.nonEmpty, "at least one racing appender must land")
    // every loser failed through the CONTRACT, not through a torn write
    losers.foreach {
      case Left(e) => assert(e.isInstanceOf[ConcurrentWriterException],
        s"loser must fail cleanly, got $e")
      case _ => ()
    }
    // whoever won, the landed index is undamaged and lease-free
    assert(TermIndex.auditTermIndex(spark, indexDir).count() == 0)
    assert(!IndexMaintenance.writerLeaseHeld(spark, indexDir))
    winners.foreach {
      case Right(inc) =>
        assert(spark.read.parquet(s"$indexDir/postings")
          .filter(col("increment") === inc).count() > 0,
          s"winner increment=$inc must have landed its postings")
      case _ => ()
    }
  }

  test("writer lease: a stale lease from a crashed writer blocks appends " +
      "until the operator breaks it explicitly") {
    val indexDir = tmpDir("graft-lease-stale") + "/index"
    TermIndex.buildTermIndex(docs.filter(col("doc_id") % 3 =!= 0), indexDir)
    // simulate the crash: the lease file survives its writer
    val lease = IndexMaintenance.leasePath(indexDir)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(lease.toUri.getPath),
      "dead-writer pid=0".getBytes("UTF-8"))
    val e = intercept[ConcurrentWriterException] {
      TermIndex.appendTermIndex(docs.filter(col("doc_id") % 3 === 0),
        indexDir, increment = 1L)
    }
    assert(e.getMessage.contains("dead-writer"),
      "the rejection must NAME the stale holder so the operator can " +
        "verify it is dead before breaking the lease")
    assert(IndexMaintenance.breakWriterLease(spark, indexDir))
    TermIndex.appendTermIndex(docs.filter(col("doc_id") % 3 === 0),
      indexDir, increment = 1L)
    assert(TermIndex.auditTermIndex(spark, indexDir).count() == 0)
  }

  // --------------- lease liveness: heartbeat + stale takeover (round 13)

  /** Plant a lease file whose last heartbeat stamp is `ageMs` old —
    * the artifact a crashed writer leaves behind. */
  private def plantStaleLease(indexDir: String, ageMs: Long): Unit = {
    val lease = IndexMaintenance.leasePath(indexDir)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(lease.toUri.getPath),
      (s"dead-writer pid=0 nonce=spec " +
        s"epoch_ms=${System.currentTimeMillis() - ageMs}").getBytes("UTF-8"))
  }

  test("lease liveness: a dead owner's stale lease is taken over " +
      "automatically; ingest resumes without a human") {
    val indexDir = tmpDir("graft-lease-dead") + "/index"
    TermIndex.buildTermIndex(docs.filter(col("doc_id") % 3 =!= 0), indexDir)
    plantStaleLease(indexDir, ageMs = 60000L)
    // the stale lease still blocks a plain append (exclusion holds) ...
    intercept[ConcurrentWriterException] {
      TermIndex.appendTermIndex(docs.filter(col("doc_id") % 3 === 0),
        indexDir, increment = 1L)
    }
    // ... but the policy-driven takeover removes it and ingest heals
    assert(IndexMaintenance.takeOverStaleLease(spark, indexDir,
      maxAgeMs = 30000L), "a 60s-old stamp is past a 30s horizon: stale")
    TermIndex.appendTermIndex(docs.filter(col("doc_id") % 3 === 0),
      indexDir, increment = 1L)
    assert(TermIndex.auditTermIndex(spark, indexDir).count() == 0)
  }

  test("lease liveness: a LIVE owner is never taken over — the heartbeat " +
      "keeps its stamp fresher than any sane horizon") {
    val indexDir = tmpDir("graft-lease-live") + "/index"
    spark.conf.set("graft.lease.heartbeatMs", "200")
    try {
      val (held, release) = (new CountDownLatch(1), new CountDownLatch(1))
      val holder = holdLease(indexDir, held, release)
      held.await()
      try {
        // outlive several heartbeat cadences: if renewal were broken the
        // ACQUISITION stamp would now be older than the 700ms horizon
        Thread.sleep(1200)
        assert(!IndexMaintenance.takeOverStaleLease(spark, indexDir,
          maxAgeMs = 700L),
          "heartbeat must keep a live owner's stamp under the horizon")
        assert(IndexMaintenance.writerLeaseHeld(spark, indexDir))
      } finally { release.countDown(); holder.join(30000) }
      assert(!IndexMaintenance.writerLeaseHeld(spark, indexDir),
        "release must still work after heartbeat renewals")
    } finally spark.conf.unset("graft.lease.heartbeatMs")
  }

  test("lease liveness: two racing takeovers elect exactly one winner") {
    val indexDir = tmpDir("graft-lease-race-takeover") + "/index"
    new java.io.File(indexDir).getParentFile.mkdirs()
    plantStaleLease(indexDir, ageMs = 60000L)
    val barrier = new CyclicBarrier(2)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val ts = (1 to 2).map { _ =>
      val t = new Thread(() => {
        barrier.await()
        if (IndexMaintenance.takeOverStaleLease(spark, indexDir,
          maxAgeMs = 30000L)) wins.incrementAndGet()
      })
      t.start(); t
    }
    ts.foreach(_.join(30000))
    assert(wins.get() == 1,
      s"exactly one racing takeover must win the rename, got ${wins.get()}")
    assert(!IndexMaintenance.writerLeaseHeld(spark, indexDir))
  }
}
