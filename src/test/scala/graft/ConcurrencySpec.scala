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
}
