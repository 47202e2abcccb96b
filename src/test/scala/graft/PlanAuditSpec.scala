package graft

/** Full-surface executed-plan sweep (VERDICT r10 next-round #3): EVERY
  * registered query runs at smoke scale and its AQE-final executed plan
  * is audited for the anti-pattern classes PLANS.md bans — promoted from
  * the ad-hoc `graft.tools.PlanAudit` (born from the q194 seven-scan
  * find) into a regression gate over the whole registry.
  *
  * What is asserted, per query:
  *
  *  1. **No `CartesianProduct`, ever.** An unkeyed shuffle-join of two
  *     data-proportional sides has no 100 TB story; nothing on the
  *     surface needs one.
  *  2. **`BroadcastNestedLoopJoin` only within a per-query budget.** A
  *     BNLJ is correct exactly when one side is a BOUNDED broadcast —
  *     the 1-row scalar attach (`crossJoin(broadcast(agg))`) and the
  *     N×K dense assignment pass (IVF/PQ/k-means scoring, |langs|-row
  *     attaches) — and every such site is a deliberate, scaladoc'd
  *     design (PLANS.md "Known, accepted costs"). The budgets below are
  *     the measured counts of those intended sites; a NEW query that
  *     plans a BNLJ, or an existing one that grows extra nested-loop
  *     stages, fails the sweep.
  *  3. **Corpus scan counts stay bounded** — `documents` and
  *     `embeddings` each ≤ 2 scans per plan unless a measured budget
  *     documents why more channels are intended. The q194 class (an
  *     expensive decode corpus recomputed per CONSUMER: seven documents
  *     scans) cannot reappear silently. localCheckpoint truncation only
  *     ever HIDES scans, so these are true upper bounds on what a
  *     refactor may add to the visible plan.
  *  4. **Whole-stage codegen present in every plan** — at least one
  *     `*(n)` span; a query whose hot path fell out of codegen entirely
  *     (interpreted expressions end-to-end) fails.
  *
  * Budgets are measured at sf0.001 (plan SHAPE is scale-invariant for
  * these properties: BNLJ sites here are structural `crossJoin`s /
  * no-equi-key joins, not AQE size decisions, and scan counts come from
  * the query's dataflow, not row counts). Tightening a budget after a
  * plan improvement is encouraged; raising one requires the same
  * boundedness argument the existing sites carry.
  */
class PlanAuditSpec extends SparkSpecBase {

  /** Measured intended-BNLJ counts (regex hits on the FINAL-plan
    * section). All are bounded-broadcast sites: scalar attaches, N×K
    * assignment passes, probe-set / codebook / LUT broadcasts.
    * Unlisted queries: 0. */
  private val BNLJ_BUDGET: Map[String, Int] = Map(
    "q105_distribution_drift" -> 1,
    "q108_equidepth_global" -> 1,
    "q114_windowed_funnel" -> 2,
    "q117_chi_square" -> 1,
    "q119_ann_recall" -> 1,
    "q125_salted_skew_join" -> 1,
    "q126_asof_broadcast" -> 1,
    "q127_asof_multikey" -> 1,
    "q130_boilerplate_ngrams" -> 1,
    "q131_ivf_nprobe_recall" -> 3,
    "q132_heavy_gram_monitor" -> 1,
    "q136_ivfpq_topk" -> 1,
    "q137_hybrid_retrieval" -> 1,
    "q139_term_index_probe" -> 1,
    "q140_lsh_recall" -> 1,
    "q141_temperature_sample" -> 1,
    "q142_cluster_split" -> 1,
    "q144_embedding_drift" -> 2,
    "q147_curation_pipeline" -> 1,
    "q151_token_budget_mixture" -> 4,
    "q154_lifecycle_cluster_split" -> 1,
    "q156_lifecycle_curation" -> 1,
    "q159_term_forget_probe" -> 1,
    "q162_curation_funnel" -> 1,
    "q165_weighted_mixture" -> 4,
    "q167_source_token_cap" -> 1,
    "q168_stratified_eval" -> 3,
    "q176_source_overlap" -> 1,
    "q177_dsir_weights" -> 1,
    "q193_line_dedup" -> 1,
    "q199_hard_negatives" -> 1,
    "q206_kmv_source_overlap" -> 1,
    "q211_stream_term_index" -> 1, // live probe: q139's shape (scalar stats attach)
    "q220_v2_active_categories" -> 1, // week-anchor scalar attach
    "q20_embedding_topk" -> 1,
    "q37_ivf_cells" -> 1,
    "q42_topk_aggregator" -> 1,
    "q47_pq_topk" -> 1,
    "q49_tfidf_top_terms" -> 1,
    "q51_kmeans_step" -> 1,
    "q52_filtered_topk" -> 1,
    "q78_gap_fill" -> 1,
    "q81_retrieval_topk" -> 1,
    "q87_matryoshka_rerank" -> 1,
    "q88_binary_hamming" -> 1,
    "q91_pagerank_step" -> 1,
    "q97_triangle_count" -> 3,
    "q98_minmax_skipping" -> 4,
  )

  /** Measured embeddings-scan budgets for the multi-pass vector
    * operators (assignment + rerank + recall-baseline legs each scan
    * the corpus once by design — see the DedupSimSpec two-scan pin for
    * the ADC/rerank split). Unlisted queries: ≤ 2. */
  private val EMB_SCAN_BUDGET: Map[String, Int] = Map(
    "q47_pq_topk" -> 3,
    "q51_kmeans_step" -> 3,
  )


  /** Measured documents-scan budgets for the multi-channel text
    * operators (each CHANNEL — hash probe, n-gram probe, df table,
    * mixture leg — scans the corpus once by design; the q194 class was
    * the same corpus recomputed per CONSUMER, which these are not).
    * Unlisted queries: <= 2. */
  private val DOC_SCAN_BUDGET: Map[String, Int] = Map(
    // q253's three passes are the two-path split's own anatomy: the
    // measured host-cardinality dispatch (one narrow doc_id scan) plus
    // the cold and hot filter branches — each a one-column scan, never
    // the corpus recomputed per consumer (the q194 class)
    "q253_frontier_skew" -> 3,
    "q130_boilerplate_ngrams" -> 3,
    "q132_heavy_gram_monitor" -> 3,
    "q141_temperature_sample" -> 3,
    "q145_ngram_decontamination" -> 5,
    "q156_lifecycle_curation" -> 3,
    "q162_curation_funnel" -> 3,
    "q165_weighted_mixture" -> 3,
    "q177_dsir_weights" -> 3,
    "q191_domain_gate" -> 3,
    "q49_tfidf_top_terms" -> 3,
    "q67_decontamination" -> 4,
    "q81_retrieval_topk" -> 3,
  )

  test("full registry: no cartesian, BNLJ/scan budgets hold, codegen present") {
    val failures = scala.collection.mutable.Buffer[String]()
    // measured counts land beside the assertions so a budget refresh after
    // an intentional plan change is a file read, not a re-instrumentation
    val measured = scala.collection.mutable.Buffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sf)
        // execute THIS df's own QueryExecution (count() would build a
        // separate one and leave df's plan un-finalized: no AQE reuse,
        // no codegen stages — the sweep would audit the wrong plan)
        df.collect()
        // audit the FINAL plan only: after execution the AQE tree prints
        // "== Final Plan ==" followed by "== Initial Plan ==", and the
        // initial section double-counts every scan/join of the final one
        val plan = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        val cart = "CartesianProduct".r.findAllIn(plan).size
        val bnlj = "BroadcastNestedLoop".r.findAllIn(plan).size
        val scans = "FileScan parquet [^\\n]*".r.findAllIn(plan).toSeq
        val docs = scans.count(_.contains("documents"))
        val emb = scans.count(_.contains("embedding"))
        val cg = "\\*\\(\\d+\\)".r.findAllIn(plan).toSet.size
        measured += s"$name\t$bnlj\t$docs\t$emb\t$cg"
        if (cart > 0) failures += s"$name: $cart CartesianProduct"
        if (bnlj > BNLJ_BUDGET.getOrElse(name, 0))
          failures += s"$name: BNLJ $bnlj > budget ${BNLJ_BUDGET.getOrElse(name, 0)}"
        if (docs > DOC_SCAN_BUDGET.getOrElse(name, 2))
          failures += s"$name: $docs documents scans > budget " +
            s"${DOC_SCAN_BUDGET.getOrElse(name, 2)}"
        if (emb > EMB_SCAN_BUDGET.getOrElse(name, 2))
          failures += s"$name: $emb embeddings scans > budget " +
            s"${EMB_SCAN_BUDGET.getOrElse(name, 2)}"
        if (cg == 0) failures += s"$name: no whole-stage-codegen span"
      } catch {
        case e: Throwable => failures += s"$name: EXECUTION FAILED ${e.getMessage}"
      }
      // release per-query state so 200+ queries don't accumulate blocks
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/planaudit_measured.tsv"),
      measured.mkString("", "\n", "\n"))
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }
}
