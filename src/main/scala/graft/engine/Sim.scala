package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{ScoredRow, TopKAgg, VecFns}

/** Similarity search over the `embeddings` table (`array<float>` vectors) —
  * LLM-pipeline surface (brief north star; beyond-reference).
  *
  * Two paths:
  *  - brute-force cosine top-k for a probe set: the correctness baseline.
  *    Work is O(probes × corpus); the probe side broadcasts, so the corpus
  *    never shuffles — at 100 TB this is one map pass per probe batch plus
  *    a per-probe top-k (TakeOrdered-style, k rows per partition).
  *  - sign-LSH bucketing: the scale path. One map-only pass assigns every
  *    vector to a 2^NPLANES-bucket index; probes then search only their
  *    bucket (recall traded for a 1/buckets cost factor; banded variant
  *    recovers recall like MinHash bands do).
  *
  * Scores are [[VecFns]] left-fold arithmetic → bit-identical to the DuckDB
  * oracle, displayed through [[Num.round6]].
  */
object Sim {
  import Tables._

  /** Probe set: a deterministic slice (vec_id < N_PROBES) standing in for
    * "the query batch". */
  val N_PROBES = 8
  val TOP_K = 5

  /** Shared tail of every cosine search: rank scored candidates per probe
    * (cos desc, vec_id tie-break), keep k, present through round6. Input
    * must carry (probe_id, vec_id, cos). */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("vec_id").as("neighbor_id"),
        Num.round6(col("cos")).as("cosine"))
      .orderBy("probe_id", "rank")
  }

  /** Brute-force cosine top-k per probe (the oracle-checkable ANN baseline).
    * Probes broadcast; ranks via row_number over a per-probe window with
    * vec_id tie-break. */
  def embeddingTopK(spark: SparkSession, dir: String): DataFrame = {
    // Norms are per-vector, not per-pair: precompute sqrt(|v|²) once on
    // each side so the scored join does a single dot fold per pair instead
    // of three. Bit-identical to cosine(): IEEE ops in the same order.
    val e = spread(embeddings(spark, dir))
      .select(col("vec_id"), col("embedding"),
        sqrt(VecFns.norm2(col("embedding"))).as("nrm"))
    val probes = e.filter(col("vec_id") < N_PROBES)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
        col("nrm").as("pnrm"))
    rankTopK(
      e.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"),
          (VecFns.dot(col("pv"), col("embedding")) / (col("pnrm") * col("nrm")))
            .as("cos")),
      TOP_K)
  }

  /** q199 band: a hard negative is a candidate whose cosine sits in
    * [[HN_LO]], [[HN_HI]]) — above the easy-negative floor (random pairs
    * teach nothing) but strictly below the near-dup ceiling (anything
    * higher risks being an unlabeled positive). The classic mining band
    * of contrastive embedding training (e.g. DPR/SimCSE-style hard
    * negatives). */
  val HN_LO = 0.15
  val HN_HI = 0.6

  /** q199: hard-negative mining — per probe, the top-k most-similar
    * candidates INSIDE the band: the highest-value negatives a
    * contrastive trainer can pair with the probe. Same scored join as
    * [[embeddingTopK]] (probes broadcast, one dot fold per pair, norms
    * precomputed per side) with the band predicate applied BEFORE the
    * rank window, so the per-probe sort sees only band survivors — at
    * deployment scale the band filter also gates what the ANN index
    * probe returns (an IVF cell list scan with the same predicate), so
    * the brute-force form here is the oracle-checkable baseline of the
    * same plan family as q20/q52. Cross-engine exact: cosines are
    * computed in the same IEEE order on both sides, so the band compare
    * against literal bounds agrees bit-for-bit. */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val e = spread(embeddings(spark, dir))
      .select(col("vec_id"), col("embedding"),
        sqrt(VecFns.norm2(col("embedding"))).as("nrm"))
    val probes = e.filter(col("vec_id") < N_PROBES)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
        col("nrm").as("pnrm"))
    rankTopK(
      e.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"),
          (VecFns.dot(col("pv"), col("embedding")) / (col("pnrm") * col("nrm")))
            .as("cos"))
        .filter(col("cos") >= HN_LO && col("cos") < HN_HI),
      TOP_K)
  }

  /** Same result as [[embeddingTopK]] through the typed [[TopKAgg]]
    * Aggregator instead of a window: per-group bounded buffers (≤ k rows
    * cross partition boundaries) replace the materialize-and-sort-all
    * window — the per-group TakeOrdered shape for probe batches whose
    * candidate lists don't fit a window sort at 100 TB. Verified by the
    * same oracle SQL as q20. */
  def embeddingTopKAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = spread(embeddings(spark, dir))
      .select(col("vec_id"), col("embedding"),
        sqrt(VecFns.norm2(col("embedding"))).as("nrm"))
    val probes = e.filter(col("vec_id") < N_PROBES)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
        col("nrm").as("pnrm"))
    val scored = e
      .join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        (VecFns.dot(col("pv"), col("embedding")) / (col("pnrm") * col("nrm")))
          .as("cos"))
      .as[ScoredRow]
    scored.groupByKey(_.probe_id)
      .agg(new TopKAgg(TOP_K).toColumn.name("topk"))
      .toDF("probe_id", "topk")
      .select(col("probe_id"),
        posexplode(arrays_zip(col("topk.ids"), col("topk.scores"))))
      .select(col("probe_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.ids").as("neighbor_id"),
        Num.round6(col("col.scores")).as("cosine"))
      .orderBy("probe_id", "rank")
  }

  /** IVF geometry: every IVF_STRIDE-th vector is a centroid (deterministic
    * stand-in for k-means training — the *index structure* is what's being
    * exercised; swapping in trained centroids changes no plumbing). */
  val IVF_STRIDE = 25
  val IVF_TOP_K = 3

  /** Cap on the centroid count. A fixed stride makes K grow linearly
    * with N, which turns every N×K assignment pass quadratic in the
    * corpus — caught at the ×100 scale point (sf10: 200k vectors → 8,000
    * cells → 1.6B scored pairs per pass). Past IVF_STRIDE·IVF_MAX_CELLS
    * vectors the stride grows with N instead, holding K at
    * [[IVF_MAX_CELLS]] — real IVF indexes likewise fix nlist (or grow it
    * ~√N), never linearly. 80 = the K at sf0.1, so every tested SF's
    * results are byte-identical to the uncapped form. */
  val IVF_MAX_CELLS = 80L

  /** Stride that keeps the centroid count ≤ [[IVF_MAX_CELLS]]. */
  private[graft] def centroidStride(n: Long): Long =
    math.max(IVF_STRIDE.toLong, (n + IVF_MAX_CELLS - 1) / IVF_MAX_CELLS)

  /** Corpus with precomputed norms — the shared input of every IVF /
    * k-means pass. */
  private def vecsWithNorm(spark: SparkSession, dir: String): DataFrame =
    spread(embeddings(spark, dir))
      .select(col("vec_id"), col("embedding"),
        sqrt(VecFns.norm2(col("embedding"))).as("nrm"))

  /** Initial centroids: the deterministic stride slice of the corpus,
    * stride widened past [[IVF_MAX_CELLS]]·[[IVF_STRIDE]] vectors so K
    * never scales with N. The corpus-size scalar stays IN-PLAN — an
    * uncorrelated scalar COUNT subquery feeding the stride expression
    * (the oracle computes the identical stride the same way) — so no IVF
    * query pays a driver-side count job before it starts. A scalar
    * subquery, not a crossJoin of a 1-row aggregate: the crossJoin form
    * multiplies the corpus stats into the centroid subtree's size
    * estimate, which tripped BroadcastGuard into dropping the broadcast
    * hint on the N×K assignment join. The subquery leaves the filter's
    * stats (and the broadcast of the centroids) untouched.
    *
    * `avoid` (r12): when the POPULATION was carved by an id-modulus
    * exclusion (`vec_id % M != 0` — the drift baseline's M = 9, the
    * lifecycle builds' M = ANN_DELTA_MOD), a stride modulus that happens
    * to be DIVISIBLE by M picks only excluded ids — an EMPTY centroid
    * set, measured at ×100 where the drift base's 177,777 rows yield
    * m = 2223 = 9·247 (PLANS.md r12). Passing the exclusion modulus
    * bumps such a stride by one (coprime again, same ≤K bound); the
    * oracle twins restate the identical CASE, and at every gated scale
    * where M ∤ m the adjustment is a no-op, so existing hashes are
    * untouched by construction. */
  private[graft] def strideCentroids(e: DataFrame,
      avoid: Long = 0L): DataFrame = {
    val view = "__graft_ivf_corpus_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    e.createOrReplaceTempView(view)
    val m0 = s"greatest(${IVF_STRIDE}L, ((select count(1) from $view)" +
      s" + ${IVF_MAX_CELLS - 1}L) div ${IVF_MAX_CELLS}L)"
    val m = if (avoid > 1L)
      s"(($m0) + (CASE WHEN ($m0) % ${avoid}L = 0 THEN 1L ELSE 0L END))"
    else s"($m0)"
    // Dataset construction analyzes eagerly, so the subquery is resolved
    // before the view is dropped below
    val cents = e.filter(expr(s"vec_id % $m = 0"))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv"),
        col("nrm").as("cnrm"))
    e.sparkSession.catalog.dropTempView(view)
    cents
  }

  /** Vector → nearest-centroid assignment. N×K work with the K centroids
    * broadcast (the join condition is literal-true by design — every
    * vector scores against every centroid; this is the intended N×K pass,
    * not an accidental cartesian: K is tiny and broadcast, so the N side
    * never shuffles).
    *
    * Argmax per vector via max_by, not a window: the groupBy's map-side
    * partial aggregation collapses the N×K scored rows to one row per
    * vector *before* the shuffle — a window would range-shuffle and sort
    * all N×K. Tie-break (max cos, then min cent_id) is encoded in the
    * ordering struct, so the result is fully deterministic. */
  private[graft] def assignTo(e: DataFrame, cents: DataFrame): DataFrame =
    e.join(broadcast(cents), lit(true))
      .select(col("vec_id"), col("cent_id"),
        (VecFns.dot(col("embedding"), col("cv")) / (col("nrm") * col("cnrm")))
          .as("cos"))
      .groupBy("vec_id")
      .agg(max_by(struct(col("cent_id"), col("cos")),
        struct(col("cos"), -col("cent_id"))).as("best"))
      .select(col("vec_id"), col("best.cent_id").as("cent_id"),
        col("best.cos").as("cos"))

  /** The IVF index build: assignment against the stride centroids. */
  private def ivfAssign(spark: SparkSession, dir: String): DataFrame = {
    val e = vecsWithNorm(spark, dir)
    assignTo(e, strideCentroids(e))
  }

  /** IVF cell occupancy — the coarse index a 100 TB ANN store partitions
    * by. Probes then search only their own cell(s). */
  def ivfCells(spark: SparkSession, dir: String): DataFrame =
    ivfAssign(spark, dir)
      .groupBy("cent_id")
      .agg(count(lit(1)).as("n_vectors"),
        min("vec_id").as("min_vec_id"), max("vec_id").as("max_vec_id"))
      .orderBy("cent_id")

  /** Cell-restricted ANN top-k: each probe searches only the vectors in its
    * own IVF cell (1-probe search; recall/latency knob = cells probed).
    *
    * The assignment feeds both the probe lookup and the candidate join —
    * localCheckpoint materializes the N×K scoring pass once (the
    * [[semanticDedup]] rule); without it the dominant pass runs twice. */
  def ivfTopK(spark: SparkSession, dir: String): DataFrame = {
    val a = ivfAssign(spark, dir).select(col("vec_id"), col("cent_id"))
      .localCheckpoint()
    val e = spread(embeddings(spark, dir))
      .select(col("vec_id"), col("embedding"),
        sqrt(VecFns.norm2(col("embedding"))).as("nrm"))
    val probes = a.filter(col("vec_id") < lit(4))
      .select(col("vec_id").as("probe_id"), col("cent_id").as("pcell"))
      .join(e.select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
        col("nrm").as("pnrm")), "probe_id")
    val cands = a.join(broadcast(probes),
        col("cent_id") === col("pcell") && col("vec_id") =!= col("probe_id"))
      .join(e, "vec_id")
    rankTopK(
      cands.select(col("probe_id"), col("vec_id"),
        (VecFns.dot(col("pv"), col("embedding")) / (col("pnrm") * col("nrm")))
          .as("cos")),
      IVF_TOP_K)
  }

  /** Recall@k evaluation of the IVF index against brute force — the eval
    * harness every ANN deployment runs before trusting an index: the
    * ground truth is the exact cosine top-[[IVF_TOP_K]] for the SAME
    * probes the IVF query serves, recall is |approx ∩ exact| per probe
    * summed, reported as an exact ppm fraction (integer arithmetic — a
    * float recall would be the one nondeterministic number in an
    * otherwise exact pipeline).
    *
    * Scale shape: the exact side is one broadcast-probe scan (ground
    * truth over a SAMPLE of probes — the standard practice; never all
    * probes); the intersection is a tiny semi join on (probe, neighbor).
    * A recall drop at constant geometry is how you catch index-build
    * drift in CI. */
  def annRecall(spark: SparkSession, dir: String): DataFrame = {
    val approx = ivfTopK(spark, dir)
      .select(col("probe_id"), col("neighbor_id")).localCheckpoint()
    val e = spread(embeddings(spark, dir))
      .select(col("vec_id"), col("embedding"),
        sqrt(VecFns.norm2(col("embedding"))).as("nrm"))
    val probes = e.filter(col("vec_id") < lit(4))
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
        col("nrm").as("pnrm"))
    val exact = rankTopK(
      e.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"),
          (VecFns.dot(col("pv"), col("embedding")) / (col("pnrm") * col("nrm")))
            .as("cos")),
      IVF_TOP_K)
      .select(col("probe_id"), col("neighbor_id")).localCheckpoint()
    val hits = approx.join(exact, Seq("probe_id", "neighbor_id"), "left_semi")
      .agg(count(lit(1)).as("n_hits"))
    exact.agg(countDistinct(col("probe_id")).as("n_probes"))
      .crossJoin(broadcast(hits))
      .select(col("n_probes"), lit(IVF_TOP_K.toLong).as("k"), col("n_hits"),
        expr(s"n_hits * 1000000L div (n_probes * ${IVF_TOP_K}L)")
          .as("recall_ppm"))
  }

  // ---- Persisted IVF index lifecycle (q129): the ANN twin of the
  // MinHash band index ([[Dedup.buildMinhashIndex]]). A production vector
  // store trains its coarse quantizer ONCE, then adds vectors and serves
  // probes against the frozen cells — never retraining per ingest. ----

  /** Delta split for the index lifecycle demo. Coprime to [[IVF_STRIDE]]
    * (unlike Dedup's mod-5 split): a mod-5 delta would swallow every
    * vec_id % 25 == 0 centroid candidate and leave the build corpus with
    * zero centroids. */
  val ANN_DELTA_MOD = 7L

  private[graft] def withNorm(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding"),
      sqrt(VecFns.norm2(col("embedding"))).as("nrm"))

  /** Live-feed modulus of [[embeddingDrift]] — coprime to [[IVF_STRIDE]]
    * for the same reason as [[ANN_DELTA_MOD]], and distinct from it so
    * the two demonstrations exercise different splits. */
  val DRIFT_MOD = 9L

  /** q144: embedding-distribution drift — the monitor a production vector
    * pipeline pages on: assign a live feed against the FROZEN baseline
    * centroids (never retrained by the monitor — retraining would hide
    * exactly the shift being measured) and compare per-cell occupancy
    * shares in exact ppm. A cell whose live share departs its baseline
    * share signals upstream distribution shift (new domain, encoder
    * regression, ingest bug) before any training run pays for it; the
    * per-cell fixed-point mean cosine-to-centroid separately flags cells
    * whose members are drifting away from their own centroid (cell
    * coherence decay) even when occupancy holds.
    *
    * Float discipline: the only doubles are the cosines; they collapse
    * to floor(·×10⁶) fixed-point integers BEFORE any aggregation, so
    * sums and means are exact under any partitioning. All shares are
    * integer ppm.
    *
    * Scale shape: two N×K broadcast assignment passes (the documented
    * IVF geometry, K capped), per-cell aggregates with map-side combine,
    * a full-outer join of two ≤K-row cell tables, totals as a broadcast
    * 1-row aggregate. The streaming form
    * ([[graft.streaming.DocsStream]]-style foreachBatch over
    * [[assignTo]] with these frozen centroids) lands one histogram per
    * micro-batch — bounded state, same arithmetic. */
  /** Per-cell occupancy + fixed-point cosine mass of an assignment —
    * the histogram unit shared by [[embeddingDrift]] and the streaming
    * monitor ([[graft.streaming.DriftStream]]): (cent_id, n, s_fp6). */
  private[graft] def cellHistogram(a: DataFrame): DataFrame =
    a.groupBy("cent_id")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("cos") * 1000000).cast("long")).as("s_fp6"))

  /** Frozen baseline centroids of the drift monitor — stride-picked from
    * the non-live population (the [[embeddingDrift]] split). */
  private[graft] def driftBaselineCentroids(spark: SparkSession,
      dir: String): DataFrame =
    strideCentroids(vecsWithNorm(spark, dir)
      .filter(col("vec_id") % DRIFT_MOD =!= 0), avoid = DRIFT_MOD)

  def embeddingDrift(spark: SparkSession, dir: String): DataFrame = {
    val e = vecsWithNorm(spark, dir)
    val base = e.filter(col("vec_id") % DRIFT_MOD =!= 0)
    val live = e.filter(col("vec_id") % DRIFT_MOD === 0)
    val cents = strideCentroids(base, avoid = DRIFT_MOD)
    def cells(a: DataFrame, suffix: String): DataFrame =
      cellHistogram(a).toDF("cent_id", s"n_$suffix", s"s_$suffix")
    val joined = cells(assignTo(base, cents), "base")
      .join(cells(assignTo(live, cents), "live"), Seq("cent_id"), "full_outer")
      .select(col("cent_id"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_live"), lit(0L)).as("n_live"),
        coalesce(col("s_base"), lit(0L)).as("s_base"),
        coalesce(col("s_live"), lit(0L)).as("s_live"))
    val totals = joined.agg(sum("n_base").as("t_base"),
      sum("n_live").as("t_live"))
    joined.crossJoin(broadcast(totals))
      .select(col("cent_id"), col("n_base"), col("n_live"),
        expr("n_base * 1000000L div t_base").as("base_ppm"),
        expr("n_live * 1000000L div t_live").as("live_ppm"),
        expr("(n_live * 1000000L div t_live) - (n_base * 1000000L div t_base)")
          .as("drift_ppm"),
        expr("CASE WHEN n_base = 0 THEN NULL ELSE s_base div n_base END")
          .as("mean_cos_fp6_base"),
        expr("CASE WHEN n_live = 0 THEN NULL ELSE s_live div n_live END")
          .as("mean_cos_fp6_live"))
      .orderBy("cent_id")
  }

  /** Nearest-cell assignment that KEEPS the vector payload: the argmax
    * aggregation carries (embedding, nrm) through `first` — functionally
    * dependent on the group key, so deterministic — instead of re-joining
    * the corpus on vec_id afterwards (which would add an N-row shuffle
    * join to every index write). */
  private def assignWithVec(e: DataFrame, cents: DataFrame,
      carry: Seq[String] = Nil): DataFrame =
    e.join(broadcast(cents), lit(true))
      .select(Seq(col("vec_id"), col("embedding"), col("nrm"), col("cent_id"),
        (VecFns.dot(col("embedding"), col("cv")) / (col("nrm") * col("cnrm")))
          .as("cos")) ++ carry.map(col): _*)
      .groupBy("vec_id")
      .agg(max_by(struct(col("cent_id"), col("cos")),
          struct(col("cos"), -col("cent_id"))).as("best"),
        Seq(first(col("embedding")).as("embedding"),
          first(col("nrm")).as("nrm")) ++
          carry.map(c => first(col(c)).as(c)): _*)
      .select(Seq(col("vec_id"), col("embedding"), col("nrm"),
        col("best.cent_id").as("cell")) ++ carry.map(col): _*)

  /** Build-once half: train (stride-pick) the centroids from the build
    * corpus, persist them at `indexDir/centroids`, and lay the assigned
    * vectors out at `indexDir/vectors` partitioned by (increment, cell) —
    * cell-partitioning is what lets a probe's scan skip every file
    * outside its own cells, increment-partitioning is what makes
    * [[appendIvfIndex]] idempotent per delta (same contract as the
    * MinHash index: build = static overwrite clears stale increments). */
  def buildIvfIndex(base: DataFrame, indexDir: String,
      avoid: Long = 0L): Unit = IndexMaintenance.withWriterLease(
      base.sparkSession, indexDir, "ivf-build") {
    val e = withNorm(base)
    strideCentroids(e, avoid).write.mode("overwrite")
      .parquet(s"$indexDir/centroids")
    writeIndexCells(e, indexDir, increment = 0L) // re-enters the root lease
  }

  /** Append-a-delta half: assign the delta against the PERSISTED (frozen)
    * centroids — no retrain, the real IVF add-vectors contract — and
    * write it as partition increment=<n> (dynamic overwrite: a retried
    * increment replaces itself). */
  def appendIvfIndex(delta: DataFrame, indexDir: String,
      increment: Long): Unit =
    writeIndexCells(withNorm(delta), indexDir, increment)

  /** Every IVF-family mutation leases the index ROOT (`indexDir`), not
    * `$indexDir/vectors`: [[maintainIvfIndex]]'s recluster swaps the
    * whole root, so a sub-path lease key would let a retrain rename the
    * index out from under an in-flight append undetected — one
    * canonical lease path per index family. */
  private def writeIndexCells(e: DataFrame, indexDir: String,
      increment: Long): Unit = IndexMaintenance.withWriterLease(
      e.sparkSession, indexDir,
      s"ivf-index increment=$increment") {
    val cents = e.sparkSession.read.parquet(s"$indexDir/centroids")
    assignWithVec(e, cents)
      .withColumn("increment", lit(increment))
      .write.partitionBy("increment", "cell")
      .option("partitionOverwriteMode",
        if (increment == 0L) "static" else "dynamic")
      .mode("overwrite")
      .parquet(s"$indexDir/vectors")
  }

  /** IVF twin of [[Dedup.compactMinhashIndex]]: fold the vector
    * increments into `increment=0`, keeping the `cell` partitioning that
    * probes prune on. No reassignment — the stored
    * (vec_id, embedding, nrm, cell) rows ARE the assignment against the
    * frozen centroids; compaction is pure layout maintenance (the
    * centroids file is one small parquet and is left untouched). */
  def compactIvfIndex(spark: SparkSession, indexDir: String): Unit =
    IndexMaintenance.rewrite(spark, s"$indexDir/vectors",
      leaseDir = indexDir) { staging =>
      spark.read.parquet(s"$indexDir/vectors")
        .select(col("vec_id"), col("embedding"), col("nrm"),
          lit(0L).as("increment"), col("cell"))
        .write.partitionBy("increment", "cell")
        .mode("overwrite").parquet(staging)
    }

  // -------------------------- persisted IVF-PQ index lifecycle (q149)

  /** [[pqCodebook]] trained on a GIVEN population (the build corpus) —
    * the form the persisted lifecycle freezes at build time. Entry ids
    * are DENSE ranks (row_number over the ≤[[PQ_K]] picked vectors), not
    * vec_id/stride: a build population missing some stride rows (they
    * arrived in a later delta) would otherwise leave holes that break
    * the positional ADC LUT. The rank window is over ≤K rows. */
  private def pqCodebookOf(base: DataFrame): DataFrame =
    subvectors(
      base.filter(col("vec_id") % PQ_STRIDE === 0 &&
          col("vec_id") < PQ_K * PQ_STRIDE)
        .select(col("vec_id"), col("embedding"))
        .withColumn("j", (row_number().over(
          Window.orderBy("vec_id")) - 1).cast("int"))
        .select(col("j"), col("embedding")),
      "j", "cv")

  /** PQ scored stream against an explicit (frozen) codebook —
    * (vec_id, m, j, dp), map-only; [[pqBests]] collapses it. */
  private def pqScoredAgainst(e: DataFrame, cb: DataFrame): DataFrame =
    subvectors(e, "vec_id", "sv")
      .join(broadcast(cb), "m")
      .select(col("vec_id"), col("m"), col("j"),
        VecFns.dot(col("sv"), col("cv")).as("dp"))

  /** Build-once half of the compressed-index lifecycle: coarse centroids
    * AND the PQ codebook train on the build corpus and freeze; every
    * vector lands cell-partitioned carrying its M-byte code next to the
    * full-precision floats (codes drive the ADC scan; the floats serve
    * the exact rerank — the hot/cold split a 100 TB store makes
    * physical, one table here). */
  def buildIvfPqIndex(base: DataFrame, indexDir: String,
      avoid: Long = 0L): Unit = IndexMaintenance.withWriterLease(
      base.sparkSession, indexDir, "ivfpq-build") {
    val e = withNorm(base)
    // The two frozen training artifacts are independent of each other
    // (centroids read only `e`, the codebook only `base`) and both must
    // exist before the cell write reads them back — overlap the two
    // small write jobs (guide §2.6) instead of paying their driver
    // latencies back-to-back; failures stay loud via join.
    val failures =
      new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val writes = Seq[(String, () => Unit)](
      "centroids" -> (() => strideCentroids(e, avoid).write.mode("overwrite")
        .parquet(s"$indexDir/centroids")),
      "codebook" -> (() => pqCodebookOf(
          base.select(col("vec_id"), col("embedding")))
        .write.mode("overwrite").parquet(s"$indexDir/codebook"))
    ).map { case (tag, w) =>
      val t = new Thread(() =>
        try w() catch { case e: Throwable => failures.add(e) },
        s"ivfpq-build-$tag")
      t.setDaemon(true)
      t.start()
      t
    }
    writes.foreach(_.join())
    if (!failures.isEmpty) throw failures.peek()
    writePqCells(e, indexDir, increment = 0L) // re-enters the root lease
  }

  /** Append-a-delta half: encode against the PERSISTED (frozen) centroids
    * and codebook — the real add-vectors contract; a retried increment
    * replaces itself (dynamic overwrite). */
  def appendIvfPqIndex(delta: DataFrame, indexDir: String,
      increment: Long): Unit =
    writePqCells(withNorm(delta), indexDir, increment)

  private def writePqCells(e: DataFrame, indexDir: String,
      increment: Long): Unit = IndexMaintenance.withWriterLease(
      e.sparkSession, indexDir, s"ivfpq-index increment=$increment") {
    val spark = e.sparkSession
    val cents = spark.read.parquet(s"$indexDir/centroids")
    val cb = spark.read.parquet(s"$indexDir/codebook")
    val codes = pqBests(
        pqScoredAgainst(e.select(col("vec_id"), col("embedding")), cb))
      .select(col("vec_id"), pqCodeOf(col("bests")).as("code"))
    assignWithVec(e, cents)
      .join(codes, "vec_id")
      .withColumn("increment", lit(increment))
      .write.partitionBy("increment", "cell")
      .option("partitionOverwriteMode",
        if (increment == 0L) "static" else "dynamic")
      .mode("overwrite")
      .parquet(s"$indexDir/vectors")
  }

  /** [[compactIvfIndex]]'s twin for the compressed index: fold the
    * increments into `increment=0`, codes and cell partitioning intact,
    * centroids/codebook untouched — pure layout maintenance. */
  def compactIvfPqIndex(spark: SparkSession, indexDir: String): Unit =
    IndexMaintenance.rewrite(spark, s"$indexDir/vectors",
      leaseDir = indexDir) { staging =>
      spark.read.parquet(s"$indexDir/vectors")
        .select(col("vec_id"), col("embedding"), col("nrm"), col("code"),
          lit(0L).as("increment"), col("cell"))
        .write.partitionBy("increment", "cell")
        .mode("overwrite").parquet(staging)
    }

  /** Deletion's reach into the vector store ([[graft.engine
    * .CurationLoop.forget]]'s device for the dense modality, serving
    * both the plain IVF and the IVF-PQ layout — the row schema rides
    * along untouched): drop the ids' vectors by rewriting only the
    * increments that contain them, cell partitioning preserved, frozen
    * centroids/codebook untouched (deletion must not retrain — the
    * monitor/probe contracts depend on frozen artifacts). Emptied
    * (increment, cell) leaf partitions are deleted explicitly (a
    * dynamic overwrite writes nothing for them). Returns vectors
    * removed. */
  def forgetVectors(spark: SparkSession, ids: DataFrame,
      indexDir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/vectors")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p) ||
        IndexMaintenance.parquetFileCount(spark, p.toString) == 0L) return 0L
    // deletion is a mutation like any other: same canonical ROOT lease
    // as build/append/compact/recluster (one family, one lease path)
    IndexMaintenance.withWriterLease(spark, indexDir, "ivf-forget") {
    val vecs = spark.read.parquet(s"$indexDir/vectors")
    val idc = broadcast(ids.select(col("vec_id")))
    val touched = vecs.join(idc, Seq("vec_id"), "left_semi")
      .select(col("increment")).distinct().collect().map(_.get(0))
    if (touched.isEmpty) return 0L
    val part = vecs.filter(col("increment").isin(touched: _*))
      .localCheckpoint()
    val kept = part.join(idc, Seq("vec_id"), "left_anti").localCheckpoint()
    val removed = part.count() - kept.count()
    kept.write.partitionBy("increment", "cell")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(s"$indexDir/vectors")
    val before = part.select(col("increment"), col("cell")).distinct()
      .collect().map(r => (r.get(0), r.get(1)))
    val after = kept.select(col("increment"), col("cell")).distinct()
      .collect().map(r => (r.get(0), r.get(1))).toSet
    before.filterNot(after).foreach { case (i, c) =>
      fs.delete(new org.apache.hadoop.fs.Path(
        s"$indexDir/vectors/increment=$i/cell=$c"), true)
    }
    removed
    }
  }

  /** Uniqueness AUDIT for a persisted vector store
    * ([[TermIndex.auditTermIndex]]'s twin): the ingest invariant is one
    * row per vec_id TOTAL — a re-delivered vector under a new batch id
    * lands a second (increment, cell) row the appends cannot detect,
    * after which probes may return the id twice and cell-occupancy
    * drift/compaction counts skew. One (vec_id, increment, cell)
    * columnar projection (never the embedding payload), aggregated per
    * id with map-side combine; the daily path never pays this — a
    * schedule pages on a nonempty result. */
  def auditIvfIndex(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(s"$indexDir/vectors")
      .select(col("vec_id"), col("increment").cast("long"),
        col("cell").cast("long"))
      .groupBy("vec_id")
      .agg(count(lit(1)).as("n_rows"),
        array_sort(collect_set(col("increment"))).as("increments"),
        array_sort(collect_set(col("cell"))).as("cells"))
      .filter(col("n_rows") > 1)
      .orderBy("vec_id")

  /** Serve probes from the persisted compressed index: top-nprobe cells
    * via the AQE-safe sorted-slice aggregate (DPP prunes every other
    * cell's files), ADC over the pruned cells' CODES ([[PQ_M]] lookups
    * per candidate into the probe's broadcast LUT), exact rerank of the
    * top-[[IVFPQ_RERANK]] shortlist. The floats discipline is
    * [[ivfpqTopK]]'s exactly: the ADC stage reads ONLY
    * (vec_id, cell, code) — the candidate stream and its per-probe
    * ranking exchange carry no `embedding`/`nrm` (candidates per probe ≈
    * nprobe × cellsize grows linearly with the corpus; shuffling floats
    * for them is the cost PQ codes exist to avoid — DedupSimSpec pins
    * the pre-shortlist scan schema) — and full-precision vectors are
    * fetched from `$indexDir/vectors` only for the broadcast
    * top-RERANK shortlist, |probes|·RERANK rows against one corpus
    * join. Output matches [[ivfpqTopK]]'s
    * (probe_id, rank, neighbor_id, adc_dot, cosine). */
  def probeIvfPqIndex(probes: DataFrame, indexDir: String,
      k: Int = IVF_TOP_K, nprobe: Int = IVFPQ_NPROBE): DataFrame =
    ivfPqProbePlan(probes, indexDir, k, nprobe, obs = None)

  /** [[probeIvfPqIndex]] with the serving metrics the compressed tier
    * reports per probe batch ([[probeIvfIndexObserved]]'s discipline —
    * metrics ride the probe job via `observe`, zero extra jobs):
    * `adc_candidates` = code rows entering the ADC scan (the probe-cost
    * unit: ≈ nprobe × cellsize per probe — the linear-in-corpus count
    * whose floats the PQ codes exist to avoid moving) and `cells_probed`
    * = distinct cells actually touched (every other cell's files are
    * DPP-pruned from the scan). */
  def probeIvfPqIndexObserved(probes: DataFrame, indexDir: String,
      k: Int = IVF_TOP_K, nprobe: Int = IVFPQ_NPROBE)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = new org.apache.spark.sql.Observation("ivfpq_probe")
    (ivfPqProbePlan(probes, indexDir, k, nprobe, Some(obs)), obs)
  }

  private def ivfPqProbePlan(probes: DataFrame, indexDir: String,
      k: Int, nprobe: Int,
      obs: Option[org.apache.spark.sql.Observation]): DataFrame = {
    val spark = probes.sparkSession
    val cents = spark.read.parquet(s"$indexDir/centroids")
    val cb = spark.read.parquet(s"$indexDir/codebook")
    val pn = probes.select(col("probe_id"), col("embedding").as("pv"),
      sqrt(VecFns.norm2(col("embedding"))).as("pnrm"))
    val pcells = pn.join(broadcast(cents), lit(true))
      .select(col("probe_id"), col("cent_id"),
        (VecFns.dot(col("pv"), col("cv")) / (col("pnrm") * col("cnrm")))
          .as("cos"))
      .groupBy("probe_id")
      .agg(slice(array_sort(collect_list(struct(-col("cos"), col("cent_id")))),
        1, nprobe).as("cells"))
      .select(col("probe_id"), explode(col("cells.cent_id")).as("pcell"))
    val lut = subvectors(pn.select(col("probe_id"), col("pv").as("embedding")),
        "probe_id", "sv")
      .join(broadcast(cb), "m")
      .select(col("probe_id"), col("m"), col("j"),
        VecFns.dot(col("sv"), col("cv")).as("dp"))
      .groupBy("probe_id")
      .agg(array_sort(collect_list(struct(col("m"), col("j"), col("dp"))))
        .as("ls"))
      .select(col("probe_id"), transform(col("ls"), s => s.getField("dp"))
        .as("lut"))
    val candidates = spark.read.parquet(s"$indexDir/vectors")
      .select(col("vec_id"), col("cell"), col("code"))
      .join(broadcast(pcells),
        col("cell") === col("pcell") && col("vec_id") =!= col("probe_id"))
    val measured = obs.fold(candidates)(o => candidates.observe(o,
      count(lit(1)).as("adc_candidates"),
      size(collect_set(col("pcell"))).cast("long").as("cells_probed")))
    val adc = measured
      .join(broadcast(lut), "probe_id")
      .select(col("probe_id"), col("vec_id"),
        // entries-per-subspace derives from the LUT length (≤ PQ_K when
        // the frozen codebook is smaller than the full K), so the
        // positional lookup stays aligned with the dense codebook ids
        aggregate(sequence(lit(0), lit(PQ_M - 1)), lit(0.0),
          (acc, m) => acc + element_at(col("lut"),
            (m * (size(col("lut")) / lit(PQ_M)).cast("int") +
              element_at(col("code"), m + 1) + 1).cast("int")))
          .as("adc"))
    val wa = Window.partitionBy("probe_id")
      .orderBy(col("adc").desc, col("vec_id").asc)
    val wr = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    val shortlist = adc
      .withColumn("arank", row_number().over(wa).cast("long"))
      .filter(col("arank") <= IVFPQ_RERANK)
      .select(col("probe_id"), col("vec_id"), col("adc"))
    // floats enter here and only here: the stored vectors join the
    // broadcast shortlist (|probes|·RERANK rows) — never the ADC stream
    spark.read.parquet(s"$indexDir/vectors")
      .select(col("vec_id"), col("embedding"), col("nrm"))
      .join(broadcast(shortlist), "vec_id")
      .join(broadcast(pn), "probe_id")
      .select(col("probe_id"), col("vec_id"), col("adc"),
        (VecFns.dot(col("pv"), col("embedding")) / (col("pnrm") * col("nrm")))
          .as("cos"))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("vec_id").as("neighbor_id"),
        Num.round6(col("adc")).as("adc_dot"), Num.round6(col("cos")).as("cosine"))
      .orderBy("probe_id", "rank")
  }

  /** q149: the compressed-index lifecycle end-to-end — build (centroids +
    * codebook freeze) over 6/7 of the corpus, append the held-out 1/7
    * encoded against the frozen artifacts, serve. The oracle recomputes
    * the whole geometry with centroids/codebook drawn from the BUILD
    * population only — an append that retrained either, or a probe that
    * missed the increment's cells, hash-mismatches. */
  def ivfpqIndexProbe(spark: SparkSession, dir: String): DataFrame = {
    val e = spread(embeddings(spark, dir))
    val indexDir = IndexMaintenance.scratchIndexDir(spark, "ivfpq-index")
    buildIvfPqIndex(e.filter(col("vec_id") % ANN_DELTA_MOD =!= 0), indexDir,
      avoid = ANN_DELTA_MOD)
    appendIvfPqIndex(e.filter(col("vec_id") % ANN_DELTA_MOD === 0), indexDir,
      increment = 1L)
    probeIvfPqIndex(
      e.filter(col("vec_id") < PQ_PROBES)
        .select(col("vec_id").as("probe_id"), col("embedding")),
      indexDir)
  }

  /** Per-cell sample depth of [[cellCoverageSample]]. */
  val COV_K = 3

  /** q148: cluster-stratified coverage sample — distribution-preserving
    * subsampling: take [[COV_K]] documents from EVERY IVF cell by a
    * deterministic hash order, so the sample spans the embedding space's
    * structure instead of mirroring its density (a uniform sample of a
    * 90%-web corpus is 90% web; a per-cell sample keeps the tail
    * regions represented — the SemDeDup-adjacent curation move, and the
    * eval-set construction a training run wants). Deterministic: the
    * same corpus yields the same sample under any partitioning.
    *
    * Scale shape: the N×K assignment is the documented IVF geometry;
    * the per-cell top-k is a rank-limited window —
    * `WindowGroupLimit` prunes to k rows per cell map-side before the
    * sort (the grouped-top-k plan pinned since round 3) — and cell
    * sizes ride the same aggregate. Never a global sort. */
  def cellCoverageSample(spark: SparkSession, dir: String): DataFrame = {
    val a = ivfAssign(spark, dir).select(col("vec_id"), col("cent_id"))
      .localCheckpoint() // feeds both the sample window and the size agg
    val sizes = a.groupBy("cent_id").agg(count(lit(1)).as("n_in_cell"))
    a.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("cent_id")
          .orderBy(
            (graft.functions.TextFns.polyHash(
              concat(lit("cov:"), col("vec_id").cast("string"))) % 1000000)
              .asc, col("vec_id").asc)).cast("long"))
      .filter(col("rank") <= COV_K)
      .join(broadcast(sizes), "cent_id")
      .select(col("cent_id"), col("rank"), col("vec_id"), col("n_in_cell"))
      .orderBy("cent_id", "rank")
  }

  /** Drift-triggered recluster — the maintenance policy that closes the
    * IVF lifecycle: appends assign against FROZEN centroids (correct for
    * serving, and [[embeddingDrift]]'s monitor depends on it), but a
    * feed whose distribution has genuinely moved packs its vectors into
    * a few cells and probe cost decays toward a scan of those cells.
    * This policy measures per-cell occupancy drift of the appended
    * increments against the build partition (the q144 exact-ppm
    * arithmetic, computed from the index's own partitions — no corpus
    * read) and, only above `thresholdPpm`, retrains centroids over the
    * full indexed set and reassigns — through the
    * [[IndexMaintenance.rewrite]] staging swap on the whole index dir,
    * so racing probes see old-or-new atomically (centroids and vectors
    * can never mix generations). Below threshold it is a no-op: zero
    * writes, one bounded aggregate.
    *
    * The threshold decision is one driver-side scalar (the
    * control-flow-action discipline of [[Graph.pageRankRun]]'s node
    * count): a ≤2K-row cell table reduced to max |drift|. Returns
    * whether a recluster ran.
    *
    * Replay safety: the recluster folds every increment EXCEPT the
    * newest into `increment=0` — the newest increment's vectors are
    * reassigned against the new centroids like everything else but stay
    * in their own partition. The newest increment is the only one a
    * streaming ingest ([[graft.streaming.VecIndexStream]]) can replay
    * after a crash between this maintenance and its checkpoint commit;
    * because it is never folded, the replayed append's dynamic
    * partition overwrite REPLACES it (with bit-identical rows — the
    * replay assigns against the same now-persisted centroids) instead
    * of landing a second copy beside a folded one. */
  def maintainIvfIndex(spark: SparkSession, indexDir: String,
      thresholdPpm: Long): Boolean = {
    val vecs = spark.read.parquet(s"$indexDir/vectors")
    def occ(df: DataFrame, n: String): DataFrame =
      df.groupBy("cell").agg(count(lit(1)).as(n))
    val j = occ(vecs.filter(col("increment") === 0L), "n_base")
      .join(occ(vecs.filter(col("increment") =!= 0L), "n_live"),
        Seq("cell"), "full_outer")
      .select(coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_live"), lit(0L)).as("n_live"))
    val maxDrift = j
      .crossJoin(broadcast(j.agg(sum("n_base").as("tb"),
        sum("n_live").as("tl"))))
      .select(when(col("tl") === 0L, lit(0L)).otherwise(
        abs(expr("(n_live * 1000000L div tl) - (n_base * 1000000L div tb)")))
        .as("d"))
      .agg(max("d")).collect()(0).getLong(0)
    if (maxDrift <= thresholdPpm) false
    else {
      // one directory listing (no data read) — the partition a replayed
      // append may rewrite, excluded from the fold below
      val newestInc =
        IndexMaintenance.maxIncrement(spark, s"$indexDir/vectors")
      IndexMaintenance.rewrite(spark, indexDir) { staging =>
        val all = spark.read.parquet(s"$indexDir/vectors")
          .select(col("vec_id"), col("embedding"), col("nrm"),
            col("increment").cast("long").as("inc"))
        strideCentroids(
          all.select(col("vec_id"), col("embedding"), col("nrm")))
          .write.mode("overwrite").parquet(s"$staging/centroids")
        assignWithVec(all, spark.read.parquet(s"$staging/centroids"),
          carry = Seq("inc"))
          .withColumn("increment",
            when(col("inc") === newestInc, lit(newestInc)).otherwise(lit(0L)))
          .drop("inc")
          .write.partitionBy("increment", "cell")
          .mode("overwrite").parquet(s"$staging/vectors")
      }
      true
    }
  }

  /** Serve a probe batch against the persisted index: score each probe
    * vector against the frozen centroids (|probes|×K, all broadcast-side),
    * keep its top-`nprobe` cells, then search ONLY those cells — the
    * broadcast join on the `cell` partition column lets dynamic partition
    * pruning drop every other cell's files from the index scan (DedupSimSpec
    * pins the dynamicpruning subquery), so probe cost scales with
    * nprobe × cell size, not index size.
    *
    * `nprobe` is the standard IVF recall/latency knob: a true neighbor
    * sitting just across a cell boundary is invisible at nprobe=1 and found
    * once its cell enters the probe set — [[ivfNprobeRecall]] measures the
    * recall curve on this exact code path. nprobe=1 ranks the same
    * (cos desc, cent_id asc) order the previous argmax encoded, so the
    * default stays bit-identical. Each index vector lives in exactly one
    * cell, so multi-cell candidate sets are disjoint — no dedup step.
    * `probes` needs (probe_id, embedding). */
  /** Probe→cell assignment of [[probeIvfIndex]]: top-nprobe cells via an
    * aggregate (sorted top-n slice of the ≤K scored cells), not a window
    * — the aggregate keeps the build side in the plan shape AQE's DPP
    * broadcast-reuse matches (a window here made AQE drop the pruning
    * filter to `true` — the probe would scan the whole index).
    * (-cos, cent_id) struct sort ≡ (cos desc, cent_id asc), the argmax's
    * exact order, so nprobe=1 stays bit-identical. */
  private def probeAssignments(probes: DataFrame, cents: DataFrame,
      nprobe: Int): DataFrame =
    probes.select(col("probe_id"), col("embedding").as("pv"),
        sqrt(VecFns.norm2(col("embedding"))).as("pnrm"))
      .join(broadcast(cents), lit(true))
      .select(col("probe_id"), col("pv"), col("pnrm"), col("cent_id"),
        (VecFns.dot(col("pv"), col("cv")) / (col("pnrm") * col("cnrm")))
          .as("cos"))
      .groupBy("probe_id")
      .agg(slice(array_sort(collect_list(struct(-col("cos"), col("cent_id")))),
          1, nprobe).as("cells"),
        first(col("pv")).as("pv"), first(col("pnrm")).as("pnrm"))
      .select(col("probe_id"), col("pv"), col("pnrm"),
        explode(col("cells.cent_id")).as("pcell"))

  private def probeSearch(assigned: DataFrame, indexDir: String,
      k: Int): DataFrame = {
    val idx = assigned.sparkSession.read.parquet(s"$indexDir/vectors")
    rankTopK(
      idx.join(broadcast(assigned),
          col("cell") === col("pcell") && col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"),
          (VecFns.dot(col("pv"), col("embedding")) / (col("pnrm") * col("nrm")))
            .as("cos")),
      k)
  }

  def probeIvfIndex(probes: DataFrame, indexDir: String,
      k: Int = IVF_TOP_K, nprobe: Int = 1): DataFrame = {
    val cents = probes.sparkSession.read.parquet(s"$indexDir/centroids")
    probeSearch(probeAssignments(probes, cents, nprobe), indexDir, k)
  }

  /** [[probeIvfIndex]] with the serving metrics a production index
    * reports per probe batch: the returned Observation yields
    * `assignment_rows` (probe→cell pairs entering the index join —
    * |probes| × nprobe, the hot-loop size item 8 of the round-7 review
    * asked to surface) and `cells_probed` (distinct cells actually
    * touched; every cell NOT in this set is pruned from the scan — the
    * file-level complement is spec-pinned via the scan's DPP metrics).
    * Metrics ride the probe job itself via `observe` — zero extra jobs,
    * the [[kmeansRun]] discipline; `collect_set` over the bounded
    * assignment set is exact, not approximate. */
  def probeIvfIndexObserved(probes: DataFrame, indexDir: String,
      k: Int = IVF_TOP_K, nprobe: Int = 1)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val cents = probes.sparkSession.read.parquet(s"$indexDir/centroids")
    val obs = new org.apache.spark.sql.Observation("ivf_probe")
    val assigned = probeAssignments(probes, cents, nprobe)
      .observe(obs,
        count(lit(1)).as("assignment_rows"),
        size(collect_set(col("pcell"))).cast("long").as("cells_probed"))
    (probeSearch(assigned, indexDir, k), obs)
  }

  /** q129: the ANN index lifecycle end-to-end — build over 6/7 of the
    * embeddings, append the held-out 1/7 as a delta (frozen centroids),
    * probe. The oracle recomputes the same geometry in one pass: stride
    * centroids over the BUILD corpus count, every vector (build + delta)
    * assigned against them, probes searching their own cell — so a probe
    * that misses the appended increment, or an append that retrains the
    * centroids, hash-mismatches. */
  def ivfIndexProbe(spark: SparkSession, dir: String): DataFrame = {
    val e = spread(embeddings(spark, dir))
    val indexDir = IndexMaintenance.scratchIndexDir(spark, "ivf-index")
    buildIvfIndex(e.filter(col("vec_id") % ANN_DELTA_MOD =!= 0), indexDir,
      avoid = ANN_DELTA_MOD)
    appendIvfIndex(e.filter(col("vec_id") % ANN_DELTA_MOD === 0), indexDir,
      increment = 1L)
    probeIvfIndex(
      e.filter(col("vec_id") < 4)
        .select(col("vec_id").as("probe_id"), col("embedding")),
      indexDir)
  }

  /** nprobe values [[ivfNprobeRecall]] measures — the knee of the IVF
    * recall curve is between these at any corpus size (cells ≈
    * [[IVF_MAX_CELLS]] regardless of N). */
  val NPROBES_MEASURED: Seq[Int] = Seq(1, 2, 4)

  /** q131: recall@k as a function of nprobe on the SAME persisted index —
    * the measurement that justifies [[probeIvfIndex]]'s nprobe knob: a true
    * neighbor just across a cell boundary is invisible at nprobe=1 and
    * recovered once its cell enters the probe set, so recall must be
    * non-decreasing in nprobe (and strictly rising somewhere, or the knob
    * is dead weight — DedupSimSpec asserts both against this output).
    *
    * One index build, one brute-force ground truth, and ONE DPP-pruned
    * index pass at max(nprobe): every candidate keeps the rank (`crn`) of
    * the cell it came from, so the nprobe=n probe is exactly the
    * candidates with crn ≤ n — each smaller setting is a filter over the
    * materialized superset, not another index scan (the per-candidate
    * scores are identical, so the per-np top-k is bit-identical to an
    * independent [[probeIvfIndex]] run at that nprobe). Scale shape: the
    * ground truth is the documented eval-harness cost over a probe
    * SAMPLE ([[annRecall]]); the one index pass touches
    * max(nprobe)/K of the index's files. */
  def ivfNprobeRecall(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(spread(embeddings(spark, dir))).localCheckpoint()
    val indexDir = IndexMaintenance.scratchIndexDir(spark, "ivf-nprobe")
    buildIvfIndex(e.select(col("vec_id"), col("embedding")), indexDir)
    val pn = e.filter(col("vec_id") < N_PROBES)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
        col("nrm").as("pnrm"))
    val exact = rankTopK(
      e.join(broadcast(pn), col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"),
          (VecFns.dot(col("pv"), col("embedding")) / (col("pnrm") * col("nrm")))
            .as("cos")),
      IVF_TOP_K)
      .select(col("probe_id"), col("neighbor_id")).localCheckpoint()
    val denom = exact.agg(countDistinct(col("probe_id")).as("n_probes"))
    val maxNp = NPROBES_MEASURED.max
    val cents = spark.read.parquet(s"$indexDir/centroids")
    // top-maxNp cells per probe with their rank — the same aggregate
    // shape as probeIvfIndex's assignment (AQE keeps DPP), rank via
    // posexplode of the sorted slice
    val assigned = pn.join(broadcast(cents), lit(true))
      .select(col("probe_id"), col("pv"), col("pnrm"), col("cent_id"),
        (VecFns.dot(col("pv"), col("cv")) / (col("pnrm") * col("cnrm")))
          .as("cos"))
      .groupBy("probe_id")
      .agg(slice(array_sort(collect_list(struct(-col("cos"), col("cent_id")))),
          1, maxNp).as("cells"),
        first(col("pv")).as("pv"), first(col("pnrm")).as("pnrm"))
      .select(col("probe_id"), col("pv"), col("pnrm"),
        posexplode(col("cells.cent_id")))
      .select(col("probe_id"), col("pv"), col("pnrm"),
        (col("pos") + 1).as("crn"), col("col").as("pcell"))
    val idx = spark.read.parquet(s"$indexDir/vectors")
    val cands = idx.join(broadcast(assigned),
        col("cell") === col("pcell") && col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("crn"), col("vec_id"),
        (VecFns.dot(col("pv"), col("embedding")) / (col("pnrm") * col("nrm")))
          .as("cos"))
      .localCheckpoint()
    NPROBES_MEASURED.map { np =>
      val hits = rankTopK(
          cands.filter(col("crn") <= np)
            .select(col("probe_id"), col("vec_id"), col("cos")),
          IVF_TOP_K)
        .select(col("probe_id"), col("neighbor_id"))
        .join(exact, Seq("probe_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
      denom.crossJoin(broadcast(hits))
        .select(lit(np.toLong).as("nprobe"), col("n_probes"),
          lit(IVF_TOP_K.toLong).as("k"), col("n_hits"),
          expr(s"n_hits * 1000000L div (n_probes * ${IVF_TOP_K}L)")
            .as("recall_ppm"))
    }.reduce(_ unionAll _).orderBy("nprobe")
  }

  /** One distributed Lloyd (k-means) update step over the IVF assignment:
    * per-(centroid, dimension) mean of the member vectors — the iterative
    * half of index training ([[ivfAssign]] is the other half; alternating
    * the two is k-means).
    *
    * Scale shape: assignment is the N×K broadcast pass; the update is one
    * shuffle on (cent_id, dim) with map-side partial sums — the canonical
    * distributed k-means shape, volume K×D rows after the combiner.
    *
    * Determinism: float components are scaled to fixed-point longs
    * (floor(x·2^20)) before summing — integer sums are order-free, so the
    * result is bit-identical regardless of partitioning, and one final
    * division yields the mean (same trick as [[Num]]'s integer-cents money;
    * a float sum() would be partition-order-dependent and unverifiable). */
  val KMEANS_SCALE = 1L << 20

  /** One Lloyd update from an assignment: per-(centroid, dimension)
    * fixed-point mean of the member vectors (unordered output; callers
    * order or rebuild arrays). */
  private def lloydUpdate(e: DataFrame, assign: DataFrame): DataFrame =
    e.join(assign.select(col("vec_id"), col("cent_id")), "vec_id")
      .select(col("cent_id"), posexplode(col("embedding")))
      .select(col("cent_id"), col("pos").cast("long").as("dim"),
        floor(col("col").cast("double") * KMEANS_SCALE).cast("long").as("scaled"))
      .groupBy("cent_id", "dim")
      .agg(count(lit(1)).as("n_members"), sum("scaled").as("ssum"))
      .select(col("cent_id"), col("dim"), col("n_members"),
        (col("ssum").cast("double") /
          (col("n_members") * KMEANS_SCALE).cast("double")).as("new_coord"))

  /** Mean table → centroid vectors for the next assignment round: coords
    * reassembled into arrays in dimension order and narrowed to float —
    * the storage type of the corpus (and of every production vector
    * index), and what keeps the next round's dot products inside the
    * codegen'd float-array [[VecFns.dot]]. The double→float narrowing is
    * round-to-nearest in both engines, so iterated centroids stay
    * bit-identical cross-engine. */
  private def toCentroidArrays(upd: DataFrame): DataFrame =
    upd
      .select(col("cent_id"), col("dim"),
        col("new_coord").cast("float").as("coord"))
      .groupBy("cent_id")
      .agg(array_sort(collect_list(struct(col("dim"), col("coord")))).as("z"))
      .select(col("cent_id"),
        transform(col("z"), x => x.getField("coord")).as("cv"))
      .withColumn("cnrm", sqrt(VecFns.norm2(col("cv"))))

  def kmeansStep(spark: SparkSession, dir: String): DataFrame = {
    val e = vecsWithNorm(spark, dir)
    lloydUpdate(e, assignTo(e, strideCentroids(e)))
      .orderBy("cent_id", "dim")
  }

  /** Lloyd rounds to run in [[kmeansIterated]] (assignment + update each;
    * the first assignment is against the stride centroids). */
  val KMEANS_ITERS = 3

  /** Internal k-means driver: runs `iters` Lloyd rounds, localCheckpointing
    * each round's K×D centroid table so the lineage stays flat (the
    * [[graft.engine.Dedup.connectedComponents]] loop discipline — an
    * unmaterialized loop would re-run every prior N×K assignment pass each
    * round). Returns the final round's raw update table plus the per-round
    * mean-cosine trace for convergence monitoring (K×D scalar aggregates —
    * convergence checks, not data collects).
    *
    * Monotonicity: assignment maximizes each vector's cosine given the
    * centroids; the mean update maximizes the summed cosine given the
    * assignment (cosine is scale-invariant, so the unnormalized mean and
    * the spherical-k-means normalized mean induce identical cosines) —
    * textbook alternating maximization, so mean assigned cosine is
    * non-decreasing round over round (up to the 2^-20 fixed-point floor and
    * the float narrowing, both ≪ any real movement). */
  private[graft] def kmeansRun(
      spark: SparkSession, dir: String, iters: Int): (DataFrame, Seq[Double]) = {
    val e = vecsWithNorm(spark, dir).localCheckpoint()
    var cents = strideCentroids(e)
    var lastUpd: DataFrame = null
    val trace = Seq.newBuilder[Double]
    // objective trace rides the checkpoint jobs via observe() — zero
    // extra jobs; the blocking get() calls are deferred past the loop so
    // rounds never await the async listener bus (see Graph.pageRankRun)
    val observations = (1 to iters).map { i =>
      val obs = new org.apache.spark.sql.Observation(s"km_cos_$i")
      val assign = assignTo(e, cents)
        .observe(obs, avg(col("cos")).as("mean_cos")).localCheckpoint()
      lastUpd = lloydUpdate(e, assign)
      cents = toCentroidArrays(lastUpd).localCheckpoint()
      obs
    }
    observations.foreach(o => trace += o.get("mean_cos").asInstanceOf[Double])
    (lastUpd.orderBy("cent_id", "dim"), trace.result())
  }

  /** [[KMEANS_ITERS]] full Lloyd rounds (assign → mean-update, centroids
    * fed back each round): the trained-index twin of the single-step
    * [[kmeansStep]]. Output is the final round's update table — with
    * iters = 1 this IS kmeansStep, which pins the loop plumbing to an
    * already-proven base case.
    *
    * Scale shape per round: one broadcast N×K scoring pass (map-side
    * argmax collapse) + one (cent, dim) shuffle of fixed-point partial
    * sums — K×D rows after the combiner. Rounds are sequential by nature;
    * the per-round localCheckpoint keeps each round's cost O(one round),
    * not O(history). */
  def kmeansIterated(spark: SparkSession, dir: String): DataFrame =
    kmeansRun(spark, dir, KMEANS_ITERS)._1

  /** The LSH index build: every vector assigned to its sign-bucket in one
    * map-only pass, then per-bucket occupancy stats. At scale the bucket id
    * is the partition/clustering key of the ANN index. */
  def lshBuckets(spark: SparkSession, dir: String): DataFrame =
    spread(embeddings(spark, dir))
      .select(col("vec_id"), VecFns.lshBucket(col("embedding")).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_vectors"),
        min("vec_id").as("min_vec_id"), max("vec_id").as("max_vec_id"))
      .orderBy("bucket")

  /** Embedding near-duplicate pairs via banded sign-LSH: the 8 sign bits
    * split into two 4-bit half-buckets; vectors sharing either half are
    * candidates; candidates verify with exact cosine ≥ COS_T. Approximate
    * by design (recall < 1 for moderate similarity) — the oracle replicates
    * the same bands, so results still match exactly. */
  val COS_T = 0.35

  /** Filtered vector search — the hybrid retrieval shape production systems
    * run (RAG with metadata predicates): the quality/language gate applies
    * *before* any scoring, so the per-probe work is proportional to the
    * filtered corpus, not the full one. The filter side joins on the
    * vector id (documents and embeddings share ids via dim_review's
    * doc_id=vec_id identity); at scale that join is the pushed-down
    * predicate of the ANN index scan. */
  def filteredTopK(spark: SparkSession, dir: String): DataFrame = {
    val keep = TextOps.langQualityRaw(spark, dir) // gate thresholds: TextOps.MIN_TOKENS/MAX_STOP_RATIO
      .filter(col("quality_bucket") === "ok" && col("predicted_lang") === "en")
      .select(col("doc_id").as("vec_id"))
    val e = spread(embeddings(spark, dir))
      .join(keep, "vec_id")
      .select(col("vec_id"), col("embedding"),
        sqrt(VecFns.norm2(col("embedding"))).as("nrm"))
    val probes = spread(embeddings(spark, dir))
      .filter(col("vec_id") < N_PROBES)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
        sqrt(VecFns.norm2(col("embedding"))).as("pnrm"))
    rankTopK(
      e.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"),
          (VecFns.dot(col("pv"), col("embedding")) / (col("pnrm") * col("nrm")))
            .as("cos")),
      TOP_K)
  }

  /** Product-quantization geometry: PQ_M subspaces of PQ_D dims (M×D =
    * the 64-dim embedding), PQ_K centroids per subspace, codebook entries
    * drawn deterministically from the corpus (every PQ_STRIDE-th vector's
    * subvectors — same trained-centroid stand-in as [[IVF_STRIDE]]). The
    * metric is inner product (MIPS-style PQ), so every score is one
    * [[VecFns.dot]] — codegen'd and bit-identical in the oracle. */
  val PQ_M = 8
  val PQ_D = 8
  val PQ_K = 16
  val PQ_STRIDE = 25
  val PQ_PROBES = 4
  val PQ_TOP_K = 3

  /** Subvector explode: (id, m, 8-dim slice) — one row per subspace. */
  private def subvectors(df: DataFrame, idCol: String, out: String): DataFrame =
    df.select(col(idCol), explode(array((0 until PQ_M).map(m =>
        struct(lit(m).as("m"),
          slice(col("embedding"), m * PQ_D + 1, PQ_D).as(out))): _*)).as("e"))
      .select(col(idCol), col("e.m").as("m"), col(s"e.$out").as(out))

  /** PQ codebook: (m, j, centroid subvector), PQ_M×PQ_K rows — broadcast
    * everywhere it's used (it is the index's only global state). */
  private def pqCodebook(spark: SparkSession, dir: String): DataFrame =
    subvectors(
      embeddings(spark, dir)
        .filter(col("vec_id") % PQ_STRIDE === 0 &&
          col("vec_id") < PQ_K * PQ_STRIDE)
        .select((col("vec_id") / PQ_STRIDE).cast("int").as("j"), col("embedding")),
      "j", "cv")

  /** PQ encoding, scored stream: per (vector, subspace, codebook entry)
    * the inner product — N×M×K rows with the codebook broadcast,
    * map-only against the corpus. [[pqBests]] collapses it. */
  private def pqScored(spark: SparkSession, dir: String): DataFrame =
    pqScoredAgainst(
      spread(embeddings(spark, dir)).select(col("vec_id"), col("embedding")),
      pqCodebook(spark, dir))

  /** Fused PQ argmax (r15, guide §2.3/§2.4): ONE groupBy(vec_id) with a
    * max(struct) aggregate per subspace over the N×M×K scored stream.
    * The previous two-stage shape — groupBy(vec_id, m) argmax, then
    * groupBy(vec_id) collect_list — shuffled the N×M per-subspace
    * winners a SECOND time just to assemble the M-slot array (and the
    * lifecycle writer then joined the result back to the assignment on
    * vec_id). Equivalence: max over struct(dp, -j) is the same total
    * order as max_by(struct(j, dp), struct(dp, -j)) — highest dp, tie →
    * lowest j — and max() skips the when()'s other-subspace NULLs, so
    * each slot is bit-identical; the partial aggregation still collapses
    * the expansion map-side, and only N rows cross the exchange (was
    * N + N×M across two exchanges). `bests[m] = struct(dp, nj = -j)`. */
  private def pqBests(scored: DataFrame): DataFrame =
    scored.groupBy("vec_id").agg(
      array((0 until PQ_M).map(m =>
        max(when(col("m") === m,
          struct(col("dp"), (-col("j")).as("nj"))))): _*).as("bests"))

  /** Winner code array (j per subspace, m-ascending) off [[pqBests]]. */
  private def pqCodeOf(bests: Column): Column =
    transform(bests, b => -b.getField("nj"))

  /** PQ codes per vector: the M-byte compressed representation a 100 TB
    * vector store keeps in place of raw floats (64 dims × 4 B → 8 B, 32×),
    * plus the reconstructed self-inner-product. The float sum folds in
    * subspace order (sorted struct array → left fold), never through a
    * float `sum()` aggregate whose order is partition-dependent. */
  def pqCodes(spark: SparkSession, dir: String): DataFrame =
    pqBests(pqScored(spark, dir))
      .select(col("vec_id"),
        concat_ws("-", transform(pqCodeOf(col("bests")), j => j.cast("string")))
          .as("codes"),
        // fold in subspace order — bests is m-ascending by construction,
        // the same order the previous array_sort(struct(m, j, dp)) gave
        Num.round6(aggregate(transform(col("bests"), b => b.getField("dp")),
          lit(0.0), (acc, x) => acc + x)).as("approx_self_dot"))
      .orderBy("vec_id")

  /** PQ asymmetric-distance top-k: each probe precomputes its M×K lookup
    * table of subspace inner products (one tiny broadcast), and scoring a
    * compressed vector is M table lookups — no floats ever read from the
    * corpus side. This is the ADC search loop of an IVF-PQ index, the
    * standard shape for billion-vector ANN. */
  def pqTopK(spark: SparkSession, dir: String): DataFrame = {
    val codes = pqBests(pqScored(spark, dir))
      .select(col("vec_id"), pqCodeOf(col("bests")).as("code"))
    val lut = subvectors(
        spread(embeddings(spark, dir)).filter(col("vec_id") < PQ_PROBES)
          .select(col("vec_id").as("probe_id"), col("embedding")),
        "probe_id", "pv")
      .join(broadcast(pqCodebook(spark, dir)), "m")
      .select(col("probe_id"), col("m"), col("j"),
        VecFns.dot(col("pv"), col("cv")).as("dp"))
      .groupBy("probe_id")
      .agg(array_sort(collect_list(struct(col("m"), col("j"), col("dp"))))
        .as("ls"))
      .select(col("probe_id"),
        transform(col("ls"), s => s.getField("dp")).as("lut"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("adc").desc, col("vec_id").asc)
    codes.join(broadcast(lut), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        aggregate(sequence(lit(0), lit(PQ_M - 1)), lit(0.0),
          (acc, m) => acc + element_at(col("lut"),
            (m * PQ_K + element_at(col("code"), m + 1) + 1).cast("int")))
          .as("adc"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= PQ_TOP_K)
      .select(col("probe_id"), col("rank"), col("vec_id").as("neighbor_id"),
        Num.round6(col("adc")).as("adc_dot"))
      .orderBy("probe_id", "rank")
  }

  /** Semantic-dedup drop threshold: a vector this cosine-close to its
    * cell's canonical representative is considered a semantic duplicate
    * (SemDeDup-style: cluster, then prune within clusters). */
  val SEMDEDUP_T = 0.3

  /** Semantic deduplication — embedding-space near-dup pruning: assign
    * every vector to its IVF cell, elect the cell's canonical member
    * (min id — a trained pipeline would use the member closest to the
    * centroid; the plumbing is identical), and drop members whose cosine
    * to the canonical exceeds the threshold. Output is the per-cell audit
    * (kept/dropped counts + cosine range) a 100 TB curation run logs.
    *
    * Scale shape: the cell assignment is the broadcast N×K pass of
    * [[ivfAssign]] — materialized once (localCheckpoint) because both the
    * canonical election and the member scoring consume it; without the
    * materialization each branch re-runs the N×K pass (exchange reuse does
    * not dedupe it — verified in the AQE final plan), doubling the
    * dominant cost. A production pipeline persists the assignment anyway:
    * it *is* the index. Canonicals are one-per-cell (bounded ⇒ broadcast),
    * so the scoring pass is map-only against the corpus — no all-pairs,
    * no corpus shuffle. min/max over doubles are order-free, so the audit
    * is deterministic under any partitioning. */
  def semanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val a = ivfAssign(spark, dir).select(col("vec_id"), col("cent_id"))
      .localCheckpoint()
    val e = spread(embeddings(spark, dir))
      .select(col("vec_id"), col("embedding"),
        sqrt(VecFns.norm2(col("embedding"))).as("nrm"))
    val canon = a.groupBy("cent_id").agg(min("vec_id").as("canon_id"))
      .join(e.select(col("vec_id").as("canon_id"),
        col("embedding").as("canonv"), col("nrm").as("cnrm")), "canon_id")
    a.join(e, "vec_id")
      .join(broadcast(canon), "cent_id")
      .select(col("cent_id"), col("canon_id"), col("vec_id"),
        (VecFns.dot(col("embedding"), col("canonv")) /
          (col("nrm") * col("cnrm"))).as("cos"))
      .groupBy("cent_id", "canon_id")
      .agg(count(lit(1)).as("n_vectors"),
        sum(when(col("vec_id") =!= col("canon_id") &&
          col("cos") >= SEMDEDUP_T, 1L).otherwise(0L)).as("n_dropped"),
        Num.round6(min("cos")).as("min_cos"),
        Num.round6(max(when(col("vec_id") =!= col("canon_id"), col("cos"))))
          .as("max_nonself_cos"))
      .orderBy("cent_id")
  }

  /** q166: [[semanticDedup]] SERVED from the persisted IVF index — the
    * embedding modality's cluster-consuming decision gets its lifecycle
    * form, like every closure consumer on the text side (keep-list,
    * split, curation, weights). The in-plan q76 pays the N×K assignment
    * pass every run; here the stored (vec_id, embedding, nrm, cell)
    * rows ARE the assignment (frozen centroids, increments appended by
    * the streaming ingest), so the audit is two scans of the index
    * files: a per-cell canonical election (bounded aggregate, one row
    * per cell, broadcast back) and a map-side member scoring — no N×K
    * pass, no corpus shuffle. The demo builds the standard 4/5 + 1/5
    * increment geometry ([[ivfIndexProbe]]'s); production reads the
    * index [[graft.streaming.VecIndexStream]] maintains.
    *
    * The audit differs from q76's numbers by construction — cells here
    * come from the BUILD population's stride centroids (the frozen-
    * centroid add-vectors contract), not full-corpus centroids — so it
    * carries its own oracle replicating exactly that geometry. */
  def lifecycleSemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val e = spread(embeddings(spark, dir))
    val indexDir = IndexMaintenance.scratchIndexDir(spark, "semdedup-index")
    buildIvfIndex(e.filter(col("vec_id") % ANN_DELTA_MOD =!= 0), indexDir,
      avoid = ANN_DELTA_MOD)
    appendIvfIndex(e.filter(col("vec_id") % ANN_DELTA_MOD === 0), indexDir,
      increment = 1L)
    semanticDedupFromIndex(spark, indexDir)
  }

  /** The serving half of [[lifecycleSemanticDedup]] over an existing
    * index directory — the call a day loop makes against the maintained
    * store. */
  def semanticDedupFromIndex(spark: SparkSession,
      indexDir: String): DataFrame = {
    // partition-column inference reads `cell` as int; the audit contract
    // (and the driver's schema gate) wants the bigint the centroid ids
    // actually are
    val v = spark.read.parquet(s"$indexDir/vectors")
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("cell").cast("long").as("cent_id"))
    val canon = v.groupBy("cent_id").agg(min("vec_id").as("canon_id"))
      .join(v.select(col("vec_id").as("canon_id"),
        col("embedding").as("canonv"), col("nrm").as("cnrm")), "canon_id")
    v.join(broadcast(canon), "cent_id")
      .select(col("cent_id"), col("canon_id"), col("vec_id"),
        (VecFns.dot(col("embedding"), col("canonv")) /
          (col("nrm") * col("cnrm"))).as("cos"))
      .groupBy("cent_id", "canon_id")
      .agg(count(lit(1)).as("n_vectors"),
        sum(when(col("vec_id") =!= col("canon_id") &&
          col("cos") >= SEMDEDUP_T, 1L).otherwise(0L)).as("n_dropped"),
        Num.round6(min("cos")).as("min_cos"),
        Num.round6(max(when(col("vec_id") =!= col("canon_id"), col("cos"))))
          .as("max_nonself_cos"))
      .orderBy("cent_id")
  }

  /** Int8 quantization scale: symmetric per-vector absmax → [-127, 127].
    * The rounding is floor(x + 0.5) — never `round()`, whose half-even /
    * half-up behaviour differs between engines. */
  val QUANT_LEVELS = 127

  /** Int8 embedding quantization — the 4× compression a billion-vector
    * store applies before PQ even enters the picture (and the layout
    * int8-SIMD distance kernels read): per-vector symmetric absmax scale,
    * each component mapped to round(x/scale·127) via the floor(+0.5) form.
    * Output is the per-vector audit: scale, quantized checksum/extrema,
    * and the worst absolute reconstruction error (≤ scale/254 + ε by
    * construction — DedupSimSpec-style bound pinned in RoundFourSpec).
    *
    * Scale shape: map-only — one projection over the corpus, no shuffle;
    * the checksum aggregate is per-row (fold over the vector), not
    * cross-row. */
  def int8Quant(spark: SparkSession, dir: String): DataFrame = {
    val v = col("embedding")
    val scale = array_max(transform(v, x => abs(x.cast("double"))))
    val quant = transform(v, x =>
      floor(x.cast("double") * QUANT_LEVELS / col("scale_raw") + 0.5)
        .cast("long"))
    // The raw scale keeps a distinct name end-to-end: the output column
    // `scale` is a rounded alias in the same select list, and Spark's
    // lateral-column-alias resolution would otherwise capture IT inside the
    // zip_with lambda — reconstructing with the rounded scale and shifting
    // max_abs_err by an ulp past the round6 boundary.
    spread(embeddings(spark, dir))
      .select(col("vec_id"), v, scale.as("scale_raw"))
      .select(col("vec_id"), v, col("scale_raw"), quant.as("q"))
      .select(col("vec_id"),
        Num.round6(col("scale_raw")).as("scale"),
        aggregate(col("q"), lit(0L), (acc, x) => acc + x).as("q_sum"),
        array_min(col("q")).as("q_min"),
        array_max(col("q")).as("q_max"),
        Num.round6(array_max(zip_with(v, col("q"), (x, q) =>
          abs(x.cast("double") - q.cast("double") * col("scale_raw") / QUANT_LEVELS))))
          .as("max_abs_err"))
      .orderBy("vec_id")
  }

  /** Matryoshka geometry: coarse pass over the first MRL_DIMS dims, then a
    * full-dim rerank of a bounded shortlist. */
  val MRL_DIMS = 16
  val MRL_SHORTLIST = 20

  /** Matryoshka (truncated-prefix) two-stage ANN — the MRL retrieval
    * pattern: embeddings trained so prefixes are themselves valid
    * embeddings get searched coarse-first on the head slice (here 16 of 64
    * dims = 4× less data touched), then a shortlist is reranked with the
    * full vector. Output keeps the coarse rank next to the final rank so
    * the reorder the rerank performs is visible (and spec-checked).
    *
    * Scale shape: the N×P coarse scoring reads only the prefix column
    * (in a real layout, a separate narrow column/file — 4× the IO cut);
    * full vectors are touched for P×SHORTLIST rows only. Shortlist and
    * rerank are per-probe windows over ≤ N and ≤ SHORTLIST rows; probes
    * broadcast, candidates never shuffle. */
  def matryoshkaRerank(spark: SparkSession, dir: String): DataFrame = {
    val e = spread(embeddings(spark, dir))
      .select(col("vec_id"), col("embedding"),
        slice(col("embedding"), 1, MRL_DIMS).as("head"))
      .select(col("vec_id"), col("embedding"), col("head"),
        sqrt(VecFns.norm2(col("head"))).as("hnrm"),
        sqrt(VecFns.norm2(col("embedding"))).as("nrm"))
    val probes = e.filter(col("vec_id") < N_PROBES)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
        col("head").as("ph"), col("hnrm").as("phnrm"), col("nrm").as("pnrm"))
    val coarseW = Window.partitionBy(col("probe_id"))
      .orderBy(col("coarse").desc, col("vec_id").asc)
    val shortlist = e.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"), col("pv"), col("embedding"),
        col("pnrm"), col("nrm"),
        (VecFns.dot(col("ph"), col("head")) / (col("phnrm") * col("hnrm")))
          .as("coarse"))
      .withColumn("coarse_rank", row_number().over(coarseW).cast("long"))
      .filter(col("coarse_rank") <= MRL_SHORTLIST)
    val fullW = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    shortlist
      .select(col("probe_id"), col("vec_id"), col("coarse_rank"),
        (VecFns.dot(col("pv"), col("embedding")) / (col("pnrm") * col("nrm")))
          .as("cos"))
      .withColumn("rank", row_number().over(fullW).cast("long"))
      .filter(col("rank") <= TOP_K)
      .select(col("probe_id"), col("rank"), col("vec_id").as("neighbor_id"),
        Num.round6(col("cos")).as("cosine"), col("coarse_rank"))
      .orderBy("probe_id", "rank")
  }

  /** Pack sign bits of dims [from, from+n) into one BIGINT, MSB-first —
    * a left fold (acc*2 + bit) in index order, so the oracle can rebuild
    * it with the same fold. 32-bit halves keep the fold inside BIGINT
    * range under ANSI mode (64 doublings would overflow the sign bit). */
  private def packSigns(v: Column, from: Int, n: Int): Column =
    aggregate(
      transform(slice(v, from + 1, n),
        x => when(x >= 0f, 1L).otherwise(0L)),
      lit(0L),
      (acc, b) => acc * 2L + b)

  /** Binary (sign) quantization + Hamming search — the 32× compression
    * tier under int8 ([[int8Quant]]): each vector becomes 64 sign bits in
    * two BIGINT words; candidate distance is popcount(XOR) per word —
    * integer-exact, no float discipline needed. Top-k per probe by
    * (hamming asc, vec_id), with the true cosine of each survivor shown —
    * the verify-stage read a binary-first store does anyway.
    *
    * Scale shape: the signature build is map-only (16 bytes/vector — the
    * whole index of a billion vectors fits in executor memory); scoring is
    * two XOR+popcounts per pair inside whole-stage codegen, no arrays
    * touched until the cosine verify of ≤ k×P survivors. */
  def binaryQuantHamming(spark: SparkSession, dir: String): DataFrame = {
    val e = spread(embeddings(spark, dir))
      .select(col("vec_id"), col("embedding"),
        packSigns(col("embedding"), 0, 32).as("sig_hi"),
        packSigns(col("embedding"), 32, 32).as("sig_lo"),
        sqrt(VecFns.norm2(col("embedding"))).as("nrm"))
    val probes = e.filter(col("vec_id") < N_PROBES)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
        col("sig_hi").as("p_hi"), col("sig_lo").as("p_lo"),
        col("nrm").as("pnrm"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("hamming").asc, col("vec_id").asc)
    e.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"), col("pv"), col("embedding"),
        col("pnrm"), col("nrm"),
        (bit_count(col("p_hi").bitwiseXOR(col("sig_hi"))) +
          bit_count(col("p_lo").bitwiseXOR(col("sig_lo")))).cast("long")
          .as("hamming"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TOP_K)
      .select(col("probe_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("hamming"),
        Num.round6(VecFns.dot(col("pv"), col("embedding")) /
          (col("pnrm") * col("nrm"))).as("cosine"))
      .orderBy("probe_id", "rank")
  }

  def cosineNearDup(spark: SparkSession, dir: String): DataFrame = {
    // As in embeddingTopK: norms precomputed per vector; the vector and its
    // norm ride through the band join so the verify step is one dot fold
    // per candidate (vs three folds and two extra doc-table joins).
    val e = spread(embeddings(spark, dir))
      .select(col("vec_id"), col("embedding"),
        sqrt(VecFns.norm2(col("embedding"))).as("nrm"),
        VecFns.lshBucket(col("embedding")).as("bucket"))
    val bands = e.select(col("vec_id"), col("embedding"), col("nrm"),
      explode(array(
        concat(lit("0:"), col("bucket") % 16),
        concat(lit("1:"), shiftright(col("bucket"), 4)))).as("band"))
    bands.as("x")
      .join(bands.as("y").hint("merge"), // self-join ⇒ merge + ReusedExchange (see Dedup.nearDupPairs)
        col("x.band") === col("y.band") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        (VecFns.dot(col("x.embedding"), col("y.embedding")) /
          (col("x.nrm") * col("y.nrm"))).as("cos"))
      .distinct() // pairs sharing both half-buckets appear twice; cos is pure per pair
      .filter(col("cos") >= COS_T)
      .select(col("vec_a"), col("vec_b"), Num.round6(col("cos")).as("cosine"))
      .orderBy("vec_a", "vec_b")
  }

  /** IVF-PQ probe geometry: coarse cells searched per probe and the ADC
    * shortlist depth handed to the exact re-ranker. nprobe trades recall
    * for cells touched (q131 measures that curve on the IVF half); the
    * rerank depth bounds how many full-precision vectors a probe ever
    * reads — the IVF-PQ contract is that the corpus's floats are touched
    * only for this shortlist, never for a whole cell. */
  val IVFPQ_NPROBE = 2
  val IVFPQ_RERANK = 8

  /** q136: the composed IVF-PQ search — the standard billion-vector ANN
    * shape (coarse quantizer → ADC scan of compressed codes → exact
    * re-rank), assembled from the engine's IVF ([[ivfAssign]]) and PQ
    * ([[pqEncode]]) halves. Per probe: (1) the coarse quantizer picks the
    * top-[[IVFPQ_NPROBE]] cells; (2) every candidate in those cells is
    * scored by asymmetric distance — [[PQ_M]] lookups into the probe's
    * M×K table, no corpus floats read; (3) only the top-[[IVFPQ_RERANK]]
    * ADC survivors are re-ranked by exact cosine. Codes are on raw
    * vectors (not cell residuals) — the non-residual IVFADC variant —
    * so the PQ half is exactly the q46/q47 encoder and the two indexes
    * stay independently verifiable.
    *
    * Scale shape: the stored index row is (vec_id, cell, code) — cell
    * from the coarse quantizer, an [[PQ_M]]-byte code in place of the
    * floats (32× smaller); persisted it would be partitioned by cell
    * exactly like [[buildIvfIndex]], making step (2) a DPP-pruned scan
    * of nprobe/K of the files (the path q129's probe spec-pins). The
    * probe side (cells + LUT) is |probes|·nprobe rows broadcast; the
    * re-rank broadcasts |probes|·RERANK survivors into one corpus join.
    * Nothing in the pipeline shuffles the corpus. */
  def ivfpqTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = vecsWithNorm(spark, dir).localCheckpoint()
    val cents = strideCentroids(e)
    // the compressed half of the index: an M-byte code per vector. A
    // deployment pre-builds (vec_id, cell, code) as ONE cell-partitioned
    // table (the q129 lifecycle); in-plan, the two halves are kept as
    // separate single-pass builds and meet only AT the candidates —
    // joining them corpus-wide first would be an N×N shuffle join that
    // costs more than both build passes combined (measured 12.5s vs
    // 2.9+1.5s at sf0.1).
    val codes = pqBests(pqScored(spark, dir))
      .select(col("vec_id"), pqCodeOf(col("bests")).as("code"))
    // top-nprobe cells per probe via the sorted-slice aggregate (the
    // AQE-safe form ivfNprobeRecall uses — a window here kills DPP reuse)
    val pn = e.filter(col("vec_id") < PQ_PROBES)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
        col("nrm").as("pnrm"))
    val pcells = pn.join(broadcast(cents), lit(true))
      .select(col("probe_id"), col("cent_id"),
        (VecFns.dot(col("pv"), col("cv")) / (col("pnrm") * col("cnrm")))
          .as("cos"))
      .groupBy("probe_id")
      .agg(slice(array_sort(collect_list(struct(-col("cos"), col("cent_id")))),
        1, IVFPQ_NPROBE).as("cells"))
      .select(col("probe_id"), explode(col("cells.cent_id")).as("pcell"))
    // per-probe ADC lookup table: M×K inner products against the codebook
    val lut = subvectors(
        e.filter(col("vec_id") < PQ_PROBES)
          .select(col("vec_id").as("probe_id"), col("embedding")),
        "probe_id", "pv")
      .join(broadcast(pqCodebook(spark, dir)), "m")
      .select(col("probe_id"), col("m"), col("j"),
        VecFns.dot(col("pv"), col("cv")).as("dp"))
      .groupBy("probe_id")
      .agg(array_sort(collect_list(struct(col("m"), col("j"), col("dp"))))
        .as("ls"))
      .select(col("probe_id"), transform(col("ls"), s => s.getField("dp"))
        .as("lut"))
    // candidate pruning FIRST (the IVF contract): the coarse assignment
    // meets the broadcast probe cells, leaving |probes|·nprobe·cellsize
    // candidate ids — ~(P·nprobe/K)·N rows, a small fraction of the
    // corpus. BroadcastGuard strips the hint if a huge probe batch ever
    // outgrows the broadcast ceiling (AQE then picks the join).
    val cands = assignTo(e, cents)
      .select(col("vec_id"), col("cent_id").as("cell"))
      .join(broadcast(pcells),
        col("cell") === col("pcell") && col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"))
    // ADC scan: codes are fetched for the candidates only (one map-side
    // broadcast join against the code build — never an N×N shuffle);
    // scoring a candidate is PQ_M table lookups folded in subspace order
    val adc = codes.join(broadcast(cands), "vec_id")
      .join(broadcast(lut), "probe_id")
      .select(col("probe_id"), col("vec_id"),
        aggregate(sequence(lit(0), lit(PQ_M - 1)), lit(0.0),
          (acc, m) => acc + element_at(col("lut"),
            (m * PQ_K + element_at(col("code"), m + 1) + 1).cast("int")))
          .as("adc"))
    val wa = Window.partitionBy("probe_id")
      .orderBy(col("adc").desc, col("vec_id").asc)
    val shortlist = adc
      .withColumn("arank", row_number().over(wa).cast("long"))
      .filter(col("arank") <= IVFPQ_RERANK)
      .select(col("probe_id"), col("vec_id"), col("adc"))
    // exact re-rank: full-precision floats are read for the broadcast
    // shortlist only — |probes|·RERANK rows against one corpus join
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    e.join(broadcast(shortlist), "vec_id")
      .join(broadcast(pn), "probe_id")
      .select(col("probe_id"), col("vec_id"), col("adc"),
        (VecFns.dot(col("pv"), col("embedding")) / (col("pnrm") * col("nrm")))
          .as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= IVF_TOP_K)
      .select(col("probe_id"), col("rank"), col("vec_id").as("neighbor_id"),
        Num.round6(col("adc")).as("adc_dot"),
        Num.round6(col("cos")).as("cosine"))
      .orderBy("probe_id", "rank")
  }

  /** Output dimensionality of the [[randomProjectionAudit]] sketch. */
  val RP_D = 16

  /** ±1 component (j, i) of the random-projection matrix — integer hash
    * parity, deterministic, never materialized (the JL matrix at 100 TB
    * is a FORMULA, not an artifact to ship to executors).
    *
    * The hash is the minhash family's multiplicative form,
    * `(a_j·(i+1) + b_j) mod P mod 2` with per-row a_j,b_j < P: the
    * product wraps P many times as i varies, so parities decorrelate
    * across both rows and dims. (An additive `c_j + i·k` parity with odd
    * k alternates deterministically in i — every row becomes the SAME
    * alternating functional and the sketch collapses; caught by the
    * distortion audit itself reading ~0.99 avg distortion.) */
  private def rpSign(j: Int, i: Column): Column = {
    val aj = (j.toLong * 2654435761L + 11L) % 1000000007L
    val bj = (j.toLong * 40503L + 2654435769L) % 1000000007L
    when(((lit(aj) * (i.cast("long") + 1L) + lit(bj))
      % 1000000007L) % 2L === 0L, lit(1.0)).otherwise(lit(-1.0))
  }

  /** Row j of the sketch: left fold over input dims (the oracle's
    * list_reduce order — bit-identical cross-engine). */
  private def rpComponent(j: Int, v: Column): Column =
    aggregate(
      transform(sequence(lit(0), size(v) - 1),
        i => rpSign(j, i) * element_at(v, i + 1).cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** q175: Johnson–Lindenstrauss random projection — sketch every
    * embedding from 64 to [[RP_D]] dims with a sign (Achlioptas ±1)
    * matrix derived from integer hashing, then AUDIT what the sketch
    * costs: cosine distortion over a deterministic pair sweep
    * (consecutive vec_ids — an id-ordered 1-1 join), split by whether
    * the pair shares a label. The calibration read before running any
    * LSH/clustering stage on sketched vectors instead of full ones —
    * 4× less shuffle byte-width for a measured recall price, the same
    * economics as the PQ tier but join-algebra-free.
    *
    * Scale shape: the projection is map-only (RP_D folds per row, no
    * matrix broadcast — components are hash formulas); the audit pair
    * join is 1-1 on consecutive ids (sort-merge on the id, no blow-up);
    * everything after is a 2-row aggregate. All distortion cells are
    * ppm integers (round6 fixed-point before differencing), so the
    * gate is exact. */
  def randomProjectionAudit(spark: SparkSession, dir: String): DataFrame = {
    val proj = array((0 until RP_D).map(j =>
      rpComponent(j, col("embedding"))): _*)
    val e = embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding"),
        proj.as("proj"))
    val a = e.select(col("vec_id").as("id_a"), col("label").as("lab_a"),
      col("embedding").as("emb_a"), col("proj").as("proj_a"))
    val b = e.select((col("vec_id") - 1L).as("id_a"),
      col("label").as("lab_b"), col("embedding").as("emb_b"),
      col("proj").as("proj_b"))
    val cosP = VecFns.dotFold(col("proj_a"), col("proj_b")) /
      (sqrt(VecFns.dotFold(col("proj_a"), col("proj_a"))) *
        sqrt(VecFns.dotFold(col("proj_b"), col("proj_b"))))
    a.join(b, "id_a")
      .select(
        (col("lab_a") === col("lab_b")).as("same_label"),
        Num.ppm(VecFns.cosine(col("emb_a"), col("emb_b"))).as("co_ppm"),
        Num.ppm(cosP).as("cp_ppm"))
      .groupBy("same_label")
      .agg(count(lit(1)).as("n_pairs"),
        expr("sum(co_ppm) div count(1)").as("avg_cos_orig_ppm"),
        expr("sum(cp_ppm) div count(1)").as("avg_cos_proj_ppm"),
        expr("sum(abs(co_ppm - cp_ppm)) div count(1)")
          .as("avg_abs_distortion_ppm"),
        max(abs(col("co_ppm") - col("cp_ppm"))).as("max_abs_distortion_ppm"))
      .orderBy("same_label")
  }
}
