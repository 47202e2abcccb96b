package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.engine.{Dedup, Kpis, Sim}

/** Physical-plan shape assertions — the executable form of PLANS.md.
  * Each test pins a scale-critical plan property so a refactor that
  * silently regresses the plan (a broadcast that becomes a cartesian, a
  * window that sneaks back into an argmax) fails CI, not a cluster run.
  * Plans are read AFTER execution so AQE's final shape is what's asserted.
  */
class PlanShapeSpec extends SparkSpecBase {

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    val p = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    p.toString
  }

  test("lifecycle keep-list never re-hashes the corpus: no hash " +
      "expressions, no self-join, one bounded label join") {
    // the steady-state contract (q153 vs q134): serving from the
    // maintained labels must plan as documents ⟕ labels — zero
    // shingle/minhash evaluation, zero LSH self-join, zero CC rounds
    val labelDir = tmpDir("graft-plan-lifecycle") + "/labels"
    Dedup.buildClusterLabels(
      Dedup.minhashNearDup(spark, sf).select("doc_a", "doc_b"), labelDir)
    val df = Dedup.dedupKeepListFrom(spark, sf, labelDir)
    val plan = finalPlan(df)
    assert(!plan.contains("shingle_hashes") && !plan.contains("minhash_sig"),
      "lifecycle serving must not evaluate the hashing pipeline")
    assert(!plan.contains("SortMergeJoin") || !plan.contains("ReusedExchange"),
      "lifecycle serving must not run the LSH self-join")
    // exactly two sources: the corpus and the label table
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 2, s"expected 2 parquet scans (docs + labels): $scans")
  }

  test("global top-k plans as TakeOrderedAndProject, not a global sort") {
    val plan = finalPlan(Kpis.topSuppliers(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("LSH band self-join reuses one exchange under the merge hint") {
    val plan = finalPlan(Dedup.minhashNearDup(spark, sf))
    assert(plan.contains("SortMergeJoin"))
    assert(plan.contains("ReusedExchange"),
      "both sides of the band self-join must come from the same shuffle")
    assert(!plan.contains("BroadcastHashJoin"),
      "a broadcast self-join would evaluate the hashing subtree twice")
  }

  test("interval join keeps the equi-key shuffle, never a cartesian") {
    val plan = finalPlan(Kpis.orderEventWindow(spark, sf))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("IVF argmax is an aggregate, not a window sort") {
    val plan = finalPlan(Sim.ivfCells(spark, sf))
    assert(!plan.contains("Window"),
      "argmax must partial-aggregate map-side (max_by), not range-sort NxK")
    assert(plan.contains("HashAggregate") || plan.contains("ObjectHashAggregate"))
  }

  test("as-of join bounds per-group state via WindowGroupLimit") {
    val plan = finalPlan(Kpis.eventOrderAsof(spark, sf))
    assert(plan.contains("WindowGroupLimit"),
      "rank<=1 must push a per-partition group limit below the window sort")
  }

  test("semantic dedup computes the N×K assignment exactly once") {
    // ivfAssign feeds both the canonical election and the member scoring;
    // without materialization each branch re-runs the N×K broadcast pass
    // (exchange reuse does not dedupe it). The checkpoint makes the query
    // plan consume the assignment as a scan: zero N×K joins inside it.
    val plan = finalPlan(Sim.semanticDedup(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "the N×K assignment pass leaked into the query plan — it must be " +
        "materialized once, not recomputed per consumer")
  }

  test("IVF top-k computes the N×K assignment exactly once") {
    // same rule as semantic dedup: the assignment feeds both the probe
    // lookup and the candidate join — the checkpoint must make the query
    // plan consume it as a scan, with no N×K join re-run inside.
    val plan = finalPlan(Sim.ivfTopK(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "the N×K assignment pass leaked into the query plan — it must be " +
        "materialized once, not recomputed per consumer")
  }

  test("salted aggregation runs two aggregate phases") {
    val plan = finalPlan(Kpis.saltedRevenueByNation(spark, sf))
    // partial+final pairs for both the (key, salt) and the key phases
    val n = "HashAggregate".r.findAllIn(plan).length
    assert(n >= 4, s"expected two paired aggregate phases, saw $n HashAggregate nodes")
  }

  test("every aggregate query plans map-side partial aggregation") {
    val plan = finalPlan(Kpis.pricingSummary(spark, sf))
    val modes = "HashAggregate".r.findAllIn(plan).length
    assert(modes >= 2, "partial+final HashAggregate pair expected")
  }

  test("SCD2 chains both windows on one custkey shuffle") {
    // lag (change detection) and row_number+lead (interval stitching)
    // share partitioning AND sort order — the filter between them must
    // not force a second exchange; per-key history never re-shuffles.
    val plan = finalPlan(Kpis.scd2Dimension(spark, sf))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1,
      s"expected exactly one custkey shuffle, saw $shuffles")
    assert("\\bWindow\\b".r.findAllIn(plan).length >= 2)
  }

  test("binary hamming scoring stays codegen'd scalar work until the window") {
    // the XOR+popcount pairwise scoring must not materialize arrays: the
    // only array touches are the signature build (before the join) and
    // the ≤k×P cosine verify (after the rank filter)
    val plan = finalPlan(Sim.binaryQuantHamming(spark, sf))
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      "probe side must broadcast — candidates never shuffle for scoring")
    assert(plan.contains("WindowGroupLimit"),
      "rank<=k must bound per-probe state below the window sort")
  }

  test("bloom pre-join broadcasts the bitmap and semi-joins the dim") {
    val plan = finalPlan(graft.engine.Indexing.bloomPrejoin(spark, sf))
    // the fixed-size bitmap and the dim keyset both broadcast — the fact
    // side must never shuffle for either the pre-filter or the exact join
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2,
      "bitmap join and exact semi join must both be broadcast")
    assert(plan.contains("LeftSemi"),
      "the exact filter must be a semi join, not a row-multiplying inner")
  }

  test("triangle orientation plans no window at all (struct order, not rank)") {
    // the (deg, node) total order replaces round-5's global row_number —
    // assert on the un-checkpointed subplan (triangleCount materializes
    // it, which would hide the window from the final executed plan)
    val ranked = graft.engine.Graph.knnEdgesFrom(
      graft.engine.Graph.coSupplyEdges(spark, sf))
      .select(org.apache.spark.sql.functions.col("s1"),
        org.apache.spark.sql.functions.col("s2"))
    val oriented = graft.engine.Graph.orientEdges(
      ranked, graft.engine.Graph.degreesOf(ranked))
    oriented.collect()
    // the kNN cut's per-node top-K window (partitioned by node) is the
    // legitimate distributed group limit; what must never appear is an
    // UNPARTITIONED window — the single-reducer global rank
    val globalWindows = allNodes(oriented.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty,
      s"orientation must not rank nodes through a global window, " +
        s"got $globalWindows")
  }

  test("kNN graph cut prunes per-node state via WindowGroupLimit") {
    // assert on the cut subplan itself — triangleCount localCheckpoints
    // it, which hides the window from the downstream executed plan
    val plan = finalPlan(graft.engine.Graph.knnEdgesFrom(
      graft.engine.Graph.coSupplyEdges(spark, sf)))
    assert(plan.contains("WindowGroupLimit"),
      "rk<=K must push a per-node group limit below the window sort — " +
        "this is what keeps the cut distributed (no global edge sort)")
    assert(!plan.contains("CartesianProduct"))
  }

  test("equi-depth binning plans no window and no global sort before agg") {
    val plan = finalPlan(graft.engine.Analytics.equidepthGlobal(spark, sf))
    assert(!plan.contains("Window"),
      "bin assignment must be a broadcast edge lookup, not a global ntile")
    // the only sort allowed is the final ORDER BY over ≤8 result rows
    assert("Exchange rangepartitioning".r.findAllIn(plan).length <= 1)
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      "the percentile-edge array must broadcast to the scan")
  }

  // walk the whole physical tree, crossing AQE query-stage boundaries
  // (plain collect() stops at QueryStageExec, hiding materialized stages)
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val kids = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(q.plan)
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      // a leaf that points at the stage it reuses — descend into it
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        Seq(r.child)
      case other => other.children
    }
    p +: kids.flatMap(allNodes)
  }

  test("attribution window carries user partitioning, never a global sort") {
    val df = graft.engine.Analytics.attribution(spark, sf)
    df.collect()
    // walk the physical tree: every Window node must carry a non-empty
    // partition spec mentioning the user key — a substring check on the
    // rendered plan is vacuous (formatting-dependent) and can trip on
    // unrelated SinglePartition exchanges
    val windows = allNodes(df.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty,
      "the running last-click max is one per-user window pass")
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty &&
        w.partitionSpec.exists(_.toString.contains("user_id")),
        s"window must partition by user_id, got: ${w.partitionSpec}")
    }
  }

  test("grouped binning never sorts a group's data rows in one partition") {
    // the scale contract of q122: exactly ONE window, it consumes the
    // distinct-value AGGREGATE (bounded by the value domain, never raw
    // data rows), and it is sharded — partitioned by (group, value-range
    // shard), so no partition exceeds 2^QB_SHARD_BITS distinct values
    // even for a single giant group
    val df = graft.engine.Analytics.quantileBinsGrouped(spark, sf)
    df.collect()
    val windows = allNodes(df.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.size == 1,
      s"grouped binning must run exactly one window, got ${windows.size}")
    val w = windows.head
    assert(w.partitionSpec.size == 2,
      s"the prefix-sum window must partition by (group, shard), got: " +
        s"${w.partitionSpec}")
    val overAggregate = allNodes(w.child).exists {
      case _: org.apache.spark.sql.execution.aggregate.HashAggregateExec =>
        true
      case _: org.apache.spark.sql.execution.aggregate
          .ObjectHashAggregateExec => true
      case _: org.apache.spark.sql.execution.aggregate
          .SortAggregateExec => true
      case _ => false
    }
    assert(overAggregate,
      "the window must consume the per-(group, value) count aggregate, " +
        "never raw data rows — per-group data sort regression")
  }

  test("min/max skipping layout plans no window and no data-side sort") {
    // the layout build is a per-date aggregate + bounded cumulative
    // self-join on the D-row date table — the old global row_number
    // (single reducer over unaggregated data) must never come back
    val plan = finalPlan(graft.engine.Indexing.minmaxSkipping(spark, sf))
    assert(!plan.contains("Window"),
      "chunk assignment must be a broadcast date->chunk map, not a " +
        "global row_number")
    assert(plan.contains("BroadcastHashJoin"),
      "the pruned scan must consume the surviving-dates map as a broadcast")
  }

  test("boilerplate heavy-gram set joins back by broadcast, never shuffling the corpus") {
    // the counting bound caps the heavy set at S·100/pct grams regardless
    // of corpus size, so the join back onto the gram stream must be a
    // broadcast — a sort-merge there would shuffle the whole exploded
    // corpus a second time at scale
    val df = graft.engine.TextOps.boilerplateNgrams(spark, sf)
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"heavy-gram set must broadcast back onto the gram stream:\n$plan")
    // non-vacuous: the relative-df gate actually fires on this corpus,
    // and no doc's boilerplate count exceeds its gram count
    assert(rows.exists(_.getAs[Long]("n_boiler") > 0),
      "threshold produced an empty heavy set — gate is vacuous")
    assert(rows.forall(r =>
      r.getAs[Long]("n_boiler") <= r.getAs[Long]("n_grams")))
  }

  test("repeated-span accounting scans the corpus once and never nest-loops") {
    // the duplicated-hash set has no size bound (df≥2), so the operator
    // carries no broadcast hint — but whatever join AQE picks, the plan
    // must stay hash-keyed (no nested-loop/cartesian fallback), and the
    // documents file must be scanned exactly once, reused across the
    // dup-set and flag branches (the corpus TEXT never re-reads). The
    // public operator checkpoints this subplan (which would truncate the
    // scan from its executedPlan), so the pin targets the subplan.
    val df = graft.engine.TextOps.spanFlags(spark, sf)
    df.collect()
    import org.apache.spark.sql.execution.FileSourceScanExec
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = (p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(s.plan)
      case f: FileSourceScanExec => Seq(f)
      case o => o.children.flatMap(scans)
    }) ++ p.subqueries.flatMap(scans)
    val plan = df.queryExecution.executedPlan
    val docScans = scans(plan).filter(_.relation.location.rootPaths
      .exists(_.toString.contains("documents.parquet")))
    assert(docScans.length == 1,
      s"documents must scan once (ReusedExchange elsewhere): ${docScans.length}")
    val s = plan.toString
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"),
      s"span join degenerated to a nested loop:\n$s")
  }

  test("coverage sample bounds per-cell state via WindowGroupLimit") {
    val plan = finalPlan(Sim.cellCoverageSample(spark, sf))
    assert(plan.contains("WindowGroupLimit"),
      "per-cell top-k must push the rank limit below the window sort")
    assert(!plan.contains("CartesianProduct"))
  }

  test("training shuffle plans no global sort over the corpus") {
    // the manifest's window partitions by shard; the only Sort wide
    // enough to matter is the final 8-row presentation orderBy
    val df = graft.engine.TextOps.trainingShards(spark, sf)
    df.collect()
    val windows = allNodes(df.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty &&
      windows.forall(_.partitionSpec.nonEmpty),
      "shard positions must come from a shard-partitioned window, " +
        "never a global-ordering window")
  }

  test("temperature sampling never shuffles the corpus") {
    // the corpus flows scan → broadcast-joined gate → final aggregate:
    // the ONLY shuffles are per-lang aggregates (tiny) — a corpus-keyed
    // exchange here would mean the rate join degenerated
    val df = graft.engine.TextOps.temperatureSample(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the rate table must broadcast back onto the corpus")
    assert(!plan.contains("SortMergeJoin"),
      "a sort-merge rate join means the corpus shuffled for a |langs|-row table")
  }

  test("source-overlap signatures collapse map-side; the pair stage is " +
      "broadcast algebra on the tiny signature table") {
    val plan = finalPlan(Dedup.sourceOverlap(spark, sf))
    assert(plan.contains("partial_min"),
      "per-doc signatures must partial-aggregate into the per-source min " +
        "before any shuffle — doc rows never ride the exchange")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "the |sources|² pair stage runs on the broadcast signature table")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      "the inequality pair join must never shuffle or cartesian the corpus")
  }

  test("hash-store probe pushes the bucket set into the store scan and " +
      "broadcasts the batch, never shuffling the index") {
    import org.apache.spark.sql.functions.col
    val d = graft.engine.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val dirH = tmpDir("graft-plan-hashidx")
    Dedup.buildHashIndex(d, dirH)
    val delta = d.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 90000000L).as("doc_id"), col("text"))
    val df = Dedup.probeHashIndex(spark, delta, dirH)
    val plan = finalPlan(df)
    assert(plan.contains("BroadcastHashJoin"),
      "the batch's distinct hashes must broadcast into the store scan")
    assert(!plan.contains("SortMergeJoin"),
      "a sort-merge store join means the index shuffled for a batch probe")
    val storeScan = plan.linesIterator
      .find(l => l.contains("Scan parquet") && l.contains(dirH.split('/').last))
    assert(storeScan.exists(_.contains("hb")),
      "the bounded bucket set must reach the store scan as a pushed filter")
  }

  test("weighted sample reuses the source partitioning: one corpus " +
      "exchange feeds both the window and the per-source aggregate") {
    val plan = finalPlan(graft.engine.TextOps.weightedSample(spark, sf))
    val corpusExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(corpusExchanges == 1,
      s"expected exactly 1 hash exchange (window + agg share the source " +
        s"partitioning): $corpusExchanges")
  }

  test("image decode/resize are map-only: no hash exchange anywhere") {
    for (df <- Seq(
        graft.multimodal.Multimodal.imageDecodeStats(spark, sf),
        graft.multimodal.Multimodal.imageResizeStats(spark, sf))) {
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        "the decode stage must stay narrow — per-partition batches, no shuffle")
    }
  }

  test("audio frame fan-out stays narrow: the below-mean flag is computed " +
      "in the decode map, zero hash exchanges in the whole plan") {
    val df = graft.multimodal.Multimodal.audioFrameStats(spark, sf)
    df.collect()
    assert(!df.queryExecution.executedPlan.toString
      .contains("Exchange hashpartitioning"),
      "per-file features must not shuffle — the file is the row")
  }

  test("perceptual dedup groups are one map-side-combined groupBy of " +
      "8-byte keys — no join, no window") {
    val plan = finalPlan(graft.multimodal.Multimodal.imagePdupGroups(spark, sf))
    assert(plan.contains("partial_count") || plan.contains("partial"),
      "dhash groupBy must map-side combine before the exchange")
    assert(!plan.contains("Join") && !plan.contains("Window"),
      "tier-1 perceptual dedup is a plain aggregate, never a pair join")
  }

  test("perceptual near-dup pairs never nest-loop: df-capped bucket " +
      "equi-join only, verify stays scalar") {
    val plan = finalPlan(graft.multimodal.Multimodal.imagePdupPairs(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "candidate generation must ride the (band,bval) equi-join")
  }

  test("domain gate: the blocklist rides a broadcast LEFT ANTI join on " +
      "the doc stream — never a shuffled join, never a cartesian") {
    val plan = finalPlan(graft.engine.SourceOps.domainGate(spark, sf))
    assert(plan.contains("LeftAnti"), "the blocklist must be an anti join")
    assert(plan.contains("BroadcastHashJoin"),
      "domain-grain blocklist must broadcast")
    assert(!plan.contains("CartesianProduct"))
  }

  test("quality classifier is map-only to the aggregate: no join, no " +
      "window, one hash exchange for the per-source summary") {
    val plan = finalPlan(graft.engine.TextOps.qualityClassifier(spark, sf))
    assert(!plan.contains("Join") && !plan.contains("Window"),
      "the hashing-trick score folds inside the scan projection")
    val ex = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(ex == 1, s"expected exactly one hash exchange, got $ex")
  }

  test("line dedup rebuild is shuffle-free: the boilerplate set broadcasts " +
      "(single-row nest-loop), the corpus text stream crosses no exchange") {
    val plan = finalPlan(graft.engine.TextOps.lineDedup(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "the heavy-line array must broadcast into the rebuild map")
    assert(!plan.contains("SortMergeJoin"),
      "reconstruction must never reassemble through a shuffled join")
  }

  test("robots gate: broadcast form crosses zero hash exchanges; joined " +
      "form shuffles both sides on host and never broadcasts the rules") {
    // the small-domain fast path (q234): verdicts are map-side against
    // the broadcast rule sets — the only exchange is the final ordering
    val b = finalPlan(graft.engine.Crawl.robotsGateBroadcast(spark, sf))
    assert(!b.contains("hashpartitioning"),
      "broadcast form must not shuffle the URL stream")
    assert(!b.contains("Join"), "broadcast form has no relational join")
    // the beyond-broadcast form (q239): rules-as-a-table met in a
    // host-keyed sort-merge join — the shape that survives a 10⁷-host
    // rule table no executor could hold
    val j = finalPlan(graft.engine.Crawl.robotsGateJoined(spark, sf))
    assert(j.contains("SortMergeJoin"),
      "joined form must sort-merge on the host key")
    assert(j.contains("hashpartitioning(host"),
      "joined form must hash-partition on host")
    assert(!j.contains("BroadcastHashJoin"),
      "the joined form exists for the regime where rules cannot broadcast")
  }

  test("frontier (q241): one anti-join, host-partitioned window, two corpus scans") {
    val df = graft.engine.Crawl.crawlFrontier(spark, sf)
    df.collect()
    val nodes = allNodes(df.queryExecution.executedPlan)
    // the seen-before subtraction is ONE anti-join; the robots gate is
    // map-side (broadcast rules) and must not appear as a join
    val joins = nodes.filter(n => n.nodeName.contains("Join"))
    assert(joins.size == 1, s"expected one (anti) join, got: " +
      joins.map(_.nodeName).mkString(", "))
    assert(joins.head.toString.contains("LeftAnti"),
      "the seen-before subtraction must plan as a left-anti join")
    // the politeness window is per-host — bounded by the host's sitemap
    val windows = nodes.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(
      _.partitionSpec.exists(_.toString.contains("host"))),
      "the wave rank must partition by host")
    // discovery + seen read the corpus once each — no third scan
    val scans = nodes.count(n =>
      n.nodeName.contains("Scan") && n.toString.contains("documents"))
    assert(scans <= 2, s"frontier must not re-scan the corpus: $scans scans")
  }

  test("container ingests (q242/q243) are one scan, one shard exchange, no joins") {
    for (df <- Seq(graft.multimodal.Multimodal.tarShardSamples(spark, sf),
        graft.engine.Crawl.zipArchiveProbe(spark, sf))) {
      df.collect()
      val nodes = allNodes(df.queryExecution.executedPlan)
      assert(!nodes.exists(_.nodeName.contains("Join")),
        "sample grouping must stay map-side (the file IS the row)")
      val hashEx = nodes.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.outputPartitioning.isInstanceOf[
              org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => e
      }
      assert(hashEx.size == 1,
        s"exactly the shard-assembly shuffle expected, got: " +
          hashEx.map(_.outputPartitioning.toString).mkString(" ;; "))
    }
  }

  test("skewed frontier (q253): cold hosts keep the per-host window, " +
      "hot rows rank on (host, priority), offsets broadcast back") {
    val df = graft.engine.Crawl.frontierSkewedWaves(spark, sf)
    df.collect()
    val nodes = allNodes(df.queryExecution.executedPlan)
    // the two-path split is visible as two Window grains: the cold
    // per-host window and the hot (host, priority) sub-rank — plus the
    // tiny offset cumulation (also per-host, over the AGGREGATED
    // counts, not the rows)
    val windows = nodes.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    val grains = windows.map(_.partitionSpec.map(e =>
      e.toString.replaceAll("#\\d+L?", "")).mkString(","))
    assert(grains.exists(_.contains("priority")),
      s"hot rows must sub-rank on (host, priority): $grains")
    assert(grains.count(!_.contains("priority")) >= 1,
      s"cold hosts must keep the plain host window: $grains")
    // NO full re-sort of the cold hosts on the hot path: every Window
    // that partitions by host ALONE is either the cold-side window
    // (above the anti-hot filter — hot rows never ride it) or the
    // offset cumulation (above the tiny (host, priority) AGGREGATE,
    // never the hot rows themselves)
    windows.filter(w => !w.partitionSpec.exists(
        _.toString.contains("priority")))
      .foreach { w =>
        val subtree = allNodes(w)
        val coldSide = subtree.exists(n => n.nodeName.contains("Filter") &&
          n.toString.contains("NOT"))
        val overCounts = subtree.exists(
          _.nodeName.contains("HashAggregate"))
        assert(coldSide || overCounts,
          "a host-grain window may consume only cold-filtered rows or " +
            s"aggregated counts, not the hot rows: $w")
      }
    // the offset relation is broadcast back, never shuffled row-wise
    assert(nodes.exists(_.nodeName.contains("BroadcastHashJoin")),
      "the (host, priority) offsets must broadcast into the hot rows")
    assert(!nodes.exists(_.nodeName.contains("SortMergeJoin")),
      "no row-grain shuffle join belongs in the rank decomposition")
  }

  test("WET round trip (q244) is map-only: no hash exchange, no join") {
    val df = graft.engine.Crawl.wetRoundTrip(spark, sf)
    df.collect()
    val nodes = allNodes(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.nodeName.contains("Join")))
    assert(!nodes.exists {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.outputPartitioning.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.physical.HashPartitioning]
      case _ => false
    }, "emit -> re-decode must happen inside one row's computation")
  }
}
