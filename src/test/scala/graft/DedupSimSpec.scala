package graft

import org.apache.spark.sql.functions._

import graft.engine.{Dedup, IndexMaintenance, Sim, Tables, TextOps}
import graft.functions.{TextFns, VecFns}

/** LLM-pipeline operator invariants: dedup recall, signature determinism,
  * similarity self-consistency. */
class DedupSimSpec extends SparkSpecBase {
  import spark.implicits._

  test("exactDedup finds exactly the planted duplicate groups") {
    val groups = Dedup.exactDedup(spark, sf)
    val planted = Tables.documents(spark, sf)
      .filter(col("doc_id") % 7 === 0).count()
    assert(groups.count() == planted)
    assert(groups.filter(col("n_copies") =!= 2).count() == 0)
  }

  test("identical text yields identical minhash signature; jaccard(x,x)=1") {
    val df = Seq(
      (1L, "spark table scan join filter agg window group"),
      (2L, "spark table scan join filter agg window group"),
      (3L, "completely different words entirely here now yes"))
      .toDF("id", "text")
      .select(col("id"), TextFns.shingleHashes(col("text")).as("sh"))
      .select(col("id"), TextFns.minhashSig(col("sh")).as("sig"),
        TextFns.jaccard(col("sh"), col("sh")).as("self_jac"))
    val rows = df.collect().sortBy(_.getLong(0))
    assert(rows(0).getSeq[Long](1) == rows(1).getSeq[Long](1))
    assert(rows(0).getSeq[Long](1) != rows(2).getSeq[Long](1))
    assert(rows.forall(_.getDouble(2) == 1.0))
    assert(rows(0).getSeq[Long](1).length == TextFns.NH)
  }

  test("incremental probe equals the full recompute on split-crossing pairs") {
    // lifecycle proof: indexing 4/5 of the corpus and probing the 1/5
    // delta must find EXACTLY the full recompute's pairs that cross the
    // split — same pairs, same verified jaccard, nothing extra
    val inc = Dedup.incrementalNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val full = Dedup.minhashNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) =>
        (a % Dedup.DELTA_MOD == 0) != (b % Dedup.DELTA_MOD == 0) }
    assert(inc.sameElements(full))
    assert(inc.nonEmpty, "the delta split must cross some near-dup pairs")
  }

  test("incremental probe never shuffles or re-hashes the persisted index") {
    val df = Dedup.incrementalNearDup(spark, sf)
    df.collect()
    def nodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case other => other.children
      }
      p +: kids.flatMap(nodes)
    }
    val all = nodes(df.queryExecution.executedPlan)
    val bhj = all.collectFirst {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }.getOrElse(fail("the probe must be a broadcast hash join"))
    val (streamedPlan, buildPlan) = bhj.buildSide match {
      case org.apache.spark.sql.catalyst.optimizer.BuildRight =>
        (bhj.left, bhj.right)
      case _ => (bhj.right, bhj.left)
    }
    // the index (streamed) side: a bare parquet scan of the index files —
    // no exchange (the index never moves) and no signature recompute (no
    // Generate/explode of band keys on that side)
    val streamed = nodes(streamedPlan).map(_.getClass.getSimpleName)
    assert(!streamed.exists(_.contains("ShuffleExchange")),
      s"index side must not shuffle: $streamed")
    assert(!streamed.exists(_.contains("Generate")),
      s"index side must not recompute band rows: $streamed")
    assert(streamed.exists(_.contains("Scan")),
      s"index side must be a file scan: $streamed")
    // the delta side is the broadcast one, and IT carries the banding
    val broadcastSide = nodes(buildPlan).map(_.getClass.getSimpleName)
    assert(broadcastSide.exists(_.contains("Generate")),
      s"delta side must compute band rows: $broadcastSide")
  }

  test("minhashNearDup pairs all verify at jaccard >= 0.8 and a<b") {
    val pairs = Dedup.minhashNearDup(spark, sf).collect()
    assert(pairs.forall(r => r.getDouble(2) >= 0.8))
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("map-only codegen simhash == declarative explode/groupBy simhash") {
    val fast = Dedup.simhash(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = Dedup.simhashAgg(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == ref)
  }

  test("simhash is deterministic and xor-hamming of a doc with itself is 0") {
    val a = Dedup.simhash(spark, sf).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Dedup.simhash(spark, sf).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.values.forall(s => s >= 0 && s < (1L << Dedup.SIMHASH_BITS)))
  }

  test("cosine(v,v) == 1 within one ulp; topk has full ranks and no self") {
    val self = Tables.embeddings(spark, sf)
      .select(VecFns.cosine(col("embedding"), col("embedding")).as("c"))
      .filter(abs(col("c") - 1.0) > 1e-12)
    assert(self.count() == 0)
    val topk = Sim.embeddingTopK(spark, sf).collect()
    assert(topk.forall(r => r.getLong(0) != r.getLong(2)))
    val byProbe = topk.groupBy(_.getLong(0))
    assert(byProbe.values.forall(_.map(_.getLong(1)).sorted.sameElements(1L to Sim.TOP_K)))
  }

  test("codegen dot product is bit-identical to the declarative fold") {
    val e = Tables.embeddings(spark, sf)
    val cmp = e.as("a")
      .join(e.as("b"), col("a.vec_id") === col("b.vec_id") - 1)
      .select(
        VecFns.dot(col("a.embedding"), col("b.embedding")).as("fast"),
        VecFns.dotFold(col("a.embedding"), col("b.embedding")).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(cmp.count() == 0)
  }

  test("lsh buckets stay within [0, 2^NPLANES)") {
    val b = Sim.lshBuckets(spark, sf).agg(min("bucket"), max("bucket")).collect().head
    assert(b.getLong(0) >= 0 && b.getLong(1) < (1L << VecFns.NPLANES))
  }

  test("connectedComponents labels a chain, a cycle and an isolated pair") {
    // chain 1-2-3-4 (diameter 3: needs >1 propagation round), cycle 10-11-12,
    // pair 20-21 — three components, labels = min id of each.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (12L, 10L), (20L, 21L)).toDF("a", "b")
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(pairs.select(col("b").as("src"), col("a").as("dst")))
    val got = Dedup.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents converges on a 4096-node chain within O(log n) rounds") {
    // a pure path graph is the worst case for plain min-label propagation
    // (diameter = n); pointer doubling must close it in ~log2(n) rounds —
    // maxIters 16 would take a propagation-only implementation to node 16.
    val n = 4096
    val pairs = spark.range(n - 1)
      .selectExpr("id AS a", "id + 1 AS b")
    val edges = pairs.selectExpr("a AS src", "b AS dst")
      .unionAll(pairs.selectExpr("b AS src", "a AS dst"))
    val labels = Dedup.connectedComponents(edges, maxIters = 16).collect()
    assert(labels.length == n)
    assert(labels.forall(_.getLong(1) == 0L))
  }

  test("dupClusters covers every verified near-dup pair, cluster_id = min member") {
    val pairs = Dedup.minhashNearDup(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Dedup.dupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // both ends of every pair are clustered, and into the same cluster
    assert(pairs.forall { case (a, b) => clusters(a) == clusters(b) })
    // a cluster's id is one of its members and the minimum of them
    val members = clusters.groupBy(_._2).map { case (c, m) => c -> m.keys.min }
    assert(members.forall { case (c, minId) => c == minId })
  }

  test("curation verdicts partition the corpus and tally all tokens") {
    val docs = engine.Tables.documents(spark, sf)
    val total = docs.count()
    val tokens = docs.select(sum(size(TextFns.tokens(col("text")))).cast("long"))
      .collect().head.getLong(0)
    val cur = TextOps.curation(spark, sf).collect()
    assert(cur.map(_.getLong(1)).sum == total)
    assert(cur.map(_.getLong(2)).sum == tokens)
    assert(cur.map(_.getString(0)).toSet.subsetOf(
      Set("dup", "short", "stopword_heavy", "non_en", "kept")))
  }

  test("curation funnel partitions the corpus and its kept stage equals " +
      "the pipeline's shard totals") {
    val docs = engine.Tables.documents(spark, sf)
    val total = docs.count()
    val tokens = docs.select(sum(size(TextFns.tokens(col("text")))).cast("long"))
      .collect().head.getLong(0)
    val fun = TextOps.curationFunnel(spark, sf).collect()
    // exactly-one-verdict accounting: docs and tokens are conserved
    assert(fun.map(_.getLong(2)).sum == total)
    assert(fun.map(_.getLong(3)).sum == tokens)
    assert(fun.map(_.getString(1)).toSet.subsetOf(
      Set("dup", "short", "stopword_heavy", "sampled_out", "kept")))
    // the funnel's kept stage must equal what the q147 pipeline actually
    // ships — same docs, same tokens (the funnel is an accounting VIEW of
    // that pipeline, not a reimplementation allowed to drift)
    val shards = TextOps.curationPipeline(spark, sf).collect()
    val kept = fun.filter(_.getString(1) == "kept")
    assert(kept.map(_.getLong(2)).sum == shards.map(_.getLong(1)).sum)
    assert(kept.map(_.getLong(3)).sum == shards.map(_.getLong(2)).sum)
  }

  test("qualityCanonicals picks the max-token member and disagrees with " +
      "min-id only when min-id is not a max") {
    val toks = engine.Tables.documents(spark, sf)
      .select(col("doc_id"), size(TextFns.tokens(col("text"))).cast("long")
        .as("n_tokens"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val clusters = Dedup.dupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val members = clusters.groupBy(_._2).map { case (c, m) =>
      c -> m.map(_._1).toSeq.sorted }
    val qc = Dedup.qualityCanonicals(spark, sf).collect()
    assert(qc.map(_.getLong(0)).toSet == members.keySet)
    qc.foreach { r =>
      val (cid, size0, canon, canonToks, minId) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val mem = members(cid)
      assert(size0 == mem.length)
      assert(minId == cid, "cluster_id is the min member by construction")
      assert(mem.contains(canon))
      val maxT = mem.map(toks).max
      assert(toks(canon) == maxT && canonToks == maxT)
      // total order: among max-token members, the canonical is the min id
      assert(canon == mem.filter(toks(_) == maxT).min)
    }
    // the policy must MATTER on this corpus: some cluster's min-id member
    // is a shorter document than its quality canonical
    assert(qc.exists(r => r.getLong(2) != r.getLong(4)),
      "expected at least one cluster where quality ranking disagrees with min-id")
  }

  test("qualityKeepList conserves docs, keeps one doc per cluster, and " +
      "its global dividend equals q163's canonical-token gap") {
    val qk = Dedup.qualityKeepList(spark, sf).collect()
    val docs = engine.Tables.documents(spark, sf)
    val total = docs.count()
    assert(qk.map(_.getAs[Long]("n_docs")).sum == total)
    val qc = Dedup.qualityCanonicals(spark, sf).collect()
    val clustered = qc.map(_.getAs[Long]("cluster_size")).sum
    assert(qk.map(_.getAs[Long]("n_kept")).sum ==
      total - clustered + qc.length,
      "one keeper per cluster plus every unclustered doc")
    val toks = docs.select(col("doc_id"),
        size(TextFns.tokens(col("text"))).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gap = qc.map(r => r.getAs[Long]("canonical_tokens") -
      toks(r.getAs[Long]("min_id_canonical"))).sum
    assert(gap > 0, "the quality policy must matter on this corpus")
    assert(qk.map(_.getAs[Long]("token_dividend")).sum == gap,
      "global dividend must equal the per-cluster canonical-token gap")
    // serve-shape pin: the keep-list reads maintained labels — the
    // from-scratch path's signature operators (band-hash Generate, the
    // N×K nested-loop) must be absent from its plan
    val df = Dedup.qualityKeepList(spark, sf)
    df.collect()
    def nodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case other => other.children
      }
      p +: kids.flatMap(nodes)
    }
    val names = nodes(df.queryExecution.executedPlan)
      .map(_.getClass.getSimpleName)
    assert(!names.exists(_.contains("Generate")),
      s"serve plan must not re-hash the corpus: $names")
    assert(!names.exists(_.contains("BroadcastNestedLoopJoin")), s"$names")
  }

  test("weightedTokenMixture: effective ≤ raw mass, weights bite, and the " +
      "integer waterline is exact") {
    val rows = TextOps.weightedTokenMixture(spark, sf).collect()
    val raw151 = TextOps.tokenBudgetMixture(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_tokens")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("eff_tokens") <= r.getAs[Long]("raw_tokens"))
      assert(r.getAs[Long]("raw_tokens") == raw151(r.getString(0)),
        "raw masses must agree with q151's")
    }
    assert(rows.exists(r =>
      r.getAs[Long]("eff_tokens") < r.getAs[Long]("raw_tokens")),
      "dup clusters must discount some source's effective mass")
    // replicate the exact integer waterline from the (source, t) table
    val ts = rows.map(r => r.getString(0) -> r.getAs[Long]("eff_tokens"))
      .sortBy(p => (p._2, p._1))
    val nSrc = ts.length
    val b = ts.map(_._2).sum / TextOps.MIX_BUDGET_DIV
    var cum = 0L
    val fully = ts.zipWithIndex.map { case ((s, t), i) =>
      cum += t; s -> (cum + (nSrc - (i + 1)) * t <= b) }.toMap
    val k = fully.count(_._2)
    val cumK = ts.filter(p => fully(p._1)).map(_._2).sum
    val p = b - cumK; val q = nSrc - k
    rows.foreach { r =>
      val t = r.getAs[Long]("eff_tokens")
      val want = if (fully(r.getString(0)) || q == 0) 1000000L
        else (1000000L * p) / (q * t)
      assert(r.getAs[Long]("rate_ppm") == want,
        s"rate mismatch for ${r.getString(0)}")
    }
    val expected = rows.map(_.getAs[Long]("expected_eff_tokens")).sum
    assert(expected <= b && expected >= b - nSrc,
      s"waterfill must land on the effective budget: $expected vs $b")
  }

  test("sourceTokenCap: greedy prefix fills to the cap, uncapped sources " +
      "keep everything, and the cap bites somewhere") {
    val rows = TextOps.sourceTokenCap(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_tokens")).sum
    val cap = total / (TextOps.SRC_CAP_DIV * rows.length)
    val maxDoc = engine.Tables.documents(spark, sf)
      .select(max(size(TextFns.tokens(col("text")))).cast("long"))
      .collect().head.getLong(0)
    rows.foreach { r =>
      val capped = r.getAs[Boolean]("capped")
      if (capped) {
        // greedy admits while budget remains: the kept mass reaches the
        // cap and overshoots by at most one document
        assert(r.getAs[Long]("kept_tokens") >= cap, s"underfilled: $r")
        assert(r.getAs[Long]("kept_tokens") < cap + maxDoc,
          s"overshot by more than one doc: $r")
        assert(r.getAs[Long]("n_kept") < r.getAs[Long]("n_docs"))
      } else {
        assert(r.getAs[Long]("n_kept") == r.getAs[Long]("n_docs"))
        assert(r.getAs[Long]("kept_tokens") == r.getAs[Long]("n_tokens"))
      }
    }
    assert(rows.exists(_.getAs[Boolean]("capped")),
      "the cap must bite some source at this geometry")
  }

  test("stratifiedEvalSample: exactly EVAL_N picks, Hamilton quotas, and " +
      "the two-phase pick equals the one-phase prefix") {
    val rows = TextOps.stratifiedEvalSample(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_picked")).sum == TextOps.EVAL_N,
      "the sample size must be exact, not in-expectation")
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    rows.foreach { r =>
      assert(r.getAs[Long]("n_picked") == r.getAs[Long]("quota"))
      val exact = TextOps.EVAL_N.toDouble *
        r.getAs[Long]("n_docs") / total
      val q = r.getAs[Long]("quota").toDouble
      assert(q == math.floor(exact) || q == math.floor(exact) + 1,
        s"quota must be base or base+1: $r vs $exact")
    }
    // one-phase check: the quota-prefix of the full per-lang hash order
    // (no ppm pre-filter) must pick the same documents
    val docs = engine.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        (TextFns.polyHash(
          concat(lit("eval:"), col("doc_id").cast("string"))) % 1000000)
          .as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val quotas = rows.map(r => r.getString(0) -> r.getAs[Long]("quota")).toMap
    val onePhase = docs.groupBy(_._2).map { case (lang, ds) =>
      lang -> ds.sortBy(d => (d._3, d._1)).take(quotas(lang).toInt)
        .map(_._1).sum
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("picked_id_sum") == onePhase(r.getString(0)),
        s"two-phase pick diverged from the one-phase prefix for ${r.getString(0)}")
    }
  }

  test("lengthPercentiles: histogram-derived order statistics equal the " +
      "brute-force sorted nearest-rank at every (lang, pct)") {
    val lens = engine.Tables.documents(spark, sf)
      .select(col("lang"), size(TextFns.tokens(col("text"))).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).sorted }
    val rows = TextOps.lengthPercentiles(spark, sf).collect()
    assert(rows.length == lens.size * TextOps.LEN_PCTS.length)
    rows.foreach { r =>
      val (lang, pct) = (r.getString(0), r.getLong(1))
      val sorted = lens(lang)
      assert(r.getAs[Long]("n_docs") == sorted.length)
      val rank = ((sorted.length * pct + 99) / 100).toInt // ceil(n·p/100)
      assert(r.getAs[Long]("tokens") == sorted(rank - 1),
        s"$lang p$pct: histogram said ${r.getAs[Long]("tokens")}, " +
          s"sorted corpus says ${sorted(rank - 1)}")
    }
  }

  test("vector-store uniqueness audit: clean lifecycle empty; a " +
      "re-delivered vector flagged with its increments and cells") {
    val e = engine.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val indexDir = IndexMaintenance.scratchIndexDir(spark, "ivf-audit")
    Sim.buildIvfIndex(e.filter(col("vec_id") % Sim.ANN_DELTA_MOD =!= 0),
      indexDir, avoid = Sim.ANN_DELTA_MOD)
    Sim.appendIvfIndex(e.filter(col("vec_id") % Sim.ANN_DELTA_MOD === 0),
      indexDir, increment = 1L)
    assert(Sim.auditIvfIndex(spark, indexDir).count() == 0,
      "disjoint increments must audit clean")
    Sim.appendIvfIndex(e.filter(col("vec_id") === 7L), indexDir,
      increment = 2L)
    val flagged = Sim.auditIvfIndex(spark, indexDir).collect()
    assert(flagged.map(_.getLong(0)).toSeq == Seq(7L),
      s"audit must flag exactly the re-delivered vector: ${flagged.toSeq}")
    assert(flagged.head.getAs[Long]("n_rows") == 2L)
    assert(flagged.head.getSeq[Long](2).contains(2L),
      "flag must name the spanning increments")
  }

  test("semanticDedupFromIndex serves the stored assignment: every vector " +
      "audited, canon = min per cell, and NO N×K assignment in the plan") {
    val e = engine.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val indexDir = IndexMaintenance.scratchIndexDir(spark, "semdedup-spec")
    Sim.buildIvfIndex(e.filter(col("vec_id") % Sim.ANN_DELTA_MOD =!= 0),
      indexDir, avoid = Sim.ANN_DELTA_MOD)
    Sim.appendIvfIndex(e.filter(col("vec_id") % Sim.ANN_DELTA_MOD === 0),
      indexDir, increment = 1L)
    val audit = Sim.semanticDedupFromIndex(spark, indexDir)
    val rows = audit.collect()
    assert(rows.map(_.getAs[Long]("n_vectors")).sum == e.count(),
      "every indexed vector lands in exactly one cell audit row")
    val cells = spark.read.parquet(s"$indexDir/vectors")
      .groupBy("cell").agg(min("vec_id").as("m")).collect()
      .map(r => r.getAs[Number]("cell").longValue -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("canon_id") ==
        cells(r.getAs[Number]("cent_id").longValue),
        s"canonical must be the cell's min member: $r")
      assert(r.getAs[Double]("max_nonself_cos") <= 1.0 + 1e-9)
    }
    // the lifecycle point: the serve plan reads the STORED assignment —
    // no N×K centroid-scoring pass (which appears as the broadcast
    // nested-loop join assignWithVec uses)
    def nodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case other => other.children
      }
      p +: kids.flatMap(nodes)
    }
    val names = nodes(audit.queryExecution.executedPlan)
      .map(_.getClass.getSimpleName)
    assert(!names.exists(_.contains("BroadcastNestedLoopJoin")),
      s"serve plan must not re-run the N×K assignment: $names")
  }

  test("pqCodes emits PQ_M codes in [0, PQ_K) for every vector") {
    val rows = Sim.pqCodes(spark, sf).collect()
    assert(rows.length == engine.Tables.embeddings(spark, sf).count())
    assert(rows.forall { r =>
      val parts = r.getString(1).split("-").map(_.toInt)
      parts.length == Sim.PQ_M && parts.forall(c => c >= 0 && c < Sim.PQ_K)
    })
  }

  test("pqTopK ranks are dense per probe and ADC tracks the exact dot") {
    val topk = Sim.pqTopK(spark, sf).collect()
    val byProbe = topk.groupBy(_.getLong(0))
    assert(byProbe.keySet == (0L until Sim.PQ_PROBES).toSet)
    assert(byProbe.values.forall(
      _.map(_.getLong(1)).sorted.sameElements(1L to Sim.PQ_TOP_K)))
    // sanity: quantized self-dot tracks the exact norm². Synthetic random
    // vectors are near-orthogonal, so a 16-entry stride-sampled codebook
    // quantizes coarsely (measured avg rel err ≈ 0.38 here) — the bound is
    // a mechanics check (subspace misalignment or an off-by-one in the LUT
    // indexing pushes it far past 1), not a recall claim.
    val err = Sim.pqCodes(spark, sf)
      .join(engine.Tables.embeddings(spark, sf), "vec_id")
      .select((abs(col("approx_self_dot") -
        graft.functions.VecFns.norm2(col("embedding"))) /
        graft.functions.VecFns.norm2(col("embedding"))).as("rel"))
      .agg(avg("rel"), max("rel")).collect().head
    assert(err.getDouble(0) < 0.5 && err.getDouble(1) < 1.0,
      s"reconstruction error avg=${err.getDouble(0)} max=${err.getDouble(1)}")
  }

  test("topBigrams / tfidfTopTerms rank densely inside every group") {
    val bi = TextOps.topBigrams(spark, sf).collect()
    assert(bi.groupBy(_.getString(0)).values.forall { g =>
      val ranks = g.map(_.getLong(1)).sorted
      ranks.sameElements(1L to ranks.length) && ranks.length <= TextOps.BIGRAM_TOP_K
    })
    val terms = TextOps.tfidfTopTerms(spark, sf).collect()
    assert(terms.groupBy(_.getLong(0)).values.forall(
      _.map(_.getLong(1)).sorted.sameElements(1L to TextOps.TFIDF_TOP_K)))
    // every doc with >= 3 distinct terms appears
    assert(terms.map(_.getLong(0)).distinct.length ==
      engine.Tables.documents(spark, sf).count())
  }

  test("kmeansStep covers every (centroid, dim) cell with consistent membership") {
    val rows = Sim.kmeansStep(spark, sf).collect()
    val dims = rows.groupBy(_.getLong(0)).map { case (_, g) =>
      (g.map(_.getLong(1)).sorted.toSeq, g.map(_.getLong(2)).distinct.length)
    }
    // all 64 dims per centroid, and every dim of a centroid agrees on the
    // member count (they aggregate the same vectors)
    assert(dims.forall { case (ds, nCounts) =>
      ds == (0L until 64L) && nCounts == 1
    })
    // new coords stay inside the data's coordinate range
    assert(rows.forall(r => math.abs(r.getDouble(3)) <= 1.0))
  }

  test("sketch aggregates track their exact twins within tolerance") {
    val full = engine.Kpis.approxStatsFull(spark, sf).collect()
    assert(full.nonEmpty)
    full.foreach { r =>
      val exactU = r.getLong(2).toDouble
      val approxU = r.getLong(3).toDouble
      assert(math.abs(approxU - exactU) / exactU < 0.05,
        s"HLL off by ${math.abs(approxU - exactU) / exactU} on ${r.getString(0)}")
      val exactP = r.getDouble(5)
      val approxP = r.getDouble(7)
      assert(math.abs(approxP - exactP) / math.max(math.abs(exactP), 1e-9) < 0.10,
        s"approx p50 $approxP vs exact $exactP on ${r.getString(0)}")
    }
    // the gated form every verdict cell must be TRUE (this is what the
    // DuckDB oracle hash-checks)
    val gated = engine.Kpis.approxStats(spark, sf).collect()
    assert(gated.forall(r => r.getBoolean(4) && r.getBoolean(5)))
  }

  test("docFingerprint is deterministic and total") {
    val fp1 = TextOps.docFingerprint(spark, sf).collect()
    val fp2 = TextOps.docFingerprint(spark, sf).collect()
    assert(fp1.sameElements(fp2))
    assert(fp1.forall(!_.isNullAt(1)))
  }

  test("IVF probe dynamically prunes to its own cells' files") {
    // the scale contract of the persisted index: a probe batch's scan of
    // indexDir/vectors must carry a dynamicpruning subquery on the `cell`
    // partition column (fed by the broadcast probe assignment) and read
    // strictly fewer files than the index holds — probe cost scales with
    // cell size, not index size
    val e = Tables.embeddings(spark, sf)
    val indexDir = tmpDir("graft-ivf-ndx-dpp") + "/index"
    Sim.buildIvfIndex(e.filter(col("vec_id") % Sim.ANN_DELTA_MOD =!= 0),
      indexDir, avoid = Sim.ANN_DELTA_MOD)
    Sim.appendIvfIndex(e.filter(col("vec_id") % Sim.ANN_DELTA_MOD === 0),
      indexDir, increment = 1L)
    val probes = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    val q = Sim.probeIvfIndex(probes, indexDir)
    // collect() drives q's OWN queryExecution (count() would build and
    // execute a different plan, leaving these scans' metrics empty)
    assert(q.collect().nonEmpty)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"index scan must carry a dynamicpruning subquery on cell:\n$plan")
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
    val idxScans = scans(q.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString
        .contains("graft-ivf-ndx-dpp")))
    assert(idxScans.nonEmpty, "no file scan over the index found")
    // the scan's own metrics report post-pruning file counts: with DPP
    // engaged, numFiles (actually read) must undercut staticFilesNum
    // (what the static filters alone would have read)
    val pruned = idxScans.filter(_.metrics.contains("staticFilesNum"))
    assert(pruned.nonEmpty, "no index scan reports dynamic-pruning metrics")
    val readFiles = pruned.map(_.metrics("numFiles").value).max
    val staticFiles = pruned.map(_.metrics("staticFilesNum").value).max
    assert(readFiles < staticFiles,
      s"probe must not scan the whole index: $readFiles vs $staticFiles files")
  }

  test("IVF recall@k rises with nprobe; multi-cell probes still prune") {
    // the nprobe knob's contract: more cells probed can only add candidates
    // (each index vector lives in exactly one cell), so recall@k is
    // non-decreasing in nprobe — and on this data the knob must be LIVE
    // (strictly lift recall end-to-end), or it's dead weight
    val rows = Sim.ivfNprobeRecall(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == Sim.NPROBES_MEASURED.map(_.toLong))
    val recalls = rows.map(_._3).toSeq
    assert(recalls == recalls.sorted, s"recall must be non-decreasing: $recalls")
    assert(recalls.last > recalls.head,
      s"the nprobe knob must lift recall on this corpus: $recalls")
    // multi-cell probes keep the scale contract: the index scan still
    // carries the dynamicpruning subquery on `cell` (nprobe cells of
    // files read, not the whole index)
    val e = Tables.embeddings(spark, sf)
    val indexDir = tmpDir("graft-ivf-ndx-np") + "/index"
    Sim.buildIvfIndex(e, indexDir)
    val probes = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    val (q, obs) = Sim.probeIvfIndexObserved(probes, indexDir, nprobe = 2)
    assert(q.collect().nonEmpty)
    // the probe path's serving metrics ride the job: assignment rows are
    // exactly |probes|×nprobe, and the probed-cell set is a subset of it
    val m = obs.get
    assert(m("assignment_rows") == 4L * 2L,
      s"assignment_rows: ${m("assignment_rows")}")
    val cellsProbed = m("cells_probed").asInstanceOf[Long]
    val totalCells = spark.read.parquet(s"$indexDir/centroids").count()
    assert(cellsProbed >= 1L && cellsProbed <= math.min(8L, totalCells),
      s"cells_probed $cellsProbed outside [1, min(8, $totalCells)]")
    // the post-pruning metrics, not the plan string: a dropped DPP filter
    // still prints "dynamicpruningexpression(true)"
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
    val pruned = scans(q.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString
        .contains("graft-ivf-ndx-np")))
      .filter(_.metrics.contains("staticFilesNum"))
    assert(pruned.nonEmpty, "nprobe>1 probe lost dynamic partition pruning")
    assert(pruned.map(_.metrics("numFiles").value).max <
      pruned.map(_.metrics("staticFilesNum").value).max,
      "nprobe>1 probe must not scan the whole index")
  }

  test("compaction folds band-index increments; probes bit-identical, fewer files") {
    val d = Tables.documents(spark, sf)
    val indexDir = tmpDir("graft-compact-mh") + "/index"
    Dedup.buildMinhashIndex(d.filter(col("doc_id") % 3 === 0), indexDir)
    Dedup.appendMinhashIndex(d.filter(col("doc_id") % 3 === 1), indexDir,
      increment = 1L)
    val probe = d.filter(col("doc_id") % 3 === 2)
    def pairs(): Seq[String] = Dedup.probeMinhashIndex(spark, probe, indexDir)
      .collect().map(_.toString).sorted.toSeq
    def rows(): Long = spark.read.parquet(indexDir).count()
    val (pairsBefore, rowsBefore) = (pairs(), rows())
    val filesBefore = IndexMaintenance.parquetFileCount(spark, indexDir)
    Dedup.compactMinhashIndex(spark, indexDir)
    assert(pairs() == pairsBefore, "probe results changed across compaction")
    assert(rows() == rowsBefore, "compaction lost or duplicated index rows")
    val filesAfter = IndexMaintenance.parquetFileCount(spark, indexDir)
    assert(filesAfter < filesBefore,
      s"compaction must shrink the file pile: $filesBefore -> $filesAfter")
    val incs = spark.read.parquet(indexDir)
      .select(col("increment").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq
    assert(incs == Seq(0L), s"increments must fold into the build: $incs")
  }

  test("compaction folds IVF increments; probes bit-identical, cells intact") {
    val e = Tables.embeddings(spark, sf)
    val indexDir = tmpDir("graft-compact-ivf") + "/index"
    Sim.buildIvfIndex(e.filter(col("vec_id") % Sim.ANN_DELTA_MOD =!= 0),
      indexDir, avoid = Sim.ANN_DELTA_MOD)
    Sim.appendIvfIndex(e.filter(col("vec_id") % Sim.ANN_DELTA_MOD === 0),
      indexDir, increment = 1L)
    val probes = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    def top(): Seq[String] = Sim.probeIvfIndex(probes, indexDir)
      .collect().map(_.toString).sorted.toSeq
    val before = top()
    val filesBefore =
      IndexMaintenance.parquetFileCount(spark, s"$indexDir/vectors")
    Sim.compactIvfIndex(spark, indexDir)
    assert(top() == before, "probe top-k changed across compaction")
    val filesAfter =
      IndexMaintenance.parquetFileCount(spark, s"$indexDir/vectors")
    assert(filesAfter < filesBefore,
      s"compaction must shrink the file pile: $filesBefore -> $filesAfter")
    // the cell partitioning (what probes prune on) must survive the fold
    val cols = spark.read.parquet(s"$indexDir/vectors").columns.toSeq
    assert(cols.contains("cell") && cols.contains("increment"))
    val incs = spark.read.parquet(s"$indexDir/vectors")
      .select(col("increment").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq
    assert(incs == Seq(0L), s"increments must fold into the build: $incs")
  }

  test("IVF append is idempotent and never retrains the centroids") {
    val e = Tables.embeddings(spark, sf)
    val indexDir = tmpDir("graft-ivf-ndx-idem") + "/index"
    val base = e.filter(col("vec_id") % Sim.ANN_DELTA_MOD =!= 0)
    val delta = e.filter(col("vec_id") % Sim.ANN_DELTA_MOD === 0)
    Sim.buildIvfIndex(base, indexDir)
    val centsBefore = spark.read.parquet(s"$indexDir/centroids")
      .select("cent_id").collect().map(_.getLong(0)).sorted.toSeq
    Sim.appendIvfIndex(delta, indexDir, increment = 1L)
    val once = spark.read.parquet(s"$indexDir/vectors").count()
    // retry of the same increment must replace, not duplicate
    Sim.appendIvfIndex(delta, indexDir, increment = 1L)
    val twice = spark.read.parquet(s"$indexDir/vectors").count()
    assert(once == twice, s"retried append duplicated vectors: $once -> $twice")
    assert(once == e.count(), "index must hold build + delta exactly once")
    // appends assign against FROZEN centroids — the set cannot change
    val centsAfter = spark.read.parquet(s"$indexDir/centroids")
      .select("cent_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(centsAfter == centsBefore, "append must not retrain centroids")
    // and no delta vec_id is a centroid (they arrived after training)
    assert(centsAfter.forall(_ % Sim.ANN_DELTA_MOD != 0))
    // rebuild clears stale increments (static overwrite)
    Sim.buildIvfIndex(base, indexDir)
    val incs = spark.read.parquet(s"$indexDir/vectors")
      .select(col("increment").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq
    assert(incs == Seq(0L), s"rebuild must clear old increments: $incs")
  }

  test("maintainIvfIndex: in-distribution appends are a no-op; a " +
      "concentrated drifted feed triggers an atomic recluster") {
    val e = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val indexDir = tmpDir("graft-ivf-maintain") + "/index"
    Sim.buildIvfIndex(e.filter(col("vec_id") % Sim.ANN_DELTA_MOD =!= 0),
      indexDir, avoid = Sim.ANN_DELTA_MOD)
    // in-distribution delta: a slice of the same corpus → small drift
    Sim.appendIvfIndex(e.filter(col("vec_id") % Sim.ANN_DELTA_MOD === 0),
      indexDir, increment = 1L)
    val centsBefore = spark.read.parquet(s"$indexDir/centroids")
      .select("cent_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(!Sim.maintainIvfIndex(spark, indexDir, thresholdPpm = 900000L),
      "an in-distribution append must not trigger a recluster")
    assert(spark.read.parquet(s"$indexDir/centroids")
      .select("cent_id").collect().map(_.getLong(0)).sorted.toSeq
      == centsBefore, "no-op maintenance must not touch the centroids")
    // drifted feed: every delta vector identical → one cell swallows the
    // whole live population → max drift ≈ 1e6 ppm
    val one = e.filter(col("vec_id") === 1).select(col("embedding").as("e1"))
    val drifted = e.filter(col("vec_id") % 5 === 0)
      .crossJoin(broadcast(one))
      .select((col("vec_id") + 10000000L).as("vec_id"),
        col("e1").as("embedding"))
    Sim.appendIvfIndex(drifted, indexDir, increment = 2L)
    val rowsBefore = spark.read.parquet(s"$indexDir/vectors").count()
    // the concentrated increment is ~5/12 of the live population, so the
    // hot cell's live share (and its drift) sits near 580k ppm — well
    // above an ops threshold of 400k, while the in-distribution case
    // above stayed under 900k by a wide margin
    assert(Sim.maintainIvfIndex(spark, indexDir, thresholdPpm = 400000L),
      "a fully concentrated live feed must trigger the recluster")
    // recluster folded every increment EXCEPT the newest (the replay-
    // safety contract: the newest is the only one a crashed stream can
    // replay, so it must stay individually replaceable), kept every
    // vector, retrained over the full set, and probes serve
    val after = spark.read.parquet(s"$indexDir/vectors")
    assert(after.count() == rowsBefore, "recluster lost or duplicated vectors")
    val incs = after.select(col("increment").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(incs == Seq(0L, 2L),
      s"recluster must fold all but the newest increment: $incs")
    val centsAfter = spark.read.parquet(s"$indexDir/centroids")
      .select("cent_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(centsAfter != centsBefore, "recluster must retrain the centroids")
    // the advisor scenario: a crash between the recluster and the stream
    // checkpoint replays the newest append — it must REPLACE its (still
    // separate, now reassigned) partition, leaving index content and
    // row count unchanged rather than double-landing the batch
    val contentAfterRecluster = after
      .select(col("vec_id"), col("cell").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    Sim.appendIvfIndex(drifted, indexDir, increment = 2L)
    val replayed = spark.read.parquet(s"$indexDir/vectors")
      .select(col("vec_id"), col("cell").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(replayed == contentAfterRecluster,
      "a replayed newest append after a recluster must be invisible")
    val probes = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    val served = Sim.probeIvfIndex(probes, indexDir).collect()
    assert(served.nonEmpty && served.map(_.getLong(0)).distinct.length > 1,
      "probes must serve from the reclustered index")
  }

  test("IVF-PQ index lifecycle: frozen artifacts, idempotent appends, " +
      "compaction invisible to probes") {
    val e = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val indexDir = tmpDir("graft-ivfpq-ndx") + "/index"
    val base = e.filter(col("vec_id") % Sim.ANN_DELTA_MOD =!= 0)
    val delta = e.filter(col("vec_id") % Sim.ANN_DELTA_MOD === 0)
    Sim.buildIvfPqIndex(base, indexDir)
    val cbBefore = spark.read.parquet(s"$indexDir/codebook")
      .collect().map(_.toString).sorted.toSeq
    val centsBefore = spark.read.parquet(s"$indexDir/centroids")
      .select("cent_id").collect().map(_.getLong(0)).sorted.toSeq
    Sim.appendIvfPqIndex(delta, indexDir, increment = 1L)
    val once = spark.read.parquet(s"$indexDir/vectors").count()
    Sim.appendIvfPqIndex(delta, indexDir, increment = 1L)
    assert(spark.read.parquet(s"$indexDir/vectors").count() == once,
      "retried append must replace, not duplicate")
    assert(once == e.count(), "index must hold build + delta exactly once")
    // append must not retrain either frozen artifact
    assert(spark.read.parquet(s"$indexDir/codebook")
      .collect().map(_.toString).sorted.toSeq == cbBefore,
      "append retrained the codebook")
    assert(spark.read.parquet(s"$indexDir/centroids")
      .select("cent_id").collect().map(_.getLong(0)).sorted.toSeq
      == centsBefore, "append retrained the centroids")
    val probes = e.filter(col("vec_id") < Sim.PQ_PROBES)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    def top(): Seq[String] = Sim.probeIvfPqIndex(probes, indexDir)
      .collect().map(_.toString).toSeq
    val before = top()
    assert(before.nonEmpty)
    val filesBefore =
      IndexMaintenance.parquetFileCount(spark, s"$indexDir/vectors")
    Sim.compactIvfPqIndex(spark, indexDir)
    assert(top() == before, "probe results changed across compaction")
    assert(IndexMaintenance.parquetFileCount(spark, s"$indexDir/vectors")
      < filesBefore, "compaction must shrink the file pile")
    val incs = spark.read.parquet(s"$indexDir/vectors")
      .select(col("increment").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq
    assert(incs == Seq(0L), s"increments must fold into the build: $incs")
  }

  test("forgetVectors purges the vector store without touching frozen " +
      "artifacts: probes equal an index the vectors were never in") {
    val e = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val base = e.filter(col("vec_id") % Sim.ANN_DELTA_MOD =!= 0)
    val delta = e.filter(col("vec_id") % Sim.ANN_DELTA_MOD === 0)
    val indexDir = tmpDir("graft-ivf-forget") + "/index"
    Sim.buildIvfIndex(base, indexDir)
    Sim.appendIvfIndex(delta, indexDir, increment = 1L)
    val centsBefore = spark.read.parquet(s"$indexDir/centroids")
      .collect().map(_.toString).sorted.toSeq
    val deadIds = delta.filter(col("vec_id") % 2 === 0).select("vec_id")
    val removed = Sim.forgetVectors(spark, deadIds, indexDir)
    assert(removed == deadIds.count(), "every dead vector must purge")
    assert(spark.read.parquet(s"$indexDir/centroids")
      .collect().map(_.toString).sorted.toSeq == centsBefore,
      "deletion must not retrain the frozen centroids")
    // deleted ids drawn from the delta ⇒ centroids identical to an
    // index they were never appended to ⇒ probes must be bit-equal
    val cleanDir = tmpDir("graft-ivf-forget-clean") + "/index"
    Sim.buildIvfIndex(base, cleanDir)
    Sim.appendIvfIndex(delta.filter(col("vec_id") % 2 =!= 0), cleanDir,
      increment = 1L)
    val probes = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    assert(Sim.probeIvfIndex(probes, indexDir, nprobe = 2)
      .collect().map(_.toString).toSeq ==
      Sim.probeIvfIndex(probes, cleanDir, nprobe = 2)
        .collect().map(_.toString).toSeq,
      "purged index must serve exactly like never-ingested")
    assert(Sim.forgetVectors(spark, deadIds, indexDir) == 0L,
      "replayed forget must remove nothing")
  }

  test("IVF-PQ probe reads no corpus floats before the shortlist; " +
      "serving metrics ride the probe job") {
    // the PQ cost model: the ADC stage — whose candidate count grows
    // linearly with the corpus — must scan (vec_id, cell, code) only;
    // full-precision embeddings are read by a SEPARATE scan that joins
    // the broadcast top-RERANK shortlist. A scan reading both code and
    // embedding means floats ride the candidate stream again.
    val e = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val indexDir = tmpDir("graft-ivfpq-floats") + "/index"
    Sim.buildIvfPqIndex(e.filter(col("vec_id") % Sim.ANN_DELTA_MOD =!= 0),
      indexDir, avoid = Sim.ANN_DELTA_MOD)
    Sim.appendIvfPqIndex(e.filter(col("vec_id") % Sim.ANN_DELTA_MOD === 0),
      indexDir, increment = 1L)
    val probes = e.filter(col("vec_id") < Sim.PQ_PROBES)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    val (q, obs) = Sim.probeIvfPqIndexObserved(probes, indexDir)
    assert(q.collect().nonEmpty)
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
    val vecScans = scans(q.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString
        .contains("graft-ivfpq-floats")))
      .filter(!_.relation.location.rootPaths.exists(_.toString
        .matches(".*(centroids|codebook).*")))
    assert(vecScans.nonEmpty, "no scan over the index vectors found")
    val adcScans = vecScans.filter(_.requiredSchema.fieldNames.contains("code"))
    val rerankScans =
      vecScans.filter(_.requiredSchema.fieldNames.contains("embedding"))
    assert(adcScans.nonEmpty && rerankScans.nonEmpty,
      "probe must have distinct ADC and rerank scans")
    adcScans.foreach(s => assert(
      !s.requiredSchema.fieldNames.contains("embedding") &&
        !s.requiredSchema.fieldNames.contains("nrm"),
      s"ADC scan must not read floats: ${s.requiredSchema.fieldNames.toSeq}"))
    rerankScans.foreach(s => assert(
      !s.requiredSchema.fieldNames.contains("code"),
      s"rerank scan must not read codes: ${s.requiredSchema.fieldNames.toSeq}"))
    // and the ADC scan keeps the DPP file pruning (nprobe cells of files)
    val pruned = adcScans.filter(_.metrics.contains("staticFilesNum"))
    assert(pruned.nonEmpty, "ADC scan lost dynamic partition pruning")
    assert(pruned.map(_.metrics("numFiles").value).max <
      pruned.map(_.metrics("staticFilesNum").value).max,
      "ADC scan must not read the whole index")
    // serving metrics: candidates are bounded by the probed cells' total
    // occupancy and must cover at least the rerank shortlist; the probed
    // cell count is bounded by |probes| × nprobe distinct cells
    val m = obs.get
    val adcCandidates = m("adc_candidates").asInstanceOf[Long]
    val cellsProbed = m("cells_probed").asInstanceOf[Long]
    val n = e.count()
    assert(adcCandidates >= Sim.IVFPQ_RERANK.toLong && adcCandidates < n *
      Sim.IVFPQ_NPROBE,
      s"adc_candidates out of range: $adcCandidates")
    assert(cellsProbed >= 1L &&
      cellsProbed <= Sim.PQ_PROBES.toLong * Sim.IVFPQ_NPROBE,
      s"cells_probed out of range: $cellsProbed")
  }

  test("ivfpqTopK reranks exactly and joins everything broadcast") {
    val df = Sim.ivfpqTopK(spark, sf)
    val rows = df.collect()
    val byProbe = rows.groupBy(_.getLong(0))
    assert(byProbe.keySet == (0L until Sim.PQ_PROBES).toSet)
    byProbe.values.foreach { g =>
      assert(g.map(_.getLong(1)).sorted.sameElements(1L to Sim.IVF_TOP_K))
      // exact rerank ⇒ final order is by true cosine, not ADC
      val byRank = g.sortBy(_.getLong(1)).map(_.getDouble(4))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)))
    // the reported cosine IS the true cosine of that pair (the rerank read
    // full-precision floats for the shortlist)
    val e = engine.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val truth = df.select(col("probe_id"), col("neighbor_id"), col("cosine"))
      .join(e.select(col("vec_id").as("probe_id"), col("embedding").as("pv")),
        "probe_id")
      .join(e.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv")),
        "neighbor_id")
      .select((col("cosine") -
        engine.Num.round6(
          graft.functions.VecFns.dot(col("pv"), col("nv")) /
          (sqrt(graft.functions.VecFns.norm2(col("pv"))) *
            sqrt(graft.functions.VecFns.norm2(col("nv")))))).as("d"))
      .agg(max(abs(col("d")))).collect().head.getDouble(0)
    assert(truth == 0.0, s"rerank cosine must be the exact cosine: $truth")
    // scale shape: the corpus is never shuffled for a join — the ADC scan
    // and the rerank both take the probe side broadcast
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      "ivfpq must not sort-merge-join the corpus")
  }

  test("hybridRetrieval fuses ranks consistently; dense half matches brute force") {
    val rows = TextOps.hybridRetrieval(spark, sf).collect()
    val byProbe = rows.groupBy(_.getLong(0))
    assert(byProbe.keySet == (0L until TextOps.HR_PROBES.toLong).toSet)
    byProbe.values.foreach { g =>
      assert(g.map(_.getLong(1)).sorted.sameElements(1L to TextOps.HR_TOP_K))
    }
    rows.foreach { r =>
      val lex = if (r.isNullAt(3)) None else Some(r.getLong(3))
      val den = if (r.isNullAt(4)) None else Some(r.getLong(4))
      assert(lex.nonEmpty || den.nonEmpty, "a fused row must come from a list")
      // the fused score is exactly the two reciprocal contributions
      val expect = lex.map(v => 1.0 / (TextOps.HR_RRF_K + v)).getOrElse(0.0) +
        den.map(v => 1.0 / (TextOps.HR_RRF_K + v)).getOrElse(0.0)
      assert(math.abs(r.getDouble(5) - expect) < 1e-6)
    }
    // survivors carrying dense_rank <= TOP_K must agree with the exact
    // brute-force ranking (q20's baseline restricted to these probes)
    val brute = Sim.embeddingTopK(spark, sf)
      .filter(col("probe_id") < TextOps.HR_PROBES)
      .select(col("probe_id"), col("rank"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.filter(r => !r.isNullAt(4) && r.getLong(4) <= Sim.TOP_K).foreach { r =>
      assert(brute((r.getLong(0), r.getLong(4))) == r.getLong(2),
        s"dense rank disagrees with brute force for ${r}")
    }
  }

  test("lmScore is total, bounded, and its pair accounting is exact") {
    val rows = TextOps.lmScore(spark, sf).collect()
    // one row per doc with >= 2 tokens, n_pairs = tokens - 1
    val expected = engine.Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("nt"))
      .filter(col("nt") >= 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1) - 1)).toMap
    assert(rows.map(_.getLong(0)).toSet == expected.keySet)
    rows.foreach { r =>
      assert(r.getLong(2) == expected(r.getLong(0)), s"n_pairs wrong: $r")
      assert(r.getLong(3) >= 0 && r.getLong(3) <= r.getLong(2))
      val s = r.getDouble(4)
      assert(s > 0.0 && s < 1.0, s"mean bigram probability out of range: $s")
    }
  }

  test("incremental cluster labels equal the full recompute across " +
      "merged increments") {
    import org.apache.spark.sql.Row
    val all = Dedup.minhashNearDup(spark, sf)
      .select("doc_a", "doc_b").localCheckpoint()
    assert(all.count() > 3, "need enough pairs to split into increments")
    def batch(i: Int) = all.filter((col("doc_a") + col("doc_b")) % 3 === i)
    val labelDir = tmpDir("graft-cc-inc") + "/labels"
    Dedup.buildClusterLabels(batch(0), labelDir)
    Dedup.mergeClusterIncrement(spark, labelDir, batch(1))
    Dedup.mergeClusterIncrement(spark, labelDir, batch(2))
    val merged = Dedup.readClusterLabels(spark, labelDir)
      .collect().map { case Row(id: Long, label: Long) => (id, label) }
      .sorted.toSeq
    val full = Dedup.connectedComponents(
        all.select(col("doc_a").as("src"), col("doc_b").as("dst"))
          .unionAll(all.select(col("doc_b").as("src"), col("doc_a").as("dst"))))
      .collect().map { case Row(id: Long, label: Long) => (id, label) }
      .sorted.toSeq
    assert(merged == full,
      "incremental merges must reproduce the full transitive closure")
    // non-vacuity: some increment must have actually MERGED components
    // (same-batch-only closures would make this test prove nothing)
    val firstOnly = Dedup.connectedComponents(
        batch(0).select(col("doc_a").as("src"), col("doc_b").as("dst"))
          .unionAll(batch(0).select(col("doc_b").as("src"), col("doc_a").as("dst"))))
      .collect().map { case Row(id: Long, label: Long) => (id, label) }.toMap
    assert(full.exists { case (id, lbl) =>
      firstOnly.get(id).exists(_ != lbl) },
      "later increments must change at least one label")
    // merging an increment with no cross-component edges is a no-op
    val before = Dedup.readClusterLabels(spark, labelDir).collect()
      .map(_.toString).sorted.toSeq
    Dedup.mergeClusterIncrement(spark, labelDir, batch(1))
    assert(Dedup.readClusterLabels(spark, labelDir).collect()
      .map(_.toString).sorted.toSeq == before,
      "re-merging already-internal edges must change nothing")
  }

  test("maintained label store is built once per corpus and served to " +
      "every consumer: repeated and concurrent demands share one dir") {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val first = Dedup.lifecycleLabels(spark, sf)
    assert(Dedup.lifecycleLabels(spark, sf) == first,
      "a second consumer must serve from the maintained store, not rebuild")
    implicit val ec: ExecutionContext = ExecutionContext.global
    val dirs = Await.result(Future.sequence((1 to 4).map(_ =>
      Future(Dedup.lifecycleLabels(spark, sf)))), 2.minutes)
    assert(dirs.forall(_ == first),
      "concurrent consumers must share the one maintained store")
    // and the shared store really is the merged lifecycle state: it
    // serves the exact clusters the full recomputation derives
    assert(Dedup.lifecycleDupClusters(spark, sf).collect().map(_.toSeq).toSeq
      == Dedup.dupClusters(spark, sf).orderBy("doc_id")
        .collect().map(_.toSeq).toSeq,
      "maintained store must serve the full-recompute clusters")
  }

  test("label lifecycle bootstraps from an empty table: empty reads are " +
      "legal and a first merge IS the increment's closure") {
    val labelDir = tmpDir("graft-cc-empty") + "/labels"
    // a missing/file-less label dir reads as the empty (all-singleton)
    // state, not a schema-inference failure
    assert(Dedup.readClusterLabels(spark, labelDir).count() == 0)
    // the keep-list off the empty table keeps every document
    Dedup.dedupKeepListFrom(spark, sf, labelDir).collect().foreach { r =>
      assert(r.getLong(2) == r.getLong(1) && r.getLong(3) == 0L,
        s"empty labels must keep everything: $r")
    }
    // merging the first increment into the empty table = that
    // increment's own transitive closure (all ids fresh)
    val pairs = Dedup.minhashNearDup(spark, sf)
      .select("doc_a", "doc_b").localCheckpoint()
    Dedup.mergeClusterIncrement(spark, labelDir, pairs)
    assert(Dedup.readClusterLabels(spark, labelDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Dedup.dupClusters(spark, sf).select("doc_id", "cluster_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq,
      "bootstrap-by-increment must equal the closure")
  }

  test("containmentDedup catches doc-in-doc pairs the Jaccard gate misses") {
    val rows = Dedup.containmentDedup(spark, sf).collect()
    // planted half-docs: (orig, orig+50000000) pairs with containment ≈ 1
    val planted = rows.filter(r =>
      r.getLong(1) == r.getLong(0) + 50000000L)
    assert(planted.nonEmpty, "bottom-k sketch must surface half-doc plants")
    planted.foreach { r =>
      assert(r.getDouble(3) >= Dedup.CONT_T, s"containment too low: $r")
    }
    // the operator's raison d'être: some caught pair FAILS the 0.8
    // Jaccard near-dup gate (prefix-half ⇒ jaccard ≈ ratio ≈ 0.5)
    assert(planted.exists(_.getDouble(2) < 0.8),
      "a containment pair below the Jaccard gate must exist")
    rows.foreach { r =>
      assert(r.getDouble(3) >= r.getDouble(2) - 1e-9,
        s"containment dominates jaccard by definition: $r")
    }
  }

  test("lshRecall: hits and candidates are monotone along the geometry " +
      "chain; production (4,3) is measured") {
    // the settings chain (12,1)…(1,12) has provable subset structure: a
    // band match at geometry g implies a band match at every finer
    // geometry (each aligned r-slot window contains an aligned window of
    // the finer split), so candidates and hits must be non-increasing as
    // bands shrink — a violation means the banding arithmetic is wrong
    val rows = Dedup.lshRecall(spark, sf).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Dedup.LSH_SETTINGS.map { case (b, r) => (b.toLong, r.toLong) },
      "one row per measured geometry, coarse→fine")
    val nTrue = rows.map(_.getLong(2)).distinct
    assert(nTrue.length == 1 && nTrue.head > 0,
      "planted corpus must yield a fixed, nonzero ground-truth pair set")
    val cands = rows.map(_.getLong(3))
    val hits = rows.map(_.getLong(4))
    assert(cands.zip(cands.tail).forall { case (a, b) => a >= b },
      s"candidates must shrink as bands coarsen: ${cands.toSeq}")
    assert(hits.zip(hits.tail).forall { case (a, b) => a >= b },
      s"hits must shrink as bands coarsen: ${hits.toSeq}")
    // exact-copy plants (mod-13) collide in EVERY geometry: recall of the
    // all-rows band is still nonzero
    assert(hits.last > 0, "exact-copy plants must survive the (1,12) band")
    // the production geometry's recall is the one the near-dup family
    // rides — it must not be the weakest point of the curve
    val prod = rows.find(r => r.getLong(0) == TextFns.BANDS.toLong).get
    assert(prod.getLong(4) >= hits.last,
      "production (BANDS,R) recall must dominate the all-rows band")
  }

  test("winnowing guarantee: a shared substring ≥ W+K-1 chars shares a " +
      "fingerprint; identical docs pair at overlap 1.0; disjoint docs never") {
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, "alpha beta " + shared + " gamma delta"),
      (2L, "omega psi " + shared + " chi phi rho sigma tau"),
      (3L, "totally unrelated content with no common run at all zzz qqq"),
      (4L, "alpha beta " + shared + " gamma delta"))
      .toDF("doc_id", "text")
    // the guarantee operates on the raw fingerprint channel (pre-gates):
    // any substring of length ≥ WINNOW_W + WINNOW_K - 1 contributes at
    // least one common selected fingerprint
    val byF = Dedup.winnowRows(docs)
      .groupBy("f").agg(collect_set("doc_id").as("ds"))
      .collect().map(_.getSeq[Long](1).toSet)
    assert(byF.exists(s => s.contains(1L) && s.contains(2L)),
      "docs sharing a 59-char substring must share a fingerprint")
    assert(!byF.exists(s => s.contains(3L) && s.size > 1),
      "the disjoint doc shares no fingerprint with anyone")
    val pairs = Dedup.winnowPairsOf(docs).collect()
    val p14 = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 4L)
    assert(p14.isDefined, "identical docs must pair")
    assert(p14.get.getDouble(5) == 1.0, "identical docs overlap exactly 1.0")
    assert(p14.get.getLong(2) == p14.get.getLong(3),
      "identical docs share their whole fingerprint set")
    assert(!pairs.exists(r => r.getLong(0) == 3L || r.getLong(1) == 3L))
  }

  test("winnowing fingerprint pass is map-only: no exchange below the " +
      "fingerprint aggregation") {
    // the windowed-min runs INSIDE the gram array (transform+slice), so
    // the per-document fingerprint stream must not cost a Window or an
    // extra shuffle: the plan's only exchanges are the df gate, the
    // bucket self-join, and the pair aggregation — all ABOVE winnowRows
    val plan = Dedup.winnowRows(
      Seq((1L, "a b c d e f g h i j k l m n o p")).toDF("doc_id", "text"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"),
      s"fingerprint selection must not use a window function:\n$plan")
    assert(!plan.toLowerCase.contains("repartition") ||
      plan.toLowerCase.contains("spread"), "no explicit repartition")
  }

  test("bpeTrain learns the hand-derivable merge sequence and " +
      "greedy-left-to-right fold semantics") {
    // histogram: the:10 then:5 hen:4 tent:3 — pair counts round 1:
    // (h,e)=19, (t,h)=15, (e,n)=9, (t,e)=3, (n,t)=3 → merge (h,e);
    // round 2: (t,he)=15 dominates; round 3: (the,n)=5
    val words = Seq(
      ("the", 10L), ("then", 5L), ("hen", 4L), ("tent", 3L))
      .toDF("word", "freq")
      .select(col("word"), col("freq"),
        filter(split(col("word"), ""), c => length(c) > 0).as("syms"))
    val m = TextOps.bpeTrain(spark, words, 3).collect()
    assert(m.map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getString(3), r.getLong(4))).toSeq == Seq(
      (1L, "h", "e", "he", 19L),
      (2L, "t", "he", "the", 15L),
      (3L, "the", "n", "then", 5L)))
  }

  test("bpeMerges invariants: BPE_MERGES ranked rows, counts " +
      "non-increasing, merged is the concatenation") {
    val m = TextOps.bpeMerges(spark, sf).collect()
    assert(m.length == TextOps.BPE_MERGES)
    assert(m.map(_.getLong(0)).toSeq == (1L to TextOps.BPE_MERGES.toLong))
    assert(m.forall(r => r.getString(3) == r.getString(1) + r.getString(2)))
    val ns = m.map(_.getLong(4))
    // a merged symbol's successor pairs inherit at most the merged pair's
    // occurrences, so the greedy max can never rise round-over-round
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b },
      s"merge counts must be non-increasing: ${ns.toSeq}")
    assert(ns.forall(_ > 0))
  }

  test("winnow index probe equals the full recompute on delta-involving " +
      "pairs; replayed append is invisible") {
    import org.apache.spark.sql.functions.{col, concat, length, lit}
    val d = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val plants = d.filter(col("doc_id") % Dedup.WINNOW_PLANT_MOD === 0)
      .select((col("doc_id") + 60000000L).as("doc_id"),
        concat(lit("zq"), col("doc_id").cast("string"), lit(" "),
          col("text").substr(lit(1), lit(Dedup.WINNOW_PLANT_CHARS)))
          .as("text"))
    val wDir = tmpDir("winnow-spec")
    Dedup.buildWinnowIndex(d.filter(col("doc_id") % 2 === 0), wDir)
    Dedup.appendWinnowIndex(d.filter(col("doc_id") % 2 === 1), wDir, 1L)
    val probe = Dedup.probeWinnowIndex(spark, plants, wDir)
      .orderBy("doc_a", "doc_b").collect()
    // the full in-plan recompute over the augmented corpus, restricted
    // to delta-involving pairs, must be IDENTICAL — same pairs, same
    // shared counts, same overlaps
    val full = Dedup.winnowPairsOf(d.unionByName(plants))
      .filter(col("doc_b") >= 60000000L)
      .orderBy("doc_a", "doc_b").collect()
    assert(probe.map(_.toSeq).toSeq == full.map(_.toSeq).toSeq)
    assert(probe.nonEmpty, "plants must pair with their sources")
    // every plant long enough to carry the guarantee pairs with its source
    val longSources = d
      .filter(col("doc_id") % Dedup.WINNOW_PLANT_MOD === 0 &&
        length(col("text")) >= Dedup.WINNOW_PLANT_CHARS)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val paired = probe.map(r => (r.getLong(0), r.getLong(1))).toSet
    longSources.foreach { s =>
      assert(paired.contains((s, s + 60000000L)),
        s"plant of doc $s must pair with its source") }
    // replay: re-appending the same increment (dynamic overwrite) and
    // re-probing must not change a single row
    Dedup.appendWinnowIndex(d.filter(col("doc_id") % 2 === 1), wDir, 1L)
    val again = Dedup.probeWinnowIndex(spark, plants, wDir)
      .orderBy("doc_a", "doc_b").collect()
    assert(again.map(_.toSeq).toSeq == probe.map(_.toSeq).toSeq)
  }

  test("bpeFertility: training strictly compresses the corpus vs the " +
      "untrained (all-chars) tokenization; accounting conserved") {
    val f = TextOps.bpeFertility(spark, sf).collect()
    assert(f.nonEmpty)
    f.foreach { r =>
      val (words, toks, oov) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(toks >= words, "every word is at least one token")
      assert(oov <= words)
      assert(r.getDouble(4) ==
        math.round(toks.toDouble / words.toDouble * 1e6) / 1e6)
    }
    // untrained baseline: every word tokenizes to its characters — merges
    // can only shorten in-histogram words, never lengthen anything
    val untrained = Tables.documents(spark, sf)
      .select(explode(TextFns.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .agg(sum(length(col("w")).cast("long"))).collect()(0).getLong(0)
    val trainedTotal = f.map(_.getLong(2)).sum
    assert(trainedTotal < untrained,
      s"10 merges must compress: $trainedTotal !< $untrained")
  }

  test("stride centroid pick survives a modulus divisible by the " +
      "population's exclusion (the r12 x100 empty-baseline bug)") {
    // The drift baseline excludes vec_id % 9 == 0. Sized so the stride
    // modulus lands EXACTLY on a multiple of 9 — 200,000 ids minus the
    // 22,223 excluded = 177,777 rows -> m = ceil(177777/80) = 2223 =
    // 9*247 — every multiple of m is excluded and the unadjusted pick
    // is mathematically EMPTY (found by the x100 sweep; invisible at
    // the sf0.01 oracle scale where m = 25). `avoid` bumps such a
    // modulus by one, restoring the <= K bound with a coprime stride.
    val pop = spark.range(0, 200000).toDF("vec_id")
      .filter(col("vec_id") % 9 =!= 0)
      .withColumn("embedding", array(lit(1.0f), lit(2.0f)))
      .withColumn("nrm", lit(1.0))
    assert(Sim.strideCentroids(pop).count() == 0,
      "the hazard must be real: the unadjusted pick is empty here")
    val adjusted = Sim.strideCentroids(pop, avoid = 9L)
    val n = adjusted.count()
    assert(n > 0 && n <= 200000 / 2223,
      s"adjusted pick must be nonempty and stride-bounded, got $n")
    // and the adjustment is a NO-OP whenever the modulus is already
    // coprime — the oracle-compatibility guarantee at the gated scales
    val small = spark.range(0, 500).toDF("vec_id")
      .filter(col("vec_id") % 9 =!= 0)
      .withColumn("embedding", array(lit(1.0f), lit(2.0f)))
      .withColumn("nrm", lit(1.0))
    assert(Sim.strideCentroids(small, avoid = 9L).collect().map(_.getLong(0))
      .sameElements(Sim.strideCentroids(small).collect().map(_.getLong(0))))
  }
}
