package graft

import org.apache.spark.sql.functions._

import graft.engine.{Graph, Kpis, TextOps}
import graft.streaming.{AsOfStream, EventsStream}

/** Round-11 operator pins: the streaming oracle probes (q201/q202/q205)
  * against their batch twins, the KMV pairwise estimator (q206), k-core
  * peeling (q207), and the q195 deployment-path flag. The replay probes
  * are lineage-cached per corpus dir (the q180 contract), so these tests
  * share the build with the Verify run when executed in one JVM. */
class RoundElevenSpec extends SparkSpecBase {

  test("q201 probe: totals equal the batch sessionization; batches are 0..2") {
    val got = EventsStream.streamSessionsProbe(spark, sf).collect()
    assert(got.nonEmpty)
    assert(got.forall(r => r.getLong(3) >= 0 && r.getLong(3) <= 2),
      "last_batch outside the three-slice replay")
    val batch = Kpis.eventSessions(spark, sf)
      .select("user_id", "n_events", "n_sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gotTriples = got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(gotTriples.sorted.sameElements(batch.sorted),
      "streamed per-user totals must equal the lag-window batch query")
  }

  test("q202 probe: every click answered once per direction; matches obey the contract") {
    val got = AsOfStream.streamAsOfProbe(spark, sf).collect()
    val ev = graft.engine.Tables.events(spark, sf)
    val nClicks = ev.filter(col("event_type") === "click").count()
    val byDir = got.groupBy(_.getString(0))
    assert(byDir.keySet == Set("backward", "forward", "nearest"))
    byDir.foreach { case (d, rows) =>
      assert(rows.length == nClicks,
        s"direction=$d: ${rows.length} emissions != $nClicks clicks (flush " +
          "heartbeat must finalize every probe exactly once)")
    }
    // contract spot-check: backward matches are purchases at-or-before
    // the click within tolerance, on the same user
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    byDir("backward").filter(!_.isNullAt(4)).foreach { r =>
      val (user, clickUs, m) = (r.getLong(1), r.getLong(3), r.getLong(4))
      val (pUser, pUs) = purch(m)
      assert(pUser == user && pUs <= clickUs &&
        clickUs - pUs <= AsOfStream.SS_TOL_US)
    }
  }

  test("q205 probe: scrambled-arrival session windows equal the batch session counts") {
    val got = EventsStream.streamSessionWindowsProbe(spark, sf).collect()
    assert(got.nonEmpty)
    val perUser = got.groupBy(_.getLong(0))
      .map { case (u, rows) => (u, rows.length.toLong, rows.map(_.getLong(3)).sum) }
    val batch = Kpis.eventSessions(spark, sf)
      .select("user_id", "n_sessions", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(perUser.toSeq.sorted.sameElements(batch.toSeq.sorted),
      "per-user (n_sessions, n_events) must survive out-of-order replay")
  }

  test("q206: KMV pairwise overlap is exact bottom-k algebra and brackets true Jaccard") {
    val rows = TextOps.kmvSourceOverlap(spark, sf).collect()
    val nSources = graft.engine.Tables.documents(spark, sf)
      .select("source").distinct().count()
    assert(rows.length == nSources * (nSources - 1) / 2, "all unordered pairs")
    rows.foreach { r =>
      val (nc, nm, ppm) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nc >= 0 && nc <= nm && nm <= TextOps.KMV_K)
      assert(ppm == nc * 1000000L / nm, "estimate is the exact integer ratio")
    }
    // the estimator must track reality: compare against exact vocabulary
    // Jaccard per pair, within the loose 1/sqrt(k) KMV band (k=64 → ±0.125,
    // widened ×2 for small-sketch noise)
    import graft.functions.TextFns
    val vocab = graft.engine.Tables.documents(spark, sf)
      .select(col("source"), explode(TextFns.shingleHashes(col("text"))).as("h"))
      .distinct().collect().groupBy(_.getString(0))
      .map { case (s, hs) => s -> hs.map(_.getLong(1)).toSet }
    var worst = 0.0
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (va, vb) = (vocab(a), vocab(b))
      val exact = (va & vb).size.toDouble / (va | vb).size
      val est = r.getLong(4) / 1e6
      worst = math.max(worst, math.abs(est - exact))
    }
    assert(worst <= 0.25, s"KMV estimate drifted $worst from exact Jaccard")
  }

  test("q207: k-core is the fixpoint a driver-side peel reaches") {
    val got = Graph.kCore(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent driver-side peel over the same kNN edge list
    val e0 = Graph.knnEdgesFrom(
        Graph.coSupplyEdges(spark, sf).localCheckpoint())
      .select("s1", "s2").collect().map(r => (r.getLong(0), r.getLong(1)))
    var edges = e0.toSet
    var changed = true
    while (changed) {
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (n, o) => n -> o.size }
      val keep = deg.filter(_._2 >= Graph.KCORE_K).keySet
      val next = edges.filter(e => keep(e._1) && keep(e._2))
      changed = next != edges
      edges = next
    }
    val expDeg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, o) => n -> o.size.toLong }
    assert(got == expDeg, "engine k-core != driver-side peel fixpoint")
    assert(got.nonEmpty && got.values.forall(_ >= Graph.KCORE_K),
      "every member has >= K neighbours inside the core")
  }

  private def sliceBounds(): (Long, Long) = {
    val ev = graft.engine.Tables.events(spark, sf)
    val r = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .head()
    (r.getLong(0), r.getLong(1) - r.getLong(0) + 1)
  }
  private def sliceOf(us: Long, tmin: Long, span: Long): Long =
    math.min(2L, (us - tmin) * 3 / span)

  test("q208 probe: pairs equal the batch interval join; batch stamps the later member") {
    val got = EventsStream.streamIntervalJoinProbe(spark, sf).collect()
    assert(got.nonEmpty)
    val ev = graft.engine.Tables.events(spark, sf)
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id").as("cu"),
        unix_micros(col("ts")).as("cus"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("pu"),
        unix_micros(col("ts")).as("pus"))
    val batch = c.join(p, col("cu") === col("pu") &&
        col("pus") >= col("cus") &&
        col("pus") <= col("cus") + 3600L * 1000000L)
      .select("cid", "pid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.map(r => (r.getLong(0), r.getLong(1))).sorted
      .sameElements(batch.sorted), "streamed pair set != batch interval join")
    val (tmin, span) = sliceBounds()
    got.foreach { r =>
      val want = math.max(sliceOf(r.getLong(3), tmin, span),
        sliceOf(r.getLong(4), tmin, span))
      assert(r.getLong(6) == want,
        s"pair (${r.getLong(0)},${r.getLong(1)}) emitted in batch " +
          s"${r.getLong(6)}, later member arrived in $want")
    }
  }

  test("q209 probe: row-grain as-of sink aggregates back to q126") {
    val got = AsOfStream.streamAsOfSinkProbe(spark, sf)
    val agg = got.groupBy(col("nk"))
      .agg(count(lit(1)).as("n_events"),
        count(col("rate_id")).as("n_matched"),
        sum(col("rate_id")).as("sum_rate_ids"))
      .orderBy("nk").collect().map(_.toSeq)
    val q126 = Kpis.eventNationRateAsof(spark, sf).collect().map(_.toSeq)
    assert(agg.sameElements(q126),
      "per-nk aggregates of the streamed rows must equal the batch as-of")
    // arrival-batch law: each probe answered in its own slice's batch
    val (tmin, span) = sliceBounds()
    val tsById = graft.engine.Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts"))).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.collect().foreach { r =>
      assert(r.getLong(3) == sliceOf(tsById(r.getLong(0)), tmin, span))
    }
  }

  test("q210 probe: complete-mode final state equals the batch histogram") {
    val got = EventsStream.streamDriftProbe(spark, sf).collect().map(_.toSeq)
    val batch = graft.engine.Tables.events(spark, sf)
      .select(col("event_type"),
        expr(s"least(CAST(round(value * 100) AS BIGINT) div " +
          s"${EventsStream.DRIFT_BUCKET_CENTS}L, " +
          s"${EventsStream.DRIFT_MAX_BUCKET}L)").as("bucket"))
      .groupBy("event_type", "bucket").agg(count(lit(1)).as("n"))
      .orderBy("event_type", "bucket").collect().map(_.toSeq)
    assert(got.sameElements(batch))
  }

  test("q211: streamed postings + mid-stream compaction serve == one batch-built index") {
    import graft.streaming.TermIndexStream
    import graft.engine.{TermIndex, TextOps}
    val streamed = TermIndexStream.streamTermIndexProbe(spark, sf)
      .collect().map(_.toSeq)
    val batchDir = graft.engine.IndexMaintenance
      .scratchIndexDir(spark, "r11-ti-batch")
    TermIndex.buildTermIndex(
      graft.engine.Tables.documents(spark, sf).select("doc_id", "text"),
      batchDir)
    val batch = TermIndex.probeTermIndex(spark, TermIndexStream.ST_TERMS,
      batchDir, TextOps.RETRIEVAL_TOP_K).collect().map(_.toSeq)
    assert(streamed.nonEmpty && streamed.sameElements(batch),
      "streamed ingest (3 increments + a compaction) must serve exactly " +
        "what a single batch build serves")
  }

  test("q212: streamed ingest+serving == the batch index lifecycle row-for-row") {
    import graft.streaming.VecIndexStream
    import graft.engine.Sim
    val streamed = VecIndexStream.streamVecIndexProbe(spark, sf)
      .collect().map(_.toSeq)
    val batch = Sim.ivfIndexProbe(spark, sf).collect().map(_.toSeq)
    assert(streamed.nonEmpty && streamed.sameElements(batch))
  }

  test("q195 deployment flag drops only the validation column") {
    val before = TextOps.kmvDistinctShingles(spark, sf).collect()
    // per-call scoping: no shared (JVM- or session-) state is mutated, so
    // concurrently running suites can never observe the deployment flag.
    val after = TextOps.kmvDistinctShingles(spark, sf, exact = false).collect()
    assert(after.length == before.length)
    assert(after.forall(_.isNullAt(1)), "n_exact must be null when gated off")
    // sketch columns are byte-identical with the flag off
    def sk(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getString(0), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(sk(after).sameElements(sk(before)))
  }
}
