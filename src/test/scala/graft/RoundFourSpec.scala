package graft

import org.apache.spark.sql.functions._

import graft.engine.{Kpis, Sim, SourceOps, Tables, TextOps}

/** Invariants for the round-4 operators (q71–q76) — properties the oracle
  * hash-match can't express: geometric coverage, idempotence, conservation
  * of counts. */
class RoundFourSpec extends SparkSpecBase {

  test("repetition ratio is in [0,1) and distinct never exceeds total") {
    val r = TextOps.repetition(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (n, d) = (row.getAs[Long]("n_shingles"),
        row.getAs[Long]("n_distinct_shingles"))
      val ratio = row.getAs[Double]("rep_ratio")
      assert(d >= 1 && d <= n)
      assert(ratio >= 0.0 && ratio < 1.0)
      assert(row.getAs[Boolean]("repetitive") == (ratio > TextOps.REP_T))
    }
    // the tiny-vocab corpus must actually exercise both regimes
    assert(r.exists(_.getAs[Double]("rep_ratio") > 0.0))
  }

  test("PII: every planted doc is detected, redaction is idempotent") {
    val agg = TextOps.piiScan(spark, sf).collect()
    val planted = Tables.documents(spark, sf)
      .filter(col("doc_id") % TextOps.PII_EVERY === 0).count()
    assert(agg.map(_.getAs[Long]("n_docs_with_pii")).sum == planted)
    assert(agg.map(_.getAs[Long]("total_emails")).sum == planted)
    assert(agg.map(_.getAs[Long]("total_phones")).sum == planted)
    // redacted text is strictly shorter overall (tags < planted strings)
    assert(agg.map(_.getAs[Long]("total_chars_redacted")).sum <
      agg.map(_.getAs[Long]("total_chars_raw")).sum)
    // idempotence: scrubbing already-scrubbed text is a no-op (the tags
    // contain no characters the patterns can match)
    def scrub(c: org.apache.spark.sql.Column) =
      regexp_replace(regexp_replace(c, TextOps.EMAIL_RE, "<EMAIL>"),
        TextOps.PHONE_RE, "<PHONE>")
    val twice = Tables.documents(spark, sf)
      .select(scrub(col("text")).as("once"))
      .select(sum(when(scrub(col("once")) === col("once"), 0L).otherwise(1L)))
      .collect()(0).getLong(0)
    assert(twice == 0L)
  }

  test("chunks tile each document: stride-aligned starts, full coverage") {
    val chunks = TextOps.docChunks(spark, sf).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val lens = Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chunks.keySet == lens.keySet)
    chunks.foreach { case (docId, cs) =>
      val sorted = cs.sortBy(_.getAs[Long]("chunk_idx"))
      val len = lens(docId)
      sorted.zipWithIndex.foreach { case (c, i) =>
        assert(c.getAs[Long]("chunk_idx") == i + 1)
        assert(c.getAs[Long]("chunk_start") ==
          i.toLong * TextOps.CHUNK_STRIDE + 1)
        val expectLen = math.min(TextOps.CHUNK_SIZE,
          len - c.getAs[Long]("chunk_start") + 1)
        assert(c.getAs[Long]("chunk_len") == expectLen)
      }
      // the last chunk reaches the end of the text
      val last = sorted.last
      assert(last.getAs[Long]("chunk_start") + last.getAs[Long]("chunk_len")
        - 1 == len)
      // every start is within the text (no empty trailing chunks)
      assert(sorted.forall(_.getAs[Long]("chunk_start") <= len))
    }
  }

  test("schema evolution: rows conserved, null accounting exact") {
    val rows = SourceOps.schemaEvolution(spark, sf).collect()
    val nOrders = Tables.orders(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == nOrders)
    rows.foreach { r =>
      if (r.getAs[String]("status") == "<legacy>") {
        // v1 rows all carry a price and no status/priority
        assert(r.getAs[Long]("n_missing_price") == 0L)
        assert(r.getAs[Long]("n_priorities") == 0L)
      } else {
        // v2 rows never carry a price
        assert(r.getAs[Long]("n_missing_price") == r.getAs[Long]("n_rows"))
        assert(r.getAs[Double]("revenue") == 0.0)
      }
    }
  }

  test("inverted index: df conservation and sorted posting heads") {
    val idx = TextOps.invertedIndex(spark, sf).collect()
    // Σ df == total distinct (doc, term) pairs
    val pairCount = Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(array_distinct(graft.functions.TextFns.tokens(col("text"))))
          .as("term"))
      .count()
    assert(idx.map(_.getAs[Long]("df")).sum == pairCount)
    idx.foreach { r =>
      val head = r.getAs[String]("postings_head")
        .split(",").filter(_.nonEmpty).map(_.toLong)
      assert(head.length == math.min(r.getAs[Long]("df"),
        TextOps.POSTINGS_HEAD.toLong))
      assert(head.sameElements(head.sorted))
      assert(head.headOption.contains(r.getAs[Long]("min_doc_id")))
    }
  }

  test("semantic dedup: vectors conserved, canonical never dropped") {
    val cells = Sim.semanticDedup(spark, sf).collect()
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(cells.map(_.getAs[Long]("n_vectors")).sum == nVecs)
    cells.foreach { r =>
      // the canonical member can't drop itself
      assert(r.getAs[Long]("n_dropped") <= r.getAs[Long]("n_vectors") - 1)
      // canonical is a real member of the cell: its self-cosine is 1
      // (within round6), so the max over the cell is bounded by it
      assert(r.getAs[Double]("min_cos") <= 1.0)
    }
    // the threshold actually separates: some cells drop, some keep all
    assert(cells.exists(_.getAs[Long]("n_dropped") > 0))
  }

  test("retrieval top-k: monotone scores, hits really contain probe terms") {
    val top = TextOps.retrievalTopK(spark, sf).collect()
    assert(top.length == TextOps.RETRIEVAL_TOP_K)
    assert(top.map(_.getAs[Long]("rank")).toSeq ==
      (1L to TextOps.RETRIEVAL_TOP_K))
    val scores = top.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    top.foreach(r => assert(r.getAs[Long]("n_terms_hit") >= 1 &&
      r.getAs[Long]("n_terms_hit") <= TextOps.PROBE_TERMS.length))
    // spot-check: every returned doc really contains at least one probe term
    val ids = top.map(_.getAs[Long]("doc_id")).toSeq
    val hits = Tables.documents(spark, sf)
      .filter(col("doc_id").isin(ids: _*))
      .select(col("doc_id"), graft.functions.TextFns.tokens(col("text")).as("w"))
      .collect()
    assert(hits.length == ids.length)
    hits.foreach { r =>
      val toks = r.getSeq[String](1).toSet
      assert(TextOps.PROBE_TERMS.exists(toks.contains))
    }
  }

  test("cdc merge: rows conserve snapshot - deletes + inserts, no tombstones") {
    val m = Kpis.cdcMergeApply(spark, sf).collect()
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("k"), year(col("o_orderdate")).as("y"))
    val nSnap = o.filter(col("y") <= 1995).count()
    val nIns = o.filter(col("y") >= 1996).count()
    val nDel = o.filter(col("y") <= 1995 &&
      col("k") % Kpis.MERGE_DEL_EVERY === 0).count()
    val nUpd = o.filter(col("y") <= 1995 &&
      col("k") % Kpis.MERGE_UPD_EVERY === 0 &&
      col("k") % Kpis.MERGE_DEL_EVERY =!= 0).count()
    def rows(p: String) = m.filter(_.getAs[String]("provenance") == p)
      .map(_.getAs[Long]("n_rows")).sum
    assert(rows("inserted") == nIns)
    assert(rows("updated") == nUpd)
    assert(rows("unchanged") == nSnap - nDel - nUpd)
    assert(m.map(_.getAs[Long]("n_rows")).sum == nSnap - nDel + nIns)
  }

  test("funnel stages are monotone and stage 1 counts first-touch users") {
    val f = Kpis.eventFunnel(spark, sf).collect()
      .sortBy(_.getAs[Long]("stage")).map(_.getAs[Long]("n_users"))
    assert(f.length == Kpis.FUNNEL_STAGES.length)
    assert(f.zip(f.tail).forall { case (a, b) => a >= b },
      "a later funnel stage can never exceed an earlier one")
    val signups = Tables.events(spark, sf)
      .filter(col("event_type") === Kpis.FUNNEL_STAGES.head)
      .select("user_id").distinct().count()
    assert(f.head == signups)
  }

  test("retention: week-0 cell holds the full cohort, grid conserves user-weeks") {
    val grid = Kpis.retentionCohorts(spark, sf).collect()
    // every user is active in their own cohort week by definition
    grid.groupBy(_.getAs[java.sql.Date]("cohort_week").toString)
      .foreach { case (_, rows) =>
        assert(rows.exists(_.getAs[Long]("weeks_since") == 0L))
        val w0 = rows.filter(_.getAs[Long]("weeks_since") == 0L)
          .map(_.getAs[Long]("n_users")).sum
        assert(rows.forall(_.getAs[Long]("n_users") <= w0),
          "no later week can retain more users than the cohort started with")
      }
    // Σ n_users over the grid = distinct (user, active-week) pairs
    val pairs = Tables.events(spark, sf)
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("w"))
      .distinct().count()
    assert(grid.map(_.getAs[Long]("n_users")).sum == pairs)
  }

  test("variant path extraction agrees with the map-typed JSON path") {
    // three faces of the same JSON column must extract identical values
    val v = SourceOps.variantProps(spark, sf)
      .select("event_type", "n_events", "total_k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val m = SourceOps.mapProps(spark, sf)
      .select("event_type", "n_events", "total_k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(v.sameElements(m))
  }

  test("unpivot emits one row per (entity, metric), values preserved") {
    val long = Kpis.nationMetricsLong(spark, sf).collect()
    val nNations = Tables.nation(spark, sf).count()
    assert(long.length == nNations * 2)
    assert(long.map(_.getAs[String]("metric")).toSet ==
      Set("n_orders", "revenue"))
    // the long form conserves the wide totals
    val totalOrders = long.filter(_.getAs[String]("metric") == "n_orders")
      .map(_.getAs[Double]("value")).sum
    assert(totalOrders == Tables.orders(spark, sf).count().toDouble)
  }

  test("reconciliation: key universe and per-side totals conserve") {
    val rows = Kpis.reconciliation(spark, sf).collect()
      .map(r => r.getAs[String]("side") ->
        (r.getAs[Long]("n_keys"), r.getAs[Long]("total_orders"),
          r.getAs[Long]("total_events"))).toMap
    val orderKeys = Tables.orders(spark, sf).select("o_custkey")
      .distinct().collect().map(_.getAs[Number](0).longValue).toSet
    val eventKeys = Tables.events(spark, sf).select("user_id")
      .distinct().collect().map(_.getAs[Number](0).longValue).toSet
    def n(side: String) = rows.get(side).map(_._1).getOrElse(0L)
    assert(n("both") == (orderKeys & eventKeys).size)
    assert(n("orders_only") == (orderKeys -- eventKeys).size)
    assert(n("events_only") == (eventKeys -- orderKeys).size)
    assert(rows.values.map(_._2).sum == Tables.orders(spark, sf).count())
    assert(rows.values.map(_._3).sum == Tables.events(spark, sf).count())
  }

  test("int8 quant: codes in [-127,127], absmax hits the rail, error ≤ scale/254") {
    val rows = Sim.int8Quant(spark, sf).collect()
    assert(rows.length == Tables.embeddings(spark, sf).count())
    rows.foreach { r =>
      val (qMin, qMax) = (r.getAs[Long]("q_min"), r.getAs[Long]("q_max"))
      assert(qMin >= -Sim.QUANT_LEVELS && qMax <= Sim.QUANT_LEVELS)
      // the absmax component maps exactly onto a rail
      assert(math.max(math.abs(qMin), qMax) == Sim.QUANT_LEVELS)
      // half-step reconstruction bound (round6 on both sides → 1 ulp slack)
      val scale = r.getAs[Double]("scale")
      assert(r.getAs[Double]("max_abs_err") <=
        scale / (2 * Sim.QUANT_LEVELS) + 2e-6)
    }
  }

  test("gap fill: complete nation-month lattice, zero-filled gaps flagged") {
    val rows = Kpis.gapFill(spark, sf).collect()
    val nNations = Tables.nation(spark, sf).count()
    val months = rows.map(_.getAs[java.sql.Date]("month").toString).distinct
    assert(rows.length == nNations * months.length)
    // every nation covers every month exactly once — no holes, no dups
    rows.groupBy(_.getAs[String]("n_name")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[java.sql.Date]("month").toString).distinct
        .length == months.length)
    }
    rows.foreach { r =>
      assert(r.getAs[Boolean]("is_gap") == (r.getAs[Long]("n_orders") == 0L))
      if (r.getAs[Boolean]("is_gap")) assert(r.getAs[Double]("revenue") == 0.0)
    }
    // filling adds no revenue: totals equal the plain grouped aggregate
    val direct = Tables.orders(spark, sf)
      .agg(sum(graft.engine.Num.cents(col("o_totalprice")))).collect()(0)
      .getLong(0)
    val filled = rows.map(r => math.round(r.getAs[Double]("revenue") * 100)).sum
    assert(filled == direct)
  }

  test("SCD2: intervals chain gaplessly, one current row per customer") {
    val rows = Kpis.scd2Dimension(spark, sf).collect()
      .groupBy(_.getAs[Long]("o_custkey"))
    assert(rows.nonEmpty)
    rows.foreach { case (_, vs) =>
      val sorted = vs.sortBy(_.getAs[Long]("version"))
      // versions are 1..n dense
      assert(sorted.map(_.getAs[Long]("version")).toSeq ==
        (1L to vs.length).toSeq)
      // exactly one open (current) interval — the last
      assert(vs.count(_.getAs[Boolean]("is_current")) == 1)
      assert(sorted.last.getAs[Boolean]("is_current"))
      // valid_to of version k == valid_from of version k+1 (no gaps,
      // no overlaps), and consecutive versions differ in status
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.sql.Timestamp]("valid_to") ==
            b.getAs[java.sql.Timestamp]("valid_from"))
          assert(a.getAs[String]("status") != b.getAs[String]("status"))
        case _ =>
      }
    }
    // run-length compression conserves history: total orders ≥ versions,
    // and replaying the intervals yields every status the customer had
    val nVersions = rows.values.map(_.length).sum
    assert(nVersions <= Tables.orders(spark, sf).count())
  }

  test("matryoshka: rerank is subset-optimal — never beats brute force") {
    val mrl = Sim.matryoshkaRerank(spark, sf).collect()
    val brute = Sim.embeddingTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("rank")) ->
        r.getAs[Double]("cosine")).toMap
    assert(mrl.length == Sim.N_PROBES * Sim.TOP_K)
    mrl.foreach(r => assert(r.getAs[Long]("coarse_rank") <= Sim.MRL_SHORTLIST))
    mrl.groupBy(_.getAs[Long]("probe_id")).foreach { case (pid, vs) =>
      val sorted = vs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to vs.length).toSeq)
      val cosines = sorted.map(_.getAs[Double]("cosine")).toSeq
      // final list is sorted by full cosine …
      assert(cosines == cosines.sorted.reverse)
      // … and rank-for-rank can only be ≤ the global (unfiltered) optimum:
      // reranking a 20-candidate subset never beats brute force
      cosines.zipWithIndex.foreach { case (c, i) =>
        assert(c <= brute((pid, (i + 1).toLong)) + 1e-6)
      }
    }
    // on this corpus the coarse pass must actually reorder something —
    // otherwise the rerank stage is untested
    assert(mrl.exists(r => r.getAs[Long]("coarse_rank") != r.getAs[Long]("rank")))
  }

  test("binary hamming: distances in [0,64], self-consistent with signs") {
    val rows = Sim.binaryQuantHamming(spark, sf).collect()
    assert(rows.length == Sim.N_PROBES * Sim.TOP_K)
    rows.foreach { r =>
      val h = r.getAs[Long]("hamming")
      assert(h >= 0 && h <= 64)
      assert(r.getAs[Double]("cosine") >= -1.0 - 1e-6 &&
        r.getAs[Double]("cosine") <= 1.0 + 1e-6)
    }
    // per probe: ranks dense 1..k, hamming non-decreasing with rank
    rows.groupBy(_.getAs[Long]("probe_id")).foreach { case (_, vs) =>
      val sorted = vs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to vs.length).toSeq)
      assert(sorted.map(_.getAs[Long]("hamming")).toSeq ==
        sorted.map(_.getAs[Long]("hamming")).toSeq.sorted)
    }
  }

  test("profiler: counts are exact against direct per-column queries") {
    val c = Tables.customer(spark, sf)
    val prof = Kpis.columnProfile(spark, sf).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    assert(prof.size == 5)
    val total = c.count()
    prof.values.foreach(r => assert(r.getAs[Long]("n_rows") == total))
    assert(prof("c_custkey").getAs[Long]("n_distinct") == total)
    assert(prof("c_mktsegment").getAs[Long]("n_distinct") ==
      c.select("c_mktsegment").distinct().count())
    prof.values.foreach(r => assert(r.getAs[Long]("n_nulls") == 0L))
    // cents rendering: min_val of c_acctbal is the true numeric min
    val minBal = c.agg(min(graft.engine.Num.cents(col("c_acctbal"))))
      .collect()(0).getLong(0)
    assert(prof("c_acctbal").getAs[String]("min_val") == minBal.toString)
  }

  test("temperatureSample flattens the mixture: bigger languages get " +
      "lower rates, sample lands near the budget") {
    val rows = TextOps.temperatureSample(spark, sf).collect()
    assert(rows.length > 1)
    // α<1 flattening: rate_ppm strictly anti-monotone in corpus share
    // (ties in n_docs aside) — the head language must be downsampled
    // hardest, tails kept at (or near) full rate
    val byDocs = rows.sortBy(_.getAs[Long]("n_docs"))
    val rates = byDocs.map(_.getAs[Long]("rate_ppm"))
    byDocs.zip(byDocs.tail).foreach { case (small, big) =>
      if (small.getAs[Long]("n_docs") < big.getAs[Long]("n_docs"))
        assert(small.getAs[Long]("rate_ppm") >= big.getAs[Long]("rate_ppm"),
          s"flattening must favor the smaller language: $small vs $big")
    }
    assert(rates.forall(r => r >= 0 && r <= 1000000))
    // the realized sample must land near budget = corpus/TEMP_BUDGET_DIV
    // (hash-gate variance at sf0.001 is wide; 2x bounds still catch a
    // broken normalizer, which is off by |langs|x)
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val kept = rows.map(_.getAs[Long]("n_kept")).sum
    val budget = total.toDouble / TextOps.TEMP_BUDGET_DIV
    assert(kept > budget / 2 && kept < budget * 2,
      s"sample $kept far from budget $budget")
  }

  test("tokenBudgetMixture waterfills exactly: line sources equalized, " +
      "below-line sources untouched, budget conserved") {
    val rows = TextOps.tokenBudgetMixture(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_tokens")).sum
    val budget = total / TextOps.MIX_BUDGET_DIV
    val expected = rows.map(_.getAs[Long]("expected_tokens")).sum
    // Σ min(t_i, L) = B up to the per-source floor rounding (≤1 token
    // lost per source)
    assert(expected <= budget && expected >= budget - rows.length,
      s"waterfill must land on the budget: $expected vs $budget")
    rows.foreach { r =>
      val t = r.getAs[Long]("n_tokens"); val e = r.getAs[Long]("expected_tokens")
      val rp = r.getAs[Long]("rate_ppm")
      if (rp == 1000000L) assert(e == t, s"below-line source must keep all: $r")
      else assert(e < t, s"above-line source must downsample: $r")
    }
    // every above-line source is allocated the same waterline mass (±1
    // for the floor)
    val lineAllocs = rows.filter(_.getAs[Long]("rate_ppm") < 1000000L)
      .map(_.getAs[Long]("expected_tokens"))
    if (lineAllocs.length > 1)
      assert(lineAllocs.max - lineAllocs.min <= 1,
        s"above-line sources must equalize: ${lineAllocs.toSeq}")
  }

  test("writeShards materializes the training shuffle: hive shard dirs " +
      "match the manifest; file order IS the order hash") {
    val out = java.nio.file.Files.createTempDirectory("graft-shards")
      .toString + "/corpus"
    TextOps.writeShards(Tables.documents(spark, sf), out)
    val manifest = TextOps.trainingShards(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val back = spark.read.parquet(out)
    val counts = back.groupBy("shard").count().collect()
      .map(r => r.getAs[Number]("shard").longValue() -> r.getLong(1)).toMap
    assert(counts == manifest,
      s"shard dirs must hold exactly the manifest counts")
    // each shard is one task's output (repartition on shard) sorted by
    // (h, doc_id) — reading a shard dir back yields the hash order
    manifest.keys.foreach { s =>
      val hs = spark.read.parquet(s"$out/shard=$s")
        .select("h", "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(hs.zip(hs.tail).forall { case (a, b) =>
        a._1 < b._1 || (a._1 == b._1 && a._2 <= b._2) },
        s"shard $s file order must be the (h, doc_id) shuffle order")
    }
  }
}
