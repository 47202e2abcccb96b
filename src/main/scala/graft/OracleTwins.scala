package graft

import graft.engine.{Dedup, Graph, Schemas, Sim, TextOps}
import graft.functions.{TextFns, VecFns}

/** DuckDB SQL twins for the LLM-pipeline queries, **generated from the same
  * constants** as the Spark implementations ([[TextFns]]/[[VecFns]]/
  * [[Dedup]]/[[Sim]]) — the hash family, band geometry, LSH planes and
  * thresholds can't drift between the engine and its oracle.
  *
  * Every numeric path is a left fold (`list_reduce` ≡ Catalyst `aggregate`)
  * or integer arithmetic, so results are bit-identical (see Num's scaladoc
  * for the float-discipline rules).
  */
object OracleTwins {
  private val P = TextFns.P

  /** Polynomial rolling hash over code points — twin of TextFns.polyHash.
    * Lambda vars are prefixed to survive nesting inside outer lambdas. */
  def polyhash(s: String): String =
    s"list_reduce(list_prepend(7::BIGINT, list_transform(" +
      s"list_filter(string_split($s, ''), phc -> len(phc) > 0), " +
      s"phd -> ascii(phd)::BIGINT)), (pha, phx) -> (pha * 31 + phx) % $P)"

  /** Distinct word-k-gram shingle hashes of `w` (a token list). */
  def shingleHashes(w: String, k: Int = 3): String =
    s"list_distinct(list_transform(list_transform(" +
      s"range(1, greatest(len($w) - ${k - 1}, 1) + 1), " +
      s"shi -> array_to_string(list_slice($w, shi, shi + ${k - 1}), ' ')), " +
      s"shs -> ${polyhash("shs")}))"

  def minhashSig(i: Int, sh: String): String =
    s"list_aggregate(list_transform($sh, mh -> " +
      s"(${TextFns.A(i)} * mh + ${TextFns.B(i)}) % $P), 'min')"

  /** Left-fold dot product — twin of VecFns.dot. */
  def dot(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(" +
      s"range(1, len($a) + 1), di -> $a[di]::DOUBLE * $b[di]::DOUBLE)), " +
      s"(da, dx) -> da + dx)"

  def norm2(a: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(" +
      s"range(1, len($a) + 1), ni -> $a[ni]::DOUBLE * $a[ni]::DOUBLE)), " +
      s"(na, nx) -> na + nx)"

  def cosine(a: String, b: String): String =
    s"(${dot(a, b)} / (sqrt(${norm2(a)}) * sqrt(${norm2(b)})))"

  def round6(x: String): String =
    s"CAST(round(($x)*1000000) AS BIGINT)/CAST(1000000 AS DOUBLE)"

  /** Signed ppm fixed-point — twin of [[graft.engine.Num.ppm]]:
    * floor(|x|·10⁶ + 0.5) with the sign re-applied, so half-way cells
    * round identically on engines whose `round` is half-even. */
  def ppm(x: String): String =
    s"CAST(CASE WHEN ($x) < 0 THEN -floor(abs($x)*1000000 + 0.5) " +
      s"ELSE floor(abs($x)*1000000 + 0.5) END AS BIGINT)"

  /** Sign-LSH bucket — twin of VecFns.lshBucket. */
  def lshBucket(v: String): String =
    (0 until VecFns.NPLANES).map { p =>
      val comp = s"(((${p}::BIGINT * 2654435761 + 12345) + pd * 40503) " +
        s"% ${VecFns.PLANE_P})::DOUBLE / ${VecFns.PLANE_P}.0 - 0.5"
      val dotP = s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(" +
        s"range(0, len($v)), pd -> ($comp) * $v[pd + 1]::DOUBLE)), " +
        s"(pa, px) -> pa + px)"
      s"(CASE WHEN $dotP > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  // ---- full query twins ----

  val exactDedup: String =
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0),
       |h AS (
       |  SELECT doc_id,
       |    sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_hash
       |  FROM corpus)
       |SELECT content_hash, CAST(count(*) AS BIGINT) AS n_copies,
       |  min(doc_id) AS canonical_doc_id
       |FROM h GROUP BY content_hash HAVING count(*) > 1
       |ORDER BY content_hash""".stripMargin

  /** CTE chain producing verified MinHash candidate `pairs` (doc_a, doc_b,
    * jaccard) — shared by the near-dup, cluster and curation twins. */
  private val minhashPairsCte: String = {
    val sigCols = (0 until TextFns.NH)
      .map(i => s"${minhashSig(i, "sh")} AS s$i").mkString(",\n    ")
    val bandExprs = (0 until TextFns.BANDS).map { b =>
      val parts = (0 until TextFns.R)
        .map(r => s"s${b * TextFns.R + r}::VARCHAR").mkString(" || '-' || ")
      s"'$b:' || $parts"
    }.mkString(", ")
    s"""toks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
       |sh AS (
       |  SELECT doc_id, ${shingleHashes("w")} AS sh FROM toks),
       |sigs AS (
       |  SELECT doc_id,
       |    $sigCols
       |  FROM sh),
       |bands AS (
       |  SELECT doc_id, unnest([$bandExprs]) AS band FROM sigs),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y ON x.band = y.band AND x.doc_id < y.doc_id),
       |pairs AS (
       |  SELECT doc_a, doc_b,
       |    len(list_intersect(sa.sh, sb.sh))::DOUBLE /
       |      len(list_distinct(sa.sh || sb.sh))::DOUBLE AS jaccard
       |  FROM cand
       |  JOIN sh sa ON doc_a = sa.doc_id
       |  JOIN sh sb ON doc_b = sb.doc_id)""".stripMargin
  }

  val minhashNearDup: String =
    s"""WITH $minhashPairsCte
       |SELECT doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= 0.8
       |ORDER BY doc_a, doc_b""".stripMargin

  /** q128's twin: the FULL-corpus pair recompute restricted to pairs that
    * cross the delta split — exactly what probing the persisted index
    * with the delta must find (and nothing else). */
  val incrementalNearDup: String =
    s"""WITH $minhashPairsCte
       |SELECT doc_a, doc_b, jaccard FROM pairs
       |WHERE jaccard >= 0.8
       |  AND ((doc_a % ${graft.engine.Dedup.DELTA_MOD} = 0)
       |       <> (doc_b % ${graft.engine.Dedup.DELTA_MOD} = 0))
       |ORDER BY doc_a, doc_b""".stripMargin

  /** q197's twin — [[graft.streaming.DedupStream.streamNearDupProbe]]:
    * the batch semantics of the whole streaming near-dup lifecycle. The
    * replay builds the index over the %3==0 slice and streams slices 1
    * and 2 in order, so the landed output must be the full-corpus pair
    * set MINUS base-internal pairs, each pair stamped with the batch of
    * its later-arriving member — `greatest(doc_a%3, doc_b%3)`. */
  val streamNearDup: String =
    s"""WITH $minhashPairsCte
       |SELECT doc_a, doc_b, jaccard,
       |  CAST(greatest(doc_a % 3, doc_b % 3) AS BIGINT) AS batch
       |FROM pairs
       |WHERE jaccard >= 0.8 AND NOT (doc_a % 3 = 0 AND doc_b % 3 = 0)
       |ORDER BY doc_a, doc_b""".stripMargin

  /** q200's twin — [[graft.streaming.EventsStream.streamHourlyProbe]]:
    * the batch hourly aggregate (q16's arithmetic verbatim) under the
    * final-watermark cutoff — only windows whose end is at or before
    * `max(ts) − 2 hours` (the stream's watermark delay) have been
    * evicted/emitted by the replay's last no-data micro-batch; the tail
    * is still open state by design. */
  val streamHourly: String =
    """WITH mx AS (SELECT max(ts) AS m FROM events),
      |h AS (
      | SELECT date_trunc('hour', ts) AS hs, event_type,
      |  count(*) AS n_events,
      |  CAST(SUM(CAST(round((value)*100) AS BIGINT)) AS DOUBLE)
      |    /CAST(100 AS DOUBLE) AS total_value
      | FROM events GROUP BY 1, 2)
      |SELECT strftime(hs, '%Y-%m-%d %H:%M:%S') AS hour_start,
      |  event_type, n_events, total_value,
      |  total_value/n_events AS avg_value
      |FROM h, mx
      |WHERE hs + INTERVAL 1 HOUR <= m - INTERVAL 2 HOUR
      |ORDER BY hour_start, event_type""".stripMargin

  /** q201's twin — [[graft.streaming.EventsStream.streamSessionsProbe]]:
    * the batch gaps-and-islands sessionization (q17's exact integer-µs
    * arithmetic) plus the replay's update LAW: `last_batch` is the slice
    * index of the user's newest event under the replay's time-thirds
    * formula `least(2, (ts_us − tmin)·3 div (tmax − tmin + 1))` — the
    * micro-batch that emitted the user's final update. */
  val streamSessions: String =
    """WITH b AS (
      | SELECT min(epoch_us(ts)) AS tmin, max(epoch_us(ts)) AS tmax
      | FROM events),
      |e AS (
      | SELECT user_id, event_id, ts,
      |  lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us,
      |  least(2, ((epoch_us(ts) - b.tmin) * 3) // (b.tmax - b.tmin + 1)) AS slice
      | FROM events, b)
      |SELECT user_id,
      | CAST(count(*) AS BIGINT) AS n_events,
      | CAST(SUM(CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
      |               THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
      | CAST(max(slice) AS BIGINT) AS last_batch
      |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q205's twin — [[graft.streaming.EventsStream.streamSessionWindowsProbe]]:
    * lag-window gaps-and-islands at SESSION grain. The stream saw the
    * events time-SCRAMBLED (event_id mod 3 slices); the twin computes
    * over the time-ordered table — equality holds only if the
    * watermark-merge state reassembled every session across batches. */
  val streamSessionWindows: String =
    """WITH e AS (
      | SELECT user_id, event_id, ts, epoch_us(ts) AS ts_us,
      |  lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      | FROM events),
      |s AS (
      | SELECT user_id, ts, ts_us,
      |  SUM(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
      |           THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      | FROM e)
      |SELECT user_id,
      | strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      | strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
      | CAST(count(*) AS BIGINT) AS n_events
      |FROM s GROUP BY user_id, sess_id
      |ORDER BY user_id, session_start""".stripMargin

  /** Shared slice-index SQL of the time-thirds replays (q201/q208/q209):
    * `least(2, (ts_us − tmin)·3 div (tmax − tmin + 1))` with bounds from
    * the full events table — writeTimeSlices' formula verbatim. Callers
    * provide a CTE `b(tmin, span)`. */
  private def sliceOf(tsUs: String): String =
    s"least(2, ($tsUs - b.tmin) * 3 // b.span)"

  private val sliceBoundsCte: String =
    """b AS (
      | SELECT min(epoch_us(ts)) AS tmin,
      |  max(epoch_us(ts)) - min(epoch_us(ts)) + 1 AS span
      | FROM events)""".stripMargin

  /** q216's twin — [[graft.streaming.EventsStream.streamOuterJoinProbe]]:
    * the plain batch LEFT interval join, no cutoff clause (the two-row
    * flush heartbeat advanced BOTH sides' watermarks past every real
    * row's eviction horizon). A null row emitted early (its click later
    * matched), a stranded unmatched click, or a double emission all
    * change the set. */
  val streamOuterJoin: String =
    s"""WITH ev AS (
       | SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
       | FROM events),
       |c AS (SELECT event_id AS click_id, user_id, ts_us AS click_us
       |      FROM ev WHERE event_type = 'click'),
       |p AS (SELECT event_id AS purchase_id, user_id AS p_user,
       |       ts_us AS purchase_us, value
       |      FROM ev WHERE event_type = 'purchase')
       |SELECT c.click_id, p.purchase_id, c.user_id, c.click_us,
       | p.purchase_us, p.value
       |FROM c LEFT JOIN p ON c.user_id = p.p_user
       | AND p.purchase_us >= c.click_us
       | AND p.purchase_us <= c.click_us + 3600000000
       |ORDER BY click_id, COALESCE(purchase_id, -1)""".stripMargin

  /** q217's twin — [[graft.streaming.EventsStream.streamFullOuterJoinProbe]]:
    * the plain batch FULL interval join (user_id is the click side's,
    * null on right-only rows, exactly as the streamed projection emits
    * it). Both eviction machines are pinned: stranded or early-emitted
    * null rows on EITHER side change the set. */
  val streamFullOuterJoin: String =
    s"""WITH ev AS (
       | SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
       | FROM events),
       |c AS (SELECT event_id AS click_id, user_id, ts_us AS click_us
       |      FROM ev WHERE event_type = 'click'),
       |p AS (SELECT event_id AS purchase_id, user_id AS p_user,
       |       ts_us AS purchase_us, value
       |      FROM ev WHERE event_type = 'purchase')
       |SELECT c.click_id, p.purchase_id, c.user_id, c.click_us,
       | p.purchase_us, p.value
       |FROM c FULL JOIN p ON c.user_id = p.p_user
       | AND p.purchase_us >= c.click_us
       | AND p.purchase_us <= c.click_us + 3600000000
       |ORDER BY COALESCE(click_id, -1), COALESCE(purchase_id, -1)""".stripMargin

  /** q215's twin — [[graft.streaming.EventsStream.streamDedupProbe]]:
    * every event exactly once, stamped with its FIRST-arrival slice
    * (`event_id mod 3`); the replayed 4th slice must contribute nothing
    * (no batch value 3 can appear). */
  val streamDedup: String =
    """SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value,
      | CAST(event_id % 3 AS BIGINT) AS batch
      |FROM events ORDER BY event_id""".stripMargin

  /** q208's twin — [[graft.streaming.EventsStream.streamIntervalJoinProbe]]:
    * the batch interval join (q64's click→purchase attribution shape) at
    * pair grain, each pair stamped with the micro-batch of its
    * later-arriving member — `greatest(slice(click), slice(purchase))`.
    * A pair lost at a slice boundary (buffer evicted too early), emitted
    * eagerly (before its later member), or emitted twice all flip
    * cells. */
  val streamIntervalJoin: String =
    s"""WITH $sliceBoundsCte,
       |ev AS (
       | SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
       | FROM events),
       |c AS (SELECT event_id AS click_id, user_id, ts_us AS click_us
       |      FROM ev WHERE event_type = 'click'),
       |p AS (SELECT event_id AS purchase_id, user_id AS p_user,
       |       ts_us AS purchase_us, value
       |      FROM ev WHERE event_type = 'purchase')
       |SELECT c.click_id, p.purchase_id, c.user_id, c.click_us,
       | p.purchase_us, p.value,
       | CAST(greatest(${sliceOf("c.click_us")},
       |               ${sliceOf("p.purchase_us")}) AS BIGINT) AS batch
       |FROM c JOIN p ON c.user_id = p.p_user
       | AND p.purchase_us >= c.click_us
       | AND p.purchase_us <= c.click_us + 3600000000, b
       |ORDER BY click_id, purchase_id""".stripMargin

  /** q209's twin — [[graft.streaming.AsOfStream.streamAsOfSinkProbe]]:
    * q126's backward broadcast as-of at ROW grain (latest rate_from ≤
    * ts, (rate_from, rate_id)-max tie), each probe stamped with ITS
    * arrival slice — a stream-static join must answer every probe in
    * its own micro-batch. */
  val streamAsOfSink: String =
    s"""WITH $sliceBoundsCte,
       |e AS (
       | SELECT event_id, user_id % ${graft.engine.Kpis.RATE_NATIONS} AS nk,
       |  ts, epoch_us(ts) AS ts_us
       | FROM events),
       |r AS (
       | SELECT nk.v AS rnk,
       |  TIMESTAMP '${graft.engine.Kpis.RATE_START}'
       |   + INTERVAL (ep.v) DAY AS rate_from,
       |  nk.v * 1000 + ep.v AS rate_id
       | FROM (SELECT unnest(range(0, ${graft.engine.Kpis.RATE_NATIONS})) AS v) nk
       | CROSS JOIN (SELECT unnest(range(0, ${graft.engine.Kpis.RATE_EPOCHS})) AS v) ep),
       |j AS (
       | SELECT e.event_id, e.nk, e.ts_us, r.rate_id,
       |  row_number() OVER (PARTITION BY e.event_id
       |    ORDER BY r.rate_from DESC, r.rate_id DESC) AS rn
       | FROM e LEFT JOIN r ON e.nk = r.rnk AND r.rate_from <= e.ts)
       |SELECT event_id, nk, rate_id,
       | CAST(${sliceOf("ts_us")} AS BIGINT) AS batch
       |FROM j, b WHERE rn = 1
       |ORDER BY event_id""".stripMargin

  /** q210's twin — [[graft.streaming.EventsStream.streamDriftProbe]]:
    * the fixed-bucket value histogram over the whole table — what the
    * complete-mode stream's final emission must equal after
    * accumulating all three micro-batches. */
  val streamDrift: String =
    s"""SELECT event_type,
       | CAST(least(CAST(round((value)*100) AS BIGINT)
       |       // ${graft.streaming.EventsStream.DRIFT_BUCKET_CENTS},
       |       ${graft.streaming.EventsStream.DRIFT_MAX_BUCKET}) AS BIGINT) AS bucket,
       | CAST(count(*) AS BIGINT) AS n
       |FROM events GROUP BY 1, 2
       |ORDER BY event_type, bucket""".stripMargin

  /** q202's twin — [[graft.streaming.AsOfStream.streamAsOfProbe]]: the
    * batch as-of contract per direction over the click/purchase slices.
    * No watermark-cutoff clause: the replay's flush heartbeat advances
    * the final watermark past every probe's finalization instant, so the
    * stream must emit EVERY click exactly once in all three directions.
    * Backward: (ts,id)-max at-or-before within tol; forward: (ts,id)-min
    * at-or-after within tol; nearest: closer of best-backward vs first
    * strictly-later, backward on ties — [[graft.plans.AsOf]]'s sweep
    * semantics, restated as correlated top-1 subqueries. */
  val streamAsOf: String = {
    val tol = graft.streaming.AsOfStream.SS_TOL_US
    s"""WITH ev AS (
       | SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
       | FROM events WHERE event_type IN ('click', 'purchase')),
       |c AS (SELECT event_id AS click_id, user_id, ts_us
       |      FROM ev WHERE event_type = 'click'),
       |p AS (SELECT event_id, user_id, ts_us
       |      FROM ev WHERE event_type = 'purchase'),
       |bwd AS (
       | SELECT 'backward' AS direction, c.user_id, c.click_id, c.ts_us,
       |  (SELECT p.event_id FROM p
       |   WHERE p.user_id = c.user_id AND p.ts_us <= c.ts_us
       |     AND c.ts_us - p.ts_us <= $tol
       |   ORDER BY p.ts_us DESC, p.event_id DESC LIMIT 1) AS matched_id
       | FROM c),
       |fwd AS (
       | SELECT 'forward' AS direction, c.user_id, c.click_id, c.ts_us,
       |  (SELECT p.event_id FROM p
       |   WHERE p.user_id = c.user_id AND p.ts_us >= c.ts_us
       |     AND p.ts_us - c.ts_us <= $tol
       |   ORDER BY p.ts_us ASC, p.event_id ASC LIMIT 1) AS matched_id
       | FROM c),
       |n0 AS (
       | SELECT c.user_id, c.click_id, c.ts_us,
       |  (SELECT p.ts_us FROM p
       |   WHERE p.user_id = c.user_id AND p.ts_us <= c.ts_us
       |     AND c.ts_us - p.ts_us <= $tol
       |   ORDER BY p.ts_us DESC, p.event_id DESC LIMIT 1) AS b_ts,
       |  (SELECT p.event_id FROM p
       |   WHERE p.user_id = c.user_id AND p.ts_us <= c.ts_us
       |     AND c.ts_us - p.ts_us <= $tol
       |   ORDER BY p.ts_us DESC, p.event_id DESC LIMIT 1) AS b_id,
       |  (SELECT p.ts_us FROM p
       |   WHERE p.user_id = c.user_id AND p.ts_us > c.ts_us
       |     AND p.ts_us - c.ts_us <= $tol
       |   ORDER BY p.ts_us ASC, p.event_id ASC LIMIT 1) AS f_ts,
       |  (SELECT p.event_id FROM p
       |   WHERE p.user_id = c.user_id AND p.ts_us > c.ts_us
       |     AND p.ts_us - c.ts_us <= $tol
       |   ORDER BY p.ts_us ASC, p.event_id ASC LIMIT 1) AS f_id
       | FROM c),
       |nst AS (
       | SELECT 'nearest' AS direction, user_id, click_id, ts_us,
       |  CASE WHEN b_ts IS NULL AND f_ts IS NULL THEN NULL
       |       WHEN f_ts IS NULL THEN b_id
       |       WHEN b_ts IS NULL THEN f_id
       |       WHEN ts_us - b_ts <= f_ts - ts_us THEN b_id
       |       ELSE f_id END AS matched_id
       | FROM n0)
       |SELECT direction, user_id, click_id, ts_us, matched_id
       |FROM (SELECT * FROM bwd UNION ALL SELECT * FROM fwd
       |      UNION ALL SELECT * FROM nst)
       |ORDER BY direction, user_id, click_id""".stripMargin
  }

  /** q213's twin — [[graft.engine.Dedup.sortedNeighbourhood]]: the
    * window semantics stated directly (every pair within rank distance
    * ≤ W in block-sorted (pfx, doc_id) order) — the engine's
    * bucket-explode equi-join is an implementation detail the twin
    * never mentions, so a bucket-boundary pair lost by the join
    * mechanics hash-mismatches. */
  val sortedNeighbourhood: String = {
    import graft.engine.Dedup.{LINK_PREFIX, LINK_T, SN_WINDOW}
    s"""WITH d AS (
       |  SELECT doc_id, lang, source,
       |    substring(text, 1, $LINK_PREFIX) AS pfx
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, lang, source, pfx,
       |    row_number() OVER (PARTITION BY lang, source
       |      ORDER BY pfx, doc_id) AS rn
       |  FROM d),
       |p AS (
       |  SELECT x.lang, x.source, levenshtein(x.pfx, y.pfx) AS dist
       |  FROM r x JOIN r y
       |   ON x.lang = y.lang AND x.source = y.source
       |    AND y.rn > x.rn AND y.rn <= x.rn + $SN_WINDOW)
       |SELECT lang, source, CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(SUM(CASE WHEN dist <= $LINK_T THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_linked,
       |  CAST(min(dist) AS BIGINT) AS min_dist
       |FROM p GROUP BY lang, source
       |ORDER BY lang, source""".stripMargin
  }

  /** q150's twin: the near-dup pair CTE mapped to canonicalized source
    * pairs with fixed-point Jaccard mass. */
  val sourcePairDups: String =
    s"""WITH $minhashPairsCte,
       |v AS (SELECT doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= 0.8),
       |m AS (
       |  SELECT least(da.source, db.source) AS source_a,
       |    greatest(da.source, db.source) AS source_b,
       |    CAST(floor(jaccard * 1000000) AS BIGINT) AS jfp
       |  FROM v
       |  JOIN documents da ON v.doc_a = da.doc_id
       |  JOIN documents db ON v.doc_b = db.doc_id)
       |SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(sum(jfp) AS BIGINT) AS jaccard_mass_fp6
       |FROM m GROUP BY source_a, source_b
       |ORDER BY source_a, source_b""".stripMargin

  /** CTE chain from verified pairs to per-doc component labels `lab`
    * (doc_id, cluster_id) — the recursive transitive closure the Spark side
    * computes by min-label propagation. */
  private val dupClusterCte: String =
    s"""$minhashPairsCte,
       |dup AS (
       |  SELECT doc_a, doc_b FROM pairs WHERE jaccard >= 0.8),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM dup
       |  UNION ALL SELECT doc_b, doc_a FROM dup),
       |reach(id, r) AS (
       |  SELECT DISTINCT src, src FROM edges
       |  UNION
       |  SELECT re.id, e.dst FROM reach re JOIN edges e ON re.r = e.src),
       |lab AS (
       |  SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id)""".stripMargin

  val dupClusters: String =
    s"""WITH RECURSIVE $dupClusterCte,
       |sz AS (
       |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
       |  FROM lab GROUP BY cluster_id)
       |SELECT doc_id, cluster_id, cluster_size
       |FROM lab JOIN sz USING (cluster_id)
       |ORDER BY doc_id""".stripMargin

  /** q160's twin: per-doc weight 1/|cluster| over the same recursive
    * closure, weight mass in exact ppm integer division. */
  val softDedupWeights: String =
    s"""WITH RECURSIVE $dupClusterCte,
       |sz AS (
       |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS csize
       |  FROM lab GROUP BY cluster_id),
       |j AS (
       |  SELECT d.lang, COALESCE(sz.csize, 1) AS csize
       |  FROM documents d
       |  LEFT JOIN lab ON d.doc_id = lab.doc_id
       |  LEFT JOIN sz ON lab.cluster_id = sz.cluster_id)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN csize > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_clustered,
       |  CAST(sum(1000000 // csize) AS BIGINT) AS weight_mass_ppm,
       |  CAST(max(csize) AS BIGINT) AS max_cluster_size
       |FROM j GROUP BY lang ORDER BY lang""".stripMargin

  /** q158's twin: the closure over pairs with BOTH endpoints surviving
    * the FORGET_MOD deletion — the decremental maintenance must arrive
    * at exactly this (splits, canonical changes, dropped singletons
    * included). */
  val forgetClusters: String =
    s"""WITH RECURSIVE $minhashPairsCte,
       |dup AS (
       |  SELECT doc_a, doc_b FROM pairs WHERE jaccard >= 0.8
       |    AND doc_a % ${Dedup.FORGET_MOD} <> 0
       |    AND doc_b % ${Dedup.FORGET_MOD} <> 0),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM dup
       |  UNION ALL SELECT doc_b, doc_a FROM dup),
       |reach(id, r) AS (
       |  SELECT DISTINCT src, src FROM edges
       |  UNION
       |  SELECT re.id, e.dst FROM reach re JOIN edges e ON re.r = e.src),
       |lab AS (
       |  SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
       |sz AS (
       |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
       |  FROM lab GROUP BY cluster_id)
       |SELECT doc_id, cluster_id, cluster_size
       |FROM lab JOIN sz USING (cluster_id)
       |ORDER BY doc_id""".stripMargin

  /** q134's twin: the keep/drop decision over the same recursive
    * transitive closure — kept iff unclustered or canonical (min id) of
    * its cluster. */
  val dedupKeepList: String =
    s"""WITH RECURSIVE $dupClusterCte
       |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN lab.cluster_id IS NULL
       |    OR lab.cluster_id = d.doc_id THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_kept,
       |  CAST(sum(CASE WHEN lab.cluster_id IS NULL
       |    OR lab.cluster_id = d.doc_id THEN 0 ELSE 1 END) AS BIGINT)
       |    AS n_dropped,
       |  ${round6("sum(CASE WHEN lab.cluster_id IS NULL OR " +
                   "lab.cluster_id = d.doc_id THEN 1 ELSE 0 END)::DOUBLE " +
                   "/ count(*)::DOUBLE")} AS kept_ratio
       |FROM documents d LEFT JOIN lab ON d.doc_id = lab.doc_id
       |GROUP BY d.lang ORDER BY d.lang""".stripMargin

  /** q140's twin: the banding-geometry recall/precision sweep, recomputed
    * over the same planted corpus — signatures built per-slot (s0..s11),
    * a geometry's collision flag = OR over its bands of per-slot AND
    * chains, exact Jaccard from the shingle sets, counters and ppm
    * ratios in exact integer arithmetic. */
  val lshRecall: String = {
    val sigCols = (0 until TextFns.NH)
      .map(i => s"${minhashSig(i, "sh")} AS s$i").mkString(",\n    ")
    def collide(b: Int, r: Int): String =
      (0 until b).map { i =>
        (0 until r).map(j => s"p.s${i * r + j} = d.s${i * r + j}")
          .mkString("(", " AND ", ")")
      }.mkString("(", " OR ", ")")
    val collideCols = Dedup.LSH_SETTINGS.map { case (b, r) =>
      s"${collide(b, r)} AS c_${b}_$r" }.mkString(",\n    ")
    val aggCols = Dedup.LSH_SETTINGS.map { case (b, r) =>
      s"CAST(sum(CASE WHEN c_${b}_$r THEN 1 ELSE 0 END) AS BIGINT) " +
        s"AS cand_${b}_$r,\n    " +
        s"CAST(sum(CASE WHEN c_${b}_$r AND jac >= 0.8 THEN 1 ELSE 0 END) " +
        s"AS BIGINT) AS hit_${b}_$r" }.mkString(",\n    ")
    val settingRows = Dedup.LSH_SETTINGS.map { case (b, r) =>
      s"SELECT ${b}::BIGINT AS bands, ${r}::BIGINT AS rows_per_band, " +
        s"n_true, cand_${b}_$r AS n_candidates, hit_${b}_$r AS n_hits, " +
        s"CASE WHEN n_true = 0 THEN NULL " +
        s"ELSE hit_${b}_$r * 1000000 // n_true END AS recall_ppm, " +
        s"CASE WHEN cand_${b}_$r = 0 THEN NULL " +
        s"ELSE hit_${b}_$r * 1000000 // cand_${b}_$r END AS precision_ppm " +
        s"FROM agg" }.mkString("\nUNION ALL ")
    s"""WITH base AS (SELECT doc_id, text FROM documents),
       |aug AS (
       |  SELECT doc_id, text FROM base
       |  UNION ALL SELECT doc_id + 10000000, text || ' seven near dup tail'
       |    FROM base WHERE doc_id % 7 = 0
       |  UNION ALL SELECT doc_id + 20000000,
       |    substr(text, 1, CAST(floor(len(text)/2) AS BIGINT))
       |    FROM base WHERE doc_id % 11 = 0
       |  UNION ALL SELECT doc_id + 30000000, text FROM base
       |    WHERE doc_id % 13 = 0),
       |toks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM aug),
       |sh AS (SELECT doc_id, ${shingleHashes("w")} AS sh FROM toks),
       |sigs AS (SELECT doc_id, sh,
       |    $sigCols
       |  FROM sh),
       |pairs AS (
       |  SELECT p.doc_id AS probe_id, d.doc_id AS doc_id,
       |    len(list_intersect(p.sh, d.sh))::DOUBLE /
       |      len(list_distinct(p.sh || d.sh))::DOUBLE AS jac,
       |    $collideCols
       |  FROM sigs p JOIN sigs d
       |    ON p.doc_id < ${Dedup.LSH_PROBES} AND d.doc_id <> p.doc_id),
       |agg AS (
       |  SELECT CAST(sum(CASE WHEN jac >= 0.8 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_true,
       |    $aggCols
       |  FROM pairs)
       |SELECT * FROM ($settingRows) ORDER BY bands DESC""".stripMargin
  }

  /** q146's twin: the same two candidate channels (head fingerprint +
    * banded MinHash) over the same half-doc plants, exact
    * max-directional containment verify. */
  val containmentDedup: String = {
    val sigCols = (0 until TextFns.NH)
      .map(i => s"${minhashSig(i, "sh")} AS s$i").mkString(",\n    ")
    val bandExprs = (0 until TextFns.BANDS).map { b =>
      val parts = (0 until TextFns.R)
        .map(r => s"s${b * TextFns.R + r}::VARCHAR").mkString(" || '-' || ")
      s"'$b:' || $parts"
    }.mkString(", ")
    s"""WITH d AS (SELECT doc_id, text FROM documents),
       |aug AS (
       |  SELECT doc_id, text FROM d
       |  UNION ALL SELECT doc_id + 50000000,
       |    substr(text, 1, CAST(floor(len(text)/2) AS BIGINT))
       |  FROM d WHERE doc_id % ${Dedup.CONT_PLANT_MOD} = 0),
       |toks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM aug),
       |sh AS (SELECT doc_id,
       |    ${polyhash(s"array_to_string(list_slice(w, 1, ${Dedup.CONT_HEAD_TOKENS}), ' ')")}
       |      AS hh,
       |    ${shingleHashes("w")} AS sh
       |  FROM toks),
       |sigs AS (SELECT doc_id,
       |    $sigCols
       |  FROM sh),
       |bands AS (SELECT doc_id, unnest([$bandExprs]) AS k FROM sigs),
       |cand AS (
       |  SELECT DISTINCT doc_a, doc_b FROM (
       |    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
       |    FROM sh x JOIN sh y ON x.hh = y.hh AND x.doc_id < y.doc_id
       |    UNION ALL
       |    SELECT x.doc_id, y.doc_id
       |    FROM bands x JOIN bands y ON x.k = y.k AND x.doc_id < y.doc_id)),
       |p AS (
       |  SELECT doc_a, doc_b,
       |    len(list_intersect(sa.sh, sb.sh))::DOUBLE /
       |      len(list_distinct(sa.sh || sb.sh))::DOUBLE AS jaccard,
       |    GREATEST(
       |      len(list_intersect(sa.sh, sb.sh))::DOUBLE / len(sa.sh)::DOUBLE,
       |      len(list_intersect(sa.sh, sb.sh))::DOUBLE / len(sb.sh)::DOUBLE)
       |      AS containment
       |  FROM cand
       |  JOIN sh sa ON doc_a = sa.doc_id
       |  JOIN sh sb ON doc_b = sb.doc_id)
       |SELECT doc_a, doc_b, ${round6("jaccard")} AS jaccard,
       |  ${round6("containment")} AS containment
       |FROM p WHERE containment >= ${Dedup.CONT_T}
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** q155's twin: the head-fingerprint channel alone over the same
    * half-doc plant geometry, restricted to (original, plant) pairs —
    * the cross pairs the index probe emits (plants are the delta and
    * are never indexed, so plant-plant and original-original pairs
    * cannot appear). */
  val containmentIncrementProbe: String =
    s"""WITH d AS (SELECT doc_id, text FROM documents),
       |aug AS (
       |  SELECT doc_id, text FROM d
       |  UNION ALL SELECT doc_id + 50000000,
       |    substr(text, 1, CAST(floor(len(text)/2) AS BIGINT))
       |  FROM d WHERE doc_id % ${Dedup.CONT_PLANT_MOD} = 0),
       |toks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM aug),
       |sh AS (SELECT doc_id,
       |    ${polyhash(s"array_to_string(list_slice(w, 1, ${Dedup.CONT_HEAD_TOKENS}), ' ')")}
       |      AS hh,
       |    ${shingleHashes("w")} AS sh
       |  FROM toks),
       |cand AS (
       |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM sh x JOIN sh y ON x.hh = y.hh AND x.doc_id < y.doc_id
       |  WHERE x.doc_id < 50000000 AND y.doc_id >= 50000000),
       |p AS (
       |  SELECT doc_a, doc_b,
       |    len(list_intersect(sa.sh, sb.sh))::DOUBLE /
       |      len(list_distinct(sa.sh || sb.sh))::DOUBLE AS jaccard,
       |    GREATEST(
       |      len(list_intersect(sa.sh, sb.sh))::DOUBLE / len(sa.sh)::DOUBLE,
       |      len(list_intersect(sa.sh, sb.sh))::DOUBLE / len(sb.sh)::DOUBLE)
       |      AS containment
       |  FROM cand
       |  JOIN sh sa ON doc_a = sa.doc_id
       |  JOIN sh sb ON doc_b = sb.doc_id)
       |SELECT doc_a, doc_b, ${round6("jaccard")} AS jaccard,
       |  ${round6("containment")} AS containment
       |FROM p WHERE containment >= ${Dedup.CONT_T}
       |ORDER BY doc_a, doc_b""".stripMargin

  /** q145's twin: same 13-gram overlap over the same plant geometry;
    * per-doc shared-gram counts from the distinct held-out gram set. */
  val ngramDecontamination: String =
    s"""WITH d AS (SELECT doc_id, lang, text FROM documents),
       |h AS (SELECT * FROM d WHERE doc_id % ${Dedup.DECON_HOLD_MOD} = 0),
       |ex AS (
       |  SELECT doc_id + 40000000 AS doc_id, lang,
       |    array_to_string(list_slice(string_split_regex(trim(text), '\\s+'),
       |      1, ${Dedup.DECON_EXCERPT_TOKENS}), ' ') AS text
       |  FROM h WHERE doc_id % 3 = 0),
       |tr AS (
       |  SELECT * FROM d WHERE doc_id % ${Dedup.DECON_HOLD_MOD} <> 0
       |  UNION ALL SELECT * FROM ex),
       |hw AS (
       |  SELECT string_split_regex(trim(text), '\\s+') AS w FROM h),
       |hg AS (
       |  SELECT DISTINCT unnest(${shingleHashes("w", Dedup.DECON_K)}) AS g
       |  FROM hw),
       |tw AS (
       |  SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS w
       |  FROM tr),
       |tg AS (
       |  SELECT doc_id, unnest(${shingleHashes("w", Dedup.DECON_K)}) AS g
       |  FROM tw),
       |sh AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
       |  FROM tg JOIN hg USING (g) GROUP BY doc_id),
       |j AS (
       |  SELECT tw.lang, COALESCE(n_shared, 0) AS n_shared
       |  FROM tw LEFT JOIN sh ON tw.doc_id = sh.doc_id)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_train_docs,
       |  CAST(sum(CASE WHEN n_shared > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_contaminated,
       |  CAST(sum(n_shared) AS BIGINT) AS shared_gram_instances,
       |  max(n_shared) AS max_shared_grams
       |FROM j GROUP BY lang ORDER BY lang""".stripMargin

  /** q142's twin: split by the cluster representative's hash over the
    * same recursive transitive closure; the straddle audit recomputed
    * independently (both engines must arrive at zero). */
  val clusterAwareSplit: String =
    s"""WITH RECURSIVE $dupClusterCte,
       |a AS (
       |  SELECT d.doc_id, d.lang, COALESCE(lab.cluster_id, d.doc_id) AS rep
       |  FROM documents d LEFT JOIN lab ON d.doc_id = lab.doc_id),
       |s AS (
       |  SELECT doc_id, lang, rep,
       |    CASE WHEN ${polyhash("rep::VARCHAR")} % ${Dedup.SPLIT_MOD} = 0
       |      THEN 'test' ELSE 'train' END AS split
       |  FROM a),
       |st AS (
       |  SELECT CAST(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_straddling_clusters
       |  FROM (SELECT rep, count(DISTINCT split) AS n_splits
       |        FROM s GROUP BY rep))
       |SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(count(DISTINCT rep) AS BIGINT) AS n_clusters,
       |  n_straddling_clusters
       |FROM s, st GROUP BY split, lang, n_straddling_clusters
       |ORDER BY split, lang""".stripMargin

  /** CTE chain producing per-doc 48-bit fingerprints `sim` (doc_id,
    * simhash) — shared by the SimHash near-dup and SQL-function twins. */
  private val simhashCte: String = {
    val sumCols = (0 until Dedup.SIMHASH_BITS)
      .map(b => s"CAST(SUM((((${TextFns.A(b)} * h + ${TextFns.B(b)}) % $P) % 2)" +
        s" * 2 - 1) AS BIGINT) AS s$b")
      .mkString(",\n    ")
    val simExpr = (0 until Dedup.SIMHASH_BITS)
      .map(b => s"(CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END)")
      .mkString(" + ")
    s"""tok AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
       |  FROM documents),
       |th AS (
       |  SELECT doc_id, ${polyhash("tok")} AS h FROM tok),
       |sums AS (
       |  SELECT doc_id,
       |    $sumCols
       |  FROM th GROUP BY doc_id),
       |sim AS (
       |  SELECT doc_id, CAST($simExpr AS BIGINT) AS simhash FROM sums)""".stripMargin
  }

  val simhashNearDup: String = {
    val bandExprs = (0 until Dedup.SIM_BANDS)
      .map(b => s"'$b:' || ((simhash >> ${Dedup.BAND_WIDTH * b}) % " +
        s"${1 << Dedup.BAND_WIDTH})::VARCHAR")
      .mkString(", ")
    s"""WITH $simhashCte,
       |bands AS (
       |  SELECT doc_id, simhash, unnest([$bandExprs]) AS band FROM sim),
       |pairs AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |    CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
       |  FROM bands x JOIN bands y ON x.band = y.band AND x.doc_id < y.doc_id)
       |SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= ${Dedup.HAM_T}
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  val sqlTextFunctions: String =
    s"""WITH $simhashCte
       |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  min(${polyhash("d.text")}) AS min_hash,
       |  max(${polyhash("d.text")}) AS max_hash,
       |  CAST(sum(sim.simhash % ${TextOps.SIM_CHECKSUM_MOD}) AS BIGINT) AS sim_checksum
       |FROM documents d JOIN sim ON d.doc_id = sim.doc_id
       |GROUP BY d.lang ORDER BY d.lang""".stripMargin

  val embeddingTopK: String =
    s"""WITH probes AS (
       |  SELECT vec_id AS probe_id, embedding AS pv FROM embeddings
       |  WHERE vec_id < ${Sim.N_PROBES}),
       |scored AS (
       |  SELECT probe_id, vec_id, ${cosine("pv", "embedding")} AS cos
       |  FROM embeddings JOIN probes ON vec_id <> probe_id),
       |r AS (
       |  SELECT probe_id, vec_id, cos,
       |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id)
       |      AS rank
       |  FROM scored)
       |SELECT probe_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id,
       |  ${round6("cos")} AS cosine
       |FROM r WHERE rank <= ${Sim.TOP_K} ORDER BY probe_id, rank""".stripMargin

  /** q199's twin — [[graft.engine.Sim.hardNegatives]]: the q20 scored
    * join with the mining band applied before the rank window; cosines
    * fold in the same IEEE order on both engines, so the literal band
    * compare agrees bit-for-bit. */
  val hardNegatives: String =
    s"""WITH probes AS (
       |  SELECT vec_id AS probe_id, embedding AS pv FROM embeddings
       |  WHERE vec_id < ${Sim.N_PROBES}),
       |scored AS (
       |  SELECT probe_id, vec_id, ${cosine("pv", "embedding")} AS cos
       |  FROM embeddings JOIN probes ON vec_id <> probe_id),
       |banded AS (
       |  SELECT * FROM scored
       |  WHERE cos >= ${Sim.HN_LO} AND cos < ${Sim.HN_HI}),
       |r AS (
       |  SELECT probe_id, vec_id, cos,
       |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id)
       |      AS rank
       |  FROM banded)
       |SELECT probe_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id,
       |  ${round6("cos")} AS cosine
       |FROM r WHERE rank <= ${Sim.TOP_K} ORDER BY probe_id, rank""".stripMargin

  val lshBuckets: String =
    s"""WITH b AS (
       |  SELECT vec_id, CAST(${lshBucket("embedding")} AS BIGINT) AS bucket
       |  FROM embeddings)
       |SELECT bucket, CAST(count(*) AS BIGINT) AS n_vectors,
       |  min(vec_id) AS min_vec_id, max(vec_id) AS max_vec_id
       |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin

  val cosineNearDup: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |    CAST(${lshBucket("embedding")} AS BIGINT) AS bucket
       |  FROM embeddings),
       |bands AS (
       |  SELECT vec_id, unnest([
       |    '0:' || (bucket % 16)::VARCHAR,
       |    '1:' || (bucket // 16)::VARCHAR]) AS band
       |  FROM e),
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
       |  FROM bands x JOIN bands y ON x.band = y.band AND x.vec_id < y.vec_id),
       |p AS (
       |  SELECT vec_a, vec_b, ${cosine("ea.embedding", "eb.embedding")} AS cos
       |  FROM cand
       |  JOIN e ea ON vec_a = ea.vec_id
       |  JOIN e eb ON vec_b = eb.vec_id)
       |SELECT vec_a, vec_b, ${round6("cos")} AS cosine
       |FROM p WHERE cos >= ${Sim.COS_T} ORDER BY vec_a, vec_b""".stripMargin

  val textStats: String =
    s"""WITH t AS (
       |  SELECT lang, len(text)::BIGINT AS len,
       |    len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens
       |  FROM documents),
       |g AS (
       |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(len) AS BIGINT) AS total_chars,
       |    CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |    min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens
       |  FROM t GROUP BY lang)
       |SELECT lang, n_docs, total_chars, total_tokens, min_tokens, max_tokens,
       |  total_tokens::DOUBLE / n_docs AS avg_tokens
       |FROM g ORDER BY lang""".stripMargin

  /** CTE chain producing the per-doc quality row set `r` — shared by the
    * langQuality and curation twins. */
  private val langQualityCte: String = {
    val stopList = TextOps.STOPWORDS.map(s => s"'$s'").mkString(", ")
    s"""t AS (
       |  SELECT doc_id, lang,
       |    len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens,
       |    len(list_filter(string_split_regex(trim(text), '\\s+'),
       |      sw -> sw IN ($stopList)))::BIGINT AS n_stop,
       |    len(regexp_replace(text, '\\s+', '', 'g'))::BIGINT AS n_letters
       |  FROM documents),
       |r AS (
       |  SELECT *, n_stop::DOUBLE / n_tokens::DOUBLE AS stop_ratio,
       |    n_letters::DOUBLE / n_tokens::DOUBLE AS avg_word_len
       |  FROM t)""".stripMargin
  }

  val langQuality: String =
    s"""WITH $langQualityCte
       |SELECT doc_id, lang, n_tokens, n_stop, n_letters, stop_ratio, avg_word_len,
       |  CASE WHEN stop_ratio >= ${TextOps.STOP_RATIO_EN} THEN 'en' ELSE 'unk' END
       |    AS predicted_lang,
       |  CASE WHEN n_tokens < ${TextOps.MIN_TOKENS} THEN 'short'
       |       WHEN stop_ratio > ${TextOps.MAX_STOP_RATIO} THEN 'stopword_heavy'
       |       ELSE 'ok' END AS quality_bucket
       |FROM r ORDER BY doc_id""".stripMargin

  val curation: String =
    s"""WITH RECURSIVE $dupClusterCte,
       |$langQualityCte,
       |v AS (
       |  SELECT r.doc_id,
       |    CASE WHEN lab.cluster_id IS NOT NULL AND r.doc_id <> lab.cluster_id
       |           THEN 'dup'
       |         WHEN r.n_tokens < ${TextOps.MIN_TOKENS} THEN 'short'
       |         WHEN r.stop_ratio > ${TextOps.MAX_STOP_RATIO} THEN 'stopword_heavy'
       |         WHEN r.stop_ratio < ${TextOps.STOP_RATIO_EN} THEN 'non_en'
       |         ELSE 'kept' END AS verdict,
       |    r.n_tokens
       |  FROM r LEFT JOIN lab ON r.doc_id = lab.doc_id)
       |SELECT verdict, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
       |FROM v GROUP BY verdict ORDER BY verdict""".stripMargin

  /** q147's twin: the same four-stage composition — recursive CC keep
    * list, quality floor, temperature rates over the KEPT corpus,
    * hash-gated sample, shard manifest. */
  val curationPipeline: String =
    s"""WITH RECURSIVE $dupClusterCte,
       |$langQualityCte,
       |kept AS (
       |  SELECT r.doc_id, r.lang, r.n_tokens
       |  FROM r LEFT JOIN lab ON r.doc_id = lab.doc_id
       |  WHERE (lab.cluster_id IS NULL OR lab.cluster_id = r.doc_id)
       |    AND r.n_tokens >= ${TextOps.MIN_TOKENS}
       |    AND r.stop_ratio <= ${TextOps.MAX_STOP_RATIO}),
       |counts AS (
       |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
       |  FROM kept GROUP BY lang),
       |z AS (
       |  SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
       |    list_reduce(list_prepend(0.0::DOUBLE,
       |      list_transform(list(n_docs ORDER BY lang), zn -> sqrt(zn::DOUBLE))),
       |      (za, zx) -> za + zx) AS z
       |  FROM counts),
       |rates AS (
       |  SELECT lang,
       |    CAST(floor(least(1.0,
       |      sqrt(n_docs::DOUBLE) / z *
       |        (n_total::DOUBLE / ${TextOps.TEMP_BUDGET_DIV}.0) /
       |        n_docs::DOUBLE) * 1000000) AS BIGINT) AS rate_ppm
       |  FROM counts, z),
       |sampled AS (
       |  SELECT kept.doc_id, kept.lang, kept.n_tokens
       |  FROM kept JOIN rates ON kept.lang = rates.lang
       |  WHERE ${polyhash("('sample:' || doc_id::VARCHAR)")} % 1000000
       |    < rate_ppm),
       |shd AS (
       |  SELECT *, ${polyhash("('shard:' || doc_id::VARCHAR)")}
       |    % ${TextOps.N_SHARDS} AS shard
       |  FROM sampled)
       |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
       |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
       |FROM shd GROUP BY shard ORDER BY shard""".stripMargin

  /** q162's twin: q147's pipeline re-expressed as a per-(lang, verdict)
    * funnel with first-failing-gate attribution — same closure, gates,
    * rate arithmetic, and sample hash; every document lands in exactly
    * one verdict. */
  val curationFunnel: String =
    s"""WITH RECURSIVE $dupClusterCte,
       |$langQualityCte,
       |g AS (
       |  SELECT r.doc_id, r.lang, r.n_tokens,
       |    CASE WHEN lab.cluster_id IS NOT NULL AND r.doc_id <> lab.cluster_id
       |           THEN 'dup'
       |         WHEN r.n_tokens < ${TextOps.MIN_TOKENS} THEN 'short'
       |         WHEN r.stop_ratio > ${TextOps.MAX_STOP_RATIO}
       |           THEN 'stopword_heavy'
       |         END AS pre
       |  FROM r LEFT JOIN lab ON r.doc_id = lab.doc_id),
       |counts AS (
       |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
       |  FROM g WHERE pre IS NULL GROUP BY lang),
       |z AS (
       |  SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
       |    list_reduce(list_prepend(0.0::DOUBLE,
       |      list_transform(list(n_docs ORDER BY lang), zn -> sqrt(zn::DOUBLE))),
       |      (za, zx) -> za + zx) AS z
       |  FROM counts),
       |rates AS (
       |  SELECT lang,
       |    CAST(floor(least(1.0,
       |      sqrt(n_docs::DOUBLE) / z *
       |        (n_total::DOUBLE / ${TextOps.TEMP_BUDGET_DIV}.0) /
       |        n_docs::DOUBLE) * 1000000) AS BIGINT) AS rate_ppm
       |  FROM counts, z),
       |v AS (
       |  SELECT g.lang, g.n_tokens,
       |    COALESCE(g.pre,
       |      CASE WHEN ${polyhash("('sample:' || g.doc_id::VARCHAR)")} % 1000000
       |             >= rates.rate_ppm THEN 'sampled_out' ELSE 'kept' END)
       |      AS verdict
       |  FROM g LEFT JOIN rates ON g.lang = rates.lang)
       |SELECT lang, verdict, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens
       |FROM v GROUP BY lang, verdict ORDER BY lang, verdict""".stripMargin

  /** q163's twin: per-cluster canonical by quality rank (max tokens,
    * ties to min doc_id) over the same recursive closure, with the
    * min-id rule's choice alongside. */
  val qualityCanonicals: String =
    s"""WITH RECURSIVE $dupClusterCte,
       |t AS (
       |  SELECT doc_id,
       |    len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens
       |  FROM documents),
       |m AS (
       |  SELECT lab.cluster_id, lab.doc_id, t.n_tokens
       |  FROM lab JOIN t ON lab.doc_id = t.doc_id),
       |rk AS (
       |  SELECT cluster_id, doc_id, n_tokens,
       |    row_number() OVER (PARTITION BY cluster_id
       |      ORDER BY n_tokens DESC, doc_id) AS r
       |  FROM m),
       |gg AS (
       |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size,
       |    CAST(max(n_tokens) AS BIGINT) AS canonical_tokens,
       |    CAST(min(doc_id) AS BIGINT) AS min_id_canonical
       |  FROM m GROUP BY cluster_id)
       |SELECT gg.cluster_id, gg.cluster_size, rk.doc_id AS canonical_id,
       |  gg.canonical_tokens, gg.min_id_canonical
       |FROM gg JOIN rk ON gg.cluster_id = rk.cluster_id AND rk.r = 1
       |ORDER BY gg.cluster_id""".stripMargin

  /** q164's twin: per-language keep-list accounting under the
    * quality-rank canonical policy, with the min-id rule's token take
    * alongside — same closure, same argmax tie-break. */
  val qualityKeepList: String =
    s"""WITH RECURSIVE $dupClusterCte,
       |t AS (
       |  SELECT doc_id, lang,
       |    len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens
       |  FROM documents),
       |m AS (
       |  SELECT t.doc_id, t.lang, t.n_tokens, lab.cluster_id
       |  FROM t LEFT JOIN lab ON t.doc_id = lab.doc_id),
       |rk AS (
       |  SELECT cluster_id, doc_id,
       |    row_number() OVER (PARTITION BY cluster_id
       |      ORDER BY n_tokens DESC, doc_id) AS r
       |  FROM m WHERE cluster_id IS NOT NULL),
       |canon AS (SELECT cluster_id, doc_id AS q_canon FROM rk WHERE r = 1),
       |v AS (
       |  SELECT m.lang, m.n_tokens,
       |    (m.cluster_id IS NULL OR m.doc_id = canon.q_canon) AS keep,
       |    (m.cluster_id IS NULL OR m.doc_id = m.cluster_id) AS minid_keep
       |  FROM m LEFT JOIN canon ON m.cluster_id = canon.cluster_id),
       |a AS (
       |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |    CAST(sum(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT)
       |      AS kept_tokens,
       |    CAST(sum(CASE WHEN minid_keep THEN n_tokens ELSE 0 END) AS BIGINT)
       |      AS minid_kept_tokens
       |  FROM v GROUP BY lang)
       |SELECT lang, n_docs, n_kept, kept_tokens, minid_kept_tokens,
       |  kept_tokens - minid_kept_tokens AS token_dividend
       |FROM a ORDER BY lang""".stripMargin

  val tokenHistogram: String =
    s"""WITH t AS (
       |  SELECT len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens
       |  FROM documents),
       |b AS (
       |  SELECT least(n_tokens // ${TextOps.HIST_WIDTH}, ${TextOps.HIST_LAST})
       |    AS bucket FROM t),
       |g AS (
       |  SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs FROM b GROUP BY bucket)
       |SELECT bucket, n_docs, bucket * ${TextOps.HIST_WIDTH} AS lo_tokens,
       |  (bucket + 1) * ${TextOps.HIST_WIDTH} AS hi_tokens
       |FROM g ORDER BY bucket""".stripMargin

  val filteredTopK: String =
    s"""WITH $langQualityCte,
       |keep AS (
       |  SELECT doc_id FROM r
       |  WHERE n_tokens >= ${TextOps.MIN_TOKENS}
       |    AND stop_ratio <= ${TextOps.MAX_STOP_RATIO}
       |    AND stop_ratio >= ${TextOps.STOP_RATIO_EN}),
       |probes AS (
       |  SELECT vec_id AS probe_id, embedding AS pv FROM embeddings
       |  WHERE vec_id < ${Sim.N_PROBES}),
       |cand AS (
       |  SELECT e.vec_id, e.embedding
       |  FROM embeddings e JOIN keep ON e.vec_id = keep.doc_id),
       |scored AS (
       |  SELECT probe_id, vec_id, ${cosine("pv", "embedding")} AS cos
       |  FROM cand JOIN probes ON vec_id <> probe_id),
       |r2 AS (
       |  SELECT probe_id, vec_id, cos,
       |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id)
       |      AS rank
       |  FROM scored)
       |SELECT probe_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id,
       |  ${round6("cos")} AS cosine
       |FROM r2 WHERE rank <= ${Sim.TOP_K} ORDER BY probe_id, rank""".stripMargin

  val enumViolations: String =
    Schemas.enums.toSeq.sortBy { case ((t, c), _) => (t, c) }
      .map { case ((t, c), dom) =>
        val list = dom.toSeq.sorted.map(v => s"'$v'").mkString(", ")
        s"SELECT '$t' AS tbl, '$c' AS col_name, " +
          s"CAST(SUM(CASE WHEN $c IS NULL OR $c NOT IN ($list) " +
          s"THEN 1 ELSE 0 END) AS BIGINT) AS violations FROM $t"
      }
      .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY tbl, col_name")

  val topBigrams: String =
    s"""WITH t AS (
       |  SELECT lang, string_split_regex(trim(text), '\\s+') AS w FROM documents),
       |b AS (
       |  SELECT lang, unnest(list_transform(range(1, len(w)),
       |    bgi -> array_to_string(list_slice(w, bgi, bgi + 1), ' '))) AS bigram
       |  FROM t WHERE len(w) >= 2),
       |c AS (
       |  SELECT lang, bigram, CAST(count(*) AS BIGINT) AS n
       |  FROM b GROUP BY lang, bigram),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram)
       |    AS rank
       |  FROM c)
       |SELECT lang, CAST(rank AS BIGINT) AS rank, bigram, n
       |FROM r WHERE rank <= ${TextOps.BIGRAM_TOP_K} ORDER BY lang, rank""".stripMargin

  val tfidfTopTerms: String =
    s"""WITH t AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
       |  FROM documents),
       |tfq AS (
       |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM t GROUP BY doc_id, term),
       |dfq AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfq GROUP BY term),
       |nq AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
       |s AS (
       |  SELECT doc_id, tfq.term, tf, df,
       |    tf::DOUBLE * (n_docs::DOUBLE / df::DOUBLE) AS score
       |  FROM tfq JOIN dfq ON tfq.term = dfq.term, nq),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term)
       |    AS rank
       |  FROM s)
       |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, df,
       |  ${round6("score")} AS score
       |FROM r WHERE rank <= ${TextOps.TFIDF_TOP_K} ORDER BY doc_id, rank""".stripMargin

  val regexTokens: String =
    s"""WITH t AS (
       |  SELECT lang,
       |    len(string_split_regex(trim(text), '\\s+'))::BIGINT AS ws,
       |    len(regexp_extract_all(text, '\\w+|[^\\w\\s]'))::BIGINT AS re
       |  FROM documents)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(ws) AS BIGINT) AS ws_tokens,
       |  CAST(SUM(re) AS BIGINT) AS re_tokens,
       |  CAST(SUM(re) AS BIGINT)::DOUBLE / CAST(SUM(ws) AS BIGINT)::DOUBLE AS ratio
       |FROM t GROUP BY lang ORDER BY lang""".stripMargin

  /** Shared IVF CTE prefix: norms, centroid pick, N×K scoring, argmax
    * assignment — same constants as Sim.ivfAssign. */
  private def ivfPrefix: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding, sqrt(${norm2("embedding")}) AS nrm
       |  FROM embeddings),
       |c AS (
       |  SELECT vec_id AS cent_id, embedding AS cv, nrm AS cnrm
       |  FROM e WHERE vec_id % (SELECT GREATEST(${Sim.IVF_STRIDE},
       |    (count(*) + ${Sim.IVF_MAX_CELLS - 1}) // ${Sim.IVF_MAX_CELLS})
       |    FROM e) = 0),
       |s AS (
       |  SELECT e.vec_id, c.cent_id, ${dot("embedding", "cv")} / (nrm * cnrm) AS cos
       |  FROM e, c),
       |a AS (
       |  SELECT vec_id, cent_id, cos,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
       |  FROM s),
       |a1 AS (
       |  SELECT vec_id, cent_id FROM a WHERE rn = 1)""".stripMargin

  /** q129's twin: the persisted-index lifecycle recomputed in one pass —
    * centroids stride-picked from the BUILD corpus (vec_id % ANN_DELTA_MOD
    * <> 0) with the stride derived from the BUILD count, every vector
    * (build + appended delta) assigned against those frozen centroids,
    * probes searching only their own cell. An append that retrained the
    * centroids (stride over the full count, or delta ids eligible as
    * centroids) diverges here. */
  val ivfIndexProbe: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding, sqrt(${norm2("embedding")}) AS nrm
       |  FROM embeddings),
       |b AS (SELECT * FROM e WHERE vec_id % ${Sim.ANN_DELTA_MOD} <> 0),
       |c AS (
       |  SELECT vec_id AS cent_id, embedding AS cv, nrm AS cnrm
       |  FROM b WHERE vec_id % (SELECT m + CASE WHEN m % ${Sim.ANN_DELTA_MOD}
       |      = 0 THEN 1 ELSE 0 END
       |    FROM (SELECT GREATEST(${Sim.IVF_STRIDE},
       |      (count(*) + ${Sim.IVF_MAX_CELLS - 1}) // ${Sim.IVF_MAX_CELLS})
       |      AS m FROM b)) = 0),
       |s AS (
       |  SELECT e.vec_id, c.cent_id, ${dot("embedding", "cv")} / (nrm * cnrm) AS cos
       |  FROM e, c),
       |a AS (
       |  SELECT vec_id, cent_id, cos,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
       |  FROM s),
       |a1 AS (
       |  SELECT vec_id, cent_id FROM a WHERE rn = 1),
       |p AS (
       |  SELECT a1.vec_id AS probe_id, a1.cent_id AS pcell,
       |    e.embedding AS pv, e.nrm AS pnrm
       |  FROM a1 JOIN e ON a1.vec_id = e.vec_id WHERE a1.vec_id < 4),
       |cand AS (
       |  SELECT p.probe_id, a1.vec_id, ${dot("pv", "embedding")} / (pnrm * nrm) AS cos
       |  FROM a1
       |  JOIN p ON a1.cent_id = p.pcell AND a1.vec_id <> p.probe_id
       |  JOIN e ON a1.vec_id = e.vec_id),
       |r AS (
       |  SELECT probe_id, vec_id, cos,
       |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM cand)
       |SELECT probe_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id,
       |  ${round6("cos")} AS cosine
       |FROM r WHERE rank <= ${Sim.IVF_TOP_K} ORDER BY probe_id, rank""".stripMargin

  val ivfCells: String =
    s"""$ivfPrefix
       |SELECT cent_id, CAST(count(*) AS BIGINT) AS n_vectors,
       |  min(vec_id) AS min_vec_id, max(vec_id) AS max_vec_id
       |FROM a1 GROUP BY cent_id ORDER BY cent_id""".stripMargin

  /** q144's twin: frozen-baseline drift — centroids stride-picked from
    * the BASE population only (stride from the base count), both
    * populations argmax-assigned against them, cosines collapsed to
    * fixed-point before any sum. */
  val embeddingDrift: String = {
    def argmax(src: String): String =
      s"""SELECT vec_id, cent_id, cos FROM (
         |    SELECT $src.vec_id, c.cent_id,
         |      ${dot(s"$src.embedding", "cv")} / ($src.nrm * cnrm) AS cos,
         |      row_number() OVER (PARTITION BY $src.vec_id
         |        ORDER BY ${dot(s"$src.embedding", "cv")} / ($src.nrm * cnrm)
         |          DESC, cent_id) AS rn
         |    FROM $src, c) WHERE rn = 1""".stripMargin
    s"""WITH e AS (
       |  SELECT vec_id, embedding, sqrt(${norm2("embedding")}) AS nrm
       |  FROM embeddings),
       |b AS (SELECT * FROM e WHERE vec_id % ${Sim.DRIFT_MOD} <> 0),
       |l AS (SELECT * FROM e WHERE vec_id % ${Sim.DRIFT_MOD} = 0),
       |c AS (
       |  SELECT vec_id AS cent_id, embedding AS cv, nrm AS cnrm
       |  FROM b WHERE vec_id % (SELECT m + CASE WHEN m % ${Sim.DRIFT_MOD}
       |      = 0 THEN 1 ELSE 0 END
       |    FROM (SELECT GREATEST(${Sim.IVF_STRIDE},
       |      (count(*) + ${Sim.IVF_MAX_CELLS - 1}) // ${Sim.IVF_MAX_CELLS})
       |      AS m FROM b)) = 0),
       |ab AS (${argmax("b")}),
       |al AS (${argmax("l")}),
       |cb AS (
       |  SELECT cent_id, CAST(count(*) AS BIGINT) AS n_base,
       |    CAST(sum(CAST(floor(cos * 1000000) AS BIGINT)) AS BIGINT) AS s_base
       |  FROM ab GROUP BY cent_id),
       |cl AS (
       |  SELECT cent_id, CAST(count(*) AS BIGINT) AS n_live,
       |    CAST(sum(CAST(floor(cos * 1000000) AS BIGINT)) AS BIGINT) AS s_live
       |  FROM al GROUP BY cent_id),
       |j AS (
       |  SELECT COALESCE(cb.cent_id, cl.cent_id) AS cent_id,
       |    COALESCE(n_base, 0) AS n_base, COALESCE(n_live, 0) AS n_live,
       |    COALESCE(s_base, 0) AS s_base, COALESCE(s_live, 0) AS s_live
       |  FROM cb FULL OUTER JOIN cl ON cb.cent_id = cl.cent_id),
       |t AS (
       |  SELECT CAST(sum(n_base) AS BIGINT) AS t_base,
       |    CAST(sum(n_live) AS BIGINT) AS t_live FROM j)
       |SELECT cent_id, n_base, n_live,
       |  n_base * 1000000 // t_base AS base_ppm,
       |  n_live * 1000000 // t_live AS live_ppm,
       |  (n_live * 1000000 // t_live) - (n_base * 1000000 // t_base)
       |    AS drift_ppm,
       |  CASE WHEN n_base = 0 THEN NULL ELSE s_base // n_base END
       |    AS mean_cos_fp6_base,
       |  CASE WHEN n_live = 0 THEN NULL ELSE s_live // n_live END
       |    AS mean_cos_fp6_live
       |FROM j, t ORDER BY cent_id""".stripMargin
  }

  /** q214's twin — [[graft.streaming.DriftStream.streamDriftCellsProbe]]:
    * q144's assignment geometry (stride centroids over the non-live
    * population, argmax cosine with cent_id tie-break) at (batch, cell)
    * grain, the batch restated from the slice-split formula
    * `(vec_id div DRIFT_MOD) mod 2` — the landed per-batch histogram
    * pile must equal it partition for partition. */
  val streamDriftCells: String = {
    def argmax(src: String): String =
      s"""SELECT vec_id, cent_id, cos FROM (
         |    SELECT $src.vec_id, c.cent_id,
         |      ${dot(s"$src.embedding", "cv")} / ($src.nrm * cnrm) AS cos,
         |      row_number() OVER (PARTITION BY $src.vec_id
         |        ORDER BY ${dot(s"$src.embedding", "cv")} / ($src.nrm * cnrm)
         |          DESC, cent_id) AS rn
         |    FROM $src, c) WHERE rn = 1""".stripMargin
    s"""WITH e AS (
       |  SELECT vec_id, embedding, sqrt(${norm2("embedding")}) AS nrm
       |  FROM embeddings),
       |b AS (SELECT * FROM e WHERE vec_id % ${Sim.DRIFT_MOD} <> 0),
       |l AS (SELECT * FROM e WHERE vec_id % ${Sim.DRIFT_MOD} = 0),
       |c AS (
       |  SELECT vec_id AS cent_id, embedding AS cv, nrm AS cnrm
       |  FROM b WHERE vec_id % (SELECT m + CASE WHEN m % ${Sim.DRIFT_MOD}
       |      = 0 THEN 1 ELSE 0 END
       |    FROM (SELECT GREATEST(${Sim.IVF_STRIDE},
       |      (count(*) + ${Sim.IVF_MAX_CELLS - 1}) // ${Sim.IVF_MAX_CELLS})
       |      AS m FROM b)) = 0),
       |al AS (${argmax("l")})
       |SELECT CAST((vec_id // ${Sim.DRIFT_MOD}) % 2 AS BIGINT) AS batch,
       |  cent_id, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(CAST(floor(cos * 1000000) AS BIGINT)) AS BIGINT) AS s_fp6
       |FROM al GROUP BY 1, 2
       |ORDER BY batch, cent_id""".stripMargin
  }

  /** q148's twin: same assignment, same deterministic hash order, same
    * rank cut and cell sizes. */
  val cellCoverageSample: String =
    s"""$ivfPrefix,
       |sz AS (
       |  SELECT cent_id, CAST(count(*) AS BIGINT) AS n_in_cell
       |  FROM a1 GROUP BY cent_id),
       |rk AS (
       |  SELECT cent_id, vec_id,
       |    row_number() OVER (PARTITION BY cent_id
       |      ORDER BY ${polyhash("('cov:' || vec_id::VARCHAR)")} % 1000000,
       |        vec_id)::BIGINT AS rank
       |  FROM a1)
       |SELECT rk.cent_id, rank, vec_id, n_in_cell
       |FROM rk JOIN sz ON rk.cent_id = sz.cent_id
       |WHERE rank <= ${Sim.COV_K}
       |ORDER BY rk.cent_id, rank""".stripMargin

  /** q131's twin: the recall@k-vs-nprobe curve over one shared geometry —
    * index assignment (a1, argmax), probe→cell ranking (pc), and for each
    * measured nprobe the candidates from the probe's top-nprobe cells,
    * top-k'd and intersected with the brute-force ground truth. LEFT JOIN
    * from the nprobe list so a zero-hit setting still yields its row
    * (Spark's global count over an empty semi join does). */
  val ivfNprobeRecall: String =
    s"""$ivfPrefix,
       |p AS (
       |  SELECT vec_id AS probe_id, embedding AS pv, nrm AS pnrm
       |  FROM e WHERE vec_id < ${Sim.N_PROBES}),
       |pc AS (
       |  SELECT probe_id, cent_id, row_number() OVER (PARTITION BY probe_id
       |    ORDER BY ${dot("pv", "cv")} / (pnrm * cnrm) DESC, cent_id) AS crn
       |  FROM p, c),
       |np AS (SELECT unnest([${Sim.NPROBES_MEASURED.mkString(", ")}]) AS nprobe),
       |cand AS (
       |  SELECT np.nprobe, pc.probe_id, a1.vec_id,
       |    ${dot("pv", "embedding")} / (pnrm * nrm) AS cos
       |  FROM np
       |  JOIN pc ON pc.crn <= np.nprobe
       |  JOIN a1 ON a1.cent_id = pc.cent_id AND a1.vec_id <> pc.probe_id
       |  JOIN e ON a1.vec_id = e.vec_id
       |  JOIN p ON p.probe_id = pc.probe_id),
       |r AS (
       |  SELECT nprobe, probe_id, vec_id, row_number() OVER (
       |    PARTITION BY nprobe, probe_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM cand),
       |approx AS (
       |  SELECT nprobe, probe_id, vec_id AS neighbor_id
       |  FROM r WHERE rank <= ${Sim.IVF_TOP_K}),
       |xs AS (
       |  SELECT p.probe_id, e.vec_id,
       |    ${dot("pv", "embedding")} / (pnrm * nrm) AS cos
       |  FROM e JOIN p ON e.vec_id <> p.probe_id),
       |xr AS (
       |  SELECT probe_id, vec_id, row_number() OVER (
       |    PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM xs),
       |exact AS (
       |  SELECT probe_id, vec_id AS neighbor_id
       |  FROM xr WHERE rank <= ${Sim.IVF_TOP_K}),
       |hits AS (
       |  SELECT nprobe, CAST(count(*) AS BIGINT) AS n_hits
       |  FROM approx JOIN exact USING (probe_id, neighbor_id)
       |  GROUP BY nprobe),
       |tot AS (
       |  SELECT CAST(count(DISTINCT probe_id) AS BIGINT) AS n_probes
       |  FROM exact)
       |SELECT CAST(np.nprobe AS BIGINT) AS nprobe, tot.n_probes,
       |  CAST(${Sim.IVF_TOP_K} AS BIGINT) AS k,
       |  COALESCE(hits.n_hits, 0::BIGINT) AS n_hits,
       |  COALESCE(hits.n_hits, 0::BIGINT) * 1000000
       |    // (tot.n_probes * ${Sim.IVF_TOP_K}) AS recall_ppm
       |FROM np LEFT JOIN hits ON np.nprobe = hits.nprobe, tot
       |ORDER BY nprobe""".stripMargin

  val kmeansStep: String =
    s"""$ivfPrefix,
       |comps AS (
       |  SELECT a1.cent_id, (di - 1)::BIGINT AS dim,
       |    CAST(floor(e.embedding[di]::DOUBLE * ${Sim.KMEANS_SCALE}) AS BIGINT)
       |      AS scaled
       |  FROM a1 JOIN e ON a1.vec_id = e.vec_id,
       |    LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS di) t),
       |g AS (
       |  SELECT cent_id, dim, CAST(count(*) AS BIGINT) AS n_members,
       |    CAST(sum(scaled) AS BIGINT) AS ssum
       |  FROM comps GROUP BY cent_id, dim)
       |SELECT cent_id, dim, n_members,
       |  ssum::DOUBLE / (n_members * ${Sim.KMEANS_SCALE})::DOUBLE AS new_coord
       |FROM g ORDER BY cent_id, dim""".stripMargin

  /** [[Sim.KMEANS_ITERS]] Lloyd rounds, unrolled — twin of
    * Sim.kmeansIterated. Each round is the q37/q51 machinery verbatim
    * (N×K cosine scoring, row_number argmax with cent_id tie-break,
    * fixed-point mean), then the means reassemble into FLOAT-narrowed
    * centroid lists (`::FLOAT` ≡ Spark's `cast("float")`, both IEEE
    * round-to-nearest) for the next round's scoring. */
  val kmeansIterated: String = {
    val rounds = (1 to Sim.KMEANS_ITERS).map { i =>
      s"""s$i AS (
         |  SELECT e.vec_id, c.cent_id,
         |    ${dot("embedding", "cv")} / (nrm * cnrm) AS cos
         |  FROM e, c${i - 1} c),
         |n$i AS (
         |  SELECT vec_id, cent_id,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id)
         |      AS rn
         |  FROM s$i),
         |u$i AS (
         |  SELECT a.cent_id, (di - 1)::BIGINT AS dim,
         |    CAST(count(*) AS BIGINT) AS n_members,
         |    CAST(sum(CAST(floor(e.embedding[di]::DOUBLE *
         |      ${Sim.KMEANS_SCALE}) AS BIGINT)) AS BIGINT) AS ssum
         |  FROM (SELECT vec_id, cent_id FROM n$i WHERE rn = 1) a
         |    JOIN e ON a.vec_id = e.vec_id,
         |    LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS di) t
         |  GROUP BY 1, 2),
         |c$i AS (
         |  SELECT cent_id, cv, sqrt(${norm2("cv")}) AS cnrm
         |  FROM (
         |    SELECT cent_id,
         |      list((ssum::DOUBLE / (n_members * ${Sim.KMEANS_SCALE})::DOUBLE
         |        )::FLOAT ORDER BY dim) AS cv
         |    FROM u$i GROUP BY cent_id))""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT vec_id, embedding, sqrt(${norm2("embedding")}) AS nrm
       |  FROM embeddings),
       |c0 AS (
       |  SELECT vec_id AS cent_id, embedding AS cv, nrm AS cnrm
       |  FROM e WHERE vec_id % (SELECT GREATEST(${Sim.IVF_STRIDE},
       |    (count(*) + ${Sim.IVF_MAX_CELLS - 1}) // ${Sim.IVF_MAX_CELLS})
       |    FROM e) = 0),
       |$rounds
       |SELECT cent_id, dim, n_members,
       |  ssum::DOUBLE / (n_members * ${Sim.KMEANS_SCALE})::DOUBLE AS new_coord
       |FROM u${Sim.KMEANS_ITERS} ORDER BY cent_id, dim""".stripMargin
  }

  val ivfTopK: String =
    s"""$ivfPrefix,
       |p AS (
       |  SELECT a1.vec_id AS probe_id, a1.cent_id AS pcell,
       |    e.embedding AS pv, e.nrm AS pnrm
       |  FROM a1 JOIN e ON a1.vec_id = e.vec_id WHERE a1.vec_id < 4),
       |cand AS (
       |  SELECT p.probe_id, a1.vec_id, ${dot("pv", "embedding")} / (pnrm * nrm) AS cos
       |  FROM a1
       |  JOIN p ON a1.cent_id = p.pcell AND a1.vec_id <> p.probe_id
       |  JOIN e ON a1.vec_id = e.vec_id),
       |r AS (
       |  SELECT probe_id, vec_id, cos,
       |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM cand)
       |SELECT probe_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id,
       |  ${round6("cos")} AS cosine
       |FROM r WHERE rank <= ${Sim.IVF_TOP_K} ORDER BY probe_id, rank""".stripMargin

  /** Shared PQ CTE prefix: codebook from every PQ_STRIDE-th vector's
    * subvectors, per-(vector, subspace) argmax-inner-product encoding —
    * same constants as Sim.pqEncode. */
  private def pqPrefix: String = s"WITH $pqPrefixBody"

  private def pqPrefixBody: String =
    s"""pe AS (
       |  SELECT vec_id, embedding FROM embeddings),
       |pm AS (SELECT range AS m FROM range(0, ${Sim.PQ_M})),
       |cb AS (
       |  SELECT m, (vec_id // ${Sim.PQ_STRIDE})::INTEGER AS j,
       |    embedding[m*${Sim.PQ_D}+1 : m*${Sim.PQ_D}+${Sim.PQ_D}] AS cv
       |  FROM pe, pm
       |  WHERE vec_id % ${Sim.PQ_STRIDE} = 0
       |    AND vec_id < ${Sim.PQ_K * Sim.PQ_STRIDE}),
       |sub AS (
       |  SELECT vec_id, m, embedding[m*${Sim.PQ_D}+1 : m*${Sim.PQ_D}+${Sim.PQ_D}] AS sv
       |  FROM pe, pm),
       |sc AS (
       |  SELECT vec_id, sub.m, j, ${dot("sv", "cv")} AS dp
       |  FROM sub JOIN cb ON sub.m = cb.m),
       |rk AS (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY dp DESC, j)
       |    AS rn
       |  FROM sc),
       |enc AS (SELECT vec_id, m, j, dp FROM rk WHERE rn = 1)""".stripMargin

  val pqCodes: String =
    s"""$pqPrefix
       |SELECT vec_id, string_agg(j::VARCHAR, '-' ORDER BY m) AS codes,
       |  ${round6("list_reduce(list_prepend(0.0::DOUBLE, list(dp ORDER BY m)), " +
                   "(qa, qx) -> qa + qx)")} AS approx_self_dot
       |FROM enc GROUP BY vec_id ORDER BY vec_id""".stripMargin

  val pqTopK: String =
    s"""$pqPrefix,
       |cds AS (SELECT vec_id, list(j ORDER BY m) AS code FROM enc GROUP BY vec_id),
       |pl AS (
       |  SELECT sub.vec_id AS probe_id, cb.m, cb.j, ${dot("sv", "cv")} AS dp
       |  FROM sub JOIN cb ON sub.m = cb.m WHERE sub.vec_id < ${Sim.PQ_PROBES}),
       |lut AS (SELECT probe_id, list(dp ORDER BY m, j) AS lut FROM pl
       |        GROUP BY probe_id),
       |adc AS (
       |  SELECT probe_id, vec_id,
       |    list_reduce(list_prepend(0.0::DOUBLE,
       |      list_transform(range(0, ${Sim.PQ_M}),
       |        am -> lut[(am*${Sim.PQ_K} + code[am+1] + 1)::INTEGER])),
       |      (aa, ax) -> aa + ax) AS adc
       |  FROM cds, lut WHERE vec_id <> probe_id),
       |r AS (
       |  SELECT probe_id, vec_id, adc,
       |    row_number() OVER (PARTITION BY probe_id ORDER BY adc DESC, vec_id)
       |      AS rank
       |  FROM adc)
       |SELECT probe_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id,
       |  ${round6("adc")} AS adc_dot
       |FROM r WHERE rank <= ${Sim.PQ_TOP_K} ORDER BY probe_id, rank""".stripMargin

  /** Twin of Sim.ivfpqTopK — the composed IVF-PQ search. Reuses the IVF
    * prefix (e/c/s/a: every vector scored against the stride centroids,
    * ranked per vector) and the PQ prefix (pe/pm/cb/sub/sc/rk/enc: codes)
    * verbatim — their CTE names are disjoint. Probe cells are the
    * top-IVFPQ_NPROBE rows of the SAME ranking `a` the assignment uses
    * (cos DESC, cent_id tie-break ≡ the sorted-slice aggregate); ADC folds
    * the probe's LUT in subspace order; only the top-IVFPQ_RERANK ADC
    * survivors are re-ranked by exact cosine. */
  val ivfpqTopK: String =
    s"""$ivfPrefix,
       |$pqPrefixBody,
       |cds AS (SELECT vec_id, list(j ORDER BY m) AS code FROM enc GROUP BY vec_id),
       |pc AS (
       |  SELECT vec_id AS probe_id, cent_id AS pcell FROM a
       |  WHERE vec_id < ${Sim.PQ_PROBES} AND rn <= ${Sim.IVFPQ_NPROBE}),
       |pl AS (
       |  SELECT sub.vec_id AS probe_id, cb.m, cb.j, ${dot("sv", "cv")} AS dp
       |  FROM sub JOIN cb ON sub.m = cb.m WHERE sub.vec_id < ${Sim.PQ_PROBES}),
       |lut AS (SELECT probe_id, list(dp ORDER BY m, j) AS lut FROM pl
       |        GROUP BY probe_id),
       |adc AS (
       |  SELECT pc.probe_id, a1.vec_id,
       |    list_reduce(list_prepend(0.0::DOUBLE,
       |      list_transform(range(0, ${Sim.PQ_M}),
       |        am -> lut[(am*${Sim.PQ_K} + code[am+1] + 1)::INTEGER])),
       |      (aa, ax) -> aa + ax) AS adc
       |  FROM a1
       |  JOIN pc ON a1.cent_id = pc.pcell AND a1.vec_id <> pc.probe_id
       |  JOIN cds ON a1.vec_id = cds.vec_id
       |  JOIN lut ON pc.probe_id = lut.probe_id),
       |sl AS (
       |  SELECT *, row_number() OVER (PARTITION BY probe_id
       |    ORDER BY adc DESC, vec_id) AS arank
       |  FROM adc),
       |rr AS (
       |  SELECT sl.probe_id, sl.vec_id, sl.adc,
       |    ${dot("pv", "embedding")} / (pnrm * nrm) AS cos
       |  FROM sl
       |  JOIN e ON sl.vec_id = e.vec_id
       |  JOIN (SELECT vec_id AS probe_id, embedding AS pv, nrm AS pnrm
       |        FROM e WHERE vec_id < ${Sim.PQ_PROBES}) p
       |    ON sl.probe_id = p.probe_id
       |  WHERE sl.arank <= ${Sim.IVFPQ_RERANK}),
       |r AS (
       |  SELECT probe_id, vec_id, adc, cos,
       |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id)
       |      AS rank
       |  FROM rr)
       |SELECT probe_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id,
       |  ${round6("adc")} AS adc_dot, ${round6("cos")} AS cosine
       |FROM r WHERE rank <= ${Sim.IVF_TOP_K} ORDER BY probe_id, rank""".stripMargin

  /** q149's twin: the persisted compressed-index lifecycle in one pass —
    * coarse centroids AND PQ codebook drawn from the BUILD population
    * only (frozen artifacts), every vector (build + delta) assigned and
    * encoded against them, probes searching their top-nprobe cells with
    * ADC then exact rerank. */
  val ivfpqIndexProbe: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding, sqrt(${norm2("embedding")}) AS nrm
       |  FROM embeddings),
       |b AS (SELECT * FROM e WHERE vec_id % ${Sim.ANN_DELTA_MOD} <> 0),
       |c AS (
       |  SELECT vec_id AS cent_id, embedding AS cv, nrm AS cnrm
       |  FROM b WHERE vec_id % (SELECT m + CASE WHEN m % ${Sim.ANN_DELTA_MOD}
       |      = 0 THEN 1 ELSE 0 END
       |    FROM (SELECT GREATEST(${Sim.IVF_STRIDE},
       |      (count(*) + ${Sim.IVF_MAX_CELLS - 1}) // ${Sim.IVF_MAX_CELLS})
       |      AS m FROM b)) = 0),
       |s AS (
       |  SELECT e.vec_id, c.cent_id, ${dot("embedding", "cv")} / (nrm * cnrm) AS cos
       |  FROM e, c),
       |a AS (
       |  SELECT vec_id, cent_id, cos,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
       |  FROM s),
       |a1 AS (
       |  SELECT vec_id, cent_id FROM a WHERE rn = 1),
       |pm AS (SELECT range AS m FROM range(0, ${Sim.PQ_M})),
       |cbv AS (
       |  SELECT embedding,
       |    (row_number() OVER (ORDER BY vec_id) - 1)::INTEGER AS j
       |  FROM b
       |  WHERE vec_id % ${Sim.PQ_STRIDE} = 0
       |    AND vec_id < ${Sim.PQ_K * Sim.PQ_STRIDE}),
       |cb AS (
       |  SELECT m, j,
       |    embedding[m*${Sim.PQ_D}+1 : m*${Sim.PQ_D}+${Sim.PQ_D}] AS cv
       |  FROM cbv, pm),
       |sub AS (
       |  SELECT vec_id, m,
       |    embedding[m*${Sim.PQ_D}+1 : m*${Sim.PQ_D}+${Sim.PQ_D}] AS sv
       |  FROM e, pm),
       |sc AS (
       |  SELECT vec_id, sub.m, j, ${dot("sv", "cv")} AS dp
       |  FROM sub JOIN cb ON sub.m = cb.m),
       |rkk AS (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY dp DESC, j)
       |    AS rn
       |  FROM sc),
       |enc AS (SELECT vec_id, m, j FROM rkk WHERE rn = 1),
       |cds AS (SELECT vec_id, list(j ORDER BY m) AS code FROM enc GROUP BY vec_id),
       |pc AS (
       |  SELECT vec_id AS probe_id, cent_id AS pcell FROM a
       |  WHERE vec_id < ${Sim.PQ_PROBES} AND rn <= ${Sim.IVFPQ_NPROBE}),
       |pl AS (
       |  SELECT sub.vec_id AS probe_id, cb.m, cb.j, ${dot("sv", "cv")} AS dp
       |  FROM sub JOIN cb ON sub.m = cb.m WHERE sub.vec_id < ${Sim.PQ_PROBES}),
       |lut AS (SELECT probe_id, list(dp ORDER BY m, j) AS lut FROM pl
       |        GROUP BY probe_id),
       |adc AS (
       |  SELECT pc.probe_id, a1.vec_id,
       |    list_reduce(list_prepend(0.0::DOUBLE,
       |      list_transform(range(0, ${Sim.PQ_M}),
       |        am -> lut[(am*(len(lut)//${Sim.PQ_M}) + code[am+1] + 1)::INTEGER])),
       |      (aa, ax) -> aa + ax) AS adc
       |  FROM a1
       |  JOIN pc ON a1.cent_id = pc.pcell AND a1.vec_id <> pc.probe_id
       |  JOIN cds ON a1.vec_id = cds.vec_id
       |  JOIN lut ON pc.probe_id = lut.probe_id),
       |sl AS (
       |  SELECT *, row_number() OVER (PARTITION BY probe_id
       |    ORDER BY adc DESC, vec_id) AS arank
       |  FROM adc),
       |rr AS (
       |  SELECT sl.probe_id, sl.vec_id, sl.adc,
       |    ${dot("pv", "embedding")} / (pnrm * nrm) AS cos
       |  FROM sl
       |  JOIN e ON sl.vec_id = e.vec_id
       |  JOIN (SELECT vec_id AS probe_id, embedding AS pv, nrm AS pnrm
       |        FROM e WHERE vec_id < ${Sim.PQ_PROBES}) p
       |    ON sl.probe_id = p.probe_id
       |  WHERE sl.arank <= ${Sim.IVFPQ_RERANK}),
       |r AS (
       |  SELECT probe_id, vec_id, adc, cos,
       |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id)
       |      AS rank
       |  FROM rr)
       |SELECT probe_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id,
       |  ${round6("adc")} AS adc_dot, ${round6("cos")} AS cosine
       |FROM r WHERE rank <= ${Sim.IVF_TOP_K} ORDER BY probe_id, rank""".stripMargin

  val hashSample: String =
    s"""WITH s AS (
       |  SELECT lang, doc_id,
       |    len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens
       |  FROM documents
       |  WHERE ${polyhash("text")} % ${TextOps.SAMPLE_BUCKETS} = 0)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled,
       |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
       |  CAST(sum(n_tokens) AS BIGINT) AS sample_tokens
       |FROM s GROUP BY lang ORDER BY lang""".stripMargin

  val sequencePacking: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT *, COALESCE(CAST(SUM(n_tokens) OVER (
       |      PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
       |    AS cum_before
       |  FROM t),
       |b AS (SELECT *, cum_before // ${TextOps.PACK_BUDGET} AS bin_id FROM c)
       |SELECT lang, bin_id, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
       |  min(doc_id) AS first_doc_id, max(doc_id) AS last_doc_id
       |FROM b GROUP BY lang, bin_id ORDER BY lang, bin_id""".stripMargin

  val percentileGate: String =
    s"""WITH $langQualityCte,
       |d AS (
       |  SELECT doc_id, lang, n_tokens, stop_ratio,
       |    ntile(10) OVER (PARTITION BY lang ORDER BY stop_ratio DESC, doc_id)
       |      AS decile
       |  FROM r)
       |SELECT lang, CAST(decile AS BIGINT) AS decile,
       |  decile <= ${TextOps.KEEP_DECILES} AS kept,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS decile_tokens,
       |  ${round6("min(stop_ratio)")} AS min_stop_ratio,
       |  ${round6("max(stop_ratio)")} AS max_stop_ratio
       |FROM d GROUP BY lang, decile ORDER BY lang, decile""".stripMargin

  val stratifiedSplit: String =
    s"""WITH s AS (
       |  SELECT doc_id, lang,
       |    len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens,
       |    ${polyhash("text")} % ${TextOps.SAMPLE_BUCKETS} AS bucket
       |  FROM documents)
       |SELECT lang,
       |  CASE WHEN bucket = 0 THEN 'test' WHEN bucket = 1 THEN 'val'
       |       ELSE 'train' END AS split,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS split_tokens,
       |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
       |FROM s GROUP BY lang, split ORDER BY lang, split""".stripMargin

  val decontamination: String =
    s"""WITH corpus AS (
       |  SELECT doc_id, lang, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 100001, lang, text FROM documents WHERE doc_id % 7 = 0),
       |h AS (
       |  SELECT doc_id, lang,
       |    sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
       |      AS content_hash,
       |    CASE WHEN doc_id % 10 = 9 THEN 'heldout' ELSE 'train' END AS split
       |  FROM corpus),
       |ho AS (SELECT DISTINCT content_hash FROM h WHERE split = 'heldout')
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_contaminated,
       |  min(doc_id) AS min_contaminated_id
       |FROM h
       |WHERE split = 'train'
       |  AND EXISTS (SELECT 1 FROM ho WHERE ho.content_hash = h.content_hash)
       |GROUP BY lang ORDER BY lang""".stripMargin

  val sourceMixture: String =
    s"""WITH s AS (
       |  SELECT source, doc_id,
       |    len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens,
       |    50 * (1 + CAST(regexp_extract(source, '(\\d+)', 1) AS BIGINT) % 19)
       |      AS rate_permille,
       |    ${polyhash("text")} % ${TextOps.MIX_DENOM} AS bucket
       |  FROM documents),
       |k AS (SELECT *, bucket < rate_permille AS kept FROM s)
       |SELECT source, rate_permille, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(SUM(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT)
       |    AS kept_tokens,
       |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)::DOUBLE /
       |    count(*)::DOUBLE AS effective_rate
       |FROM k GROUP BY source, rate_permille ORDER BY source""".stripMargin

  val docFingerprint: String =
    s"""WITH g AS (
       |  SELECT doc_id, list_transform(
       |    range(1, greatest(len(text) - 7, 1) + 1),
       |    fgi -> ${polyhash("substr(text, fgi, 8)")}) AS g
       |  FROM documents)
       |SELECT doc_id, list_aggregate(g, 'min') AS fp_min,
       |  len(list_distinct(g))::BIGINT AS n_distinct_grams
       |FROM g ORDER BY doc_id""".stripMargin

  /** q141's twin: same α=0.5 flattening — sqrt weights, normalizer folded
    * in sorted-lang order, rate floored to ppm BEFORE gating, identical
    * float op sequence to TextOps.temperatureSample. */
  val temperatureSample: String =
    s"""WITH t AS (
       |  SELECT lang, doc_id,
       |    len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens,
       |    ${polyhash("text")} % 1000000 AS bucket
       |  FROM documents),
       |counts AS (
       |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM t GROUP BY lang),
       |z AS (
       |  SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
       |    list_reduce(list_prepend(0.0::DOUBLE,
       |      list_transform(list(n_docs ORDER BY lang), zn -> sqrt(zn::DOUBLE))),
       |      (za, zx) -> za + zx) AS z
       |  FROM counts),
       |rates AS (
       |  SELECT lang, n_docs,
       |    CAST(floor(least(1.0,
       |      sqrt(n_docs::DOUBLE) / z *
       |        (n_total::DOUBLE / ${TextOps.TEMP_BUDGET_DIV}.0) /
       |        n_docs::DOUBLE) * 1000000) AS BIGINT) AS rate_ppm
       |  FROM counts, z),
       |g AS (
       |  SELECT t.lang, rate_ppm, n_tokens, (bucket < rate_ppm) AS kept
       |  FROM t JOIN rates ON t.lang = rates.lang)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, rate_ppm,
       |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT)
       |    AS kept_tokens,
       |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) * 1000000
       |    // CAST(count(*) AS BIGINT) AS effective_ppm
       |FROM g GROUP BY lang, rate_ppm ORDER BY lang""".stripMargin

  /** q143's twin: same shard hash, same within-shard (h, doc_id) order,
    * same position-weighted checksum. */
  val trainingShards: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens,
       |    ${polyhash("('shard:' || doc_id::VARCHAR)")} AS h
       |  FROM documents),
       |s AS (
       |  SELECT *, h % ${TextOps.N_SHARDS} AS shard,
       |    row_number() OVER (PARTITION BY h % ${TextOps.N_SHARDS}
       |      ORDER BY h, doc_id)::BIGINT AS pos
       |  FROM t)
       |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
       |  min(h) AS min_hash, max(h) AS max_hash,
       |  CAST(sum(pos * (h % 1000000)) AS BIGINT) AS order_checksum
       |FROM s GROUP BY shard ORDER BY shard""".stripMargin

  /** q151's twin: identical integer waterfilling — sorted prefix sums,
    * the (k, p, q) waterline segment, div-exact rates, same hash gate. */
  val tokenBudgetMixture: String =
    s"""WITH docs AS (
       |  SELECT source, doc_id,
       |    len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens,
       |    ${polyhash("text")} % 1000000 AS bucket
       |  FROM documents),
       |counts AS (
       |  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS t
       |  FROM docs GROUP BY source),
       |tot AS (
       |  SELECT CAST(sum(t) AS BIGINT) AS total,
       |    CAST(count(*) AS BIGINT) AS n_src,
       |    CAST(sum(t) AS BIGINT) // ${TextOps.MIX_BUDGET_DIV} AS b
       |  FROM counts),
       |ranked AS (
       |  SELECT source, t,
       |    row_number() OVER (ORDER BY t, source)::BIGINT AS r,
       |    CAST(sum(t) OVER (ORDER BY t, source
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum
       |  FROM counts),
       |flagged AS (
       |  SELECT ranked.*, (cum + (n_src - r) * t <= b) AS fully_kept
       |  FROM ranked, tot),
       |line AS (
       |  SELECT CAST(sum(CASE WHEN fully_kept THEN 1 ELSE 0 END) AS BIGINT)
       |      AS k,
       |    CAST(sum(CASE WHEN fully_kept THEN t ELSE 0 END) AS BIGINT)
       |      AS cum_k
       |  FROM flagged),
       |lpq AS (SELECT k, b - cum_k AS p, n_src - k AS q FROM line, tot),
       |rates AS (
       |  SELECT source, t,
       |    CAST(CASE WHEN fully_kept OR q = 0 THEN 1000000
       |         ELSE (1000000 * p) // (q * t) END AS BIGINT) AS rate_ppm
       |  FROM flagged, lpq),
       |g AS (
       |  SELECT docs.source, t, rate_ppm, n_tokens,
       |    (bucket < rate_ppm) AS kept
       |  FROM docs JOIN rates ON docs.source = rates.source)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs, t AS n_tokens,
       |  rate_ppm, t * rate_ppm // 1000000 AS expected_tokens,
       |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_kept_docs,
       |  CAST(sum(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT)
       |    AS kept_tokens
       |FROM g GROUP BY source, t, rate_ppm ORDER BY source""".stripMargin

  /** q165's twin: q151's integer waterfilling solved over effective
    * (dedup-weighted) token masses — same closure as q160's weights,
    * same (k, p, q) waterline, same hash gate. */
  val weightedTokenMixture: String =
    s"""WITH RECURSIVE $dupClusterCte,
       |sz AS (
       |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS csize
       |  FROM lab GROUP BY cluster_id),
       |docs AS (
       |  SELECT d.source, d.doc_id,
       |    len(string_split_regex(trim(d.text), '\\s+'))::BIGINT AS n_tokens,
       |    ${polyhash("d.text")} % 1000000 AS bucket,
       |    len(string_split_regex(trim(d.text), '\\s+'))::BIGINT *
       |      (1000000 // COALESCE(sz.csize, 1)) AS eff_ppm
       |  FROM documents d
       |  LEFT JOIN lab ON d.doc_id = lab.doc_id
       |  LEFT JOIN sz ON lab.cluster_id = sz.cluster_id),
       |counts AS (
       |  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS raw_t,
       |    CAST(sum(eff_ppm) AS BIGINT) // 1000000 AS t
       |  FROM docs GROUP BY source),
       |tot AS (
       |  SELECT CAST(sum(t) AS BIGINT) AS total,
       |    CAST(count(*) AS BIGINT) AS n_src,
       |    CAST(sum(t) AS BIGINT) // ${TextOps.MIX_BUDGET_DIV} AS b
       |  FROM counts),
       |ranked AS (
       |  SELECT source, t,
       |    row_number() OVER (ORDER BY t, source)::BIGINT AS r,
       |    CAST(sum(t) OVER (ORDER BY t, source
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum
       |  FROM counts),
       |flagged AS (
       |  SELECT ranked.*, (cum + (n_src - r) * t <= b) AS fully_kept
       |  FROM ranked, tot),
       |line AS (
       |  SELECT CAST(sum(CASE WHEN fully_kept THEN 1 ELSE 0 END) AS BIGINT)
       |      AS k,
       |    CAST(sum(CASE WHEN fully_kept THEN t ELSE 0 END) AS BIGINT)
       |      AS cum_k
       |  FROM flagged),
       |lpq AS (SELECT k, b - cum_k AS p, n_src - k AS q FROM line, tot),
       |rates AS (
       |  SELECT source, t,
       |    CAST(CASE WHEN fully_kept OR q = 0 THEN 1000000
       |         ELSE (1000000 * p) // (q * t) END AS BIGINT) AS rate_ppm
       |  FROM flagged, lpq),
       |g AS (
       |  SELECT docs.source, counts.raw_t, rates.t, rate_ppm, n_tokens,
       |    eff_ppm, (bucket < rate_ppm) AS kept
       |  FROM docs JOIN rates ON docs.source = rates.source
       |  JOIN counts ON docs.source = counts.source)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  raw_t AS raw_tokens, t AS eff_tokens, rate_ppm,
       |  t * rate_ppm // 1000000 AS expected_eff_tokens,
       |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_kept_docs,
       |  CAST(sum(CASE WHEN kept THEN eff_ppm ELSE 0 END) AS BIGINT)
       |    // 1000000 AS kept_eff_tokens
       |FROM g GROUP BY source, raw_t, t, rate_ppm ORDER BY source""".stripMargin

  /** q167's twin: same corpus-relative cap (total div (2·n_src)), same
    * greedy hash-order prefix (a doc is admitted while its source's
    * budget is unexhausted). */
  val sourceTokenCap: String =
    s"""WITH docs AS (
       |  SELECT source, doc_id,
       |    len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens,
       |    ${polyhash("('cap:' || doc_id::VARCHAR)")} % 1000000 AS h
       |  FROM documents),
       |cap AS (
       |  SELECT CAST(sum(n_tokens) AS BIGINT)
       |    // (${TextOps.SRC_CAP_DIV} * count(DISTINCT source)) AS cap
       |  FROM docs),
       |cum AS (
       |  SELECT source, n_tokens,
       |    COALESCE(CAST(sum(n_tokens) OVER (PARTITION BY source
       |      ORDER BY h, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
       |      0) AS cum_before
       |  FROM docs),
       |v AS (
       |  SELECT source, n_tokens, (cum_before < cap) AS keep FROM cum, cap)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT)
       |    AS kept_tokens,
       |  (sum(CASE WHEN keep THEN 0 ELSE 1 END) > 0) AS capped
       |FROM v GROUP BY source ORDER BY source""".stripMargin

  /** q168's twin: largest-remainder apportionment on the per-language
    * counts, then the same two-phase (ppm pre-filter + exact rank)
    * quota-prefix pick. */
  val stratifiedEvalSample: String =
    s"""WITH docs AS (
       |  SELECT doc_id, lang,
       |    ${polyhash("('eval:' || doc_id::VARCHAR)")} % 1000000 AS h
       |  FROM documents),
       |counts AS (
       |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
       |  FROM docs GROUP BY lang),
       |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM counts),
       |based AS (
       |  SELECT lang, n_docs,
       |    (${TextOps.EVAL_N} * n_docs) // total AS base,
       |    (${TextOps.EVAL_N} * n_docs) % total AS rem
       |  FROM counts, tot),
       |seats AS (
       |  SELECT ${TextOps.EVAL_N} - CAST(sum(base) AS BIGINT) AS extra
       |  FROM based),
       |quotas AS (
       |  SELECT lang, n_docs,
       |    base + (CASE WHEN row_number() OVER (ORDER BY rem DESC, lang)
       |      <= extra THEN 1 ELSE 0 END) AS quota
       |  FROM based, seats),
       |thr AS (
       |  SELECT lang, n_docs, quota,
       |    least(1000000, (${TextOps.EVAL_OVER} * 1000000 * quota)
       |      // n_docs + 1000) AS thr_ppm
       |  FROM quotas),
       |cand AS (
       |  SELECT docs.lang, doc_id, n_docs, quota,
       |    row_number() OVER (PARTITION BY docs.lang
       |      ORDER BY h, doc_id) AS r
       |  FROM docs JOIN thr ON docs.lang = thr.lang
       |  WHERE h < thr_ppm)
       |SELECT lang, n_docs, CAST(quota AS BIGINT) AS quota,
       |  CAST(count(*) AS BIGINT) AS n_picked,
       |  CAST(sum(doc_id) AS BIGINT) AS picked_id_sum
       |FROM cand WHERE r <= quota
       |GROUP BY lang, n_docs, quota ORDER BY lang""".stripMargin

  /** q169's twin: the same bounded-histogram nearest-rank percentile —
    * cumulative counts over (lang, n_tokens), smallest length reaching
    * ceil(n·p/100). */
  val lengthPercentiles: String =
    s"""WITH t AS (
       |  SELECT lang,
       |    len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens
       |  FROM documents),
       |h AS (
       |  SELECT lang, n_tokens, CAST(count(*) AS BIGINT) AS cnt
       |  FROM t GROUP BY lang, n_tokens),
       |c AS (
       |  SELECT lang, n_tokens,
       |    CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY n_tokens
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum
       |  FROM h),
       |tot AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS n FROM h GROUP BY lang),
       |p AS (SELECT * FROM (VALUES ${TextOps.LEN_PCTS
           .map(x => s"(CAST($x AS BIGINT))").mkString(", ")}) AS v(pct))
       |SELECT c.lang, pct, n AS n_docs,
       |  CAST(min(n_tokens) AS BIGINT) AS tokens
       |FROM c JOIN tot ON c.lang = tot.lang CROSS JOIN p
       |WHERE cum >= (n * pct + 99) // 100
       |GROUP BY c.lang, pct, n ORDER BY c.lang, pct""".stripMargin

  val repetition: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS w
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, lang,
       |    greatest(len(w) - 2, 1)::BIGINT AS n_shingles,
       |    len(${shingleHashes("w")})::BIGINT AS n_distinct_shingles
       |  FROM toks)
       |SELECT doc_id, lang, n_shingles, n_distinct_shingles,
       |  ${round6("1.0 - n_distinct_shingles::DOUBLE / n_shingles::DOUBLE")}
       |    AS rep_ratio,
       |  (${round6("1.0 - n_distinct_shingles::DOUBLE / n_shingles::DOUBLE")})
       |    > ${TextOps.REP_T} AS repetitive
       |FROM r ORDER BY doc_id""".stripMargin

  /** q130's twin: the same relative-df gate in integer arithmetic —
    * distinct-per-doc gram hashes make `count(*)` the document
    * frequency, and `df*100 >= n_docs*pct` is the exact comparison the
    * Spark side runs. */
  val boilerplateNgrams: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, ${shingleHashes("w")} AS sh FROM toks),
       |gr AS (
       |  SELECT doc_id, unnest(sh) AS g FROM sh),
       |tot AS (SELECT count(*) AS n_total FROM sh),
       |heavy AS (
       |  SELECT g FROM gr GROUP BY g
       |  HAVING count(*) * 100 >= (SELECT n_total FROM tot)
       |    * ${TextOps.BOILER_DF_PCT}),
       |per AS (
       |  SELECT gr.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |    CAST(count(h.g) AS BIGINT) AS n_boiler
       |  FROM gr LEFT JOIN heavy h ON gr.g = h.g
       |  GROUP BY gr.doc_id)
       |SELECT doc_id, n_grams, n_boiler,
       |  ${round6("n_boiler::DOUBLE / n_grams::DOUBLE")} AS boiler_ratio
       |FROM per ORDER BY doc_id""".stripMargin

  /** q132's twin: the heavy-gram monitor's table — per heavy gram its
    * document frequency, plus the -1 sentinel row carrying total docs
    * (graft.streaming.DocsStream.heavyGramMonitor is the same operator
    * run as a stream; StreamingSpec pins stream ≡ batch, this oracle
    * pins batch ≡ DuckDB). */
  val heavyGramMonitor: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, ${shingleHashes("w")} AS sh FROM toks),
       |gr AS (
       |  SELECT doc_id, unnest(sh) AS g FROM sh),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM sh),
       |heavy AS (
       |  SELECT g FROM gr GROUP BY g
       |  HAVING count(*) * 100 >= (SELECT n_total FROM tot)
       |    * ${TextOps.BOILER_DF_PCT})
       |SELECT gr.g, CAST(count(*) AS BIGINT) AS n_docs_stream
       |FROM gr JOIN heavy h ON gr.g = h.g GROUP BY gr.g
       |UNION ALL
       |SELECT CAST(-1 AS BIGINT) AS g, n_total AS n_docs_stream FROM tot
       |ORDER BY g""".stripMargin

  /** q135's twin: global top-N word-bigram inventory with the
    * deterministic (count desc, bigram asc) boundary, coverage per lang
    * in exact ppm. Bigrams use the same truncating trailing-slice
    * convention as TextFns.shingles (≥1 entry even for 1-token docs). */
  val vocabCoverage: String =
    s"""WITH toks AS (
       |  SELECT lang, string_split_regex(trim(text), '\\s+') AS w
       |  FROM documents),
       |bg AS (
       |  SELECT lang,
       |    ${polyhash("array_to_string(list_slice(w, i, i + 1), ' ')")} AS b
       |  FROM toks, LATERAL (SELECT unnest(range(1,
       |    greatest(len(w) - 1, 1) + 1)) AS i) t),
       |vocab AS (
       |  SELECT b FROM (
       |    SELECT b, count(*) AS n FROM bg GROUP BY b)
       |  ORDER BY n DESC, b ASC LIMIT ${TextOps.VOCAB_N})
       |SELECT g.lang, CAST(count(*) AS BIGINT) AS n_bigrams,
       |  CAST(count(v.b) AS BIGINT) AS n_covered,
       |  CAST(count(v.b) AS BIGINT) * 1000000
       |    // CAST(count(*) AS BIGINT) AS coverage_ppm
       |FROM bg g LEFT JOIN vocab v ON g.b = v.b
       |GROUP BY g.lang ORDER BY g.lang""".stripMargin

  /** q133's twin — positions kept (unlike the distinct shingle set), the
    * same rolling hash, a df≥2 duplicated set, and gaps-and-islands for
    * the longest duplicated run. `list_slice` end-index is inclusive;
    * Spark's `slice(w, i, W)` takes W elements — both truncate at the
    * tail identically. */
  /** q152's twin: same positioned window hashes (k = PHRASE_W), same
    * phrase-hash probe, zero-hit phrases kept by the left join. */
  val phraseSearch: String = {
    val phraseList = TextOps.PHRASES.map(p => s"'$p'").mkString(", ")
    s"""WITH p AS (SELECT unnest([$phraseList]) AS phrase),
       |ph AS (SELECT phrase, ${polyhash("phrase")} AS h FROM p),
       |toks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
       |  FROM documents),
       |win AS (
       |  SELECT doc_id,
       |    ${polyhash(s"array_to_string(list_slice(w, pos, pos + ${TextOps.PHRASE_W - 1}), ' ')")} AS h
       |  FROM toks, LATERAL (SELECT unnest(range(1,
       |    greatest(len(w) - ${TextOps.PHRASE_W - 1}, 1) + 1)) AS pos) t),
       |hits AS (
       |  SELECT phrase, doc_id FROM win JOIN ph ON win.h = ph.h),
       |a AS (
       |  SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
       |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |    min(doc_id) AS first_doc_id
       |  FROM hits GROUP BY phrase)
       |SELECT p.phrase, COALESCE(n_occurrences, 0) AS n_occurrences,
       |  COALESCE(n_docs, 0) AS n_docs, first_doc_id
       |FROM p LEFT JOIN a USING (phrase) ORDER BY phrase""".stripMargin
  }

  val repeatedSpans: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
       |  FROM documents),
       |win AS (
       |  SELECT doc_id, (pos - 1)::BIGINT AS pos,
       |    ${polyhash(s"array_to_string(list_slice(w, pos, pos + ${TextOps.SPAN_W - 1}), ' ')")} AS h
       |  FROM toks, LATERAL (SELECT unnest(range(1,
       |    greatest(len(w) - ${TextOps.SPAN_W - 1}, 1) + 1)) AS pos) t),
       |dup AS (
       |  SELECT h FROM (SELECT DISTINCT doc_id, h FROM win)
       |  GROUP BY h HAVING count(*) >= 2),
       |fl AS (
       |  SELECT win.doc_id, win.pos, (dup.h IS NOT NULL) AS is_dup
       |  FROM win LEFT JOIN dup ON win.h = dup.h),
       |runs AS (
       |  SELECT doc_id, island, CAST(count(*) AS BIGINT) AS run FROM (
       |    SELECT doc_id,
       |      pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
       |        AS island
       |    FROM fl WHERE is_dup)
       |  GROUP BY doc_id, island),
       |runlen AS (
       |  SELECT doc_id, CAST(max(run) AS BIGINT) AS longest_dup_run
       |  FROM runs GROUP BY doc_id),
       |per AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
       |    CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_dup_windows
       |  FROM fl GROUP BY doc_id)
       |SELECT per.doc_id, n_windows, n_dup_windows,
       |  ${round6("n_dup_windows::DOUBLE / n_windows::DOUBLE")} AS dup_ratio,
       |  COALESCE(runlen.longest_dup_run, 0::BIGINT) AS longest_dup_run
       |FROM per LEFT JOIN runlen ON per.doc_id = runlen.doc_id
       |ORDER BY per.doc_id""".stripMargin

  val piiScan: String =
    s"""WITH p AS (
       |  SELECT lang, CASE WHEN doc_id % ${TextOps.PII_EVERY} = 0
       |    THEN text || ' contact user' || doc_id::VARCHAR ||
       |      '@example.com tel 555-0' || doc_id::VARCHAR
       |    ELSE text END AS text2
       |  FROM documents),
       |c AS (
       |  SELECT lang,
       |    len(regexp_extract_all(text2, '${TextOps.EMAIL_RE}'))::BIGINT AS n_emails,
       |    len(regexp_extract_all(text2, '${TextOps.PHONE_RE}'))::BIGINT AS n_phones,
       |    len(text2)::BIGINT AS len_raw,
       |    len(regexp_replace(regexp_replace(text2,
       |      '${TextOps.EMAIL_RE}', '<EMAIL>', 'g'),
       |      '${TextOps.PHONE_RE}', '<PHONE>', 'g'))::BIGINT AS len_redacted
       |  FROM p)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN n_emails + n_phones > 0 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_docs_with_pii,
       |  CAST(SUM(n_emails) AS BIGINT) AS total_emails,
       |  CAST(SUM(n_phones) AS BIGINT) AS total_phones,
       |  CAST(SUM(len_raw) AS BIGINT) AS total_chars_raw,
       |  CAST(SUM(len_redacted) AS BIGINT) AS total_chars_redacted
       |FROM c GROUP BY lang ORDER BY lang""".stripMargin

  val docChunks: String =
    s"""WITH s AS (
       |  SELECT doc_id, i::BIGINT AS i,
       |    substr(text, i::INTEGER, ${TextOps.CHUNK_SIZE}) AS c
       |  FROM documents,
       |    LATERAL (SELECT unnest(generate_series(1,
       |      greatest(len(text), 1), ${TextOps.CHUNK_STRIDE})) AS i) g)
       |SELECT doc_id,
       |  ((i - 1) // ${TextOps.CHUNK_STRIDE} + 1)::BIGINT AS chunk_idx,
       |  i AS chunk_start, len(c)::BIGINT AS chunk_len,
       |  ${polyhash("c")} AS chunk_hash
       |FROM s ORDER BY doc_id, chunk_idx""".stripMargin

  val invertedIndex: String =
    s"""WITH t AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    string_split_regex(trim(text), '\\s+'))) AS term
       |  FROM documents)
       |SELECT term, CAST(count(*) AS BIGINT) AS df,
       |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
       |  array_to_string(list_transform(
       |    list_slice(list_sort(list(doc_id)), 1, ${TextOps.POSTINGS_HEAD}),
       |    piv -> piv::VARCHAR), ',') AS postings_head
       |FROM t GROUP BY term ORDER BY term""".stripMargin

  val retrievalTopK: String = retrievalSql(TextOps.PROBE_TERMS)

  /** Twin of both TextOps.retrievalTopK (q81, corpus one-pass) and
    * TermIndex.termIndexProbe (q139, lifecycle probe): the scoring is
    * shared by construction, so the q139 binding proves the persisted
    * build+append+probe path equals the one-pass corpus retrieval. */
  def retrievalSql(probeTerms: Seq[String],
      docWhere: String = ""): String = {
    val terms = probeTerms.map(t => s"'$t'").mkString(", ")
    val where = if (docWhere.isEmpty) "" else s"\n  WHERE $docWhere"
    s"""WITH d AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
       |  FROM documents$where),
       |docs AS (
       |  SELECT doc_id, len(w)::BIGINT AS len, w FROM d),
       |corpus AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(len) AS BIGINT) AS total_tokens FROM docs),
       |tf AS (
       |  SELECT doc_id, len, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, len, unnest(w) AS term FROM docs)
       |  WHERE term IN ($terms)
       |  GROUP BY doc_id, len, term),
       |df AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |contrib AS (
       |  SELECT doc_id,
       |    {'term': tf.term,
       |     'c': tf::DOUBLE * (n_docs::DOUBLE / df::DOUBLE) /
       |       (1.0 + len::DOUBLE / (total_tokens::DOUBLE / n_docs::DOUBLE))}
       |      AS tc
       |  FROM tf JOIN df ON tf.term = df.term, corpus),
       |scored AS (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(0.0::DOUBLE, list_transform(
       |      list_sort(list(tc)), rts -> rts.c)), (ra, rx) -> ra + rx)
       |      AS score,
       |    CAST(count(*) AS BIGINT) AS n_terms_hit
       |  FROM contrib GROUP BY doc_id),
       |r AS (
       |  SELECT doc_id, score, n_terms_hit,
       |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank
       |  FROM scored)
       |SELECT CAST(rank AS BIGINT) AS rank, doc_id, n_terms_hit,
       |  ${round6("score")} AS score
       |FROM r WHERE rank <= ${TextOps.RETRIEVAL_TOP_K} ORDER BY rank""".stripMargin
  }

  /** Twin of TextOps.hybridRetrieval: distinct-token Jaccard ranking and
    * embedding-cosine ranking per probe, RRF-fused (lex contribution
    * added first, matching the Spark column order). */
  val hybridRetrieval: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    list_distinct(string_split_regex(trim(text), '\\s+')) AS w
       |  FROM documents),
       |tc AS (SELECT doc_id, len(w)::BIGINT AS nt, w FROM t),
       |px AS (
       |  SELECT doc_id AS probe_id, nt AS pnt, unnest(w) AS tok
       |  FROM tc WHERE doc_id < ${TextOps.HR_PROBES}),
       |cx AS (SELECT doc_id, nt, unnest(w) AS tok FROM tc),
       |sh AS (
       |  SELECT probe_id, doc_id, pnt, nt, CAST(count(*) AS BIGINT) AS shared
       |  FROM cx JOIN px USING (tok) WHERE doc_id <> probe_id
       |  GROUP BY 1, 2, 3, 4),
       |lj AS (
       |  SELECT probe_id, doc_id,
       |    shared::DOUBLE / (pnt + nt - shared)::DOUBLE AS jac
       |  FROM sh),
       |lr AS (
       |  SELECT probe_id, doc_id,
       |    row_number() OVER (PARTITION BY probe_id ORDER BY jac DESC, doc_id)
       |      AS lex_rank
       |  FROM lj),
       |lex AS (SELECT probe_id, doc_id, CAST(lex_rank AS BIGINT) AS lex_rank
       |        FROM lr WHERE lex_rank <= ${TextOps.HR_DEPTH}),
       |e AS (
       |  SELECT vec_id, embedding, sqrt(${norm2("embedding")}) AS nrm
       |  FROM embeddings),
       |pe AS (
       |  SELECT vec_id AS probe_id, embedding AS pv, nrm AS pnrm
       |  FROM e WHERE vec_id < ${TextOps.HR_PROBES}),
       |dc AS (
       |  SELECT probe_id, vec_id AS doc_id,
       |    ${dot("pv", "embedding")} / (pnrm * nrm) AS cos
       |  FROM e, pe WHERE vec_id <> probe_id),
       |dr AS (
       |  SELECT probe_id, doc_id,
       |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, doc_id)
       |      AS dense_rank
       |  FROM dc),
       |dens AS (SELECT probe_id, doc_id, CAST(dense_rank AS BIGINT) AS dense_rank
       |         FROM dr WHERE dense_rank <= ${TextOps.HR_DEPTH}),
       |k AS (
       |  SELECT probe_id, doc_id FROM lex
       |  UNION SELECT probe_id, doc_id FROM dens),
       |f AS (
       |  SELECT k.probe_id, k.doc_id, lex.lex_rank, dens.dense_rank,
       |    COALESCE(1.0 / (${TextOps.HR_RRF_K} + lex.lex_rank), 0.0) +
       |    COALESCE(1.0 / (${TextOps.HR_RRF_K} + dens.dense_rank), 0.0) AS rrf
       |  FROM k
       |  LEFT JOIN lex ON k.probe_id = lex.probe_id AND k.doc_id = lex.doc_id
       |  LEFT JOIN dens ON k.probe_id = dens.probe_id AND k.doc_id = dens.doc_id),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY probe_id
       |    ORDER BY rrf DESC, doc_id) AS rank
       |  FROM f)
       |SELECT probe_id, CAST(rank AS BIGINT) AS rank, doc_id,
       |  lex_rank, dense_rank, ${round6("rrf")} AS rrf_score
       |FROM r WHERE rank <= ${TextOps.HR_TOP_K} ORDER BY probe_id, rank""".stripMargin

  /** Twin of TextOps.lmScore: top-V vocabulary, `<unk>` folding, smoothed
    * bigram counts, per-pair probability floored to 2^-30 fixed point so
    * the per-doc sum is order-free integer arithmetic. */
  val lmScore: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS w
       |  FROM documents),
       |vc AS (
       |  SELECT tok, count(*) AS c
       |  FROM (SELECT unnest(w) AS tok FROM t) GROUP BY tok),
       |vocab AS (SELECT tok FROM vc ORDER BY c DESC, tok LIMIT ${TextOps.LM_VOCAB}),
       |pr AS (
       |  SELECT doc_id, lang, w[pi] AS w1, w[pi + 1] AS w2
       |  FROM t, LATERAL (SELECT unnest(range(1, len(w))) AS pi) x
       |  WHERE len(w) >= 2),
       |m1 AS (
       |  SELECT doc_id, lang,
       |    CASE WHEN w1 IN (SELECT tok FROM vocab) THEN w1 ELSE '<unk>' END AS v1,
       |    CASE WHEN w2 IN (SELECT tok FROM vocab) THEN w2 ELSE '<unk>' END AS v2
       |  FROM pr),
       |bg AS (SELECT v1, v2, CAST(count(*) AS BIGINT) AS c2 FROM m1 GROUP BY 1, 2),
       |ug AS (SELECT v1, CAST(sum(c2) AS BIGINT) AS c1 FROM bg GROUP BY 1),
       |sc AS (
       |  SELECT doc_id, lang, (v1 = '<unk>' OR v2 = '<unk>') AS oov,
       |    CAST(floor(((2 * c2 + 1)::DOUBLE /
       |      (2 * c1 + ${TextOps.LM_VOCAB + 1})::DOUBLE) *
       |      ${TextOps.LM_SCALE}) AS BIGINT) AS sp
       |  FROM m1 JOIN bg USING (v1, v2) JOIN ug USING (v1))
       |SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(sum(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT) AS oov_pairs,
       |  ${round6("sum(sp)::DOUBLE / (count(*) * " + TextOps.LM_SCALE + ".0)")}
       |    AS lm_score
       |FROM sc GROUP BY doc_id, lang ORDER BY doc_id""".stripMargin

  val int8Quant: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |    list_aggregate(list_transform(embedding, qs -> abs(qs::DOUBLE)),
       |      'max') AS scale
       |  FROM embeddings),
       |q AS (
       |  SELECT vec_id, embedding, scale,
       |    list_transform(embedding, qx ->
       |      CAST(floor(qx::DOUBLE * ${Sim.QUANT_LEVELS} / scale + 0.5)
       |        AS BIGINT)) AS q
       |  FROM e)
       |SELECT vec_id, ${round6("scale")} AS scale,
       |  CAST(list_reduce(list_prepend(0::BIGINT, q), (qa, qb) -> qa + qb)
       |    AS BIGINT) AS q_sum,
       |  list_aggregate(q, 'min') AS q_min,
       |  list_aggregate(q, 'max') AS q_max,
       |  ${round6(
        s"list_aggregate(list_transform(range(1, len(embedding) + 1), " +
        s"qi -> abs(embedding[qi]::DOUBLE - q[qi]::DOUBLE * scale / ${Sim.QUANT_LEVELS})), 'max')")}
       |    AS max_abs_err
       |FROM q ORDER BY vec_id""".stripMargin

  val scd2Dimension: String =
    """WITH seq AS (
      |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
      |    lag(o_orderstatus) OVER w AS prev
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
      |chg AS (
      |  SELECT * FROM seq WHERE prev IS NULL OR prev <> o_orderstatus),
      |v AS (
      |  SELECT o_custkey, o_orderstatus, o_orderdate,
      |    row_number() OVER w AS version,
      |    lead(o_orderdate) OVER w AS valid_to
      |  FROM chg
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
      |SELECT o_custkey, CAST(version AS BIGINT) AS version,
      |  o_orderstatus AS status, o_orderdate AS valid_from, valid_to,
      |  valid_to IS NULL AS is_current
      |FROM v ORDER BY o_custkey, version""".stripMargin

  val matryoshkaRerank: String = {
    val head = s"list_slice(%s, 1, ${Sim.MRL_DIMS})"
    s"""WITH e AS (
       |  SELECT vec_id, embedding, ${head.format("embedding")} AS head
       |  FROM embeddings),
       |probes AS (
       |  SELECT vec_id AS probe_id, embedding AS pv, head AS ph FROM e
       |  WHERE vec_id < ${Sim.N_PROBES}),
       |coarse AS (
       |  SELECT probe_id, vec_id, pv, embedding,
       |    ${cosine("ph", "head")} AS coarse
       |  FROM e JOIN probes ON vec_id <> probe_id),
       |sl AS (
       |  SELECT *, row_number() OVER (PARTITION BY probe_id
       |    ORDER BY coarse DESC, vec_id) AS coarse_rank
       |  FROM coarse QUALIFY coarse_rank <= ${Sim.MRL_SHORTLIST}),
       |rr AS (
       |  SELECT probe_id, vec_id, coarse_rank,
       |    ${cosine("pv", "embedding")} AS cos
       |  FROM sl),
       |r AS (
       |  SELECT probe_id, vec_id, coarse_rank, cos,
       |    row_number() OVER (PARTITION BY probe_id
       |      ORDER BY cos DESC, vec_id) AS rank
       |  FROM rr)
       |SELECT probe_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id,
       |  ${round6("cos")} AS cosine, CAST(coarse_rank AS BIGINT) AS coarse_rank
       |FROM r WHERE rank <= ${Sim.TOP_K} ORDER BY probe_id, rank""".stripMargin
  }

  /** Twin of Sim.packSigns: MSB-first left fold acc*2 + signbit over one
    * 32-dim half. */
  private def packSigns(v: String, from: Int, n: Int): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(" +
      s"range(${from + 1}, ${from + n + 1}), sb -> " +
      s"CASE WHEN $v[sb] >= 0 THEN 1::BIGINT ELSE 0::BIGINT END)), " +
      s"(sa, sx) -> sa * 2 + sx)"

  val binaryQuantHamming: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |    ${packSigns("embedding", 0, 32)} AS sig_hi,
       |    ${packSigns("embedding", 32, 32)} AS sig_lo
       |  FROM embeddings),
       |probes AS (
       |  SELECT vec_id AS probe_id, embedding AS pv,
       |    sig_hi AS p_hi, sig_lo AS p_lo
       |  FROM e WHERE vec_id < ${Sim.N_PROBES}),
       |scored AS (
       |  SELECT probe_id, vec_id, pv, embedding,
       |    CAST(bit_count(xor(p_hi, sig_hi)) + bit_count(xor(p_lo, sig_lo))
       |      AS BIGINT) AS hamming
       |  FROM e JOIN probes ON vec_id <> probe_id),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY probe_id
       |    ORDER BY hamming, vec_id) AS rank
       |  FROM scored)
       |SELECT probe_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id,
       |  hamming, ${round6(cosine("pv", "embedding"))} AS cosine
       |FROM r WHERE rank <= ${Sim.TOP_K} ORDER BY probe_id, rank""".stripMargin

  val columnProfile: String = {
    def one(c: String, render: String => String): String =
      s"""SELECT '$c' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_nulls,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  ${render(s"min($c)")} AS min_val, ${render(s"max($c)")} AS max_val
         |FROM customer""".stripMargin
    val plain = (c: String) => s"CAST($c AS VARCHAR)"
    val centsR = (c: String) => s"CAST(CAST(round(($c)*100) AS BIGINT) AS VARCHAR)"
    Seq(one("c_acctbal", centsR), one("c_custkey", plain),
      one("c_mktsegment", plain), one("c_name", plain),
      one("c_nationkey", plain))
      .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }

  val semanticDedup: String =
    s"""$ivfPrefix,
       |canon AS (
       |  SELECT cent_id, min(vec_id) AS canon_id FROM a1 GROUP BY cent_id),
       |cj AS (
       |  SELECT canon.cent_id, canon.canon_id, a1.vec_id,
       |    ${dot("ev.embedding", "ec.embedding")} / (ev.nrm * ec.nrm) AS cos
       |  FROM a1
       |  JOIN canon ON a1.cent_id = canon.cent_id
       |  JOIN e ev ON a1.vec_id = ev.vec_id
       |  JOIN e ec ON canon.canon_id = ec.vec_id)
       |SELECT cent_id, canon_id, CAST(count(*) AS BIGINT) AS n_vectors,
       |  CAST(SUM(CASE WHEN vec_id <> canon_id AND cos >= ${Sim.SEMDEDUP_T}
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       |  ${round6("min(cos)")} AS min_cos,
       |  ${round6("max(CASE WHEN vec_id <> canon_id THEN cos END)")}
       |    AS max_nonself_cos
       |FROM cj GROUP BY cent_id, canon_id ORDER BY cent_id""".stripMargin

  /** q166's twin: the semantic-dedup audit over the PERSISTED index's
    * geometry — centroids stride-sampled from the build population
    * (vec_id % ANN_DELTA_MOD <> 0), every vector assigned to its best
    * frozen centroid (ties to min cent_id), then q76's canonical
    * election and member scoring unchanged. */
  val lifecycleSemanticDedup: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding, sqrt(${norm2("embedding")}) AS nrm
       |  FROM embeddings),
       |b AS (SELECT * FROM e WHERE vec_id % ${Sim.ANN_DELTA_MOD} <> 0),
       |c AS (
       |  SELECT vec_id AS cent_id, embedding AS cv, nrm AS cnrm
       |  FROM b WHERE vec_id % (SELECT m + CASE WHEN m % ${Sim.ANN_DELTA_MOD}
       |      = 0 THEN 1 ELSE 0 END
       |    FROM (SELECT GREATEST(${Sim.IVF_STRIDE},
       |      (count(*) + ${Sim.IVF_MAX_CELLS - 1}) // ${Sim.IVF_MAX_CELLS})
       |      AS m FROM b)) = 0),
       |s AS (
       |  SELECT e.vec_id, c.cent_id,
       |    ${dot("embedding", "cv")} / (nrm * cnrm) AS cos
       |  FROM e, c),
       |a AS (
       |  SELECT vec_id, cent_id,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cos DESC, cent_id) AS rn
       |  FROM s),
       |a1 AS (SELECT vec_id, cent_id FROM a WHERE rn = 1),
       |canon AS (
       |  SELECT cent_id, min(vec_id) AS canon_id FROM a1 GROUP BY cent_id),
       |cj AS (
       |  SELECT canon.cent_id, canon.canon_id, a1.vec_id,
       |    ${dot("ev.embedding", "ec.embedding")} / (ev.nrm * ec.nrm) AS cos
       |  FROM a1
       |  JOIN canon ON a1.cent_id = canon.cent_id
       |  JOIN e ev ON a1.vec_id = ev.vec_id
       |  JOIN e ec ON canon.canon_id = ec.vec_id)
       |SELECT cent_id, canon_id, CAST(count(*) AS BIGINT) AS n_vectors,
       |  CAST(SUM(CASE WHEN vec_id <> canon_id AND cos >= ${Sim.SEMDEDUP_T}
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       |  ${round6("min(cos)")} AS min_cos,
       |  ${round6("max(CASE WHEN vec_id <> canon_id THEN cos END)")}
       |    AS max_nonself_cos
       |FROM cj GROUP BY cent_id, canon_id ORDER BY cent_id""".stripMargin

  /** Blocked record linkage — twin of [[Dedup.recordLinkage]]; block keys,
    * prefix length and link threshold come from the same constants.
    * `levenshtein` over ASCII prefixes is an integer metric, identical in
    * both engines. */
  val recordLinkage: String =
    s"""WITH d AS (
       | SELECT doc_id, lang, source,
       |  substring(text, 1, ${Dedup.LINK_PREFIX}) AS pfx
       | FROM documents)
       |SELECT x.lang AS lang, x.source AS source,
       | count(*) AS n_pairs,
       | CAST(SUM(CASE WHEN levenshtein(x.pfx, y.pfx) <= ${Dedup.LINK_T}
       |   THEN 1 ELSE 0 END) AS BIGINT) AS n_linked,
       | CAST(min(levenshtein(x.pfx, y.pfx)) AS BIGINT) AS min_dist
       |FROM d x JOIN d y
       | ON x.lang = y.lang AND x.source = y.source AND x.doc_id < y.doc_id
       |GROUP BY 1, 2 ORDER BY lang, source""".stripMargin

  /** One weighted-PageRank iteration — twin of [[Graph.pageRankStep]].
    * Per-edge flow is BIGINT floor division ((w·SCALE) // outw ≡ Spark's
    * `div`, all operands positive), the gather is an integer sum, and the
    * two final float ops mirror the Spark expression tree term-for-term
    * (literals CAST to DOUBLE — DuckDB decimal literals would round
    * differently than IEEE `1.0 - 0.85`). */
  val pageRankStep: String =
    s"""WITH e AS (
       | SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
       | FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       | GROUP BY 1, 2),
       |od AS (SELECT src, CAST(SUM(w) AS BIGINT) AS outw FROM e GROUP BY src),
       |g AS (
       | SELECT dst, CAST(SUM((w * ${Graph.PR_SCALE}) // outw) AS BIGINT)
       |    AS inflow,
       |  count(*) AS n_in_edges
       | FROM e JOIN od USING (src) GROUP BY dst),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM nation)
       |SELECT n.n_name, CAST(coalesce(g.n_in_edges, 0) AS BIGINT) AS n_in_edges,
       | ${round6(
          s"(CAST(1.0 AS DOUBLE) - CAST(${Graph.PR_D} AS DOUBLE)) / nn" +
          s" + CAST(${Graph.PR_D} AS DOUBLE) / nn" +
          s" * (CAST(coalesce(g.inflow, 0) AS DOUBLE)" +
          s" / CAST(${Graph.PR_SCALE} AS DOUBLE))")} AS rank
       |FROM nation n LEFT JOIN g ON n.n_nationkey = g.dst CROSS JOIN nn
       |ORDER BY n_name""".stripMargin

  /** [[Graph.PR_ITERS]] PageRank rounds, unrolled — twin of
    * Graph.pageRankIterated. The whole recurrence is BIGINT: per-edge flow
    * is (r·w) // outw, the new rank is base + (85·inflow) // 100, where
    * base = (15·SCALE) // (100·N) — `//` is floor division on positive
    * BIGINTs, ≡ Spark's `div`, so the scaled rank trajectory is exactly
    * integer-equal in both engines. */
  val pageRankIterated: String = {
    val base = s"((${Graph.PR_D_DEN - Graph.PR_D_NUM} * ${Graph.PR_SCALE}) " +
      s"// (${Graph.PR_D_DEN} * nn.nn))"
    val rounds = (1 to Graph.PR_ITERS).map { i =>
      s"""f$i AS (
         |  SELECT e.dst, (r.r * e.w) // od.outw AS flow
         |  FROM e JOIN od ON e.src = od.src JOIN r${i - 1} r ON r.node = e.src),
         |g$i AS (
         |  SELECT dst, CAST(SUM(flow) AS BIGINT) AS inflow
         |  FROM f$i GROUP BY dst),
         |r$i AS (
         |  SELECT n.n_nationkey AS node,
         |    $base + (${Graph.PR_D_NUM} * coalesce(g.inflow, 0)) //
         |      ${Graph.PR_D_DEN} AS r
         |  FROM nation n LEFT JOIN g$i g ON n.n_nationkey = g.dst
         |    CROSS JOIN nn)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       | SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
       |  CAST(count(*) AS BIGINT) AS w
       | FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       | GROUP BY 1, 2),
       |od AS (SELECT src, CAST(SUM(w) AS BIGINT) AS outw FROM e GROUP BY src),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM nation),
       |r0 AS (
       | SELECT n_nationkey AS node, ${Graph.PR_SCALE} // nn.nn AS r
       | FROM nation CROSS JOIN nn),
       |$rounds
       |SELECT n.n_name, CAST(r.r AS BIGINT) AS rank_scaled,
       | ${round6(s"CAST(r.r AS DOUBLE) / CAST(${Graph.PR_SCALE} AS DOUBLE)")}
       |   AS rank
       |FROM nation n JOIN r${Graph.PR_ITERS} r ON n.n_nationkey = r.node
       |ORDER BY n_name""".stripMargin
  }

  /** Shared CTE prefix: the distinct supplier-part projection, the
    * weighted co-supply edge aggregate, and the union-kNN sparsified
    * edge set (each node keeps its [[Graph.KNN_K]] strongest incident
    * edges; an edge survives if either endpoint keeps it) — used by both
    * the triangle-count and label-propagation twins so the graph
    * derivation cannot drift between them. */
  private val keptEdgesCte: String =
    s"""sp0 AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
       |sp AS (
       | SELECT l_partkey, l_suppkey FROM (
       |  SELECT l_partkey, l_suppkey,
       |   row_number() OVER (PARTITION BY l_partkey ORDER BY l_suppkey)
       |    AS srk
       |  FROM sp0) c
       | WHERE srk <= ${Graph.COSUPPLY_CAP}),
       |e AS (
       | SELECT a.l_suppkey AS s1, b.l_suppkey AS s2,
       |  CAST(count(*) AS BIGINT) AS w
       | FROM sp a JOIN sp b
       |  ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
       | GROUP BY 1, 2),
       |tot AS (SELECT count(*) AS n_edges_total FROM e),
       |inc AS (
       | SELECT s1 AS node, s2 AS nb, w FROM e
       | UNION ALL SELECT s2 AS node, s1 AS nb, w FROM e),
       |kept AS (
       | SELECT DISTINCT least(node, nb) AS s1, greatest(node, nb) AS s2, w
       | FROM (
       |  SELECT node, nb, w,
       |   row_number() OVER (PARTITION BY node ORDER BY w DESC, nb) AS rk
       |  FROM inc) r
       | WHERE rk <= ${Graph.KNN_K})""".stripMargin

  /** Twin of [[Sim.annRecall]] — the IVF twin runs verbatim as a derived
    * table (same text as q38's oracle, so the approx side cannot drift),
    * the exact side is the brute-force top-IVF_TOP_K for the same
    * probes, and recall reduces to integer ppm. */
  val annRecall: String =
    s"""WITH iv AS (
       |  SELECT probe_id, neighbor_id FROM ($ivfTopK) ivq),
       |ex AS (
       |  SELECT probe_id, vec_id AS neighbor_id FROM (
       |   SELECT probe_id, vec_id,
       |    row_number() OVER (PARTITION BY probe_id
       |      ORDER BY cos DESC, vec_id) AS rank
       |   FROM (
       |    SELECT p.probe_id, e.vec_id,
       |     ${cosine("p.pv", "e.embedding")} AS cos
       |    FROM embeddings e
       |    JOIN (SELECT vec_id AS probe_id, embedding AS pv
       |          FROM embeddings WHERE vec_id < 4) p
       |     ON e.vec_id <> p.probe_id) sc) rk
       |  WHERE rank <= ${Sim.IVF_TOP_K}),
       |h AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_hits
       |  FROM iv JOIN ex USING (probe_id, neighbor_id)),
       |t AS (
       |  SELECT CAST(count(DISTINCT probe_id) AS BIGINT) AS n_probes FROM ex)
       |SELECT n_probes, CAST(${Sim.IVF_TOP_K} AS BIGINT) AS k, n_hits,
       | n_hits * 1000000 // (n_probes * ${Sim.IVF_TOP_K}) AS recall_ppm
       |FROM t CROSS JOIN h""".stripMargin

  /** Twin of [[Graph.triangleCount]] — the same relative-threshold,
    * degree-orientation, wedge-close pipeline in SQL. */
  val triangleCount: String =
    s"""WITH $keptEdgesCte,
       |deg AS (
       | SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
       |  SELECT s1 AS node FROM kept UNION ALL SELECT s2 AS node FROM kept) u
       | GROUP BY 1),
       |pos AS (
       | SELECT node, row_number() OVER (ORDER BY deg, node) AS pos FROM deg),
       |o AS (
       | SELECT least(p1.pos, p2.pos) AS u, greatest(p1.pos, p2.pos) AS v
       | FROM kept
       |  JOIN pos p1 ON kept.s1 = p1.node
       |  JOIN pos p2 ON kept.s2 = p2.node),
       |wed AS (
       | SELECT x.a AS a, x.b AS b, y.c AS c
       | FROM (SELECT u AS a, v AS b FROM o) x
       |  JOIN (SELECT u AS a, v AS c FROM o) y
       |  ON x.a = y.a AND x.b < y.c),
       |tri AS (
       | SELECT count(*) AS n_triangles FROM wed
       |  JOIN o ON wed.b = o.u AND wed.c = o.v)
       |SELECT (SELECT count(*) FROM deg) AS n_nodes,
       | (SELECT n_edges_total FROM tot) AS n_edges_total,
       | (SELECT count(*) FROM kept) AS n_edges_kept,
       | (SELECT max(deg) FROM deg) AS max_degree,
       | (SELECT n_triangles FROM tri) AS n_triangles""".stripMargin

  /** q207's twin — [[Graph.kCore]]: [[Graph.KCORE_MAX_ROUNDS]] unrolled
    * peel rounds over the same kNN cut. Peeling a stable graph is a
    * no-op, so unrolling MORE rounds than the loop needed meets its
    * fixpoint exactly; if the data ever needed more, the Spark side
    * fails hard (round cap) rather than hash-mismatching silently. */
  val kCore: String = {
    val K = Graph.KCORE_K
    val R = Graph.KCORE_MAX_ROUNDS
    // AS MATERIALIZED: DuckDB inlines plain CTEs, and each round
    // references the previous one three times — 3^R plan expansions
    // without materialization (observed: fd exhaustion at R=16)
    val rounds = (1 to R).map { i =>
      s"""k$i AS MATERIALIZED (
         | SELECT node FROM (
         |  SELECT s1 AS node FROM e${i - 1}
         |  UNION ALL SELECT s2 FROM e${i - 1}) u
         | GROUP BY node HAVING count(*) >= $K),
         |e$i AS MATERIALIZED (
         | SELECT e.s1, e.s2 FROM e${i - 1} e
         |  JOIN k$i a ON e.s1 = a.node
         |  JOIN k$i b ON e.s2 = b.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $keptEdgesCte,
       |e0 AS MATERIALIZED (SELECT s1, s2 FROM kept),
       |$rounds
       |SELECT node, CAST(count(*) AS BIGINT) AS core_deg
       |FROM (SELECT s1 AS node FROM e$R UNION ALL SELECT s2 FROM e$R) u
       |GROUP BY node ORDER BY node""".stripMargin
  }

  /** Twin of [[Graph.labelPropagation]] — [[Graph.LP_ITERS]] unrolled
    * synchronous rounds; the per-node argmax replays as a row_number
    * window ordered (weight desc, label asc), exactly the total order of
    * the Spark side's `max_by(lab, struct(s, -lab))`. */
  val labelPropagation: String = {
    val rounds = (1 to Graph.LP_ITERS).map { i =>
      s"""l$i AS (
         | SELECT n.node, coalesce(v.winner, p.lab) AS lab
         | FROM nodes n JOIN l${i - 1} p ON n.node = p.node
         | LEFT JOIN (
         |  SELECT node, lab AS winner FROM (
         |   SELECT a.node, r.lab, SUM(a.w) AS s,
         |    row_number() OVER (PARTITION BY a.node
         |     ORDER BY SUM(a.w) DESC, r.lab) AS rk
         |   FROM adj a JOIN l${i - 1} r ON a.nb = r.node
         |   GROUP BY a.node, r.lab) t
         |  WHERE rk = 1) v ON v.node = n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $keptEdgesCte,
       |adj AS (
       | SELECT s1 AS node, s2 AS nb, w FROM kept
       | UNION ALL SELECT s2 AS node, s1 AS nb, w FROM kept),
       |nodes AS (SELECT DISTINCT node FROM adj),
       |l0 AS (SELECT node, node AS lab FROM nodes),
       |$rounds
       |SELECT lab, count(*) AS n_members,
       | min(node) AS min_node, max(node) AS max_node
       |FROM l${Graph.LP_ITERS} GROUP BY 1 ORDER BY lab""".stripMargin
  }

  /** q170's twin — the same char-8-gram rolling-hash stream as
    * [[docFingerprint]], windowed local minima (winnowing), distinct per
    * doc, df-gated [2, WINNOW_DF_CAP], bucket self-join, overlap vs the
    * smaller set. The filter reads the ROUNDED overlap, matching the
    * Spark filter on the round6'd column. */
  /** The winnowing pair pipeline over a source relation `src(doc_id,
    * text)` — gram hashes, windowed minima, per-doc distinct, df gate,
    * bucket self-join, overlap filter. Shared by q170 (whole corpus) and
    * q173 (augmented corpus, delta-restricted). */
  private def winnowPairsSql(src: String): String = {
    import graft.engine.Dedup.{WINNOW_K, WINNOW_W, WINNOW_DF_CAP}
    s"""g AS (
       |  SELECT doc_id, list_transform(
       |    range(1, greatest(len(text) - ${WINNOW_K - 1}, 1) + 1),
       |    wgi -> ${polyhash(s"substr(text, wgi, $WINNOW_K)")}) AS g
       |  FROM $src),
       |fsets AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    range(1, greatest(len(g) - ${WINNOW_W - 1}, 1) + 1),
       |    wwi -> list_aggregate(list_slice(g, wwi, wwi + ${WINNOW_W - 1}),
       |      'min'))) AS fps
       |  FROM g),
       |fp AS (
       |  SELECT doc_id, len(fps)::BIGINT AS n_fp, unnest(fps) AS f
       |  FROM fsets),
       |keep AS (
       |  SELECT f FROM fp GROUP BY f
       |  HAVING count(*) >= 2 AND count(*) <= $WINNOW_DF_CAP),
       |k AS (SELECT fp.* FROM fp JOIN keep USING (f)),
       |pr AS (
       |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |    CAST(count(*) AS BIGINT) AS n_shared,
       |    CAST(min(x.n_fp) AS BIGINT) AS n_fp_a,
       |    CAST(min(y.n_fp) AS BIGINT) AS n_fp_b
       |  FROM k x JOIN k y ON x.f = y.f AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2),
       |ov AS (
       |  SELECT doc_a, doc_b, n_shared, n_fp_a, n_fp_b,
       |    ${round6("n_shared::DOUBLE / least(n_fp_a, n_fp_b)::DOUBLE")}
       |      AS overlap
       |  FROM pr)""".stripMargin
  }

  val winnowNearDup: String = {
    import graft.engine.Dedup.WINNOW_T
    s"""WITH ${winnowPairsSql("documents")}
       |SELECT * FROM ov
       |WHERE overlap >= $WINNOW_T ORDER BY doc_a, doc_b""".stripMargin
  }

  /** q173's twin: the full winnowing pair pass over the corpus plus the
    * embedded-paragraph plants, restricted to delta-involving pairs
    * (plants carry ids ≥ 60000000; doc_a < doc_b, so doc_b lands in the
    * plant range for cross AND plant-plant pairs). The df gate is the
    * corpus-wide rule over the augmented corpus — exactly what the probe
    * reconstructs from its matched rows. */
  val winnowIncrementProbe: String = {
    import graft.engine.Dedup.{WINNOW_PLANT_MOD, WINNOW_PLANT_CHARS, WINNOW_T}
    s"""WITH aug AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 60000000,
       |    'zq' || doc_id::VARCHAR || ' ' || substr(text, 1, $WINNOW_PLANT_CHARS)
       |  FROM documents WHERE doc_id % $WINNOW_PLANT_MOD = 0),
       |${winnowPairsSql("aug")}
       |SELECT * FROM ov
       |WHERE overlap >= $WINNOW_T AND doc_b >= 60000000
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** q171's twin — [[graft.engine.TextOps.bpeMerges]] unrolled (the
    * [[kmeansIterated]] device): each round counts adjacent symbol pairs
    * over the capped word histogram, picks the top pair by (n desc, pair
    * asc) via a 1-row CTE, and applies the merge with the IDENTICAL
    * greedy left fold (`list_reduce` over single-symbol lists with a []
    * seed ≡ Spark's `aggregate` with an empty-array zero). */
  /** The shared BPE training-state CTE chain: capped word histogram `wf`,
    * char symbols `w0`, then per round i the pair counts `p_i`, the chosen
    * merge `m_i` (1-row CTE), and the rewritten histogram `w_i`. */
  private def bpeStateSql: String = {
    import graft.engine.TextOps.{BPE_WORD_CAP, BPE_MERGES}
    val rounds = (1 to BPE_MERGES).map { i =>
      s"""p$i AS (
         |  SELECT syms[bpi] AS a, syms[bpi + 1] AS b,
         |    CAST(sum(freq) AS BIGINT) AS n
         |  FROM w${i - 1}, LATERAL (SELECT unnest(range(1, len(syms)))
         |    AS bpi) t
         |  GROUP BY 1, 2),
         |m$i AS (SELECT a, b, n FROM p$i ORDER BY n DESC, a, b LIMIT 1),
         |w$i AS (
         |  SELECT word, freq, list_reduce(
         |    list_prepend([]::VARCHAR[], list_transform(syms, bs -> [bs])),
         |    (bacc, bx) -> CASE
         |      WHEN len(bacc) > 0 AND bacc[-1] = m.a AND bx[1] = m.b
         |      THEN list_append(bacc[1:len(bacc)-1], m.a || m.b)
         |      ELSE list_append(bacc, bx[1]) END) AS syms
         |  FROM w${i - 1}, m$i m)""".stripMargin
    }.mkString(",\n")
    s"""toksrc AS (
       |  SELECT unnest(list_filter(string_split_regex(trim(text), '\\s+'),
       |    bt -> len(bt) > 0)) AS word
       |  FROM documents),
       |wf AS (
       |  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM toksrc
       |  GROUP BY word ORDER BY freq DESC, word ASC LIMIT $BPE_WORD_CAP),
       |w0 AS (
       |  SELECT word, freq,
       |    list_filter(string_split(word, ''), bc -> len(bc) > 0) AS syms
       |  FROM wf),
       |$rounds""".stripMargin
  }

  val bpeMerges: String = {
    import graft.engine.TextOps.BPE_MERGES
    val out = (1 to BPE_MERGES).map { i =>
      s"SELECT ${i}::BIGINT AS merge_rank, a AS sym_a, b AS sym_b, " +
        s"a || b AS merged, n AS n_occurrences FROM m$i"
    }.mkString("\nUNION ALL ")
    s"""WITH $bpeStateSql
       |SELECT * FROM (
       |$out
       |) m ORDER BY merge_rank""".stripMargin
  }

  /** q172's twin — the trained `w{BPE_MERGES}` table joins back to the
    * corpus token stream; OOV words fall back to their character count. */
  val bpeFertility: String = {
    import graft.engine.TextOps.BPE_MERGES
    s"""WITH $bpeStateSql,
       |vs AS (
       |  SELECT word, len(syms)::BIGINT AS n_syms FROM w$BPE_MERGES),
       |ctoks AS (
       |  SELECT lang, unnest(list_filter(
       |    string_split_regex(trim(text), '\\s+'), bt -> len(bt) > 0))
       |    AS word
       |  FROM documents),
       |scored AS (
       |  SELECT lang, COALESCE(vs.n_syms, len(ctoks.word)::BIGINT) AS n_tok,
       |    (vs.word IS NULL) AS oov
       |  FROM ctoks LEFT JOIN vs ON ctoks.word = vs.word)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(n_tok) AS BIGINT) AS n_bpe_tokens,
       |  CAST(sum(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT) AS n_oov_words,
       |  ${round6("sum(n_tok)::DOUBLE / count(*)::DOUBLE")} AS fertility
       |FROM scored GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** Twin of [[Indexing.zorderLocality]] — the Morton-interleave text is
    * the SAME string the Spark plan compiles ([[Indexing.zInterleaveSql]]
    * on [[Indexing.Z_X]]/[[Indexing.Z_Y]]), so the curve geometry cannot
    * drift between engine and oracle. */
  val zorderLocality: String = {
    val z = graft.engine.Indexing.zInterleaveSql("x", "y")
    def spans(src: String, cell: String, name: String): String =
      s"""SELECT '$name' AS layout, CAST(count(*) AS BIGINT) AS n_cells,
         | CAST(SUM(sx) AS BIGINT) AS sum_span_x,
         | CAST(SUM(sy) AS BIGINT) AS sum_span_y,
         | CAST(max(sx) AS BIGINT) AS max_span_x,
         | CAST(max(sy) AS BIGINT) AS max_span_y,
         | CAST(SUM(n) AS BIGINT) AS n_rows
         |FROM (
         | SELECT $cell AS cell, max(x) - min(x) AS sx, max(y) - min(y) AS sy,
         |  count(*) AS n
         | FROM $src GROUP BY 1) cells""".stripMargin
    s"""WITH o AS (
       | SELECT ${graft.engine.Indexing.Z_X} AS x,
       |  ${graft.engine.Indexing.Z_Y} AS y
       | FROM orders),
       |zt AS (SELECT x, y, $z AS z FROM o)
       |SELECT * FROM (
       | ${spans("zt", "CAST(floor(z / 64.0) AS BIGINT)", "zorder")}
       | UNION ALL
       | ${spans("zt", "x * 4 + CAST(floor(y / 64.0) AS BIGINT)", "linear")}
       |) layouts ORDER BY layout""".stripMargin
  }

  /** q174's twin — [[graft.engine.TextOps.weightedSample]]: the same
    * priority u/w ranking (u = polyhash of "sps:"||doc_id, w = whitespace
    * token count), row_number per source over the IEEE-exact division of
    * identical integers, so the membership checksum pins the SAME docs. */
  val weightedSample: String = {
    import graft.engine.TextOps.SPS_K
    s"""WITH d AS (
       |  SELECT source, doc_id,
       |    greatest(len(string_split_regex(trim(text), '\\s+'))::BIGINT, 1)
       |      AS w,
       |    (${polyhash("'sps:' || doc_id::VARCHAR")} % 1000000 + 1) AS u_ppm
       |  FROM documents),
       |r AS (
       |  SELECT source, doc_id, w,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY u_ppm::DOUBLE / w::DOUBLE, doc_id) AS rk
       |  FROM d)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(w) AS BIGINT) AS total_tokens,
       |  CAST(sum(CASE WHEN rk <= $SPS_K THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_picked,
       |  CAST(sum(CASE WHEN rk <= $SPS_K THEN doc_id ELSE 0 END) AS BIGINT)
       |    AS picked_id_sum,
       |  CAST(sum(CASE WHEN rk <= $SPS_K THEN w ELSE 0 END) AS BIGINT)
       |    AS picked_tokens
       |FROM r GROUP BY source ORDER BY source""".stripMargin
  }

  /** q175's twin — [[graft.engine.Sim.randomProjectionAudit]]: the ±1
    * sign matrix regenerated from the same integer-hash formula (constants
    * precomputed in Scala so both engines see identical literals), the
    * projection as the same left fold, cosines ppm-fixed-pointed via the
    * sign-handled floor form before any differencing. */
  val randomProjectionAudit: String = {
    import graft.engine.Sim.RP_D
    def rpComp(j: Int, v: String): String = {
      val aj = (j.toLong * 2654435761L + 11L) % 1000000007L
      val bj = (j.toLong * 40503L + 2654435769L) % 1000000007L
      s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(" +
        s"range(0, len($v)), rpi -> " +
        s"(CASE WHEN (($aj * (rpi + 1) + $bj) % 1000000007) % 2 = 0 " +
        s"THEN 1.0 ELSE -1.0 END) * $v[rpi + 1]::DOUBLE)), " +
        s"(rpa, rpx) -> rpa + rpx)"
    }
    val projList = (0 until RP_D).map(j => rpComp(j, "embedding"))
      .mkString("[\n      ", ",\n      ", "]")
    s"""WITH e AS (
       |  SELECT vec_id, label, embedding,
       |    $projList AS proj
       |  FROM embeddings),
       |p AS (
       |  SELECT a.label = b.label AS same_label,
       |    ${ppm(cosine("a.embedding", "b.embedding"))} AS co_ppm,
       |    ${ppm(cosine("a.proj", "b.proj"))} AS cp_ppm
       |  FROM e a JOIN e b ON b.vec_id = a.vec_id + 1)
       |SELECT same_label, CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(sum(co_ppm) // count(*) AS BIGINT) AS avg_cos_orig_ppm,
       |  CAST(sum(cp_ppm) // count(*) AS BIGINT) AS avg_cos_proj_ppm,
       |  CAST(sum(abs(co_ppm - cp_ppm)) // count(*) AS BIGINT)
       |    AS avg_abs_distortion_ppm,
       |  CAST(max(abs(co_ppm - cp_ppm)) AS BIGINT) AS max_abs_distortion_ppm
       |FROM p GROUP BY same_label ORDER BY same_label""".stripMargin
  }

  /** q176's twin — [[graft.engine.Dedup.sourceOverlap]]: per-doc MinHash
    * signatures (the shared hash family), groupBy-min per source, then the
    * component-agreement count over the source pairs. */
  val sourceOverlap: String = {
    import graft.functions.TextFns.NH
    val docSig = (0 until NH)
      .map(i => s"${minhashSig(i, "sh")} AS s$i").mkString(",\n    ")
    val srcMin = (0 until NH).map(i => s"min(s$i) AS s$i").mkString(", ")
    val agree = (0 until NH)
      .map(i => s"(CASE WHEN a.s$i = b.s$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH toks AS (
       |  SELECT source, string_split_regex(trim(text), '\\s+') AS w
       |  FROM documents),
       |sh AS (SELECT source, ${shingleHashes("w")} AS sh FROM toks),
       |ds AS (
       |  SELECT source,
       |    $docSig
       |  FROM sh),
       |sigs AS (SELECT source, $srcMin FROM ds GROUP BY source),
       |pr AS (
       |  SELECT a.source AS source_a, b.source AS source_b,
       |    CAST($agree AS BIGINT) AS n_agree
       |  FROM sigs a JOIN sigs b ON a.source < b.source)
       |SELECT source_a, source_b, n_agree,
       |  CAST(n_agree * 1000000 // $NH AS BIGINT) AS est_jaccard_ppm
       |FROM pr ORDER BY source_a, source_b""".stripMargin
  }

  /** Shared generative CTEs of the q178/q179 twins: dims from n_chars,
    * channel byte p = (doc_id·31 + p·7) mod 256 — the oracle regenerates
    * the EXPECTED raster arithmetically; only the Spark side goes through
    * the real PPM wire format, so the hashes gate the parser itself. */
  private def ppmBaseSql: String =
    s"""d AS (
       |  SELECT doc_id, (n_chars % 16 + 1) AS w, (n_chars % 12 + 1) AS h
       |  FROM documents),
       |px AS (
       |  SELECT doc_id, w, h,
       |    list_transform(range(0, w*h*3),
       |      pp -> (doc_id*31 + pp*7) % 256) AS v
       |  FROM d)""".stripMargin

  private def channelSums(vec: String, nPix: String): String =
    (0 until 3).map { c =>
      val nm = Seq("sum_r", "sum_g", "sum_b")(c)
      s"CAST(list_aggregate(list_transform(range(0, $nPix), " +
        s"ci -> $vec[3*ci + ${c + 1}]), 'sum') AS BIGINT) AS $nm"
    }.mkString(",\n  ")

  private def rasterChecksum(vec: String): String =
    s"CAST(list_reduce(list_prepend(7, $vec), " +
      s"(ca, cx) -> (ca*31 + cx) % $P) AS BIGINT) AS checksum"

  /** q242's twin — [[graft.multimodal.Multimodal.tarShardSamples]]:
    * sample keys (including the >100-byte arm the ustar prefix split
    * must carry), class labels, text stats and the q178 pixel formulas
    * regenerated arithmetically; the twin never mentions tar blocks,
    * octal fields, or member grouping — Spark only reaches these rows
    * through the full ustar write → parse → group-by-key → decode
    * chain, so a checksum bug, a prefix-blind name read, a desynced
    * data block, or a lost sample member flips rows. */
  val tarShardSamples: String =
    s"""WITH d AS (
       |  SELECT doc_id, n_chars, (n_chars % 23 + 4) AS nt,
       |    (n_chars % 16 + 1) AS w, (n_chars % 12 + 1) AS h
       |  FROM documents),
       |t AS (
       |  SELECT doc_id, nt, w, h,
       |    CASE WHEN doc_id % 13 = 0
       |      THEN repeat('x', 90) || '/' || CAST(doc_id % 7 AS VARCHAR) ||
       |        '/sample' || lpad(CAST(doc_id AS VARCHAR), 9, '0')
       |      ELSE 'train/' || CAST(doc_id % 7 AS VARCHAR) ||
       |        '/sample' || lpad(CAST(doc_id AS VARCHAR), 9, '0')
       |    END AS key,
       |    array_to_string(list_transform(range(0, nt),
       |      i -> 's' || CAST((doc_id * 29 + i * 11) % 9973 AS VARCHAR)),
       |      ' ') AS text
       |  FROM d)
       |SELECT key,
       |  CAST(doc_id % 10 AS BIGINT) AS cls,
       |  CAST(nt AS BIGINT) AS n_tokens,
       |  md5(text) AS text_md5,
       |  CASE WHEN doc_id % 3 = 0 THEN CAST(w AS BIGINT) END AS width,
       |  CASE WHEN doc_id % 3 = 0 THEN CAST(h AS BIGINT) END AS height,
       |  CASE WHEN doc_id % 3 = 0 THEN
       |    CAST(list_reduce(list_prepend(7,
       |      list_transform(range(0, w*h*3),
       |        pp -> (doc_id*31 + pp*7) % 256)),
       |      (ca, cx) -> (ca*31 + cx) % $P) AS BIGINT)
       |  END AS checksum
       |FROM t ORDER BY key""".stripMargin

  /** q178's twin — [[graft.multimodal.Multimodal.imageDecodeStats]]. */
  val imageDecodeStats: String =
    s"""WITH $ppmBaseSql
       |SELECT doc_id AS media_id,
       |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       |  CAST(w*h*3 AS BIGINT) AS n_bytes,
       |  ${channelSums("v", "w*h")},
       |  ${rasterChecksum("v")}
       |FROM px ORDER BY media_id""".stripMargin

  /** q179's twin — [[graft.multimodal.Multimodal.imageResizeStats]]: the
    * nearest-neighbour source-index arithmetic (x·srcW div dstW) replayed
    * per destination byte, so the resample kernel is pinned
    * pixel-for-pixel. */
  val imageResizeStats: String = {
    import graft.multimodal.Multimodal.{THUMB_H, THUMB_W}
    val n = THUMB_W * THUMB_H * 3
    val src = s"3*(((((rq//3)//$THUMB_W)*h)//$THUMB_H)*w + " +
      s"((((rq//3)%$THUMB_W)*w)//$THUMB_W)) + (rq%3) + 1"
    s"""WITH $ppmBaseSql,
       |rz AS (
       |  SELECT doc_id,
       |    list_transform(range(0, $n), rq -> v[$src]) AS rv
       |  FROM px)
       |SELECT doc_id AS media_id,
       |  CAST($THUMB_W AS BIGINT) AS width,
       |  CAST($THUMB_H AS BIGINT) AS height,
       |  CAST($n AS BIGINT) AS n_bytes,
       |  ${channelSums("rv", (THUMB_W * THUMB_H).toString)},
       |  ${rasterChecksum("rv")}
       |FROM rz ORDER BY media_id""".stripMargin
  }

  /** q203's twin — [[graft.multimodal.Multimodal.bmpDecodeStats]]: the
    * synthImageB generative raster (dims n%14+1 × n%10+1, byte p =
    * (doc_id·37 + p·11) mod 256) plus two WIRE pins a symmetric
    * encode/decode bug cannot cancel: n_wire_bytes = 54 + padded-stride
    * × h (the 4-byte row-padding arithmetic) and first_px_byte = the
    * byte at the pixel-data offset, which for a bottom-up BGR file is
    * the BLUE channel of the BOTTOM-LEFT pixel — v[3·(h−1)·w + 2] in
    * 0-indexed raster terms. */
  val bmpDecodeStats: String =
    s"""WITH d AS (
       |  SELECT doc_id, (n_chars % 14 + 1) AS w, (n_chars % 10 + 1) AS h
       |  FROM documents),
       |px AS (
       |  SELECT doc_id, w, h,
       |    list_transform(range(0, w*h*3),
       |      pp -> (doc_id*37 + pp*11) % 256) AS v
       |  FROM d)
       |SELECT doc_id AS media_id,
       |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       |  CAST(54 + ((3*w + 3)//4)*4*h AS BIGINT) AS n_wire_bytes,
       |  CAST(v[3*(h-1)*w + 2 + 1] AS BIGINT) AS first_px_byte,
       |  ${channelSums("v", "w*h")},
       |  ${rasterChecksum("v")}
       |FROM px ORDER BY media_id""".stripMargin

  /** q218's twin — [[graft.multimodal.Multimodal.pngDecodeStats]]: the
    * synthImageC generative raster (dims n%13+1 × n%11+1, byte p =
    * (doc_id·41 + p·13) mod 256) recomputed arithmetically — the Spark
    * side can only reach these pixels through the hand-rolled zlib/
    * DEFLATE inflate and the five unfilters — plus `filter_sum` =
    * Σ_{y<h} (y mod 5), the per-row filter-type bytes the decoder must
    * recover from the compressed scanlines (encode cycles y mod 5). */
  val pngDecodeStats: String =
    s"""WITH d AS (
       |  SELECT doc_id, (n_chars % 13 + 1) AS w, (n_chars % 11 + 1) AS h
       |  FROM documents),
       |px AS (
       |  SELECT doc_id, w, h,
       |    list_transform(range(0, w*h*3),
       |      pp -> (doc_id*41 + pp*13) % 256) AS v
       |  FROM d)
       |SELECT doc_id AS media_id,
       |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       |  CAST(list_aggregate(list_transform(range(0, h), y -> y % 5),
       |    'sum') AS BIGINT) AS filter_sum,
       |  ${channelSums("v", "w*h")},
       |  ${rasterChecksum("v")}
       |FROM px ORDER BY media_id""".stripMargin

  /** q228's twin — [[graft.multimodal.Multimodal.jpegDecodeStats]]: the
    * LOSSY format made hash-gateable. The corpus constructs quantized
    * coefficients at the four exactly-rational DCT positions with all-8
    * quant tables, so the decoded luma pixel is the exact integer
    * `128 + q00 + sx·q40 + sy·q04 + sx·sy·q44` (sign pattern sx = +1
    * iff x mod 4 ∈ {0,3} — cos((2x+1)·4π/16) = ±√2/2 times C(4)=1
    * against the 1/4 normalization is ±1/8, and F = 8q), chroma is
    * DC-only per MCU (replication upsample = MCU lookup), and the RGB
    * conversion is the decoder's fixed-point integer arithmetic
    * restated: `floor((91881·cr0 + 32768)/65536.0)` is EXACT in doubles
    * (power-of-two divisor, numerator < 2^24). `dc_sum_q` re-sums the
    * DC formula over the PADDED 4:2:0 luma block grid (2·ceil(w/16)
    * per row), pinning that the entropy decoder's prediction chain
    * walked every block of every MCU — Spark can only obtain it from
    * inside the Huffman decode. */
  val jpegDecodeStats: String = {
    // shared subexpressions, spliced textually into the per-byte lambda
    val x = "((p//3) % w)"
    val y = "((p//3) // w)"
    val bi = s"(($y//8)*64 + ($x//8))"
    val mi = s"(($y//16)*64 + ($x//16))"
    val a = s"((doc_id*17 + $bi*5) % 97 - 48)"
    val b4 = s"((doc_id*7 + $bi*3) % 17 - 8)"
    val c4 = s"((doc_id*11 + $bi) % 15 - 7)"
    val d4 = s"((doc_id*5 + $bi*9) % 13 - 6)"
    val sx = s"(CASE WHEN ($x % 4) IN (0, 3) THEN 1 ELSE -1 END)"
    val sy = s"(CASE WHEN ($y % 4) IN (0, 3) THEN 1 ELSE -1 END)"
    val ly = s"(128 + $a + $sx*$b4 + $sy*$c4 + $sx*$sy*$d4)"
    val cb0 = s"((doc_id*13 + $mi*7) % 81 - 40)"
    val cr0 = s"((doc_id*19 + $mi*11) % 81 - 40)"
    def fd(n: String) = s"CAST(floor(($n)/65536.0) AS BIGINT)"
    val rgb = s"""(CASE p % 3
      WHEN 0 THEN $ly + ${fd(s"91881*$cr0 + 32768")}
      WHEN 1 THEN $ly + ${fd(s"-22554*$cb0 - 46802*$cr0 + 32768")}
      ELSE $ly + ${fd(s"116130*$cb0 + 32768")} END)"""
    val dcSum = "list_aggregate(list_transform(range(0, bw2*bh2), " +
      "k -> (doc_id*17 + ((k//bw2)*64 + (k%bw2))*5) % 97 - 48), 'sum')"
    s"""WITH d AS (
       |  SELECT doc_id, (n_chars % 23 + 4) AS w, (n_chars % 19 + 4) AS h,
       |    ((n_chars % 23 + 4 + 15)//16)*2 AS bw2,
       |    ((n_chars % 19 + 4 + 15)//16)*2 AS bh2
       |  FROM documents),
       |px AS (
       |  SELECT doc_id, w, h, bw2, bh2,
       |    list_transform(range(0, w*h*3),
       |      p -> greatest(0, least(255, $rgb))) AS v
       |  FROM d)
       |SELECT doc_id AS media_id,
       |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       |  CAST($dcSum AS BIGINT) AS dc_sum_q,
       |  ${channelSums("v", "w*h")},
       |  ${rasterChecksum("v")}
       |FROM px ORDER BY media_id""".stripMargin
  }

  /** q229's twin — [[graft.multimodal.Multimodal.jpegProgressiveStats]]:
    * q228's exact-integer device with q229's own constants. The oracle is
    * wire-format-independent on purpose: progressive scans must
    * accumulate to the SAME final coefficients a baseline encode of the
    * blocks would carry, so the twin never mentions scans, bands, or
    * EOB runs — any progressive-machinery defect surfaces as wrong
    * pixels or a wrong DC-prediction sum. */
  val jpegProgressiveStats: String = {
    val x = "((p//3) % w)"
    val y = "((p//3) // w)"
    val bi = s"(($y//8)*64 + ($x//8))"
    val mi = s"(($y//16)*64 + ($x//16))"
    val a = s"((doc_id*23 + $bi*7) % 97 - 48)"
    val b4 = s"((doc_id*3 + $bi*5) % 17 - 8)"
    val c4 = s"((doc_id*29 + $bi*3) % 15 - 7)"
    val d4 = s"((doc_id*31 + $bi) % 13 - 6)"
    val sx = s"(CASE WHEN ($x % 4) IN (0, 3) THEN 1 ELSE -1 END)"
    val sy = s"(CASE WHEN ($y % 4) IN (0, 3) THEN 1 ELSE -1 END)"
    val ly = s"(128 + $a + $sx*$b4 + $sy*$c4 + $sx*$sy*$d4)"
    val cb0 = s"((doc_id*37 + $mi*5) % 81 - 40)"
    val cr0 = s"((doc_id*43 + $mi*3) % 81 - 40)"
    def fd(n: String) = s"CAST(floor(($n)/65536.0) AS BIGINT)"
    val rgb = s"""(CASE p % 3
      WHEN 0 THEN $ly + ${fd(s"91881*$cr0 + 32768")}
      WHEN 1 THEN $ly + ${fd(s"-22554*$cb0 - 46802*$cr0 + 32768")}
      ELSE $ly + ${fd(s"116130*$cb0 + 32768")} END)"""
    val dcSum = "list_aggregate(list_transform(range(0, bw2*bh2), " +
      "k -> (doc_id*23 + ((k//bw2)*64 + (k%bw2))*7) % 97 - 48), 'sum')"
    s"""WITH d AS (
       |  SELECT doc_id, (n_chars % 21 + 4) AS w, (n_chars % 17 + 4) AS h,
       |    ((n_chars % 21 + 4 + 15)//16)*2 AS bw2,
       |    ((n_chars % 17 + 4 + 15)//16)*2 AS bh2
       |  FROM documents),
       |px AS (
       |  SELECT doc_id, w, h, bw2, bh2,
       |    list_transform(range(0, w*h*3),
       |      p -> greatest(0, least(255, $rgb))) AS v
       |  FROM d)
       |SELECT doc_id AS media_id,
       |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       |  CAST($dcSum AS BIGINT) AS dc_sum_q,
       |  ${channelSums("v", "w*h")},
       |  ${rasterChecksum("v")}
       |FROM px ORDER BY media_id""".stripMargin
  }

  /** Shared by q230/q231 — [[graft.engine.Crawl]]'s generative crawl
    * corpus restated arithmetically: the EXTRACTED page text is
    * `title ' ' title ' ' tokens.join(' ')` where title =
    * `Doc <id> :: crawl <id%53>` (the `<title>` element plus its `<h1>`
    * repeat) and token i is the %7-first CASE the Scala side encodes as
    * entities on the wire (`x&amp;k` / `&#65;&#x42;k`). Spark can only
    * reach this string through gzip inflate → WARC framing → HTTP
    * envelope → comment/script/style removal → quote-aware tag strip →
    * entity decode → whitespace collapse; the twin never mentions any
    * of that — a defect anywhere flips `md5(text)`. */
  private val crawlTextCte: String =
    """WITH d AS (
      |  SELECT doc_id, (n_chars % 37 + 5) AS nt FROM documents),
      |tok AS (
      |  SELECT doc_id, nt,
      |    array_to_string(list_transform(range(0, nt), i ->
      |      CASE WHEN i % 7 = 3
      |             THEN 'x&' || CAST((doc_id + i) % 10 AS VARCHAR)
      |           WHEN i % 11 = 5
      |             THEN 'AB' || CAST((doc_id * 2 + i) % 10 AS VARCHAR)
      |           ELSE 'w' || CAST((doc_id * 61 + i * 29) % 9973 AS VARCHAR)
      |      END), ' ') AS toks
      |  FROM d),
      |t AS (
      |  SELECT doc_id, nt,
      |    'Doc ' || CAST(doc_id AS VARCHAR) || ' :: crawl ' ||
      |      CAST(doc_id % 53 AS VARCHAR) AS title,
      |    'Doc ' || CAST(doc_id AS VARCHAR) || ' :: crawl ' ||
      |      CAST(doc_id % 53 AS VARCHAR) || ' ' ||
      |    'Doc ' || CAST(doc_id AS VARCHAR) || ' :: crawl ' ||
      |      CAST(doc_id % 53 AS VARCHAR) || ' ' || toks AS text
      |  FROM tok)""".stripMargin

  /** q230's twin — [[graft.engine.Crawl.warcIngest]]. */
  val warcIngest: String =
    s"""$crawlTextCte
       |SELECT doc_id,
       |  'https://h' || CAST(doc_id % 53 AS VARCHAR) || '.example.com/p/' ||
       |    CAST((doc_id * 47) % 1009 AS VARCHAR) AS url,
       |  CAST(200 AS BIGINT) AS status,
       |  CAST(CASE WHEN doc_id % 4 = 0 THEN 4 ELSE 3 END AS BIGINT)
       |    AS n_records,
       |  title,
       |  CAST(length(text) AS BIGINT) AS text_chars,
       |  CAST(nt + 10 AS BIGINT) AS n_tokens,
       |  md5(text) AS text_md5
       |FROM t ORDER BY doc_id""".stripMargin

  /** q244's twin — [[graft.engine.Crawl.wetRoundTrip]]: the q230 text
    * law's columns (the emit→re-decode round trip must be invisible to
    * the gate — emitted WET text ≡ extracted text, the same-oracle
    * family as q239/q212). */
  val wetRoundTrip: String =
    s"""$crawlTextCte
       |SELECT doc_id,
       |  'https://h' || CAST(doc_id % 53 AS VARCHAR) || '.example.com/p/' ||
       |    CAST((doc_id * 47) % 1009 AS VARCHAR) AS url,
       |  CAST(length(text) AS BIGINT) AS text_chars,
       |  CAST(nt + 10 AS BIGINT) AS n_tokens,
       |  md5(text) AS text_md5
       |FROM t ORDER BY doc_id""".stripMargin

  /** q231's twin — [[graft.engine.Crawl.crawlHostStats]]: the same
    * generative text, aggregated at host grain (host = `h<id%53>`, the
    * URL formula's registrable part). */
  val crawlHostStats: String =
    s"""$crawlTextCte
       |SELECT 'h' || CAST(doc_id % 53 AS VARCHAR) || '.example.com' AS host,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(nt + 10) AS BIGINT) AS sum_tokens,
       |  CAST(sum(length(text)) AS BIGINT) AS sum_chars,
       |  CAST(sum(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_redirects
       |FROM t GROUP BY host ORDER BY host""".stripMargin

  /** q238's twin — [[graft.engine.Crawl.cdxProbe]]: the RESTRICTION of
    * the full-decode law. The q230 text formula joins through URL
    * EQUALITY to the seed set (doc_id%37==3) — captures sharing a
    * seed's URL are all returned, with the doc%4==0 archives
    * contributing their 301 capture as a second, text-less row. The
    * twin never mentions the sidecar, member offsets, or spans: the
    * Spark side must reach these rows through index lookup + span
    * random access, and a stale span fails CRC loudly while a missed
    * capture flips rows here. */
  val cdxProbe: String =
    s"""$crawlTextCte,
       |caps AS (
       |  SELECT doc_id,
       |    'https://h' || CAST(doc_id % 53 AS VARCHAR) ||
       |      '.example.com/p/' ||
       |      CAST((doc_id * 47) % 1009 AS VARCHAR) AS urlkey
       |  FROM documents),
       |seeds AS (
       |  SELECT DISTINCT urlkey FROM caps WHERE doc_id % 37 = 3),
       |m AS (
       |  SELECT c.urlkey, c.doc_id FROM caps c
       |  JOIN seeds s ON c.urlkey = s.urlkey),
       |r AS (
       |  SELECT m.urlkey, m.doc_id, CAST(200 AS BIGINT) AS status,
       |    md5(t.text) AS text_md5
       |  FROM m JOIN t ON m.doc_id = t.doc_id
       |  UNION ALL
       |  SELECT urlkey, doc_id, CAST(301 AS BIGINT) AS status,
       |    CAST(NULL AS VARCHAR) AS text_md5
       |  FROM m WHERE doc_id % 4 = 0)
       |SELECT urlkey, doc_id, status, text_md5
       |FROM r ORDER BY urlkey, doc_id, status""".stripMargin

  /** q233's twin — [[graft.engine.Crawl.charsetPages]]: the expected
    * DECODED codepoints stated via `chr()` — é/ñ/em-dash per the doc's
    * charset arm. A body decoded with the wrong charset (UTF-8 read of
    * a latin-1 é, latin-1 read of the cp1252 em-dash byte → the C1
    * control U+0097) produces different codepoints and flips
    * `md5(text)`; the twin never mentions bytes or charsets beyond the
    * label column. */
  val charsetPages: String =
    s"""WITH d AS (
       |  SELECT doc_id, (n_chars % 29 + 4) AS nt FROM documents),
       |tok AS (
       |  SELECT doc_id, nt,
       |    array_to_string(list_transform(range(0, nt), i ->
       |      CASE WHEN i % 5 = 2 THEN
       |        (CASE doc_id % 3 WHEN 0 THEN chr(233)
       |              WHEN 1 THEN chr(241) ELSE chr(8212) END)
       |          || CAST((doc_id + i) % 10 AS VARCHAR)
       |      ELSE 'm' || CAST((doc_id*37 + i*13) % 9973 AS VARCHAR)
       |      END), ' ') AS toks
       |  FROM d),
       |t AS (
       |  SELECT doc_id, nt,
       |    'Charset ' || CAST(doc_id AS VARCHAR) AS title,
       |    'Charset ' || CAST(doc_id AS VARCHAR) || ' ' || toks AS text
       |  FROM tok)
       |SELECT doc_id,
       |  CASE doc_id % 3 WHEN 0 THEN 'utf-8' WHEN 1 THEN 'iso-8859-1'
       |       ELSE 'windows-1252' END AS charset,
       |  title,
       |  CAST(length(text) AS BIGINT) AS text_chars,
       |  CAST(nt + 2 AS BIGINT) AS n_tokens,
       |  md5(text) AS text_md5
       |FROM t ORDER BY doc_id""".stripMargin

  /** q256's twin — [[graft.engine.TextOps.unicodeNormalize]]: the
    * mixed-form corpus rebuilt via chr() composition; NFC gated
    * against DuckDB's OWN `nfc_normalize` (utf8proc vs the JDK — two
    * independent UAX #15 implementations must agree byte-for-byte),
    * NFKC against the arithmetically restated fold images (é/Å
    * compose, ﬁ→fi, fullwidth g→g, ²→2, ASCII unchanged). */
  val unicodeNormalize: String =
    s"""WITH d AS (
       |  SELECT doc_id, (n_chars % 17 + 6) AS nt FROM documents),
       |r AS (
       |  SELECT doc_id, nt,
       |    array_to_string(list_transform(range(0, nt), i ->
       |      CASE i % 6
       |        WHEN 0 THEN 'e' || chr(769) || CAST((doc_id + i) % 10 AS VARCHAR)
       |        WHEN 1 THEN 'A' || chr(778)
       |        WHEN 2 THEN chr(64257)
       |        WHEN 3 THEN chr(65351)
       |        WHEN 4 THEN chr(178)
       |        ELSE 'n' || CAST((doc_id*97 + i*29) % 9973 AS VARCHAR)
       |      END), ' ') AS raw,
       |    array_to_string(list_transform(range(0, nt), i ->
       |      CASE i % 6
       |        WHEN 0 THEN chr(233) || CAST((doc_id + i) % 10 AS VARCHAR)
       |        WHEN 1 THEN chr(197)
       |        WHEN 2 THEN 'fi'
       |        WHEN 3 THEN 'g'
       |        WHEN 4 THEN '2'
       |        ELSE 'n' || CAST((doc_id*97 + i*29) % 9973 AS VARCHAR)
       |      END), ' ') AS nfkc
       |  FROM d)
       |SELECT doc_id,
       |  CAST(length(raw) AS BIGINT) AS raw_chars,
       |  CAST(length(nfc_normalize(raw)) AS BIGINT) AS nfc_chars,
       |  md5(nfc_normalize(raw)) AS nfc_md5,
       |  CAST(length(nfkc) AS BIGINT) AS nfkc_chars,
       |  md5(nfkc) AS nfkc_md5
       |FROM r ORDER BY doc_id""".stripMargin

  /** q257's twin — [[graft.engine.Crawl.bomCharsetPages]]: ONE text
    * law for all four transport arms (the twin never mentions BOMs,
    * headers, or endianness — only the `bom` column names the sniff).
    * A header-trusting decode of the lying arms, a BOM leaked into
    * the title, or a wrong endianness each flip `md5(text)` or the
    * pinned `bom` cell. */
  val bomCharsetPages: String =
    s"""WITH d AS (
       |  SELECT doc_id, (n_chars % 21 + 4) AS nt FROM documents),
       |tok AS (
       |  SELECT doc_id, nt,
       |    array_to_string(list_transform(range(0, nt), i ->
       |      CASE WHEN i % 3 = 1
       |             THEN chr(233) || CAST((doc_id + i) % 10 AS VARCHAR)
       |           ELSE 'v' || CAST((doc_id*89 + i*19) % 9973 AS VARCHAR)
       |      END), ' ') AS toks
       |  FROM d),
       |t AS (
       |  SELECT doc_id, nt,
       |    'Bom ' || CAST(doc_id AS VARCHAR) AS title,
       |    'Bom ' || CAST(doc_id AS VARCHAR) || ' ' || toks AS text
       |  FROM tok)
       |SELECT doc_id,
       |  CASE doc_id % 4 WHEN 0 THEN 'none' WHEN 1 THEN 'utf-16le'
       |       WHEN 2 THEN 'utf-16be' ELSE 'utf-8' END AS bom,
       |  title,
       |  CAST(length(text) AS BIGINT) AS text_chars,
       |  CAST(nt + 2 AS BIGINT) AS n_tokens,
       |  md5(text) AS text_md5
       |FROM t ORDER BY doc_id""".stripMargin

  /** q258's twin — [[graft.engine.Crawl.chunkedPages]]: one text law
    * over both HTTP framings (the twin never mentions chunks, sizes,
    * or CRLFs). A framing leak (hex lines in the text), a dropped
    * byte at a chunk seam, an honored chunk extension, or a lost
    * trailer field each flip `md5(text)` or the `trailer` cell. */
  val chunkedPages: String =
    s"""WITH d AS (
       |  SELECT doc_id, (n_chars % 19 + 4) AS nt FROM documents),
       |tok AS (
       |  SELECT doc_id, nt,
       |    array_to_string(list_transform(range(0, nt), i ->
       |      CASE WHEN i % 3 = 2
       |             THEN chr(233) || CAST((doc_id + i) % 10 AS VARCHAR)
       |           ELSE 'c' || CAST((doc_id*101 + i*23) % 9973 AS VARCHAR)
       |      END), ' ') AS toks
       |  FROM d),
       |t AS (
       |  SELECT doc_id, nt,
       |    'Chunk ' || CAST(doc_id AS VARCHAR) || ' ' || toks AS text
       |  FROM tok)
       |SELECT doc_id,
       |  CASE WHEN doc_id % 2 = 0 THEN 'content-length' ELSE 'chunked'
       |    END AS framing,
       |  CASE WHEN doc_id % 3 = 0 THEN 't' || CAST(doc_id % 97 AS VARCHAR)
       |       ELSE 'none' END AS trailer,
       |  CAST(length(text) AS BIGINT) AS text_chars,
       |  CAST(nt + 2 AS BIGINT) AS n_tokens,
       |  md5(text) AS text_md5
       |FROM t ORDER BY doc_id""".stripMargin

  /** q234's twin — [[graft.engine.Crawl.robotsGate]]: RFC 9309
    * longest-match precedence restated as prefix algebra. For the
    * governing graftbot group, path `/p/N` is blocked iff `N` starts
    * with the host's Disallow digit d UNLESS it also starts with the
    * longer Allow carve-out d·e — the twin never parses robots.txt, so
    * a group-selection bug (wildcard fallback, decoy group), a
    * precedence bug (Disallow beating a longer Allow), or a matcher
    * bug all flip `allowed` cells. */
  val robotsGate: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST((doc_id * 47) % 1009 AS VARCHAR) AS ns,
       |    CAST((doc_id % 53) % 10 AS VARCHAR) AS dd,
       |    CAST((doc_id % 53) % 7 AS VARCHAR) AS ee
       |  FROM documents)
       |SELECT doc_id,
       |  'h' || CAST(doc_id % 53 AS VARCHAR) || '.example.com' AS host,
       |  '/p/' || ns AS path,
       |  NOT (starts_with(ns, dd) AND NOT starts_with(ns, dd || ee))
       |    AS allowed
       |FROM d ORDER BY doc_id""".stripMargin

  /** Shared CTE prefix of the sitemap twins — the discovery population
    * (h, c, k, m) regenerated arithmetically from
    * [[graft.engine.Crawl.sitemapUrlCount]] /
    * [[graft.engine.Crawl.sitemapPathNum]]; never mentions XML. */
  private val sitemapCte: String =
    s"""WITH hosts AS (SELECT DISTINCT doc_id % 53 AS h FROM documents),
       |ck AS MATERIALIZED (
       |  -- MATERIALIZED: DuckDB's binder mis-resolves the unnest column
       |  -- when this CTE is inlined under a downstream anti-join +
       |  -- window (the q207 inlining lesson, binder flavor)
       |  SELECT h, c,
       |    unnest(range(0, CASE WHEN c = 0 THEN h % 4 + 4
       |                         ELSE (h * 3) % 5 + 3 END)) AS k
       |  FROM hosts CROSS JOIN (SELECT unnest([0, 1]) AS c)),
       |e AS (
       |  SELECT h, c, k, (h * 31 + c * 501 + k * 17) % 1009 AS m
       |  FROM ck)""".stripMargin

  /** q240's twin — [[graft.engine.Crawl.sitemapDiscover]]: the entries
    * of every host's two child sitemaps regenerated arithmetically —
    * loc (with the k%5==4 query arm's DECODED `&`), lastmod (date and
    * W3C-datetime forms), the k%6==3 changefreq, the k%4==2 omitted
    * priority. The twin never parses XML: a scanner defect anywhere
    * (entity pass, CDATA literal, prefixed local names, extension-
    * element skipping, whitespace trim, the decoy `<image:loc>`) flips
    * rows. */
  val sitemapDiscover: String =
    s"""$sitemapCte,
       |r AS (
       |  SELECT
       |    'h' || CAST(h AS VARCHAR) || '.example.com' AS host,
       |    'https://h' || CAST(h AS VARCHAR) || '.example.com/sitemap-' ||
       |      CAST(c AS VARCHAR) || '.xml' AS sitemap,
       |    'https://h' || CAST(h AS VARCHAR) || '.example.com/p/' ||
       |      CAST(m AS VARCHAR) ||
       |      CASE WHEN k % 5 = 4 THEN '?x=' || CAST(k AS VARCHAR) ||
       |        '&y=' || CAST(h % 10 AS VARCHAR) ELSE '' END AS loc,
       |    '2026-' || lpad(CAST(h % 9 + 1 AS VARCHAR), 2, '0') || '-' ||
       |      lpad(CAST((k * 3 + c) % 28 + 1 AS VARCHAR), 2, '0') ||
       |      CASE WHEN k % 3 = 1 THEN 'T' ||
       |        lpad(CAST((h + k) % 24 AS VARCHAR), 2, '0') || ':00:00+00:00'
       |      ELSE '' END AS lastmod,
       |    CASE WHEN k % 6 = 3 THEN
       |      CASE WHEN (h + k) % 2 = 0 THEN 'daily' ELSE 'weekly' END
       |    END AS changefreq,
       |    CASE WHEN k % 4 = 2 THEN NULL
       |         ELSE (((h + 2 * k + c) % 10)::DOUBLE) / (10.0::DOUBLE)
       |    END AS priority
       |  FROM e)
       |SELECT host, sitemap, loc, lastmod, changefreq, priority
       |FROM r ORDER BY host, loc""".stripMargin

  /** q241's twin — [[graft.engine.Crawl.crawlFrontier]]: discovery
    * restated arithmetically at the PATH grain (the query arm strips
    * back to the same `/p/m`), the seen-before subtraction as NOT
    * EXISTS against the corpus URL formula, the robots gate as the
    * q234 prefix algebra, and the politeness wave as the same
    * per-host window (omitted priority ranks at the protocol default
    * 0.5; rank totality holds because a host's paths are distinct by
    * construction). */
  val crawlFrontier: String =
    s"""$sitemapCte,
       |cand AS (
       |  SELECT h, m,
       |    'h' || CAST(h AS VARCHAR) || '.example.com' AS host,
       |    '/p/' || CAST(m AS VARCHAR) AS path,
       |    CAST(m AS VARCHAR) AS ns,
       |    CASE WHEN k % 4 = 2 THEN NULL
       |         ELSE (((h + 2 * k + c) % 10)::DOUBLE) / (10.0::DOUBLE)
       |    END AS priority
       |  FROM e),
       |seen AS (
       |  SELECT DISTINCT doc_id % 53 AS h, (doc_id * 47) % 1009 AS m
       |  FROM documents),
       |fresh AS (
       |  SELECT ca.host AS host, ca.path AS path, ca.ns AS ns,
       |         ca.priority AS priority, ca.h AS h
       |  FROM cand ca
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM seen s WHERE s.h = ca.h AND s.m = ca.m)),
       |ok AS (
       |  SELECT host, path, priority, coalesce(priority, 0.5) AS prio_eff
       |  FROM fresh
       |  WHERE NOT (starts_with(ns, CAST(h % 10 AS VARCHAR))
       |    AND NOT starts_with(ns,
       |      CAST(h % 10 AS VARCHAR) || CAST(h % 7 AS VARCHAR)))),
       |w AS (
       |  SELECT host, path, priority,
       |    (row_number() OVER (PARTITION BY host
       |       ORDER BY prio_eff DESC, path) - 1)
       |      // ${engine.Crawl.PER_HOST_FETCH_BUDGET} AS wave
       |  FROM ok)
       |SELECT host, path, priority, CAST(wave AS BIGINT) AS wave
       |FROM w ORDER BY host, wave, path""".stripMargin

  /** q249's twin — [[graft.engine.Crawl.avroRoundTrip]]: the field
    * formulas restated directly (é via chr(233); eighths are exact in
    * doubles). Spark only reaches these values through the full OCF
    * decode — header map, embedded JSON schema, zigzag varints,
    * little-endian doubles, multi-byte UTF-8 lengths, deflate blocks,
    * sync checks — so a wire defect anywhere flips rows. */
  val avroRoundTrip: String =
    s"""SELECT doc_id,
       |  'Avro ' || CAST(doc_id AS VARCHAR) ||
       |    CASE WHEN doc_id % 5 = 0
       |      THEN ' ' || chr(233) || CAST(doc_id % 9 AS VARCHAR)
       |      ELSE '' END AS title,
       |  (((doc_id * 7) % 1000)::DOUBLE) / (8.0::DOUBLE) AS score,
       |  (doc_id % 3 = 0) AS flag
       |FROM documents ORDER BY doc_id""".stripMargin

  /** q243's twin — [[graft.engine.Crawl.zipArchiveProbe]]: member
    * names, methods, uncompressed sizes and the seed rows' text hashes
    * regenerated arithmetically; compressed sizes are excluded (a
    * compressor property, the q218 lesson). Spark only reaches these
    * rows through EOCD scan-back → central directory → (seeds only)
    * local header + raw inflate + CRC32 — a drifted offset, a
    * mis-parsed length field, or an inflate defect flips rows or fails
    * loudly. */
  val zipArchiveProbe: String =
    s"""WITH d AS (
       |  SELECT doc_id, (n_chars % 27 + 5) AS nt FROM documents),
       |t AS (
       |  SELECT doc_id,
       |    array_to_string(list_transform(range(0, nt),
       |      i -> 'z' || CAST((doc_id * 41 + i * 13) % 9973 AS VARCHAR)),
       |      ' ') AS text
       |  FROM d)
       |SELECT 'docs/' || CAST(doc_id AS VARCHAR) || '.txt' AS name,
       |  CASE WHEN doc_id % 4 = 0 THEN 'stored' ELSE 'deflate' END AS method,
       |  CAST(length(text) AS BIGINT) AS usize,
       |  CASE WHEN doc_id % 31 = 5 THEN md5(text) END AS text_md5
       |FROM t ORDER BY name""".stripMargin

  /** q245's twin — [[graft.engine.Crawl.frontierSchedule]]: q241's
    * frontier with each host's Crawl-delay (h%7+1 by the corpus
    * formula) pacing its waves. The twin never parses robots.txt —
    * a delay mis-scoped to the wrong group (the decoy or `*` group
    * declare none) or mis-parsed flips every fetch_at_s cell of that
    * host. */
  val frontierSchedule: String =
    s"""$sitemapCte,
       |cand AS (
       |  SELECT h, m,
       |    'h' || CAST(h AS VARCHAR) || '.example.com' AS host,
       |    '/p/' || CAST(m AS VARCHAR) AS path,
       |    CAST(m AS VARCHAR) AS ns,
       |    CASE WHEN k % 4 = 2 THEN NULL
       |         ELSE (((h + 2 * k + c) % 10)::DOUBLE) / (10.0::DOUBLE)
       |    END AS priority
       |  FROM e),
       |seen AS (
       |  SELECT DISTINCT doc_id % 53 AS h, (doc_id * 47) % 1009 AS m
       |  FROM documents),
       |fresh AS (
       |  SELECT ca.host AS host, ca.path AS path, ca.ns AS ns,
       |         ca.priority AS priority, ca.h AS h
       |  FROM cand ca
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM seen s WHERE s.h = ca.h AND s.m = ca.m)),
       |ok AS (
       |  SELECT host, path, priority, h,
       |    coalesce(priority, 0.5) AS prio_eff
       |  FROM fresh
       |  WHERE NOT (starts_with(ns, CAST(h % 10 AS VARCHAR))
       |    AND NOT starts_with(ns,
       |      CAST(h % 10 AS VARCHAR) || CAST(h % 7 AS VARCHAR)))),
       |w AS (
       |  SELECT host, path, priority, h,
       |    (row_number() OVER (PARTITION BY host
       |       ORDER BY prio_eff DESC, path) - 1)
       |      // ${engine.Crawl.PER_HOST_FETCH_BUDGET} AS wave
       |  FROM ok)
       |SELECT host, path, priority, CAST(wave AS BIGINT) AS wave,
       |  CAST(wave * (h % 7 + 1) AS BIGINT) AS fetch_at_s
       |FROM w ORDER BY host, wave, path""".stripMargin

  /** q246's twin — [[graft.engine.Crawl.recrawlDue]]: the discovered
    * lastmod dates and the per-URL LATEST capture date (the WARC-Date
    * formula, Jan by construction while lastmod spans Jan–Sep) joined
    * and compared as ISO date strings. The twin never mentions the
    * archive wire — Spark must read each capture's WARC-Date through
    * the real decode, so a header-read defect, a lost latest-capture
    * reduction, or an off-by-one date slice flips `due` cells. */
  val recrawlDue: String =
    s"""$sitemapCte,
       |disc AS (
       |  SELECT h, m,
       |    'h' || CAST(h AS VARCHAR) || '.example.com' AS host,
       |    '/p/' || CAST(m AS VARCHAR) AS path,
       |    '2026-' || lpad(CAST(h % 9 + 1 AS VARCHAR), 2, '0') || '-' ||
       |      lpad(CAST((k * 3 + c) % 28 + 1 AS VARCHAR), 2, '0')
       |      AS lastmod_date
       |  FROM e),
       |caps AS (
       |  SELECT doc_id % 53 AS h, (doc_id * 47) % 1009 AS m,
       |    '2026-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
       |      AS cap
       |  FROM documents),
       |last AS (
       |  SELECT h, m, max(cap) AS last_capture FROM caps GROUP BY h, m),
       |j AS (
       |  SELECT d.host AS host, d.path AS path,
       |    l.last_capture AS last_capture, d.lastmod_date AS lastmod_date
       |  FROM disc d JOIN last l ON d.h = l.h AND d.m = l.m)
       |SELECT host, path, last_capture, lastmod_date,
       |  (lastmod_date > last_capture) AS due
       |FROM j ORDER BY host, path""".stripMargin

  /** q235's twin — [[graft.engine.Crawl.crawlCuration]]: the extracted
    * text regenerated arithmetically, then the SAME SQL text algebra
    * the q24/q44 twins use (whitespace split, stopword filter, the
    * shared thresholds) — decode chain and gate composition under one
    * hash. */
  val crawlCuration: String = {
    val stopList = TextOps.STOPWORDS.map(s => s"'$s'").mkString(", ")
    s"""WITH d AS (
       |  SELECT doc_id, (n_chars % 37 + 5) AS nt FROM documents),
       |tok AS (
       |  SELECT doc_id, nt,
       |    array_to_string(list_transform(range(0, nt), i ->
       |      CASE WHEN doc_id % 11 <> 0 AND i % ((doc_id % 5) + 3) = 1
       |        THEN ([$stopList])[CAST((doc_id + i) % 8 AS INTEGER) + 1]
       |        ELSE 'v' || CAST((doc_id*53 + i*19) % 9973 AS VARCHAR)
       |      END), ' ') AS toks
       |  FROM d),
       |t AS (
       |  SELECT doc_id,
       |    'Page ' || CAST(doc_id AS VARCHAR) || ' ' || toks AS text
       |  FROM tok),
       |q AS (
       |  SELECT doc_id,
       |    len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens,
       |    len(list_filter(string_split_regex(trim(text), '\\s+'),
       |      sw -> sw IN ($stopList)))::BIGINT AS n_stop
       |  FROM t),
       |v AS (
       |  SELECT doc_id, n_tokens,
       |    CASE WHEN n_tokens < ${TextOps.MIN_TOKENS} THEN 'short'
       |         WHEN n_stop::DOUBLE / n_tokens::DOUBLE >
       |           ${TextOps.MAX_STOP_RATIO} THEN 'stopword_heavy'
       |         WHEN n_stop::DOUBLE / n_tokens::DOUBLE <
       |           ${TextOps.STOP_RATIO_EN} THEN 'non_en'
       |         ELSE 'kept' END AS verdict
       |  FROM q)
       |SELECT verdict, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens
       |FROM v GROUP BY verdict ORDER BY verdict""".stripMargin
  }

  /** q237's twin — [[graft.engine.Crawl.mainContentExtract]]: the two
    * candidate paragraph blocks regenerated arithmetically, then the
    * SAME integer classification law (len ≥ 25; 3·linkChars < chars)
    * replayed in SQL. The chrome/link-farm/short blocks never appear
    * here: the Spark side must drop them by the ancestry/density/length
    * rules to match — surviving sidebar text or a lost paragraph flips
    * `md5(text)`. */
  val mainContentExtract: String =
    s"""WITH d AS (
       |  SELECT doc_id, (n_chars % 37 + 5) AS nt FROM documents),
       |p AS (
       |  SELECT doc_id, nt // 2 + 3 AS n0, (nt + 1) // 2 + 3 AS n1
       |  FROM d),
       |b AS (
       |  SELECT doc_id,
       |    array_to_string(list_transform(range(0, n0), i ->
       |      'm' || CAST((doc_id*43 + i*7) % 9973 AS VARCHAR)), ' ') AS b0,
       |    array_to_string(list_transform(range(0, n1), i ->
       |      'm' || CAST((doc_id*43 + 29 + i*7) % 9973 AS VARCHAR)), ' ')
       |      AS b1,
       |    'm' || CAST((doc_id*43 + 7) % 9973 AS VARCHAR) AS l0
       |  FROM p),
       |k AS (
       |  SELECT doc_id,
       |    (length(b0) >= 25 AND 3*length(l0) < length(b0)) AS keep0,
       |    (length(b1) >= 25) AS keep1, b0, b1
       |  FROM b),
       |t AS (
       |  SELECT doc_id,
       |    CASE WHEN keep0 AND keep1 THEN b0 || ' ' || b1
       |         WHEN keep0 THEN b0
       |         WHEN keep1 THEN b1
       |         ELSE '' END AS text
       |  FROM k)
       |SELECT doc_id,
       |  CAST(length(text) AS BIGINT) AS text_chars,
       |  CAST(CASE WHEN text = '' THEN 0
       |            ELSE len(string_split(text, ' ')) END AS BIGINT)
       |    AS n_tokens,
       |  md5(text) AS text_md5
       |FROM t ORDER BY doc_id""".stripMargin

  /** q236's twin — [[graft.engine.Crawl.pdfTextIngest]]: both dispatch
    * arms' EXTRACTED text regenerated arithmetically. The PDF arm's
    * tokens restate [[graft.engine.Crawl.pdfToken]]'s CASE (paren /
    * octal / hex / WinAnsi-é / plain — the wire encodes each through a
    * different PDF mechanism: literal-string escapes, `\\101` octal,
    * `<68 78 ..>` hex strings, a cp1252 high byte under
    * /WinAnsiEncoding, four separator op families); the twin never
    * mentions xref tables, zlib, or text operators — Spark can only
    * reach these strings through the full
    * gzip → WARC → HTTP → dispatch → PDF subset decode, and a defect
    * anywhere flips `md5(text)`. */
  val pdfTextIngest: String =
    s"""WITH d AS (
       |  SELECT doc_id, (n_chars % 33 + 6) AS nt FROM documents),
       |tok AS (
       |  SELECT doc_id, nt,
       |    array_to_string(list_transform(range(0, nt), i ->
       |      CASE WHEN doc_id % 3 = 0
       |             THEN 'g' || CAST((doc_id*71 + i*23) % 9973 AS VARCHAR)
       |           WHEN i % 9 = 2
       |             THEN 'p(' || CAST((doc_id + i) % 10 AS VARCHAR) || ')'
       |           WHEN i % 9 = 5
       |             THEN 'A' || CAST((doc_id + i) % 10 AS VARCHAR)
       |           WHEN i % 9 = 7
       |             THEN 'hx' || CAST((doc_id + i) % 10 AS VARCHAR)
       |           WHEN i % 7 = 4
       |             THEN chr(233) || CAST((doc_id + i) % 10 AS VARCHAR)
       |           ELSE 't' || CAST((doc_id*67 + i*31) % 9973 AS VARCHAR)
       |      END), ' ') AS toks
       |  FROM d),
       |t AS (
       |  SELECT doc_id, nt,
       |    CASE WHEN doc_id % 3 = 0
       |         THEN 'Web ' || CAST(doc_id AS VARCHAR) || ' ' || toks
       |         ELSE toks END AS text
       |  FROM tok)
       |SELECT doc_id,
       |  CASE WHEN doc_id % 3 = 0 THEN 'html' ELSE 'pdf' END AS fmt,
       |  CAST(CASE WHEN doc_id % 3 = 0 THEN 1
       |            WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END AS BIGINT)
       |    AS n_pages,
       |  CAST(length(text) AS BIGINT) AS text_chars,
       |  CAST(CASE WHEN doc_id % 3 = 0 THEN nt + 2 ELSE nt END AS BIGINT)
       |    AS n_tokens,
       |  md5(text) AS text_md5
       |FROM t ORDER BY doc_id""".stripMargin

  /** q251's twin — [[graft.engine.Crawl.pdfXrefStreamIngest]]: the
    * extracted text regenerated arithmetically from (doc_id, i). The
    * twin never mentions xref streams, object streams, W columns, or
    * predictors — Spark can only reach these strings through the PDF
    * 1.5+ bootstrap chain (q251's corpus is written EXCLUSIVELY in
    * that layout, rotating all four machinery arms on doc_id%4), so a
    * defect anywhere in it flips `md5(text)`. */
  val pdfXrefStreamIngest: String =
    s"""WITH d AS (
       |  SELECT doc_id, (n_chars % 29 + 5) AS nt FROM documents),
       |t AS (
       |  SELECT doc_id, nt,
       |    array_to_string(list_transform(range(0, nt), i ->
       |      CASE WHEN i % 5 = 3
       |             THEN chr(233) || CAST((doc_id + i) % 10 AS VARCHAR)
       |           ELSE 'z' || CAST((doc_id*73 + i*37) % 9973 AS VARCHAR)
       |      END), ' ') AS text
       |  FROM d)
       |SELECT doc_id,
       |  CAST(CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END AS BIGINT)
       |    AS n_pages,
       |  CAST(length(text) AS BIGINT) AS text_chars,
       |  CAST(nt AS BIGINT) AS n_tokens,
       |  md5(text) AS text_md5
       |FROM t ORDER BY doc_id""".stripMargin

  /** q252's twin — [[graft.engine.Crawl.pdfFormTextIngest]]: the
    * body/form/nested-form/body token order restated as plain list
    * concatenation. The twin never mentions XObjects, resource maps,
    * or Do — the é arms are reachable only if the reader scopes each
    * form's fonts to ITS resources and restores the page font at form
    * exit, so a scoping or restore defect flips `md5(text)` (or
    * rejects outright on the planted unresolvable names). */
  val pdfFormTextIngest: String =
    s"""WITH d AS (
       |  SELECT doc_id, (n_chars % 27 + 4) AS nt FROM documents),
       |t AS (
       |  SELECT doc_id, nt,
       |    array_to_string(
       |      list_transform(range(0, nt // 2), i ->
       |        CASE WHEN i % 4 = 1
       |               THEN chr(233) || CAST((doc_id + i) % 10 AS VARCHAR)
       |             ELSE 'b' || CAST((doc_id*59 + i*13) % 9973 AS VARCHAR)
       |        END) ||
       |      list_transform(range(0, 3), i ->
       |        'f' || CAST((doc_id*61 + i*17) % 9973 AS VARCHAR)) ||
       |      CASE WHEN doc_id % 3 = 1
       |           THEN ['w' || CAST((doc_id*3) % 10 AS VARCHAR) || chr(233)]
       |           ELSE [] END ||
       |      list_transform(range(nt // 2, nt), i ->
       |        CASE WHEN i % 4 = 1
       |               THEN chr(233) || CAST((doc_id + i) % 10 AS VARCHAR)
       |             ELSE 'b' || CAST((doc_id*59 + i*13) % 9973 AS VARCHAR)
       |        END), ' ') AS text
       |  FROM d)
       |SELECT doc_id,
       |  CAST(1 AS BIGINT) AS n_pages,
       |  CAST(length(text) AS BIGINT) AS text_chars,
       |  CAST(nt + 3 + CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 0 END
       |    AS BIGINT) AS n_tokens,
       |  md5(text) AS text_md5
       |FROM t ORDER BY doc_id""".stripMargin

  /** q254's twin — [[graft.engine.Crawl.pdfCidTextIngest]]: the token
    * text regenerated arithmetically from (doc_id, i). The twin never
    * mentions CIDs, CMaps, bfranges, or hex strings — the corpus
    * writes every character as a 2-byte Identity-H CID resolvable
    * only through the embedded ToUnicode CMap (é and 𝐀 through
    * bfchar singles, one of them a surrogate pair; ASCII through the
    * shifted incrementing bfrange), so a defect anywhere in the CMap
    * chain flips `md5(text)`. */
  val pdfCidTextIngest: String =
    s"""WITH d AS (
       |  SELECT doc_id, (n_chars % 25 + 4) AS nt FROM documents),
       |t AS (
       |  SELECT doc_id, nt,
       |    array_to_string(list_transform(range(0, nt), i ->
       |      CASE WHEN i % 7 = 2
       |             THEN chr(233) || CAST((doc_id + i) % 10 AS VARCHAR)
       |           WHEN i % 7 = 5
       |             THEN chr(119808) || CAST((doc_id + i) % 10 AS VARCHAR)
       |           ELSE 'k' || CAST((doc_id*79 + i*41) % 9973 AS VARCHAR)
       |      END), ' ') AS text
       |  FROM d)
       |SELECT doc_id,
       |  CAST(CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END AS BIGINT)
       |    AS n_pages,
       |  CAST(length(text) AS BIGINT) AS text_chars,
       |  CAST(nt AS BIGINT) AS n_tokens,
       |  md5(text) AS text_md5
       |FROM t ORDER BY doc_id""".stripMargin

  /** q255's twin — [[graft.engine.Crawl.pdfIncrementalIngest]]: the
    * FINAL-generation token text per update arm, regenerated
    * arithmetically. The twin never mentions /Prev, sections, or
    * freed rows — every superseded generation's text is still fully
    * parseable in the file bytes, so a chain-merge defect (oldest
    * wins, a missed subsection, an unmasked ObjStm copy) surfaces as
    * rev-N−1 tokens and flips `md5(text)`. */
  val pdfIncrementalIngest: String = {
    def toks(rev: Int): String =
      s"""array_to_string(list_transform(range(0, nt), i ->
         |      CASE WHEN i % 5 = 3
         |             THEN chr(233) || CAST((doc_id + $rev + i) % 10 AS VARCHAR)
         |           ELSE 'u' || CAST((doc_id*83 + $rev*101 + i*43) % 9973 AS VARCHAR)
         |      END), ' ')""".stripMargin
    s"""WITH d AS (
       |  SELECT doc_id, (n_chars % 23 + 4) AS nt, doc_id % 4 AS arm
       |  FROM documents),
       |t AS (
       |  SELECT doc_id, nt, arm,
       |    CASE arm
       |      WHEN 0 THEN ${toks(1)}
       |      WHEN 1 THEN ${toks(0)} || ' ' || ${toks(1)}
       |      WHEN 2 THEN ${toks(2)}
       |      ELSE ${toks(1)}
       |    END AS text
       |  FROM d)
       |SELECT doc_id,
       |  CAST(CASE WHEN arm = 1 THEN 2 ELSE 1 END AS BIGINT) AS n_pages,
       |  CAST(length(text) AS BIGINT) AS text_chars,
       |  CAST(CASE WHEN arm = 1 THEN 2*nt ELSE nt END AS BIGINT)
       |    AS n_tokens,
       |  md5(text) AS text_md5
       |FROM t ORDER BY doc_id""".stripMargin
  }

  /** q253's twin — [[graft.engine.Crawl.frontierSkewedWaves]]: the
    * candidate relation regenerated arithmetically (one cold row per
    * doc on its formula host + the hot host's fanout), waved by the
    * PLAIN per-host window. The Spark side's two-path rank
    * decomposition (cold window ∪ hot leading-key split) must be
    * exactly rank-equal to the naive form — an off-by-one in the
    * offset cumulation, a wrong salt grain, or a tie-order drift all
    * flip rows. */
  val frontierSkewedWaves: String =
    s"""WITH docs AS (SELECT doc_id FROM documents),
       |cand AS (
       |  SELECT 'h' || CAST(doc_id % 53 AS VARCHAR) || '.example.com'
       |      AS host,
       |    '/q/' || CAST(doc_id AS VARCHAR) AS path,
       |    CAST((doc_id*7) % 11 AS DOUBLE)/10.0 AS priority
       |  FROM docs
       |  UNION ALL
       |  SELECT 'hot0.example.com',
       |    '/z/' || CAST(doc_id AS VARCHAR) || '/' || CAST(j AS VARCHAR),
       |    CAST((doc_id + j) % 11 AS DOUBLE)/10.0
       |  FROM docs, range(0, 20) t(j)),
       |r AS (
       |  SELECT host, path, priority,
       |    row_number() OVER (PARTITION BY host
       |      ORDER BY priority DESC, path) AS rn
       |  FROM cand)
       |SELECT host, path, priority,
       |  CAST((rn - 1) // 4 AS BIGINT) AS wave
       |FROM r ORDER BY host, wave, path""".stripMargin

  /** q232's twin — [[graft.multimodal.Multimodal.gifDecodeStats]]: the
    * indexed-color formula pair composed directly — palette entry
    * (doc·3+j·5, doc·5+j·11, doc·7+j·13) mod 256 looked up at index
    * j = (doc·29 + pixel·17) mod 2^bpp. The Spark side can only reach
    * these pixels through the hand-rolled LZW decode (variable-width
    * codes, dictionary growth, interlace on a fifth of the corpus,
    * extension-block skip on a third); the twin never mentions any of
    * it. */
  val gifDecodeStats: String = {
    val j = "((doc_id*29 + (p//3)*17) % psize)"
    s"""WITH d AS (
       |  SELECT doc_id, (n_chars % 19 + 3) AS w, (n_chars % 13 + 3) AS h,
       |    CAST(1 << CAST((doc_id % 7) + 2 AS INTEGER) AS BIGINT) AS psize
       |  FROM documents),
       |px AS (
       |  SELECT doc_id, w, h, psize,
       |    list_transform(range(0, w*h*3), p ->
       |      CASE p % 3
       |        WHEN 0 THEN (doc_id*3 + $j*5) % 256
       |        WHEN 1 THEN (doc_id*5 + $j*11) % 256
       |        ELSE (doc_id*7 + $j*13) % 256 END) AS v
       |  FROM d)
       |SELECT doc_id AS media_id,
       |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       |  psize AS palette_size,
       |  ${channelSums("v", "w*h")},
       |  ${rasterChecksum("v")}
       |FROM px ORDER BY media_id""".stripMargin
  }

  /** q204's twin — [[graft.multimodal.Multimodal.mixedDecodeStats]]:
    * q179's format-INDEPENDENT resize oracle (generative raster + the
    * same source-index arithmetic) with the fmt column restating the
    * corpus's mod-3 PPM/BMP/PNG layout. All three parsers must recover
    * the identical raster from their very different wire layouts — PNG
    * through a real DEFLATE inflate — to match. */
  val mixedDecodeStats: String = {
    import graft.multimodal.Multimodal.{THUMB_H, THUMB_W}
    val n = THUMB_W * THUMB_H * 3
    val src = s"3*(((((rq//3)//$THUMB_W)*h)//$THUMB_H)*w + " +
      s"((((rq//3)%$THUMB_W)*w)//$THUMB_W)) + (rq%3) + 1"
    s"""WITH $ppmBaseSql,
       |rz AS (
       |  SELECT doc_id,
       |    list_transform(range(0, $n), rq -> v[$src]) AS rv
       |  FROM px)
       |SELECT doc_id AS media_id,
       |  CASE doc_id % 3 WHEN 0 THEN 'ppm' WHEN 1 THEN 'bmp'
       |    ELSE 'png' END AS fmt,
       |  CAST($THUMB_W AS BIGINT) AS width,
       |  CAST($THUMB_H AS BIGINT) AS height,
       |  CAST($n AS BIGINT) AS n_bytes,
       |  ${channelSums("rv", (THUMB_W * THUMB_H).toString)},
       |  ${rasterChecksum("rv")}
       |FROM rz ORDER BY media_id""".stripMargin
  }

  /** Shared generative CTE of the q183/q184 twins: sample i =
    * (doc_id·31 + i·17) mod 4096 − 2048 — the oracle regenerates the
    * EXPECTED waveform arithmetically; only the Spark side goes through
    * the real RIFF/WAVE wire format (chunk walk, odd-chunk pad byte,
    * little-endian PCM), so the hashes gate the parser itself. */
  private def wavBaseSql: String =
    s"""d AS (
       |  SELECT doc_id, (n_chars % 96 + 16) AS n,
       |    (8000 + (doc_id % 4) * 4000) AS sr
       |  FROM documents),
       |sg AS (
       |  SELECT doc_id, n, sr,
       |    list_transform(range(0, n),
       |      si -> (doc_id*31 + si*17) % 4096 - 2048) AS v
       |  FROM d)""".stripMargin

  /** The q183/q184 waveform statistics over a sample list `vec` (DuckDB
    * 1-indexed) of length `n`: Σ|s|, peak, sign-flip count, Σs², and the
    * rolling checksum over the unsigned 16-bit representation (s+65536
    * for negatives — the PCM wire value). */
  private def wavStats(vec: String, n: String): String =
    s"""CAST(list_aggregate(list_transform($vec, s -> abs(s)), 'sum')
       |    AS BIGINT) AS sum_abs,
       |  CAST(list_aggregate(list_transform($vec, s -> abs(s)), 'max')
       |    AS BIGINT) AS peak,
       |  CAST(COALESCE(list_aggregate(list_transform(range(1, $n),
       |    zi -> CASE WHEN ($vec[zi] < 0) <> ($vec[zi+1] < 0)
       |               THEN 1 ELSE 0 END), 'sum'), 0) AS BIGINT)
       |    AS zero_crossings,
       |  CAST(list_aggregate(list_transform($vec, s -> s*s), 'sum')
       |    AS BIGINT) AS energy,
       |  CAST(list_reduce(list_prepend(7, list_transform($vec,
       |    s -> CASE WHEN s < 0 THEN s + 65536 ELSE s END)),
       |    (wa, wx) -> (wa*31 + wx) % $P) AS BIGINT) AS checksum""".stripMargin

  /** q183's twin — [[graft.multimodal.Multimodal.audioDecodeStats]]. */
  val audioDecodeStats: String =
    s"""WITH $wavBaseSql
       |SELECT doc_id AS media_id,
       |  CAST(sr AS BIGINT) AS sample_rate,
       |  CAST(n AS BIGINT) AS n_samples,
       |  ${wavStats("v", "n")}
       |FROM sg ORDER BY media_id""".stripMargin

  /** q184's twin — [[graft.multimodal.Multimodal.audioResampleStats]]:
    * the drop-sample keep-index arithmetic (j·DEC) replayed per output
    * sample, the divided clock included, pinning the resampler
    * sample-for-sample. */
  val audioResampleStats: String = {
    import graft.multimodal.Multimodal.AUDIO_DEC
    s"""WITH $wavBaseSql,
       |dm AS (
       |  SELECT doc_id, sr, ((n - 1) // $AUDIO_DEC + 1) AS m,
       |    list_transform(range(0, (n - 1) // $AUDIO_DEC + 1),
       |      dj -> v[dj * $AUDIO_DEC + 1]) AS dv
       |  FROM sg)
       |SELECT doc_id AS media_id,
       |  CAST(sr // $AUDIO_DEC AS BIGINT) AS sample_rate,
       |  CAST(m AS BIGINT) AS n_samples,
       |  ${wavStats("dv", "m")}
       |FROM dm ORDER BY media_id""".stripMargin
  }

  /** q185's twin — [[graft.multimodal.Multimodal.videoFrameStats]]: the
    * frame slicing replayed as `substr`/`ascii` arithmetic over the
    * (all-ASCII) document bytes — offsets, stride, and the
    * trailing-partial-frame drop are all pinned. */
  val videoFrameStats: String = {
    import graft.multimodal.Multimodal.{FRAME_SIZE, FRAME_STRIDE}
    s"""WITH v AS (
       |  SELECT doc_id, text, length(text) AS L FROM documents
       |  WHERE doc_id % 3 = 2),
       |f AS (
       |  SELECT doc_id, text, unnest(range(0, L // $FRAME_SIZE)) AS fno
       |  FROM v),
       |k AS (
       |  SELECT doc_id, fno,
       |    list_transform(range(1, $FRAME_SIZE + 1),
       |      fi -> CAST(ascii(substr(text,
       |        CAST(fno * $FRAME_SIZE + fi AS INT), 1)) AS BIGINT)) AS b
       |  FROM f WHERE fno % $FRAME_STRIDE = 0)
       |SELECT doc_id AS media_id, CAST(fno AS BIGINT) AS frame_no,
       |  CAST($FRAME_SIZE AS BIGINT) AS n_bytes,
       |  CAST(list_aggregate(b, 'sum') AS BIGINT) AS sum_bytes,
       |  CAST(list_reduce(list_prepend(7, b),
       |    (fa, fx) -> (fa*31 + fx) % $P) AS BIGINT) AS checksum
       |FROM k ORDER BY media_id, frame_no""".stripMargin
  }

  /** q196's twin — [[graft.multimodal.Multimodal.videoPdupPairs]]: the
    * variant corpus (exact copy, one-byte retouch with its >32-byte
    * guard), q185's frame slicing/checksum arithmetic, the df-capped
    * (frame_no, chk) posting buckets and the integer agreement-ppm
    * verify, all replayed over the document bytes. */
  val videoPdupPairs: String = {
    import graft.multimodal.Multimodal.{FRAME_SIZE, FRAME_STRIDE,
      VID_CAP, VID_T_PPM}
    val F = FRAME_SIZE
    s"""WITH v AS (
       |  SELECT doc_id, text, length(text) AS L FROM documents
       |  WHERE doc_id % 3 = 2),
       |m AS (
       |  SELECT doc_id*4 AS vid, text, L, 0 AS pert FROM v
       |  UNION ALL
       |  SELECT doc_id*4+1, text, L, 0 FROM v WHERE doc_id % 4 = 0
       |  UNION ALL
       |  SELECT doc_id*4+2, text, L,
       |    CASE WHEN L > ${2 * F} THEN 1 ELSE 0 END
       |  FROM v WHERE doc_id % 5 = 0),
       |f AS (
       |  SELECT vid, text, pert, unnest(range(0, L // $F)) AS fno
       |  FROM m),
       |k AS (
       |  SELECT vid, CAST(fno AS BIGINT) AS frame_no,
       |    CAST(list_reduce(list_prepend(7, list_transform(
       |      range(1, $F + 1),
       |      fi -> CAST(ascii(substr(text,
       |              CAST(fno * $F + fi AS INT), 1)) AS BIGINT)
       |            + CASE WHEN pert = 1 AND fno * $F + fi = ${2 * F + 1}
       |                   THEN 1 ELSE 0 END)),
       |      (fa, fx) -> (fa*31 + fx) % $P) AS BIGINT) AS chk
       |  FROM f WHERE fno % $FRAME_STRIDE = 0),
       |nf AS (SELECT vid, CAST(count(*) AS BIGINT) AS nf FROM k
       |       GROUP BY vid),
       |ok AS (
       |  SELECT frame_no, chk FROM k GROUP BY frame_no, chk
       |  HAVING count(*) BETWEEN 2 AND $VID_CAP),
       |b AS (SELECT k.* FROM k JOIN ok USING (frame_no, chk)),
       |cand AS (
       |  SELECT DISTINCT x.vid AS id_a, y.vid AS id_b
       |  FROM b x JOIN b y USING (frame_no, chk) WHERE x.vid < y.vid),
       |mt AS (
       |  SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS n_match
       |  FROM cand c
       |  JOIN k ka ON ka.vid = c.id_a
       |  JOIN k kb ON kb.vid = c.id_b AND kb.frame_no = ka.frame_no
       |  WHERE ka.chk = kb.chk GROUP BY id_a, id_b)
       |SELECT id_a, id_b, n_match,
       |  greatest(na.nf, nb.nf) AS n_frames,
       |  CAST(n_match * 1000000 // greatest(na.nf, nb.nf) AS BIGINT)
       |    AS match_ppm
       |FROM mt JOIN nf na ON na.vid = id_a JOIN nf nb ON nb.vid = id_b
       |WHERE n_match * 1000000 // greatest(na.nf, nb.nf) >= $VID_T_PPM
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Shared generative CTE of the q186–q188 twins: the dHash of every
    * synthetic raster regenerated ARITHMETICALLY — byte p =
    * (doc_id·31 + p·7) mod 256, nearest-neighbour index math
    * (x·w div 9, y·h div 7), integer luma (299r+587g+114b) div 1000,
    * bit y·8+x = gray(x,y) > gray(x+1,y) — while the Spark side reaches
    * the same 56 bits only through the real PPM encode→parse→resize
    * kernel. `hw`/`hh` and the composed index chase (thumb→half→source)
    * replay the half-scale leg. */
  private def dhashBaseSql: String = {
    def gray(sx: String, sy: String): String =
      s"""(299*((doc_id*31 + (3*(($sy)*w + ($sx)))*7) % 256)
         | + 587*((doc_id*31 + (3*(($sy)*w + ($sx))+1)*7) % 256)
         | + 114*((doc_id*31 + (3*(($sy)*w + ($sx))+2)*7) % 256)) // 1000"""
        .stripMargin
    val gFull = gray("(i%9)*w//9", "(i//9)*h//7")
    val gHalf = gray("((i%9)*hw//9)*w//hw", "((i//9)*hh//7)*h//hh")
    def pack(g: String): String =
      s"""CAST(list_aggregate(list_transform(range(0, 56), bi ->
         |  CASE WHEN $g[CAST((bi//8)*9 + (bi%8) + 1 AS INT)]
         |          > $g[CAST((bi//8)*9 + (bi%8) + 2 AS INT)]
         |  THEN (CAST(1 AS BIGINT) << CAST(bi AS INT)) ELSE 0 END),
         |  'sum') AS BIGINT)""".stripMargin
    s"""dd AS (
       |  SELECT doc_id, (n_chars % 16 + 1) AS w, (n_chars % 12 + 1) AS h,
       |    greatest((n_chars % 16 + 1)//2, 1) AS hw,
       |    greatest((n_chars % 12 + 1)//2, 1) AS hh
       |  FROM documents),
       |gg AS (
       |  SELECT doc_id,
       |    list_transform(range(0, 63), i -> $gFull) AS gf,
       |    list_transform(range(0, 63), i -> $gHalf) AS gh
       |  FROM dd),
       |hh AS (
       |  SELECT doc_id, ${pack("gf")} AS dhash, ${pack("gh")} AS dhash_half
       |  FROM gg)""".stripMargin
  }

  /** q186's twin — [[graft.multimodal.Multimodal.imageDHash]]. */
  val imageDHash: String =
    s"""WITH $dhashBaseSql
       |SELECT doc_id AS media_id, dhash, dhash_half,
       |  CAST(bit_count(xor(dhash, dhash_half)) AS BIGINT)
       |    AS cross_scale_dist
       |FROM hh ORDER BY media_id""".stripMargin

  /** q187's twin — [[graft.multimodal.Multimodal.imagePdupGroups]]. */
  val imagePdupGroups: String =
    s"""WITH $dhashBaseSql
       |SELECT dhash, CAST(count(*) AS BIGINT) AS n_images,
       |  CAST(min(doc_id) AS BIGINT) AS canonical
       |FROM hh GROUP BY dhash HAVING count(*) > 1 ORDER BY dhash""".stripMargin

  /** q188's twin — [[graft.multimodal.Multimodal.imagePdupPairs]]: the
    * banded candidate generation (4×14-bit bands, df cap 16) and the
    * hamming ≤ 4 verify, replayed relationally. */
  val imagePdupPairs: String = {
    import graft.multimodal.Multimodal.{DHASH_BANDS, DHASH_BAND_BITS, DHASH_BAND_CAP, DHASH_T}
    s"""WITH $dhashBaseSql,
       |bands AS (
       |  SELECT doc_id, dhash, unnest(range(0, $DHASH_BANDS)) AS band
       |  FROM hh),
       |bv AS (
       |  SELECT doc_id, dhash, band,
       |    (dhash >> CAST(band * $DHASH_BAND_BITS AS INT))
       |      & ${(1L << DHASH_BAND_BITS) - 1} AS bval
       |  FROM bands),
       |ok AS (
       |  SELECT band, bval FROM bv GROUP BY band, bval
       |  HAVING count(*) BETWEEN 2 AND $DHASH_BAND_CAP),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    a.dhash AS ha, b.dhash AS hb
       |  FROM bv a JOIN ok USING (band, bval) JOIN bv b USING (band, bval)
       |  WHERE a.doc_id < b.doc_id)
       |SELECT id_a, id_b,
       |  CAST(bit_count(xor(ha, hb)) AS BIGINT) AS dist
       |FROM cand WHERE bit_count(xor(ha, hb)) <= $DHASH_T
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** q189's twin — [[graft.engine.SourceOps.urlCanonicalDedup]]: the
    * messy-URL construction AND the canonicalization replayed with
    * DuckDB's string machinery (RE2 vs Java regex — the patterns are
    * dialect-neutral), so scheme/host casing, default-port strip,
    * fragment drop, tracking-param filter, param sort, and
    * trailing-slash strip are each pinned by the hash. */
  val urlCanonicalDedup: String =
    s"""WITH r AS (
       |  SELECT doc_id, source,
       |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END)
       |    || (CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END)
       |    || '.Example.COM'
       |    || (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END)
       |    || '/docs/' || CAST(doc_id % 50 AS VARCHAR)
       |    || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
       |    || (CASE WHEN doc_id % 7 = 0 THEN ''
       |         WHEN doc_id % 2 = 0 THEN
       |           '?utm_source=rss&ref=' || CAST(doc_id % 3 AS VARCHAR)
       |             || '&b=2&a=1'
       |         ELSE '?a=1&b=2' END)
       |    || (CASE WHEN doc_id % 6 = 0
       |         THEN '#sec-' || CAST(doc_id AS VARCHAR) ELSE '' END)
       |      AS raw_url
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, raw_url,
       |    regexp_replace(raw_url, '#.*$$', '') AS nofrag
       |  FROM r),
       |c AS (
       |  SELECT doc_id, raw_url,
       |    lower(regexp_extract(nofrag,
       |      '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch,
       |    lower(regexp_extract(regexp_replace(nofrag, '\\?.*$$', ''),
       |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/]*)', 1)) AS hostport,
       |    regexp_replace(regexp_extract(
       |      regexp_replace(nofrag, '\\?.*$$', ''),
       |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(/.*)$$', 1),
       |      '/+$$', '') AS path,
       |    list_sort(list_filter(
       |      string_split(regexp_extract(nofrag, '\\?(.*)$$', 1), '&'),
       |      pp -> pp <> '' AND NOT
       |        regexp_matches(pp, '^(utm_[^=]*|ref)(=|$$)'))) AS params
       |  FROM p),
       |u AS (
       |  SELECT doc_id, raw_url,
       |    sch || '://'
       |    || (CASE WHEN sch = 'https'
       |        THEN regexp_replace(hostport, ':443$$', '')
       |        ELSE hostport END)
       |    || path
       |    || (CASE WHEN len(params) > 0
       |        THEN '?' || array_to_string(params, '&') ELSE '' END)
       |      AS url
       |  FROM c)
       |SELECT url, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(count(DISTINCT raw_url) AS BIGINT) AS n_forms,
       |  CAST(min(doc_id) AS BIGINT) AS first_doc
       |FROM u GROUP BY url ORDER BY url""".stripMargin

  /** q191's twin — [[graft.engine.SourceOps.domainGate]]: the host
    * derivation, registrable-domain extraction (last two labels), hashed
    * blocklist membership, and the exact-integer quality predicate
    * replayed relationally; kept_docs restates the anti-join path as the
    * equivalent CASE. */
  val domainGate: String =
    s"""WITH d AS (
       |  SELECT doc_id, n_chars,
       |    (CASE WHEN doc_id % 4 = 0 THEN 'www.'
       |          WHEN doc_id % 4 = 1 THEN 'cdn.' ELSE '' END)
       |    || source || '-' || CAST(doc_id % 23 AS VARCHAR) || '.'
       |    || (['com','net','org'])[CAST((doc_id % 23) % 3 + 1 AS INT)]
       |      AS host
       |  FROM documents),
       |d2 AS (
       |  SELECT doc_id, n_chars, host,
       |    array_to_string(list_slice(string_split(host, '.'), -2, -1), '.')
       |      AS domain
       |  FROM d),
       |s AS (
       |  SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
       |    CAST(sum(n_chars) AS BIGINT) AS total_chars
       |  FROM d2 GROUP BY domain),
       |f AS (
       |  SELECT domain, n_docs, n_hosts, total_chars,
       |    (${polyhash("domain")} % 7 = 0) AS blocked,
       |    (total_chars < n_docs *
       |      ${graft.engine.SourceOps.DOMAIN_MIN_AVG}) AS low_quality
       |  FROM s)
       |SELECT domain, n_docs, n_hosts, total_chars, blocked, low_quality,
       |  CAST(CASE WHEN blocked OR low_quality THEN 0 ELSE n_docs END
       |    AS BIGINT) AS kept_docs
       |FROM f ORDER BY domain""".stripMargin

  /** q192's twin — [[graft.engine.TextOps.qualityClassifier]]: the
    * hashing-trick bucket, the integer weight derivation, and the
    * token-array left fold restated with `list_reduce` (≡ Catalyst
    * `aggregate`), so the score is bit-identical integer arithmetic. */
  val qualityClassifier: String =
    s"""WITH t AS (
       |  SELECT source, string_split_regex(trim(text), '\\s+') AS w
       |  FROM documents),
       |s AS (
       |  SELECT source, CAST(len(w) AS BIGINT) AS n_toks,
       |    list_reduce(list_prepend(0::BIGINT, list_transform(w,
       |      qt -> ((((${polyhash("qt")}) % ${TextOps.QC_BUCKETS})
       |        * ${TextOps.QC_MULT} + ${TextOps.QC_BIAS}) % 2001) - 1000)),
       |      (qa, qx) -> qa + qx) AS score_milli
       |  FROM t)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN score_milli >= 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_accepted,
       |  CAST(sum(score_milli) AS BIGINT) AS sum_score_milli,
       |  CAST(sum(n_toks) AS BIGINT) AS total_tokens
       |FROM s GROUP BY source ORDER BY source""".stripMargin

  /** q193's twin — [[graft.engine.TextOps.lineDedup]]: chunk lines, the
    * df > cap boilerplate set (as a scalar list, ≡ the broadcast array),
    * and the in-place `list_filter` rebuild in original line order. */
  val lineDedup: String =
    s"""WITH w AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
       |  FROM documents),
       |base AS (
       |  SELECT doc_id, list_transform(
       |    range(0, (len(w)-1)//${TextOps.LINE_W} + 1),
       |    li -> array_to_string(list_slice(w,
       |      li*${TextOps.LINE_W}+1, li*${TextOps.LINE_W}+${TextOps.LINE_W}),
       |      ' ')) AS lines
       |  FROM w),
       |l AS (SELECT doc_id, unnest(lines) AS line FROM base),
       |hh AS (SELECT doc_id, ${polyhash("line")} AS h FROM l),
       |hv AS (
       |  SELECT coalesce(list_sort(list(h)), []::BIGINT[]) AS hvl
       |  FROM (SELECT h FROM hh GROUP BY h
       |        HAVING count(DISTINCT doc_id) > ${TextOps.LINE_DF_CAP})),
       |k AS (
       |  SELECT doc_id, lines,
       |    list_filter(lines,
       |      ln -> NOT list_contains(hvl, ${polyhash("ln")})) AS kept
       |  FROM base, hv)
       |SELECT doc_id,
       |  CAST(len(lines) AS BIGINT) AS n_lines,
       |  CAST(len(kept) AS BIGINT) AS n_kept,
       |  ${polyhash("array_to_string(kept, ' ')")} AS rebuilt_hash,
       |  CAST(list_reduce(list_prepend(0::BIGINT, list_transform(kept,
       |    kl -> CAST(len(string_split(kl, ' ')) AS BIGINT))),
       |    (ka, kx) -> ka + kx) AS BIGINT) AS kept_tokens
       |FROM k ORDER BY doc_id""".stripMargin

  /** q195's twin — [[graft.engine.TextOps.kmvDistinctShingles]]: the KMV
    * sketch is a deterministic function of the hash SET, so the oracle
    * rebuilds it as a plain bottom-k window over distinct shingle hashes,
    * merges the per-source bottom-k lists for the `__all__` row exactly
    * as the Spark side merges sketches, and replays the integer
    * estimator. */
  /** Shared CTE chain of the q195/q198 twins: per-source bottom-k of
    * distinct shingle hashes, the `__all__` merge, and the per-sketch
    * (sketch_n, mk) aggregate. */
  private def kmvBaseCte(k: Int): String =
    s"""toks AS (
       |  SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS w
       |  FROM documents),
       |sh AS (
       |  SELECT source, unnest(${shingleHashes("w")}) AS h FROM toks),
       |dist AS (SELECT DISTINCT source, h FROM sh),
       |rk AS (
       |  SELECT source, h,
       |    row_number() OVER (PARTITION BY source ORDER BY h) AS r
       |  FROM dist),
       |sk AS (SELECT source, h, r FROM rk WHERE r <= $k),
       |au AS (SELECT DISTINCT h FROM sk),
       |ark AS (SELECT h, row_number() OVER (ORDER BY h) AS r FROM au),
       |ask AS (
       |  SELECT '__all__' AS source, h, r FROM ark WHERE r <= $k),
       |u AS (SELECT * FROM sk UNION ALL SELECT * FROM ask),
       |agg AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS sketch_n,
       |    CAST(max(CASE WHEN r = $k THEN h END) AS BIGINT) AS mk
       |  FROM u GROUP BY source)""".stripMargin

  /** q206's twin — [[graft.engine.TextOps.kmvSourceOverlap]]: the KMV
    * pairwise estimator replayed set-theoretically — per-source bottom-k
    * (the kmvBaseCte ranks), per-pair merged bottom-k via a fresh
    * row_number over the union, and the in-both count joined back
    * against the two source sketches. */
  val kmvSourceOverlap: String = {
    val K = graft.engine.TextOps.KMV_K
    s"""WITH ${kmvBaseCte(K)},
       |prs AS (
       |  SELECT a.source AS source_a, b.source AS source_b
       |  FROM (SELECT DISTINCT source FROM sk) a,
       |       (SELECT DISTINCT source FROM sk) b
       |  WHERE a.source < b.source),
       |ph AS (
       |  SELECT p.source_a, p.source_b, s.h
       |  FROM prs p JOIN sk s ON s.source IN (p.source_a, p.source_b)
       |  GROUP BY 1, 2, 3),
       |mrg AS (
       |  SELECT source_a, source_b, h,
       |    row_number() OVER (PARTITION BY source_a, source_b ORDER BY h) AS r
       |  FROM ph),
       |mk2 AS (SELECT source_a, source_b, h FROM mrg WHERE r <= $K),
       |sz AS (
       |  SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_merged
       |  FROM mk2 GROUP BY 1, 2),
       |cmn AS (
       |  SELECT m.source_a, m.source_b, CAST(count(*) AS BIGINT) AS n_common
       |  FROM mk2 m
       |  JOIN sk x ON x.source = m.source_a AND x.h = m.h
       |  JOIN sk y ON y.source = m.source_b AND y.h = m.h
       |  GROUP BY 1, 2)
       |SELECT p.source_a, p.source_b,
       |  COALESCE(n_common, 0) AS n_common, n_merged,
       |  COALESCE(n_common, 0) * 1000000 // n_merged AS jaccard_ppm
       |FROM prs p
       |JOIN sz USING (source_a, source_b)
       |LEFT JOIN cmn USING (source_a, source_b)
       |WHERE n_merged > 0
       |ORDER BY source_a, source_b""".stripMargin
  }

  /** q219's twin — [[graft.engine.TextOps.quantileSketch]]: the
    * bottom-k-by-hash row sample replayed as a plain window (rank the
    * shared LCG hash, keep rk ≤ k), then the identical ceil(q·n/100)
    * order statistic in integer arithmetic. Merge-order independence is
    * the whole point: this twin never mentions partitions. */
  val quantileSketch: String = {
    import graft.engine.TextOps.{QSAMPLE_K, QSAMPLE_QS, QS_A, QS_B}
    val qvals = QSAMPLE_QS.map(q => s"($q)").mkString(", ")
    s"""WITH d AS (
       |  SELECT source, n_chars,
       |    (doc_id * $QS_A + $QS_B) % $P AS h
       |  FROM documents),
       |r AS (
       |  SELECT source, n_chars,
       |    row_number() OVER (PARTITION BY source ORDER BY h, n_chars) AS rk
       |  FROM d),
       |s AS (SELECT source, n_chars FROM r WHERE rk <= $QSAMPLE_K),
       |n AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_sample
       |  FROM s GROUP BY source),
       |v AS (
       |  SELECT source, n_chars,
       |    row_number() OVER (PARTITION BY source ORDER BY n_chars) AS vr
       |  FROM s),
       |qq AS (SELECT CAST(q AS BIGINT) AS q FROM (VALUES $qvals) t(q))
       |SELECT v.source, qq.q, n.n_sample, CAST(v.n_chars AS BIGINT) AS est
       |FROM v
       |JOIN n USING (source)
       |JOIN qq ON v.vr = (qq.q * n.n_sample + 99) // 100
       |ORDER BY source, q""".stripMargin
  }

  /** Shared CTE of the q220–q227 twins — the [[graft.engine.V2Demo]]
    * fixture mapping restated over the original parquet: every v2 column
    * is a pure projection of a testdata table, so the oracle recomputes
    * each reference KPI arithmetically while Spark must reach the same
    * rows through CSV → bronze → silver. */
  private def v2BaseCte: String =
    s"""v2b AS (
       |  SELECT o_orderkey AS booking_id, o_orderkey % 2000 AS service_id,
       |    o_custkey AS user_id, o_orderdate AS scheduled_date
       |  FROM orders),
       |v2s AS (
       |  SELECT p_partkey AS service_id, p_partkey % 100 AS provider_id,
       |    p_partkey % 10 AS category_id, p_name AS service_name
       |  FROM part),
       |v2c AS (
       |  SELECT n_nationkey AS category_id, n_name AS category_name
       |  FROM nation WHERE n_nationkey < 10),
       |v2p AS (
       |  SELECT s_suppkey AS provider_id, s_name AS business_name,
       |    'LOC-' || CAST(s_nationkey AS VARCHAR) AS location,
       |    (s_suppkey % 4 = 0) AS is_ai
       |  FROM supplier),
       |v2r AS (
       |  SELECT l_suppkey AS provider_id, (l_partkey % 5) + 1 AS rating
       |  FROM lineitem WHERE l_linenumber = 1),
       |v2pay AS (
       |  SELECT o_orderkey AS booking_id, o_totalprice AS amount,
       |    o_orderdate AS created_at
       |  FROM orders WHERE o_orderkey % 5 != 4),
       |v2d AS (
       |  SELECT o_orderkey AS dispute_id, o_orderkey AS booking_id
       |  FROM orders WHERE o_orderkey % 10 = 0)""".stripMargin

  /** q220's twin — admin KPI 1 (`/root/reference/sql/admin_kip_script:
    * 1–11`), week anchored to the corpus's latest scheduled day. */
  val v2ActiveCategories: String =
    s"""WITH $v2BaseCte
       |SELECT category_name, CAST(count(*) AS BIGINT) AS total_bookings
       |FROM v2b JOIN v2s USING (service_id) JOIN v2c USING (category_id)
       |WHERE scheduled_date >=
       |  (SELECT date_trunc('week', max(scheduled_date)) FROM v2b)
       |GROUP BY category_name
       |ORDER BY total_bookings DESC, category_name
       |LIMIT 5""".stripMargin

  /** q221's twin — admin KPI 2 (`admin_kip_script:13–23`). */
  val v2TopProviders: String =
    s"""WITH $v2BaseCte
       |SELECT CAST(provider_id AS BIGINT) AS provider_id, business_name,
       |  CAST(count(*) AS BIGINT) AS total_bookings
       |FROM v2b JOIN v2s USING (service_id) JOIN v2p USING (provider_id)
       |GROUP BY 1, 2
       |ORDER BY total_bookings DESC, provider_id
       |LIMIT 5""".stripMargin

  /** q222's twin — admin KPI 3 (`admin_kip_script:25–36`). */
  val v2DisputedProviders: String =
    s"""WITH $v2BaseCte
       |SELECT CAST(provider_id AS BIGINT) AS provider_id, business_name,
       |  CAST(count(*) AS BIGINT) AS dispute_count
       |FROM v2d JOIN v2b USING (booking_id) JOIN v2s USING (service_id)
       |  JOIN v2p USING (provider_id)
       |GROUP BY 1, 2
       |ORDER BY dispute_count DESC, provider_id
       |LIMIT 5""".stripMargin

  /** q223's twin — provider KPI 1 (`service_provider_kpis:1–10`). */
  val v2DemandByArea: String =
    s"""WITH $v2BaseCte
       |SELECT location, service_name,
       |  CAST(count(*) AS BIGINT) AS request_count
       |FROM v2b JOIN v2s USING (service_id) JOIN v2p USING (provider_id)
       |GROUP BY 1, 2
       |ORDER BY request_count DESC, location, service_name""".stripMargin

  /** q224's twin — provider KPI 2 (`service_provider_kpis:12–17`). */
  val v2AvgRating: String =
    s"""WITH $v2BaseCte
       |SELECT CAST(provider_id AS BIGINT) AS provider_id,
       |  avg(rating) AS avg_rating
       |FROM v2r GROUP BY provider_id ORDER BY provider_id""".stripMargin

  /** q225's twin — provider KPI 3 (`service_provider_kpis:19–27`),
    * money through exact integer cents. */
  val v2MonthlyRevenue: String =
    s"""WITH $v2BaseCte
       |SELECT date_trunc('month', pay.created_at) AS month,
       |  CAST(s.provider_id AS BIGINT) AS provider_id,
       |  CAST(sum(CAST(round(amount * 100) AS BIGINT)) AS BIGINT)
       |    / CAST(100 AS DOUBLE) AS revenue
       |FROM v2pay pay JOIN v2b USING (booking_id)
       |  JOIN v2s s USING (service_id)
       |GROUP BY 1, 2
       |ORDER BY month, provider_id""".stripMargin

  /** q226's twin — provider KPI 4 (`service_provider_kpis:29–36`),
    * 2-dp through the integer path (the round2 device). */
  val v2AiUsage: String =
    s"""WITH $v2BaseCte
       |SELECT CAST(round((100.0 *
       |    SUM(CASE WHEN is_ai THEN 1 ELSE 0 END) / COUNT(*)) * 100)
       |  AS BIGINT) / CAST(100 AS DOUBLE) AS ai_usage_percentage
       |FROM v2p""".stripMargin

  /** q227's twin — seeker KPI (`service_seeker_kpis:1–10`). */
  val v2TopRated: String =
    s"""WITH $v2BaseCte
       |SELECT business_name, location, avg(rating) AS avg_rating
       |FROM v2p JOIN v2r USING (provider_id)
       |GROUP BY 1, 2
       |ORDER BY avg_rating DESC, business_name
       |LIMIT 5""".stripMargin

  val kmvDistinctShingles: String = {
    val K = graft.engine.TextOps.KMV_K
    s"""WITH ${kmvBaseCte(K)},
       |ex AS (
       |  SELECT source, CAST(count(DISTINCT h) AS BIGINT) AS n_exact
       |  FROM sh GROUP BY source
       |  UNION ALL
       |  SELECT '__all__', CAST(count(DISTINCT h) AS BIGINT) FROM sh)
       |SELECT a.source, n_exact, sketch_n, mk,
       |  CASE WHEN sketch_n < $K THEN sketch_n
       |       ELSE CAST(${K - 1} AS BIGINT) * $P // mk END AS est_distinct
       |FROM agg a JOIN ex USING (source)
       |ORDER BY source""".stripMargin
  }

  /** q198's twin — [[graft.engine.TextOps.kmvLifecycle]]: the oracle is
    * the FULL-CORPUS bottom-k of q195 and never mentions increments —
    * the served store result must equal it (the mergeability theorem
    * across the build/append lifecycle). */
  val kmvLifecycle: String = {
    val K = graft.engine.TextOps.KMV_K
    s"""WITH ${kmvBaseCte(K)}
       |SELECT source, sketch_n, mk,
       |  CASE WHEN sketch_n < $K THEN sketch_n
       |       ELSE CAST(${K - 1} AS BIGINT) * $P // mk END AS est_distinct
       |FROM agg
       |ORDER BY source""".stripMargin
  }

  /** q194's twin — [[graft.multimodal.Multimodal.audioPdupPairs]]: the
    * long-waveform corpus with its re-encode and retouched variants, the
    * 56 energy-delta sign bits, and the banding/cap/threshold replayed
    * arithmetically; the Spark side reaches every fingerprint only
    * through the real RIFF/WAVE round trip. */
  val audioPdupPairs: String = {
    import graft.multimodal.Multimodal.{AFP_BANDS, AFP_BAND_BITS,
      AFP_BAND_CAP, AFP_BITS, AFP_T, AUDIO_FRAME_N}
    val F = AUDIO_FRAME_N
    s"""WITH d AS (
       |  SELECT doc_id, (n_chars % 256 + 928) AS n FROM documents),
       |m AS (
       |  SELECT doc_id*4 AS media_id, doc_id, n, 0 AS pert FROM d
       |  UNION ALL
       |  SELECT doc_id*4+1, doc_id, n, 0 FROM d WHERE doc_id % 4 = 0
       |  UNION ALL
       |  SELECT doc_id*4+2, doc_id, n, 64 FROM d WHERE doc_id % 3 = 0),
       |sg AS (
       |  SELECT media_id,
       |    list_transform(range(0, n), si ->
       |      (doc_id*31 + si*17 + ((si*si) % 4096)*13) % 4096 - 2048
       |      + CASE WHEN si >= $F AND si < ${2 * F} THEN pert
       |             ELSE 0 END) AS v
       |  FROM m),
       |fe AS (
       |  SELECT media_id,
       |    list_transform(range(0, ${AFP_BITS + 1}), fj ->
       |      list_aggregate(list_transform(range(0, $F),
       |        k -> v[CAST(fj*$F+k+1 AS INT)]*v[CAST(fj*$F+k+1 AS INT)]),
       |        'sum')) AS e
       |  FROM sg),
       |fp AS (
       |  SELECT media_id,
       |    CAST(list_aggregate(list_transform(range(0, $AFP_BITS), bj ->
       |      CASE WHEN e[CAST(bj+2 AS INT)] > e[CAST(bj+1 AS INT)]
       |      THEN (CAST(1 AS BIGINT) << CAST(bj AS INT)) ELSE 0 END),
       |      'sum') AS BIGINT) AS fp
       |  FROM fe),
       |bands AS (
       |  SELECT media_id, fp, unnest(range(0, $AFP_BANDS)) AS band
       |  FROM fp),
       |bv AS (
       |  SELECT media_id, fp, band,
       |    (fp >> CAST(band * $AFP_BAND_BITS AS INT))
       |      & ${(1L << AFP_BAND_BITS) - 1} AS bval
       |  FROM bands),
       |ok AS (
       |  SELECT band, bval FROM bv GROUP BY band, bval
       |  HAVING count(*) BETWEEN 2 AND $AFP_BAND_CAP),
       |cand AS (
       |  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
       |    a.fp AS ha, b.fp AS hb
       |  FROM bv a JOIN ok USING (band, bval) JOIN bv b USING (band, bval)
       |  WHERE a.media_id < b.media_id)
       |SELECT id_a, id_b,
       |  CAST(bit_count(xor(ha, hb)) AS BIGINT) AS dist
       |FROM cand WHERE bit_count(xor(ha, hb)) <= $AFP_T
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** q190's twin — [[graft.multimodal.Multimodal.audioFrameStats]]: the
    * frame slicing, per-frame integer features, and the below-file-mean
    * flag (`energy·n_frames < Σ energies`, an exact integer compare)
    * replayed over the regenerated waveform. */
  val audioFrameStats: String = {
    import graft.multimodal.Multimodal.AUDIO_FRAME_N
    val F = AUDIO_FRAME_N
    s"""WITH $wavBaseSql,
       |fr AS (
       |  SELECT doc_id, v, unnest(range(0, n // $F)) AS fj FROM sg),
       |fe AS (
       |  SELECT doc_id, fj,
       |    CAST(list_aggregate(list_transform(range(0, $F),
       |      k -> v[fj*$F+k+1] * v[fj*$F+k+1]), 'sum') AS BIGINT) AS energy,
       |    CAST(COALESCE(list_aggregate(list_transform(range(1, $F),
       |      k -> CASE WHEN (v[fj*$F+k] < 0) <> (v[fj*$F+k+1] < 0)
       |           THEN 1 ELSE 0 END), 'sum'), 0) AS BIGINT)
       |      AS zero_crossings
       |  FROM fr)
       |SELECT doc_id AS media_id, CAST(fj AS BIGINT) AS frame_no,
       |  energy, zero_crossings,
       |  (energy * (count(*) OVER (PARTITION BY doc_id))
       |    < sum(energy) OVER (PARTITION BY doc_id)) AS is_low
       |FROM fe ORDER BY media_id, frame_no""".stripMargin
  }

  /** q182's twin — [[graft.engine.Dedup.hashIndexProbe]]: the admission
    * verdicts recomputed relationally from the corpus + the same
    * generative plants; the Spark side reaches them only through the
    * persisted build/append/probe store lifecycle. */
  val hashIndexProbe: String = {
    import graft.engine.Dedup.{HX_BATCH_DUP_MOD, HX_CORPUS_DUP_MOD,
      HX_FRESH_RESIDUE}
    def h(t: String) =
      s"sha256(regexp_replace(lower(trim($t)), '\\s+', ' ', 'g'))"
    s"""WITH delta AS (
       |  SELECT doc_id + 80000000 AS doc_id, text FROM documents
       |  WHERE doc_id % $HX_CORPUS_DUP_MOD = 0
       |  UNION ALL
       |  SELECT doc_id + 81000000, text || ' zfresh' || doc_id::VARCHAR
       |  FROM documents WHERE doc_id % $HX_CORPUS_DUP_MOD = $HX_FRESH_RESIDUE
       |  UNION ALL
       |  SELECT doc_id + 82000000, text || ' zb' || doc_id::VARCHAR
       |  FROM documents WHERE doc_id % $HX_BATCH_DUP_MOD = 1
       |  UNION ALL
       |  SELECT doc_id + 83000000, text || ' zb' || doc_id::VARCHAR
       |  FROM documents WHERE doc_id % $HX_BATCH_DUP_MOD = 1),
       |dh AS (SELECT doc_id, ${h("text")} AS content_hash FROM delta),
       |ch AS (SELECT doc_id, ${h("text")} AS content_hash FROM documents),
       |seen AS (
       |  SELECT content_hash, min(doc_id) AS corpus_canonical FROM ch
       |  WHERE content_hash IN (SELECT content_hash FROM dh)
       |  GROUP BY content_hash),
       |rb AS (
       |  SELECT doc_id, content_hash,
       |    row_number() OVER (PARTITION BY content_hash ORDER BY doc_id)
       |      AS rb,
       |    min(doc_id) OVER (PARTITION BY content_hash) AS bmin
       |  FROM dh)
       |SELECT doc_id, content_hash,
       |  CASE WHEN corpus_canonical IS NOT NULL THEN 'dup_of_corpus'
       |       WHEN rb > 1 THEN 'dup_in_batch' ELSE 'fresh' END AS verdict,
       |  COALESCE(corpus_canonical, bmin) AS canonical_doc_id
       |FROM rb LEFT JOIN seen USING (content_hash)
       |ORDER BY doc_id""".stripMargin
  }

  /** q181's twin — [[graft.engine.SourceOps.availabilityJson]]: the
    * schedule statistics computed straight from the generative arithmetic
    * (day d open iff (pid+d)%3≠0, hours (pid+d)%8+1); the Spark side only
    * reaches them through the constructed-then-parsed JSON document. */
  val availabilityJson: String = {
    import graft.engine.SourceOps.AVAIL_DAYS
    val nDays = AVAIL_DAYS.indices.map(d =>
      s"(CASE WHEN (pid + $d) % 3 <> 0 THEN 1 ELSE 0 END)").mkString(" + ")
    val hours = AVAIL_DAYS.indices.map(d =>
      s"(CASE WHEN (pid + $d) % 3 <> 0 THEN (pid + $d) % 8 + 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH p AS (SELECT CAST(s_suppkey AS BIGINT) AS pid FROM supplier)
       |SELECT pid AS provider_id,
       |  CAST($nDays AS BIGINT) AS n_days_open,
       |  CAST($hours AS BIGINT) AS weekly_hours,
       |  ((pid + 5) % 3 <> 0 OR (pid + 6) % 3 <> 0) AS weekend_open
       |FROM p ORDER BY provider_id""".stripMargin
  }

  /** q180's twin — BATCH semantics of the streaming curated lineage
    * ([[graft.streaming.DocsStream.streamCuratedProbe]]): every distinct
    * document exactly once with its content hash, folded to batch 0. The
    * Spark side reaches this only through the live stream (micro-batch
    * dedup → foreachBatch landing → compaction), so the hash gate covers
    * the whole streaming write path. */
  val streamCurated: String =
    """SELECT doc_id, lang, source,
      |  sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
      |    AS content_hash,
      |  CAST(0 AS BIGINT) AS batch
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q177's twin — [[graft.engine.TextOps.dsirWeights]]: hashed-bigram
    * histogram, the smoothed target/raw ratio fixed-pointed ONCE per
    * feature in the identical op order (two divisions, the ppm floor),
    * then pure integer doc sums. */
  val dsirWeights: String = {
    import graft.engine.TextOps.DSIR_NB
    val ratio =
      s"((cnt_t + 1)::DOUBLE / (tot_t + $DSIR_NB)::DOUBLE) / " +
        s"((cnt_r + 1)::DOUBLE / (tot_r + $DSIR_NB)::DOUBLE)"
    s"""WITH t AS (
       |  SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS ws
       |  FROM documents),
       |bg AS (
       |  SELECT doc_id, lang,
       |    unnest(list_transform(range(1, len(ws)),
       |      bgi -> ws[bgi] || ' ' || ws[bgi + 1])) AS bg
       |  FROM t),
       |feats AS (
       |  SELECT doc_id, lang, ${polyhash("bg")} % $DSIR_NB AS f FROM bg),
       |hist AS (
       |  SELECT f, CAST(count(*) AS BIGINT) AS cnt_r,
       |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS cnt_t
       |  FROM feats GROUP BY f),
       |tots AS (SELECT CAST(sum(cnt_r) AS BIGINT) AS tot_r,
       |  CAST(sum(cnt_t) AS BIGINT) AS tot_t FROM hist),
       |scored AS (
       |  SELECT f, ${ppm(ratio)} AS score_ppm
       |  FROM hist, tots),
       |docs AS (
       |  SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_feats,
       |    CAST(sum(score_ppm) AS BIGINT) AS w_ppm
       |  FROM feats JOIN scored USING (f)
       |  GROUP BY doc_id, lang)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN w_ppm > n_feats * 1000000 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_selected,
       |  CAST(sum(w_ppm) AS BIGINT) AS sum_w_ppm,
       |  CAST(sum(w_ppm) // sum(n_feats) AS BIGINT) AS avg_ratio_ppm
       |FROM docs GROUP BY lang ORDER BY lang""".stripMargin
  }
}
