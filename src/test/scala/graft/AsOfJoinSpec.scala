package graft

import org.apache.spark.sql.functions._

import graft.engine.Kpis
import graft.plans.AsOf

/** The native sorted-merge as-of operator, proven three ways: micro
  * semantics on hand-built frames (matches, ties, no-match), row-for-row
  * equality with the window-form q41 on real data, and plan shape (the
  * physical operator appears; no Window, no expanded join). */
class AsOfJoinSpec extends SparkSpecBase {

  test("micro semantics: backward match, tie on time, no-match nulls") {
    import spark.implicits._
    val l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"), (3L, 7L, "d"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 10L, 1L, "r11"), (1L, 10L, 2L, "r12"),
      (1L, 15L, 3L, "r15"), (2L, 99L, 4L, "r99"))
      .toDF("rk", "rt", "tie", "payload")
    val got = AsOf.join(l, r, "k", "rk", "t", "rt", "tie")
      .select(col("tag"), col("payload")).collect()
      .map(x => x.getString(0) -> x.getString(1)).toMap
    // equal times: the larger tie wins (q41's orderkey DESC semantics)
    assert(got("a") == "r12")
    // strictly-before: latest time <= t
    assert(got("b") == "r15")
    // right rows all later -> no match
    assert(got("c") == null)
    // key absent on the right -> no match
    assert(got("d") == null)
  }

  test("native as-of equals the window form row for row") {
    val native = Kpis.eventOrderAsofNative(spark, sf).collect()
    val window = Kpis.eventOrderAsof(spark, sf).collect()
    assert(native.length == window.length && native.nonEmpty)
    native.zip(window).foreach { case (a, b) => assert(a == b) }
  }

  test("plan contains AsOfJoinExec and neither Window nor expanded join") {
    // all three directions plan through the native operator
    for (df <- Seq(Kpis.eventOrderAsofNative(spark, sf),
        Kpis.eventOrderAsofForward(spark, sf),
        Kpis.eventOrderAsofNearest(spark, sf))) {
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("AsOfJoin"), "native operator must be planned")
      assert(!plan.contains("Window"),
        "the native form must not fall back to the expand+rank plan")
      assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
        "the as-of pairing happens inside the operator, not a pre-join")
    }
  }

  test("forward direction: min (time, tie) at-or-after, empty-match nulls") {
    import spark.implicits._
    val l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"), (3L, 7L, "d"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 10L, 1L, "r11"), (1L, 10L, 2L, "r12"),
      (1L, 15L, 3L, "r15"), (2L, 99L, 4L, "r99"))
      .toDF("rk", "rt", "tie", "payload")
    val got = AsOf.join(l, r, "k", "rk", "t", "rt", "tie",
        direction = "forward")
      .select(col("tag"), col("payload")).collect()
      .map(x => x.getString(0) -> x.getString(1)).toMap
    // boundary tie rt == t IS a forward match, and among equal times the
    // SMALLER tie wins (mirror image of backward's larger-tie-wins)
    assert(got("a") == "r11")
    // nothing at-or-after t=20 -> null
    assert(got("b") == null)
    assert(got("c") == "r99")
    assert(got("d") == null)
  }

  test("tolerance bounds both directions; nearest prefers backward on ties") {
    import spark.implicits._
    val l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"), (4L, 12L, "e"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 10L, 1L, "r11"), (1L, 10L, 2L, "r12"),
      (1L, 15L, 3L, "r15"), (2L, 99L, 4L, "r99"),
      (4L, 10L, 1L, "rA"), (4L, 14L, 2L, "rB"))
      .toDF("rk", "rt", "tie", "payload")
    def run(dir: String, tol: Option[Long]): Map[String, String] =
      AsOf.join(l, r, "k", "rk", "t", "rt", "tie",
          direction = dir, tolerance = tol)
        .select(col("tag"), col("payload")).collect()
        .map(x => x.getString(0) -> x.getString(1)).toMap
    // forward with tolerance 5: c's only candidate is 94 away -> null
    val fwd = run("forward", Some(5L))
    assert(fwd("a") == "r11" && fwd("c") == null)
    // nearest, unbounded: equal-time beats later (a), only-backward (b),
    // only-forward (c), and an exact distance tie (e: 10 vs 14 from 12)
    // resolves backward
    val near = run("nearest", None)
    assert(near("a") == "r12") // dist 0 backward beats dist 5 forward
    assert(near("b") == "r15") // backward only
    assert(near("c") == "r99") // forward only
    assert(near("e") == "rA")  // tie: backward preferred
    // nearest with tolerance 5 drops c's distant forward match, keeps b
    val nearTol = run("nearest", Some(5L))
    assert(nearTol("b") == "r15" && nearTol("c") == null)
    // backward with tolerance: b's candidate r15 is 5 back (kept at 5,
    // dropped at 4)
    assert(run("backward", Some(5L))("b") == "r15")
    assert(run("backward", Some(4L))("b") == null)
  }

  test("mixed time units are rejected at plan-build time") {
    import spark.implicits._
    val l = Seq((1L, "2024-01-02 03:04:05", "a")).toDF("k", "ts", "tag")
      .withColumn("ts", col("ts").cast("timestamp"))
    val r = Seq((1L, "2024-01-01", 1L)).toDF("rk", "d", "tie")
      .withColumn("d", col("d").cast("date"))
    val e = intercept[IllegalArgumentException] {
      AsOf.join(l, r, "k", "rk", "ts", "d", "tie")
    }
    assert(e.getMessage.contains("share a unit"))
    // same family (timestamp vs timestamp) is fine
    val r2 = r.withColumn("d", col("d").cast("timestamp"))
    assert(AsOf.join(l, r2, "k", "rk", "ts", "d", "tie").count() == 1)
  }

  test("forward/nearest with tolerance equal their window-form twins") {
    import org.apache.spark.sql.expressions.Window
    val ev = graft.engine.Tables.events(spark, sf)
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts")).alias("c")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"),
        col("user_id").as("p_user_id"), col("ts").as("p_ts")).alias("p")
    val tolUs = Kpis.ASOF_TOLERANCE_US
    val diff = unix_micros(col("p.p_ts")) - unix_micros(col("c.ts"))
    val wf = Window.partitionBy(col("c.event_id"))
      .orderBy(col("p.p_ts").asc_nulls_last,
        col("p.p_event_id").asc_nulls_last)
    val windowFwd = c.join(p,
        col("c.user_id") === col("p.p_user_id") &&
          col("p.p_ts") >= col("c.ts") && diff <= tolUs, "left")
      .withColumn("rn", row_number().over(wf))
      .filter(col("rn") === 1)
      .select(col("c.event_id"), col("c.user_id"),
        col("p.p_event_id").as("purchase_id"),
        date_format(col("p.p_ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"))
      .orderBy("event_id").collect()
    val nativeFwd = Kpis.eventOrderAsofForward(spark, sf).collect()
    assert(nativeFwd.length == windowFwd.length && nativeFwd.nonEmpty)
    assert(nativeFwd.exists(_.get(2) != null),
      "the 24h forward tolerance must leave some matches at sf0.001")
    assert(nativeFwd.exists(_.get(2) == null),
      "the 24h forward tolerance must drop some matches at sf0.001")
    nativeFwd.zip(windowFwd).foreach { case (a, b) => assert(a == b) }

    val wn = Window.partitionBy(col("c.event_id"))
      .orderBy(abs(diff).asc_nulls_last,
        (col("p.p_ts") > col("c.ts")).asc_nulls_last,
        when(col("p.p_ts") > col("c.ts"), col("p.p_event_id"))
          .otherwise(-col("p.p_event_id")).asc_nulls_last)
    val windowNear = c.join(p,
        col("c.user_id") === col("p.p_user_id") && abs(diff) <= tolUs, "left")
      .withColumn("rn", row_number().over(wn))
      .filter(col("rn") === 1)
      .select(col("c.event_id"), col("c.user_id"),
        col("p.p_event_id").as("purchase_id"),
        date_format(col("p.p_ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"))
      .orderBy("event_id").collect()
    val nativeNear = Kpis.eventOrderAsofNearest(spark, sf).collect()
    assert(nativeNear.length == windowNear.length)
    nativeNear.zip(windowNear).foreach { case (a, b) => assert(a == b) }
  }

  test("broadcast strategy: micro semantics match the sweep in all directions") {
    import spark.implicits._
    val l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"), (3L, 7L, "d"),
      (4L, 12L, "e")).toDF("k", "t", "tag")
    val r = Seq((1L, 10L, 1L, "r11"), (1L, 10L, 2L, "r12"),
      (1L, 15L, 3L, "r15"), (2L, 99L, 4L, "r99"),
      (4L, 10L, 1L, "rA"), (4L, 14L, 2L, "rB"))
      .toDF("rk", "rt", "tie", "payload")
    def run(dir: String, tol: Option[Long], bcast: Boolean) =
      AsOf.join(l, r, "k", "rk", "t", "rt", "tie",
          direction = dir, tolerance = tol, broadcastRight = bcast)
        .select(col("tag"), col("payload")).collect()
        .map(x => x.getString(0) -> x.getString(1)).toMap
    for (dir <- Seq("backward", "forward", "nearest");
         tol <- Seq(None, Some(5L), Some(0L))) {
      val sweep = run(dir, tol, bcast = false)
      val bcast = run(dir, tol, bcast = true)
      assert(bcast == sweep, s"direction=$dir tolerance=$tol: " +
        s"broadcast $bcast != sweep $sweep")
    }
  }

  test("broadcast strategy equals the merge operator on real data") {
    val merge = Kpis.eventOrderAsofNative(spark, sf).collect()
    val bcast = Kpis.eventOrderAsofBroadcast(spark, sf).collect()
    assert(bcast.length == merge.length && bcast.nonEmpty)
    bcast.zip(merge).foreach { case (a, b) => assert(a == b) }
  }

  test("broadcast plan: BroadcastExchange, zero probe-side shuffle or sort") {
    val df = Kpis.eventOrderAsofBroadcast(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastAsOfJoin"),
      "the broadcast strategy must plan the dedicated exec")
    assert(plan.contains("BroadcastExchange"),
      "the right side must broadcast")
    // the probe side must reach the operator unshuffled and unsorted;
    // the only exchange below the join is the broadcast one (the final
    // ORDER BY above the join is the query's own presentation sort)
    val joinSubtree = plan.substring(plan.indexOf("BroadcastAsOfJoin"))
    assert(!joinSubtree.contains("Exchange hashpartitioning"),
      s"no hash exchange may appear below the broadcast as-of:\n$joinSubtree")
  }

  test("multi-key: both key columns must match, sweep and broadcast agree") {
    import spark.implicits._
    // (k1, k2) composite: same k1 with different k2 must NOT match
    val l = Seq((1L, 1L, 10L, "a"), (1L, 2L, 10L, "b"), (2L, 1L, 9L, "c"))
      .toDF("k1", "k2", "t", "tag")
    val r = Seq((1L, 1L, 5L, 1L, "x11"), (1L, 1L, 9L, 2L, "x19"),
      (1L, 2L, 7L, 3L, "x27"), (2L, 2L, 1L, 4L, "y"))
      .toDF("rk1", "rk2", "rt", "tie", "payload")
    def run(bcast: Boolean): Map[String, String] =
      AsOf.joinMulti(l, r, Seq("k1" -> "rk1", "k2" -> "rk2"),
          "t", "rt", "tie", broadcastRight = bcast)
        .select(col("tag"), col("payload")).collect()
        .map(x => x.getString(0) -> x.getString(1)).toMap
    val sweep = run(bcast = false)
    // latest (1,1) row at-or-before 10 is x19; (1,2) only sees x27;
    // (2,1) matches nothing — (2,2) and (1,*) must not leak in
    assert(sweep == Map("a" -> "x19", "b" -> "x27", "c" -> null))
    assert(run(bcast = true) == sweep)
  }

  test("multi-key q127 equals its window twin and plans the native exec") {
    val native = Kpis.lineitemRateAsof(spark, sf)
    val got = native.collect()
    val l = graft.engine.Tables.lineitem(spark, sf).select(
      col("l_suppkey"), col("l_returnflag"), col("l_shipdate"))
    val r = graft.engine.Tables.supplier(spark, sf).select(col("s_suppkey"))
      .crossJoin(spark.range(1, 4).select(col("id").as("rfc")))
      .select(col("s_suppkey"),
        expr("CASE rfc WHEN 1 THEN 'A' WHEN 2 THEN 'N' ELSE 'R' END")
          .as("rf"),
        expr("timestamp'1995-01-01' + make_interval(0, 0, 0, " +
          "cast((s_suppkey * 7 + rfc * 11) % 1000 AS int), 0, 0, 0)")
          .as("rate_from"),
        (col("s_suppkey") * 10 + col("rfc")).as("rate_id"))
    // exactly one epoch per (supplier, flag) key pair, so the backward
    // winner is that row iff its epoch has started — no rank needed
    // (lineitem's (orderkey, linenumber) is NOT unique in the synthetic
    // data, so a per-probe-row window would silently collapse rows)
    val twin = l.join(r,
        col("l_suppkey") === col("s_suppkey") &&
          col("l_returnflag") === col("rf") &&
          col("rate_from") <= col("l_shipdate"), "left")
      .groupBy(col("l_suppkey"), col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        count(col("rate_id")).as("n_matched"),
        sum(col("rate_id")).as("sum_rate_ids"))
      .orderBy("l_suppkey", "l_returnflag").collect()
    assert(got.length == twin.length && got.nonEmpty)
    got.zip(twin).foreach { case (a, b) => assert(a == b) }
    // some probes precede their epoch and some follow it — both paths real
    assert(got.exists(r0 => r0.getLong(2) != r0.getLong(3)))
    assert(got.exists(r0 => r0.getLong(3) > 0))
    native.collect()
    assert(native.queryExecution.executedPlan.toString.contains("AsOfJoin"))
  }

  test("string keys: native symbol-style aj, sweep and broadcast agree") {
    import spark.implicits._
    // kdb-aj shape: symbol key, no dictionary encoding on the caller side
    val l = Seq(("ibm", 10L, "a"), ("ibm", 20L, "b"), ("msft", 5L, "c"),
      ("aapl", 7L, "d"), (null.asInstanceOf[String], 9L, "e"))
      .toDF("sym", "t", "tag")
    val r = Seq(("ibm", 10L, 1L, "i10"), ("ibm", 10L, 2L, "i10b"),
      ("ibm", 15L, 3L, "i15"), ("msft", 99L, 4L, "m99"),
      (null.asInstanceOf[String], 1L, 5L, "nul"))
      .toDF("rsym", "rt", "tie", "payload")
    def run(dir: String, bcast: Boolean): Map[String, String] =
      AsOf.join(l, r, "sym", "rsym", "t", "rt", "tie",
          direction = dir, broadcastRight = bcast)
        .select(col("tag"), col("payload")).collect()
        .map(x => x.getString(0) -> x.getString(1)).toMap
    for (dir <- Seq("backward", "forward", "nearest")) {
      val sweep = run(dir, bcast = false)
      assert(run(dir, bcast = true) == sweep,
        s"direction=$dir: broadcast != sweep")
    }
    val bw = run("backward", bcast = false)
    // equal times: larger tie wins; missing key and NULL keys never match
    assert(bw == Map("a" -> "i10b", "b" -> "i15", "c" -> null, "d" -> null,
      "e" -> null))
    // string key against integral key is rejected at plan-build time
    val e = intercept[IllegalArgumentException] {
      AsOf.join(l, r.withColumn("rsym", lit(1L)), "sym", "rsym", "t", "rt",
        "tie")
    }
    assert(e.getMessage.contains("share a unit"))
  }

  test("broadcast exec reports index metrics and enforces the size guard") {
    import spark.implicits._
    val l = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "t")
    val r = Seq((1L, 5L, 1L), (1L, 15L, 2L), (2L, 1L, 3L))
      .toDF("rk", "rt", "tie")
    val df = AsOf.join(l, r, "k", "rk", "t", "rt", "tie",
      broadcastRight = true)
    df.collect()
    def descend(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case other => other.children
      }
      p +: kids.flatMap(descend)
    }
    val exec = descend(df.queryExecution.executedPlan).collectFirst {
      case b: graft.plans.BroadcastAsOfJoinExec => b
    }.getOrElse(fail("BroadcastAsOfJoinExec not planned"))
    assert(exec.metrics("indexRows").value == 3,
      s"index must report its rows, got ${exec.metrics("indexRows").value}")
    assert(exec.metrics("numOutputRows").value == 3)
    // the guard: right side over graft.asof.broadcastMaxRows fails loudly
    // with a pointer at the merge strategy instead of building the index
    val key = graft.plans.AsOf.BROADCAST_MAX_ROWS_KEY
    spark.conf.set(key, "2")
    try {
      val err = intercept[org.apache.spark.SparkException] {
        AsOf.join(l, r, "k", "rk", "t", "rt", "tie",
          broadcastRight = true).collect()
      }
      assert(err.getMessage.contains("bounded reference table") ||
        Option(err.getCause).exists(
          _.getMessage.contains("bounded reference table")))
    } finally spark.conf.unset(key)
  }

  test("explode_pairs generator matches the lambda fan-out and plans Generate") {
    import spark.implicits._
    // micro: ordered pairs, empty and single arrays fan out to nothing
    val micro = Seq(Seq(3L, 1L, 2L), Seq(7L), Seq.empty[Long]).toDF("xs")
      .selectExpr("explode_pairs(xs) AS (s1, s2)").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(micro == Set((3L, 1L), (3L, 2L), (1L, 2L)))
    // the generator query equals its relational oracle shape: the edge
    // aggregate from the lambda-based coSupplyEdges, cut the same way
    val fromGen = graft.engine.Graph.coSupplyTopEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val fromLambda = graft.engine.Graph.coSupplyEdges(spark, sf)
      .orderBy(col("w").desc, col("s1"), col("s2"))
      .limit(graft.engine.Graph.COSUPPLY_TOP).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(fromGen.sameElements(fromLambda))
    val df = graft.engine.Graph.coSupplyTopEdges(spark, sf)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("Generate"),
      "the UDTF must plan through GenerateExec")
  }
}
