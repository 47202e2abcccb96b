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
    val df = Kpis.eventOrderAsofNative(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), "native operator must be planned")
    assert(!plan.contains("Window"),
      "the native form must not fall back to the expand+rank plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "the as-of pairing happens inside the operator, not a pre-join")
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
