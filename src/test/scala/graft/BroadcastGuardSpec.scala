package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** The optimizer guard-rail ([[graft.plans.BroadcastGuard]], injected via
  * GraftExtensions): a broadcast() hint on a plan whose size estimate
  * exceeds `spark.graft.broadcastGuard.maxBytes` is stripped; hints on
  * genuinely bounded sides survive.
  */
class BroadcastGuardSpec extends SparkSpecBase {

  private val KEY = "spark.graft.broadcastGuard.maxBytes"

  private def hasBroadcastExchange(df: org.apache.spark.sql.DataFrame): Boolean = {
    df.collect() // execute so AQE finalizes the physical plan
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case b: BroadcastExchangeLike => b }.nonEmpty ||
      plan.toString.contains("BroadcastExchange")
  }

  test("oversized broadcast hint is stripped; join still answers correctly") {
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf)
    val joined = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    val expected = o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    try {
      // Ceiling below any table size: every broadcast hint is oversized.
      // Also zero the auto thresholds — the test tables are tiny, and
      // without this the planner re-broadcasts on size alone, hiding
      // whether the *hint* was stripped.
      spark.conf.set(KEY, "1")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      assert(!hasBroadcastExchange(joined), "hint should have been stripped")
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally {
      spark.conf.unset(KEY)
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("bounded-side hint survives under the default ceiling") {
    spark.conf.unset(KEY)
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf)
    val joined = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    assert(hasBroadcastExchange(joined))
  }

  test("guard disabled with -1 leaves hints alone") {
    try {
      spark.conf.set(KEY, "-1")
      val o = Tables.orders(spark, sf)
      val c = Tables.customer(spark, sf)
      val joined = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      assert(hasBroadcastExchange(joined))
    } finally spark.conf.unset(KEY)
  }
}
