package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the trade network (beyond-reference; companion to
  * the connected-components pass in [[Dedup.connectedComponents]]).
  *
  * Nodes are nations; a lineitem whose customer sits in nation u and whose
  * supplier sits in nation v contributes weight 1 to edge u→v. One
  * weighted-PageRank iteration runs over that edge list the way every
  * distributed PageRank does: out-degree normalize, scatter contributions
  * along edges, gather per destination.
  */
object Graph {
  import Tables._
  import Num.round6

  /** Contribution scale: per-edge rank flow is materialized as the exact
    * integer (w·SCALE) div outdeg — integer floor division, so the
    * cross-engine sum is order-free and bit-exact. */
  val PR_SCALE = 1000000000000L
  val PR_D = 0.85

  /** Customer-nation → supplier-nation weighted edge list. */
  private[engine] def tradeEdges(spark: SparkSession, dir: String): DataFrame = {
    val l = lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
    val o = orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val c = customer(spark, dir).select(col("c_custkey"),
      col("c_nationkey").as("src"))
    val s = supplier(spark, dir).select(col("s_suppkey"),
      col("s_nationkey").as("dst"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("w"))
  }

  /** One weighted-PageRank iteration from the uniform start over the
    * nation trade graph: rank(v) = (1-d)/N + d/N · Σ_u w(u,v)/outdeg(u).
    *
    * Exactness: each edge's flow is the integer (w·SCALE) div outdeg —
    * floor division on BIGINTs, identical in both engines — so the gather
    * is an integer sum (order-free) and only the final rescale touches
    * doubles (two IEEE ops, same order both sides).
    *
    * Scale shape: the fact joins reduce to a (src, dst) edge aggregate
    * map-side before any rank math; out-degree is a second small
    * aggregate broadcast back onto edges; scatter/gather shuffles edge
    * rows only. Iterating = looping this plan over a localCheckpointed
    * rank vector (the [[Dedup.connectedComponents]] loop discipline). */
  def pageRankStep(spark: SparkSession, dir: String): DataFrame = {
    val edges = tradeEdges(spark, dir)
    val outdeg = edges.groupBy(col("src")).agg(sum(col("w")).as("outw"))
    val n = nation(spark, dir).select(col("n_nationkey"), col("n_name"))
    val nNations = count(lit(1)).cast("double")
    val gathered = edges
      .join(broadcast(outdeg), "src")
      .select(col("dst"), expr(s"(w * ${PR_SCALE}L) div outw").as("flow"))
      .groupBy(col("dst"))
      .agg(sum(col("flow")).as("inflow"), count(lit(1)).as("n_in_edges"))
    n.join(gathered, col("n_nationkey") === col("dst"), "left")
      .select(col("n_name"),
        coalesce(col("inflow"), lit(0L)).as("inflow"),
        coalesce(col("n_in_edges"), lit(0L)).as("n_in_edges"))
      .crossJoin(broadcast(nation(spark, dir).agg(nNations.as("nn"))))
      .select(col("n_name"), col("n_in_edges"),
        round6(lit(1.0 - PR_D) / col("nn") +
          lit(PR_D) / col("nn") *
            (col("inflow").cast("double") / lit(PR_SCALE.toDouble)))
          .as("rank"))
      .orderBy("n_name")
  }
}
