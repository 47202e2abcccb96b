package graft

import graft.engine.{Graph, Sim}

/** Invariants for the round-5 iterative operators — the loop-discipline
  * properties the oracle hash-match can't express: objective monotonicity
  * across k-means rounds, rank-mass conservation across PageRank rounds,
  * and single-round consistency with the already-proven one-step
  * operators. */
class RoundFiveSpec extends SparkSpecBase {

  test("k-means mean assigned cosine is non-decreasing across Lloyd rounds") {
    val (_, trace) = Sim.kmeansRun(spark, sf, Sim.KMEANS_ITERS)
    assert(trace.size == Sim.KMEANS_ITERS)
    trace.sliding(2).foreach { case Seq(prev, next) =>
      // alternating maximization; 1e-9 absorbs the 2^-20 fixed-point floor
      // and the float narrowing of fed-back centroids
      assert(next >= prev - 1e-9,
        s"mean cosine regressed across a Lloyd round: $trace")
    }
    // the loop must actually move: training improves on the stride seed
    assert(trace.last > trace.head,
      s"k-means made no progress over ${Sim.KMEANS_ITERS} rounds: $trace")
  }

  test("k-means with one round IS the proven single-step kmeansStep") {
    val once = Sim.kmeansRun(spark, sf, 1)._1.collect()
    val step = Sim.kmeansStep(spark, sf).collect()
    assert(once.length == step.length && once.sameElements(step))
  }

  test("PageRank conserves rank mass every round") {
    val (out, mass) = Graph.pageRankRun(spark, sf, Graph.PR_ITERS)
    assert(mass.size == Graph.PR_ITERS)
    mass.foreach { m =>
      // floor divisions only ever leak mass, never create it; the leak is
      // < 1 unit of 10^12 per edge+node per round
      assert(m <= Graph.PR_SCALE, s"rank mass grew: $mass")
      assert(m >= (Graph.PR_SCALE * (1 - 1e-6)).toLong,
        s"rank mass leaked more than 1e-6: $mass")
    }
    val rows = out.collect()
    // every node keeps at least the teleport floor, ranks sum to ~1
    val floor = (Graph.PR_D_DEN - Graph.PR_D_NUM) * Graph.PR_SCALE /
      (Graph.PR_D_DEN * rows.length)
    assert(rows.forall(_.getAs[Long]("rank_scaled") >= floor))
    assert(math.abs(rows.map(_.getAs[Double]("rank")).sum - 1.0) < 1e-4)
  }

  test("iterated PageRank departs from the uniform start") {
    val rows = Graph.pageRankIterated(spark, sf).collect()
    val ranks = rows.map(_.getAs[Long]("rank_scaled")).toSet
    assert(ranks.size > 1, "all nations kept identical rank — no flow")
  }
}
