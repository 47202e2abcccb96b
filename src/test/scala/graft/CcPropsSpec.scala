package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

import graft.engine.Dedup

/** Randomized-graph properties of the incremental cluster lifecycle —
  * the round-9 centerpiece gets the adversarial treatment a hand-picked
  * fixture can't give: for ARBITRARY edge sets split into arbitrary
  * increments, building from the first and merging the rest must equal
  * the one-shot transitive closure, and forgetting an arbitrary node
  * subset must equal the closure over surviving edges. Random graphs
  * hit the shapes that matter (bridges, chains folding into one
  * component across increments, canonical deletions, splits) far more
  * densely than planted corpora do. Seeded Gen → deterministic runs. */
class CcPropsSpec extends SparkSpecBase {

  private val seed0 = rng.Seed(20260814L)

  /** n random undirected edges over a small id space (dense enough for
    * multi-increment component folding). */
  private def edgeGen(maxNode: Int, maxEdges: Int): Gen[Seq[(Long, Long)]] =
    Gen.chooseNum(1, maxEdges).flatMap { n =>
      Gen.listOfN(n, for {
        a <- Gen.chooseNum(0, maxNode)
        b <- Gen.chooseNum(0, maxNode) if a != b
      } yield (math.min(a, b).toLong, math.max(a, b).toLong))
    }

  private def closureOf(edges: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    import spark.implicits._
    if (edges.isEmpty) Seq.empty
    else Dedup.connectedComponents(
      edges.toDF("doc_a", "doc_b")
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionAll(edges.toDF("doc_a", "doc_b")
          .select(col("doc_b").as("src"), col("doc_a").as("dst"))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
  }

  test("incremental merges equal the one-shot closure on random graphs " +
      "under random 3-way increment splits") {
    import spark.implicits._
    var seed = seed0
    (1 to 8).foreach { round =>
      val edges = edgeGen(maxNode = 24, maxEdges = 40)
        .apply(Gen.Parameters.default, seed).get.distinct
      seed = seed.next
      val labelDir = tmpDir(s"graft-ccprop-$round") + "/labels"
      // arbitrary split: edge i goes to increment hash(i) % 3
      val parts = edges.zipWithIndex.groupMap(_._2 % 3)(_._1)
      Dedup.buildClusterLabels(
        parts.getOrElse(0, Seq.empty).toDF("doc_a", "doc_b"), labelDir)
      Seq(1, 2).foreach { k =>
        val inc = parts.getOrElse(k, Seq.empty)
        if (inc.nonEmpty)
          Dedup.mergeClusterIncrement(spark, labelDir,
            inc.toDF("doc_a", "doc_b"))
      }
      val merged = Dedup.readClusterLabels(spark, labelDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(merged == closureOf(edges),
        s"round $round: merged labels diverged from the closure " +
          s"(edges=$edges)")
    }
  }

  test("forgetClusterMembers on randomized duplicate-group corpora: " +
      "canonical loss, whole-group loss, and singleton dropout all land") {
    // near-dup relations are similarity cliques, so the text-realizable
    // random structure is GROUPS of identical documents: cluster =
    // group; deleting random members (often the min-id canonical, and
    // sometimes a whole group or all-but-one) must leave each surviving
    // group labeled by its new min survivor, and drop groups reduced to
    // ≤1 member (the ≥1-pair label semantics). Bridge/split coverage
    // lives in PipelineSpec's corpus test; this one sweeps the label
    // surgery across random configurations.
    import spark.implicits._
    var seed = seed0.next
    (1 to 6).foreach { round =>
      val sizes = Gen.listOfN(8, Gen.chooseNum(1, 4))
        .apply(Gen.Parameters.default, seed).get
      seed = seed.next
      var nextId = 0L
      val groups: Seq[Seq[Long]] = sizes.zipWithIndex.map { case (s, g) =>
        val ids = (0 until s).map(i => nextId + i * 7 + (g % 3))
        nextId += s * 7 + 11
        ids.map(_.toLong)
      }
      val docs = groups.zipWithIndex.flatMap { case (ids, g) =>
        val text = (0 until 8).map(i => s"grp${g}tok$i").mkString(" ")
        ids.map(id => (id, text))
      }.toDF("doc_id", "text")
      val pairs = groups.flatMap(ids =>
        ids.combinations(2).map(p => (p(0), p(1))))
      val labelDir = tmpDir(s"graft-ccprop-forget-$round") + "/labels"
      Dedup.buildClusterLabels(pairs.toDF("doc_a", "doc_b"), labelDir)
      // random deletions: kill ids by a rotating rule — frequently the
      // group minimum (the canonical), sometimes everything
      val dead = groups.flatten.filter(id => (id + round) % 3 == 0)
      if (dead.nonEmpty) {
        val remaining = docs.filter(!col("doc_id").isin(dead: _*))
        Dedup.forgetClusterMembers(spark, labelDir,
          dead.toDF("doc_id"), remaining)
        val expected = groups.flatMap { ids =>
          val s = ids.filterNot(dead.contains)
          if (s.length >= 2) s.map(id => (id, s.min)) else Seq.empty
        }.sorted
        val got = Dedup.readClusterLabels(spark, labelDir)
          .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        assert(got == expected,
          s"round $round: groups=$groups dead=$dead got=$got")
      }
    }
  }
}
