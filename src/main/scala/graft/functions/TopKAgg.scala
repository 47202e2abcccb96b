package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input row of the top-k aggregation: one scored candidate per probe. */
final case class ScoredRow(probe_id: Long, vec_id: Long, cos: Double)

/** Bounded top-k buffer: parallel id/score arrays, ordered by
  * (score desc, id asc), never longer than k. */
final case class TopKBuf(ids: Seq[Long], scores: Seq[Double])

/** Typed `Aggregator` keeping a k-bounded buffer per group — the scale
  * alternative to window-rank top-k: a window materializes and sorts *all*
  * candidates per probe before ranking, while this carries at most k rows
  * per partition into the merge (classic O(n log k) partial top-k, the same
  * shape as Spark's own TakeOrderedAndProject but per-group).
  *
  * Ordering is (score desc, id asc) — exact double comparisons identical to
  * the row_number window in Sim.embeddingTopK, so both paths produce the
  * same rows and the same oracle SQL verifies both (q20/q42).
  */
final class TopKAgg(k: Int) extends Aggregator[ScoredRow, TopKBuf, TopKBuf] {

  /** (score desc, id asc) with Spark's SQL double ordering: comparisons go
    * through java.lang.Double.compare, under which NaN sorts *greater* than
    * +Inf — so a NaN score ranks first here exactly as it does under the
    * row_number window's ORDER BY cos DESC (a `sortBy(-s)` would negate NaN
    * to NaN and push it last instead, diverging from the window/oracle). */
  private val ord: Ordering[(Long, Double)] = (a, b) => {
    val byScore = java.lang.Double.compare(b._2, a._2) // desc, NaN greatest
    if (byScore != 0) byScore else java.lang.Long.compare(a._1, b._1)
  }

  private def bounded(pairs: Seq[(Long, Double)]): TopKBuf = {
    val top = pairs.sorted(ord).take(k)
    TopKBuf(top.map(_._1), top.map(_._2))
  }

  override def zero: TopKBuf = TopKBuf(Nil, Nil)

  override def reduce(b: TopKBuf, a: ScoredRow): TopKBuf =
    bounded((a.vec_id, a.cos) +: b.ids.zip(b.scores))

  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf =
    bounded(x.ids.zip(x.scores) ++ y.ids.zip(y.scores))

  override def finish(r: TopKBuf): TopKBuf = r

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}
