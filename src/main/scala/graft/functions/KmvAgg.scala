package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input row of the KMV aggregation: one hashed element per group. */
final case class KmvIn(g: String, h: Long)

/** KMV sketch state: the k smallest DISTINCT hash values seen, ascending,
  * never longer than k. */
final case class KmvBuf(hs: Seq[Long])

/** Typed `Aggregator` building a k-minimum-values cardinality sketch
  * (Bar-Yossef et al. 2002, "Counting distinct elements in a data
  * stream"): the state is the k smallest DISTINCT hashes of the group —
  * bounded at k longs regardless of group size, merged by
  * union-then-rebound, so partial aggregation combines map-side exactly
  * like a sum. From a full sketch the distinct count estimates as
  * `(k-1)·M / m_k` with `m_k` the k-th smallest hash over domain `[0,M)`;
  * a sketch that never filled IS the exact distinct count.
  *
  * Unlike HyperLogLog (`approx_count_distinct`, q55) the whole sketch is
  * a deterministic function of the input SET — insertion order, split,
  * and merge tree never change it — so estimates cross engines
  * bit-identically and the DuckDB oracle replays them with a plain
  * bottom-k window (q195). At 100 TB the sketch replaces the per-group
  * distinct hash set (unbounded) with k longs, and per-source sketches
  * union into corpus-level ones without a rescan.
  */
final class KmvAgg(k: Int) extends Aggregator[KmvIn, KmvBuf, KmvBuf] {

  private def bounded(s: Seq[Long]): KmvBuf =
    KmvBuf(s.distinct.sorted.take(k))

  override def zero: KmvBuf = KmvBuf(Nil)

  override def reduce(b: KmvBuf, a: KmvIn): KmvBuf =
    if (b.hs.length == k && a.h >= b.hs.last) b else bounded(a.h +: b.hs)

  override def merge(x: KmvBuf, y: KmvBuf): KmvBuf =
    bounded(x.hs ++ y.hs)

  override def finish(r: KmvBuf): KmvBuf = r

  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
}
