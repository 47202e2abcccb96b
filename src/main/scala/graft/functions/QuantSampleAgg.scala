package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input row of the quantile-sample aggregation: one (hash, value) pair
  * per group member. `h` is a deterministic per-row hash (an LCG
  * permutation of the row key) — the sampling coin, replayable by the
  * DuckDB twin. */
final case class QsIn(g: String, h: Long, v: Long)

/** One retained sample entry. Kept as (h, v) so the bound is by hash
  * order with a value tie-break — a total order both engines share. */
final case class QsEntry(h: Long, v: Long)

/** Sample state: the k smallest entries by (h, v), ascending, multiset
  * semantics (duplicates retained — this samples ROWS, not distincts). */
final case class QsBuf(es: Seq[QsEntry])

/** Typed `Aggregator` building a deterministic bottom-k-by-hash ROW
  * sample for quantile estimation (the priority/bottom-k sampling
  * lineage — Rosén '97, Cohen–Kaplan '07): keep the k rows whose hashed
  * keys are smallest. Because the "coin" is a hash of the row key, the
  * sample — and therefore every quantile read off it — is a pure
  * function of the input SET: insertion order, partitioning, and merge
  * tree never change it, unlike `percentile_approx`/KLL whose compaction
  * outcome shifts with merge order (why q55 can only be verdict-gated).
  * The DuckDB twin replays the sample with a plain bottom-k window over
  * the same hash and reads the same order statistics (q219's gate).
  *
  * State is bounded at k entries regardless of group size and merges by
  * concat-then-rebound, so partial aggregation combines map-side exactly
  * like a sum — the 100 TB shape: one pass, k·|groups| total state,
  * quantile error O(1/√k) with k chosen at the call site.
  */
final class QuantSampleAgg(k: Int) extends Aggregator[QsIn, QsBuf, QsBuf] {

  private val ord: Ordering[QsEntry] = Ordering.by(e => (e.h, e.v))

  private def bounded(s: Seq[QsEntry]): QsBuf = QsBuf(s.sorted(ord).take(k))

  override def zero: QsBuf = QsBuf(Nil)

  override def reduce(b: QsBuf, a: QsIn): QsBuf = {
    val e = QsEntry(a.h, a.v)
    if (b.es.length == k && ord.gteq(e, b.es.last)) b
    else bounded(e +: b.es)
  }

  override def merge(x: QsBuf, y: QsBuf): QsBuf = bounded(x.es ++ y.es)

  override def finish(r: QsBuf): QsBuf = r

  override def bufferEncoder: Encoder[QsBuf] = Encoders.product[QsBuf]
  override def outputEncoder: Encoder[QsBuf] = Encoders.product[QsBuf]
}
