package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic vector primitives for similarity search over the
  * `embeddings` table (`embedding: array<float>`). Beyond-reference surface
  * (brief north star: ANN / cosine top-k at 100 TB).
  *
  * Dot products and norms are **left folds in declared order**
  * (`aggregate` ≡ DuckDB `list_reduce`), so both engines execute the same
  * IEEE-754 op sequence and produce bit-identical doubles — which makes
  * cosine scores (and the top-k ranks derived from them) oracle-comparable
  * without tolerances.
  *
  * All functions are per-row projections (codegen'd, no UDFs, no shuffle);
  * the pruning/bucketing operators built on top live in
  * [[graft.engine.Sim]].
  */
object VecFns {

  /** dot(a,b) = fold(acc=0.0; acc + double(a_i)*double(b_i)), in index
    * order. float→double casts are exact; each mul/add is one correctly
    * rounded IEEE op. Declarative form — the cross-engine reference
    * semantics the oracle twins mirror. */
  def dotFold(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Hot-path dot product: the native codegen'd [[DotProductF]] expression —
    * same IEEE sequence as [[dotFold]] (asserted bit-identical in
    * DedupSimSpec), minus the per-element lambda dispatch. */
  def dot(a: Column, b: Column): Column = DotProductF(a, b)

  /** Squared L2 norm = dot(a,a), same op sequence as the declarative fold
    * `acc + double(a_i)*double(a_i)`. */
  def norm2(a: Column): Column = DotProductF(a, a)

  /** cosine = dot / (sqrt(|a|²) * sqrt(|b|²)) — sqrt/mul/div are each
    * correctly rounded, so equality with the oracle is exact. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Sign-LSH geometry: NPLANES pseudo-random hyperplanes; bucket = the
    * NPLANES sign bits. Plane components come from integer arithmetic on
    * (plane, dim) — no RNG state, so the oracle regenerates them exactly. */
  val NPLANES = 8
  val PLANE_P = 1000003L

  /** Component d of hyperplane p, in [-0.5, 0.5): integer hash mod PLANE_P,
    * one division, one subtraction — deterministic. */
  private def planeComponent(p: Int, d: Column): Column =
    ((lit(p.toLong * 2654435761L + 12345L) + d.cast("long") * 40503L) % PLANE_P)
      .cast("double") / lit(PLANE_P.toDouble) - lit(0.5)

  /** Projection of `v` onto hyperplane p (left fold over dims). */
  def planeDot(p: Int, v: Column): Column =
    aggregate(
      transform(sequence(lit(0), size(v) - 1),
        d => planeComponent(p, d) * element_at(v, d + 1).cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** LSH bucket id: NPLANES sign bits packed into a long (0..2^NPLANES-1).
    * At 100 TB this is the partition key of the ANN index — one map-only
    * pass assigns every vector to a bucket; probes search only their own
    * bucket (recall/latency tradeoff documented in [[graft.engine.Sim]]). */
  def lshBucket(v: Column): Column =
    (0 until NPLANES)
      .map(p => when(planeDot(p, v) > 0, lit(1L << p)).otherwise(lit(0L)))
      .reduce(_ + _)
}
