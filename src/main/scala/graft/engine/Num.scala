package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers for oracle-comparable numeric outputs.
  *
  * The driver hash-compares Spark results against DuckDB running the same
  * SQL, so every derived double must be **bit-identical** across engines.
  * Two rules make that hold:
  *
  *  1. Never `round(x, n)` with n > 0 on a double. Spark rounds the shortest
  *     decimal representation (`BigDecimal.valueOf(d)` → HALF_UP) while
  *     DuckDB rounds the scaled binary value; they disagree on values like
  *     5.015 whose double sits just below the .xx5 boundary (Spark → 5.02,
  *     DuckDB → 5.01). Rounding to an *integer* is safe in both engines: the
  *     only exactly-representable tie (x.5) rounds away from zero in both,
  *     and every other value rounds to the true nearest integer.
  *
  *  2. Keep float arithmetic in a defined evaluation order (single
  *     multiplies, left-to-right folds), so both engines execute the same
  *     IEEE-754 op sequence. Sums of doubles are routed through integer
  *     cents (exact — no order sensitivity); divisions/sqrt on identical
  *     inputs are correctly rounded and therefore identical.
  *
  * SQL twin of `round2` (see SparkEntry.oracleSql):
  * `CAST(round((x)*100) AS BIGINT) / CAST(100 AS DOUBLE)`.
  */
object Num {
  /** dollars (double) → exact integer cents; safe to sum at any scale
    * (2^63 cents ≈ 9e16 dollars) with no float-order sensitivity. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** integer cents → dollars as double (IEEE division is correctly rounded,
    * so identical sums give identical doubles in both engines). */
  def dollars(c: Column): Column = c / lit(100.0)

  /** round to 2dp via the integer-cents path (cross-engine safe). */
  def round2(c: Column): Column = round(c * 100).cast("long") / lit(100.0)

  /** round to 6dp via the integer path (for similarity scores). */
  def round6(c: Column): Column = round(c * 1e6).cast("long") / lit(1e6)

  /** signed ppm fixed-point: floor(|x|·10⁶ + 0.5), sign re-applied — the
    * int8 quantizer's rounding (see Sim's quantize), extended to negative
    * cells. Used instead of `round()` wherever a fixed-pointed double can
    * be negative (projected cosines), so half-way cells can't diverge on
    * engines whose `round` is half-even.
    * SQL twin: [[graft.OracleTwins.ppm]]. */
  def ppm(c: Column): Column = {
    val m = floor(abs(c) * 1e6 + 0.5).cast("long")
    when(c < 0, -m).otherwise(m)
  }
}
