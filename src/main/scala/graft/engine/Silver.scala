package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Silver-layer data-quality operators (SURVEY.md §2.11).
  *
  * The reference enforces a declared schema by round-tripping through
  * `spark.createDataFrame(df.rdd, schema)` (ref transformations_script.py:157)
  * — an anti-pattern that destroys columnar locality and breaks Catalyst
  * pushdown through the boundary. Here enforcement stays relational
  * (`df.to(schema)`, Spark ≥3.4), so the plan keeps one scan with pruning
  * and the whole silver stage stays inside WholeStageCodegen.
  */
object Silver {

  /** V1 — schema enforcement, plan-preserving (ref transformations_script.py:154–157). */
  def enforce(df: DataFrame, schema: StructType): DataFrame = df.to(schema)

  /** V2 — field presence + type validation (ref transformations_script.py:160–165).
    * Throws on the first mismatch, mirroring the reference's fail-fast channel
    * (V3, ref :176–181) but as an exception instead of sys.exit. */
  def validate(df: DataFrame, schema: StructType): Unit = {
    val actual = df.schema.map(f => f.name -> f.dataType).toMap
    schema.foreach { f =>
      actual.get(f.name) match {
        case None =>
          throw new IllegalArgumentException(s"missing field: ${f.name}")
        case Some(dt) if dt != f.dataType =>
          throw new IllegalArgumentException(
            s"type mismatch for ${f.name}: expected ${f.dataType}, got $dt")
        case _ => ()
      }
    }
  }

  /** A5 — global de-duplication (ref transformations_script.py:168).
    * All-column dropDuplicates is a single hash-aggregate shuffle on the full
    * row — at 100 TB prefer the keyed variant (dedup on the natural key),
    * which shuffles only once on a narrow key. */
  def dedup(df: DataFrame, keys: Seq[String] = Nil): DataFrame =
    if (keys.isEmpty) df.dropDuplicates() else df.dropDuplicates(keys)

  /** FK orphan check — documented-but-unimplemented in the reference
    * (README claims it, no code exists; SURVEY.md §2.11). A left-anti join:
    * rows of `child` with no match in `parent`. Catalyst plans this as a
    * broadcast-anti when `parent` is small; at scale it shuffles on the key
    * only (both sides pruned to the join columns). */
  def fkOrphans(child: DataFrame, parent: DataFrame, cond: Column): DataFrame =
    child.join(parent, cond, "left_anti")

  /** Enum-domain violations (Postgres CHECK/ENUM → filter; SURVEY.md §7 risk 2). */
  def enumViolations(df: DataFrame, column: String, domain: Set[String]): DataFrame =
    df.filter(!col(column).isin(domain.toSeq: _*) || col(column).isNull)

  /** Column profiler — the one-pass per-column summary (rows / nulls /
    * distincts / min / max) a catalog or data-quality monitor computes on
    * every ingest. One aggregate over the table computes every column's
    * stats, then a zero-shuffle `stack` reshapes wide → long.
    *
    * Multiple exact count-distincts in one aggregate plan through Expand
    * (input ×k before the shuffle) — the standard profiler trade: one scan
    * of the table vs k. At 100 TB with wide tables, swap `countDistinct`
    * for `approx_count_distinct` (HLL, no Expand) and keep the shape.
    *
    * `minMax` renders bounds engine-portably: integers/strings cast
    * directly, doubles through scaled-integer cents (double→string
    * formatting is not cross-engine stable). */
  def profile(df: DataFrame, cols: Seq[String],
      minMax: Map[String, Column => Column] = Map.empty): DataFrame = {
    def render(c: String, x: Column): Column =
      minMax.getOrElse(c, identity[Column] _)(x).cast("string")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        render(c, min(col(c))).as(s"mn_$c"),
        render(c, max(col(c))).as(s"mx_$c"))
    }
    val wide = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackArgs = cols.map(c =>
      s"'$c', nn_$c, nd_$c, mn_$c, mx_$c").mkString(", ")
    wide.select(col("n_rows"), expr(
        s"stack(${cols.size}, $stackArgs) AS " +
          "(column_name, n_nulls, n_distinct, min_val, max_val)"))
      .select(col("column_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_val"), col("max_val"))
      .orderBy("column_name")
  }
}
