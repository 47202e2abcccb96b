package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Storage-layout index structures — the scan-pruning machinery a lake
  * engine runs before any join or aggregate touches data. Three shapes:
  *
  *  - [[bloomPrejoin]]: a compact bitmap semi-filter built from the join
  *    dim and broadcast to the fact scan, pruning rows before the join —
  *    the explicit, deterministic form of the runtime bloom filter AQE
  *    injects (`spark.sql.optimizer.runtime.bloomFilter.enabled`). False
  *    positives are removed by the exact join that follows, so the result
  *    is exact regardless of bitmap geometry.
  *  - [[minmaxSkipping]]: per-chunk min/max footer stats over a
  *    date-clustered layout, consulted to skip whole chunks for a range
  *    predicate — parquet row-group / Delta file-skipping semantics,
  *    materialized as a queryable stats table.
  *  - [[zorderLocality]]: Morton (z-order) interleave of two dimensions,
  *    with per-tile span stats proving the multi-dimensional locality
  *    that makes min/max skipping effective on BOTH columns at once —
  *    vs a linear layout that is perfect on one dimension and useless on
  *    the other.
  */
object Indexing {
  import Tables._
  import Num._

  // ---------------------------------------------------------------- bloom

  /** Bitmap geometry: 4096 buckets × 64 bits = 256 Kib ≈ 32 KB broadcast
    * no matter how large the dim side grows — the fixed-cost runtime
    * filter. At a 100 TB fact scan this prunes at the scan (before the
    * shuffle or the broadcast-hash probe), which is where the win is:
    * rows that die here are never exchanged. */
  val BLOOM_BUCKETS = 4096

  /** Bucket = first hash mod buckets; bit = 1L << (independent second
    * hash mod 64). Both codegen'd builtins over the key column name. */
  private def bloomBucket(key: String): Column =
    expr(s"pmod(xxhash64($key), ${BLOOM_BUCKETS}L)")
  private def bloomBitSql(key: String): String =
    s"shiftleft(1L, cast(pmod(xxhash64(7, $key), 64L) as int))"
  private def bloomBit(key: String): Column = expr(bloomBitSql(key))

  /** Urgent-order revenue through a bitmap pre-filter: the urgent keyset
    * reduces map-side to ≤4096 (bucket, mask) rows, broadcasts, and the
    * fact scan keeps only rows whose bit survives — an inner join on the
    * bucket doubles as "bucket absent ⇒ definite miss". The exact
    * left-semi join afterwards removes bitmap false positives, so the
    * oracle is the plain join with no bitmap at all. */
  def bloomPrejoin(spark: SparkSession, dir: String): DataFrame = {
    val dim = orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bitmap = dim
      .groupBy(bloomBucket("o_orderkey").as("bkt"))
      .agg(expr("bit_or(" + bloomBitSql("o_orderkey") + ")").as("mask"))
    val fact = lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_returnflag"),
        cents(col("l_extendedprice")).as("pc"))
      .withColumn("bkt", bloomBucket("l_orderkey"))
    val pruned = fact
      .join(broadcast(bitmap), "bkt")
      .filter((col("mask").bitwiseAND(bloomBit("l_orderkey"))) =!= 0L)
    pruned
      .join(broadcast(dim), pruned("l_orderkey") === dim("o_orderkey"),
        "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"), dollars(sum(col("pc"))).as("revenue"))
      .orderBy("l_returnflag")
  }

  // -------------------------------------------------------- min/max stats

  /** Rows per chunk — the row-group / file granularity of the stats. */
  val CHUNK_ROWS = 10000
  /** The range query answered through the stats: one shipping year,
    * chosen inside every SF's shipdate span (sf0.001 starts in 1995, so a
    * 1994 range would be vacuously empty — the q64 lesson). */
  val SKIP_LO = "1996-01-01"
  val SKIP_HI = "1997-01-01"

  /** Date-clustered layout + per-chunk min/max stats + pruned range scan,
    * in one plan. The layout is date-granular equi-depth: a per-date row
    * count (one map-side-combine aggregate, bounded by the number of
    * distinct ship dates — ~2.5k for a 7-year calendar at ANY row count),
    * each date's cumulative start position from a bounded self-join on
    * that tiny aggregate, and chunk = start `div` [[CHUNK_ROWS]] — every
    * row of one date lands in one chunk, so the layout is deterministic
    * regardless of cluster partitioning (the property the oracle needs).
    * The stats table is one row per chunk (min/max shipdate, rowcount);
    * the range query consults it, scans only surviving chunks, and still
    * returns the exact answer because skipping is conservative (a chunk
    * is dropped only when its whole [min,max] misses the range).
    *
    * Scale shape: NO window and NO global sort anywhere (the old form's
    * global `row_number` was the one single-reducer stage in the surface;
    * PlanShapeSpec now pins its absence). The fact table is touched by
    * exactly two passes — the per-date count (write-time stats work) and
    * the pruned scan, which reads only chunks surviving the min/max test
    * via a broadcast date→chunk map. The O(D²) cumulative self-join is
    * over the D-row date aggregate, never the data; for a finer-grained
    * layout key, bucket to day granularity first or read real parquet
    * footers (the write path's form). Output = one summary row: chunk
    * counts prove the skipping, the aggregate proves the scan stayed
    * exact. */
  def minmaxSkipping(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitem(spark, dir)
      .select(col("l_shipdate"), cents(col("l_extendedprice")).as("pc"))
    val byDate = li.groupBy(col("l_shipdate")).agg(count(lit(1)).as("n_d"))
    val cum = byDate
      .join(broadcast(byDate.select(col("l_shipdate").as("d2"),
        col("n_d").as("n2"))), col("d2") < col("l_shipdate"), "left")
      .groupBy(col("l_shipdate"), col("n_d"))
      .agg(coalesce(sum(col("n2")), lit(0L)).as("cum_before"))
    val chunkMap = cum.select(col("l_shipdate"), col("n_d"),
      expr(s"cum_before div ${CHUNK_ROWS}L").as("chunk"))
    val stats = chunkMap.groupBy(col("chunk"))
      .agg(min(col("l_shipdate")).as("mn"), max(col("l_shipdate")).as("mx"),
        sum(col("n_d")).as("n"))
    val lo = lit(SKIP_LO).cast("timestamp")
    val hi = lit(SKIP_HI).cast("timestamp")
    val surviving = stats.filter(col("mx") >= lo && col("mn") < hi)
    val totals = stats.agg(count(lit(1)).as("n_chunks"))
    // the pruned scan: only dates belonging to surviving chunks are read
    val survDates = chunkMap
      .join(surviving.select(col("chunk")), "chunk")
      .select(col("l_shipdate"), col("chunk"))
    val scanned = li.join(broadcast(survDates), "l_shipdate")
    val res = scanned
      .agg(countDistinct(col("chunk")).as("n_chunks_scanned"),
        count(lit(1)).as("rows_scanned"),
        coalesce(sum(when(col("l_shipdate") >= lo && col("l_shipdate") < hi,
          1L).otherwise(0L)), lit(0L)).as("n_matching"),
        dollars(coalesce(sum(when(
          col("l_shipdate") >= lo && col("l_shipdate") < hi,
          col("pc")).otherwise(0L)), lit(0L))).as("revenue"))
    res.crossJoin(broadcast(totals))
      .select(col("n_chunks"), col("n_chunks_scanned"), col("rows_scanned"),
        col("n_matching"), col("revenue"))
  }

  // ------------------------------------------------------------- z-order

  /** Bits per dimension of the Morton code (16-bit z over two 8-bit
    * coordinates). */
  val Z_BITS = 8

  /** Dialect-neutral SQL for the Morton interleave of two nonnegative
    * `< 2^Z_BITS` integer expressions — built from floor-division and
    * modulo only, so the same string parses in Spark SQL and DuckDB (the
    * oracle embeds this exact text; the geometry cannot drift). Division
    * goes through doubles in both dialects, exact for inputs < 2^8. */
  def zInterleaveSql(x: String, y: String): String =
    (0 until Z_BITS).map { i =>
      val p = 1L << i
      s"(CAST(floor(($x) / $p.0) AS BIGINT) % 2) * ${1L << (2 * i)}" +
        s" + (CAST(floor(($y) / $p.0) AS BIGINT) % 2) * ${1L << (2 * i + 1)}"
    }.mkString("(", " + ", ")")

  /** x = customer slot, y = order-date day slot — both folded into the
    * 8-bit z grid. The day index is the lexicographic (year, month, day)
    * ordinal (372 slots/year), chosen because `year`/`month`/`day` parse
    * identically in Spark SQL and DuckDB — the whole coordinate text is
    * shared with the oracle twin via [[zInterleaveSql]]. */
  val Z_X = "(o_custkey % 256)"
  val Z_Y = "((year(o_orderdate) * 372 + (month(o_orderdate) - 1) * 31" +
    " + (day(o_orderdate) - 1)) % 256)"

  /** Z-order vs linear layout, judged by per-cell span: bucket orders
    * into 1024 cells under each layout and measure how far apart the
    * rows of one cell sit along BOTH dimensions. The z-curve cell
    * (z div 64 = one 8×8 tile) bounds both spans at 7; the linear cell
    * (customer-major) has zero customer span but a date span near the
    * full 255 — the reason multi-dimensional range queries need z-order:
    * min/max skipping then prunes on either column, not just the leading
    * one.
    *
    * Everything is exact integer arithmetic on the two slot coordinates,
    * and the layout comparison reduces to 2 rows of integer sums. At
    * 100 TB this is the OPTIMIZE ZORDER BY decision query: run it on a
    * sample of candidate column pairs, pick the pair whose tile spans
    * stay balanced, rewrite the table in z order. */
  def zorderLocality(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir)
      .select(expr(Z_X).cast("long").as("x"), expr(Z_Y).cast("long").as("y"))
      .withColumn("z", expr(zInterleaveSql("x", "y")))
      .localCheckpoint() // read once by both layout measurements
    def spans(cell: Column, name: String): DataFrame =
      o.groupBy(cell.as("cell"))
        .agg((max(col("x")) - min(col("x"))).as("sx"),
          (max(col("y")) - min(col("y"))).as("sy"),
          count(lit(1)).as("n"))
        .agg(lit(name).as("layout"), count(lit(1)).as("n_cells"),
          sum(col("sx")).as("sum_span_x"), sum(col("sy")).as("sum_span_y"),
          max(col("sx")).as("max_span_x"), max(col("sy")).as("max_span_y"),
          sum(col("n")).as("n_rows"))
    spans(expr("z div 64"), "zorder")
      .unionByName(spans(expr("x * 4 + (y div 64)"), "linear"))
      .orderBy("layout")
  }
}
