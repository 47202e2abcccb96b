package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Num._
import graft.engine.Tables._

/** Skewed-JOIN mitigation — the join-side twin of q61's salted
  * aggregation (`Kpis.saltedRevenueByNation`).
  *
  * A hash equi-join routes every row of one key to one reducer; a key
  * owning a double-digit share of a 100 TB fact table turns that reducer
  * into the job's straggler (or its OOM). Two production answers:
  *
  *  1. AQE's skew-join split (`spark.sql.adaptive.skewJoin.*`): the
  *     runtime re-plan splits an oversized shuffle partition into chunks
  *     and replicates the matching build side — free, but only fires for
  *     sort-merge joins whose stats cross the thresholds, and only at
  *     shuffle boundaries AQE owns. SkewJoinSpec proves it activates
  *     (`skew=true` in the final adaptive plan) on a planted hot key.
  *
  *  2. Explicit SELECTIVE SALTING (this file): exact-split the relation
  *     on hot keys, salt the hot fact rows into [[Skew.JOIN_SALTS]]
  *     sub-keys, replicate only the hot *dimension* rows across the salt
  *     domain, and union with the untouched cold-key join. Works for any
  *     join strategy, any engine version, and keys hot beyond what AQE's
  *     chunking amortizes.
  *
  * Scale shape: the hot-key census is a partial-aggregated count (no
  * skew — combiners collapse the hot key map-side, exactly q61's
  * argument); |hot| ≤ N/threshold by construction, so the hot-key set
  * always broadcasts. The dim side replicates ×SALTS for hot keys ONLY
  * — the classic all-keys salting multiplies the entire dimension, this
  * multiplies ≤ |hot| rows. Every reducer's share of a hot key is
  * bounded at 1/SALTS of that key's rows (spec-pinned).
  */
object Skew {

  /** Salt fan-out of the hot-key path. */
  val JOIN_SALTS = 4

  /** Fact rows per key above which the key takes the salted path. */
  val HOT_THRESHOLD = 3L

  /** Helper-column name guaranteed absent from every input schema —
    * inputs that already carry a `__hotkey`/`__salt_*` column must not
    * collide with the plan's own bookkeeping (the schema contract below
    * promises fact.* ++ dim.* untouched for ARBITRARY inputs). */
  private def fresh(base: String, inputs: Seq[DataFrame]): String = {
    var n = base
    while (inputs.exists(_.columns.contains(n))) n += "_"
    n
  }

  /** Inner equi-join `fact ⋈ dim` on `factKey = dimKey`, with keys whose
    * fact-side row count exceeds `hotThreshold` routed through a salted
    * two-path plan. `saltSrc` is any fact column (or expression) whose
    * hash spreads a hot key's rows across salts — it never affects the
    * result, only the distribution. Output columns: fact.* ++ dim.*
    * (both key columns retained), exactly the plain join's schema —
    * helper columns are collision-proofed against the input schemas. */
  def saltedJoin(fact: DataFrame, dim: DataFrame,
                 factKey: String, dimKey: String, saltSrc: Column,
                 salts: Int = JOIN_SALTS,
                 hotThreshold: Long = HOT_THRESHOLD): DataFrame = {
    val spark = fact.sparkSession
    val hotK = fresh("__hotkey", Seq(fact, dim))
    val saltF = fresh("__salt_f", Seq(fact, dim))
    val saltD = fresh("__salt_d", Seq(fact, dim))
    // exact hot-key census: partial-aggregated, skew-free, and the
    // result set is ≤ N/hotThreshold keys — always broadcastable
    val hot = fact.groupBy(col(factKey).as(hotK))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > hotThreshold)
      .select(col(hotK))
    val factHot = fact.join(broadcast(hot),
      col(factKey) === col(hotK), "left_semi")
    val factCold = fact.join(broadcast(hot),
      col(factKey) === col(hotK), "left_anti")
    val dimHot = dim.join(broadcast(hot),
      col(dimKey) === col(hotK), "left_semi")
    val dimCold = dim.join(broadcast(hot),
      col(dimKey) === col(hotK), "left_anti")
    // hot path: fact rows take a deterministic salt in [0, salts);
    // ONLY the hot dim rows replicate across the full salt domain
    val saltDomain = spark.range(salts.toLong)
      .select(col("id").as(saltD))
    val saltedFact = factHot
      .withColumn(saltF, pmod(hash(saltSrc), lit(salts)).cast("long"))
    val saltedDim = dimHot.crossJoin(broadcast(saltDomain))
    val hotJoined = saltedFact
      .join(saltedDim, col(factKey) === col(dimKey) &&
        col(saltF) === col(saltD))
      .drop(saltF, saltD)
    val coldJoined = factCold.join(dimCold, col(factKey) === col(dimKey))
    hotJoined.unionByName(coldJoined)
  }

  /** q125 — revenue by order priority through the selective salted join:
    * lineitem (fact, key `l_orderkey`, salted by line number) ⋈ orders
    * (dim). With [[HOT_THRESHOLD]] = 3 and 1–7 lines per order, roughly
    * half the orders take the hot path and half the cold path, so the
    * oracle (the UNSALTED join + aggregate) proves both paths and their
    * union are semantics-preserving. */
  def saltedSkewJoin(spark: SparkSession, dir: String): DataFrame = {
    val f = lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        cents(col("l_extendedprice")).as("pc"))
    val d = orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"))
    saltedJoin(f, d, "l_orderkey", "o_orderkey", col("l_linenumber"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"), dollars(sum(col("pc"))).as("revenue"))
      .orderBy("o_orderpriority")
  }
}
