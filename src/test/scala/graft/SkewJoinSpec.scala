package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.Skew

/** Skewed-join mitigation, proven both ways the 100 TB notes (SURVEY §9)
  * lean on: AQE's runtime skew-join split actually activates on a planted
  * hot key, and the explicit selective-salting path is both
  * semantics-preserving and load-bounded. */
class SkewJoinSpec extends SparkSpecBase {

  /** A fact table with one pathologically hot key: key 0 owns ~half of
    * all rows; the rest spread uniformly over `nKeys`. */
  private def skewedFact(rows: Long, nKeys: Int): DataFrame =
    spark.range(rows).select(
      when(col("id") % 2 === 0, lit(0L))
        .otherwise(pmod(col("id"), lit(nKeys.toLong)))
        .as("k"),
      col("id").as("payload"))

  test("AQE skew-join split activates on a planted hot key (skew=true)") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // thresholds scaled down so a ~MB-scale local shuffle partition
      // counts as skewed (production defaults are 256 MB / factor 5)
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      // force a sort-merge join: AQE's skew split only applies to SMJ,
      // and the dim side would otherwise broadcast
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = skewedFact(200000L, 1000)
      val dim = spark.range(1000L).select(col("id").as("k"),
        concat(lit("dim_"), col("id")).as("name"))
      val joined = fact.join(dim, "k")
        .groupBy("name").agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must split the hot key's shuffle partition; plan:\n$plan")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective salted join equals the plain join on skewed data") {
    val fact = skewedFact(20000L, 100)
    val dim = spark.range(100L).select(col("id").as("dk"),
      concat(lit("d"), col("id")).as("name"))
    val salted = Skew.saltedJoin(fact, dim, "k", "dk", col("payload"),
        salts = 4, hotThreshold = 500L)
      .groupBy("name").agg(count(lit(1)).as("n"), sum("payload").as("s"))
      .orderBy("name").collect()
    val plain = fact.join(dim, col("k") === col("dk"))
      .groupBy("name").agg(count(lit(1)).as("n"), sum("payload").as("s"))
      .orderBy("name").collect()
    assert(salted.length == plain.length && salted.nonEmpty)
    salted.zip(plain).foreach { case (a, b) => assert(a == b) }
  }

  test("inputs already named __hotkey/__salt_f survive the salted join") {
    // the schema contract (fact.* ++ dim.* untouched) must hold for
    // ARBITRARY inputs — helper names are derived collision-free, so a
    // fact that happens to carry the old fixed names is neither
    // ambiguous nor dropped
    val fact = skewedFact(2000L, 20)
      .withColumn("__hotkey", col("k") * 10)
      .withColumn("__salt_f", lit(7L))
    val dim = spark.range(20L).select(col("id").as("dk"),
      concat(lit("d"), col("id")).as("name"), lit(3L).as("__salt_d"))
    val salted = Skew.saltedJoin(fact, dim, "k", "dk", col("payload"),
      salts = 4, hotThreshold = 50L)
    assert(salted.columns.toSeq ==
      fact.columns.toSeq ++ dim.columns.toSeq)
    val got = salted.groupBy("name")
      .agg(count(lit(1)).as("n"), sum("__hotkey").as("s"),
        min("__salt_f").as("sf"), min("__salt_d").as("sd"))
      .orderBy("name").collect()
    val plain = fact.join(dim, col("k") === col("dk"))
      .groupBy("name")
      .agg(count(lit(1)).as("n"), sum("__hotkey").as("s"),
        min("__salt_f").as("sf"), min("__salt_d").as("sd"))
      .orderBy("name").collect()
    assert(got.length == plain.length && got.nonEmpty)
    got.zip(plain).foreach { case (a, b) => assert(a == b) }
  }

  test("salting bounds any reducer's share of a hot key at ~1/salts") {
    val salts = 4
    val fact = skewedFact(20000L, 100) // key 0 holds 10k of 20k rows
    // the salted sub-key layout the hot path shuffles on
    val perSubKey = fact
      .withColumn("__salt", pmod(hash(col("payload")), lit(salts)).cast("long"))
      .groupBy(col("k"), col("__salt")).agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val hotTotal = perSubKey.collect { case ((0L, _), n) => n }.sum
    assert(hotTotal == 10000L)
    val maxShard = perSubKey.collect { case ((0L, _), n) => n }.max
    // an even split is hotTotal/salts; allow 30% hash-imbalance slack —
    // the point is no shard carries the whole key
    assert(maxShard <= (hotTotal / salts) * 13 / 10,
      s"hot key must spread over $salts sub-keys, max shard $maxShard")
  }

  test("q125's two-path union touches both paths at sf0.001") {
    // threshold 3 with 1-7 lines per order: both the salted hot path and
    // the plain cold path must carry real rows, or the oracle is proving
    // only one of them
    val f = graft.engine.Tables.lineitem(spark, sf)
      .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
    val hot = f.filter(col("n") > Skew.HOT_THRESHOLD).count()
    val cold = f.filter(col("n") <= Skew.HOT_THRESHOLD).count()
    assert(hot > 0 && cold > 0,
      s"fixture must exercise both paths: hot=$hot cold=$cold")
  }
}
