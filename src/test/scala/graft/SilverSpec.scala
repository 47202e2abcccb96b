package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.{Schemas, Silver, Tables}

/** V1–V3 + A5 + FK checks (SURVEY.md §2.11) — the components VERDICT r1
  * flagged as dead code. */
class SilverSpec extends SparkSpecBase {
  import spark.implicits._

  test("enforce reconciles column order, drops extras, upcasts") {
    val df = Seq((1, "EUROPE", 99)).toDF("r_regionkey", "r_name", "extra")
      .select(col("r_name"), col("r_regionkey"), col("extra"))
    val out = Silver.enforce(df, Schemas.region)
    assert(out.schema.fieldNames.toSeq == Seq("r_regionkey", "r_name"))
    assert(out.collect().head.getInt(0) == 1)
  }

  test("enforce casts int<->long in both directions (df.to downcasts silently — documented risk)") {
    val longSchema = StructType(Seq(StructField("k", LongType)))
    val up = Silver.enforce(Seq(7).toDF("k"), longSchema)
    assert(up.schema("k").dataType == LongType)
    assert(up.collect().head.getLong(0) == 7L)
    // NOTE: df.to does NOT reject narrowing casts — long→int is applied
    // silently (in-range values preserved). Declared schemas must therefore
    // be at least as wide as the source; validate() catches declared-vs-
    // actual type drift before enforce would mask it.
    val intSchema = StructType(Seq(StructField("k", IntegerType)))
    val down = Silver.enforce(Seq(7L).toDF("k"), intSchema)
    assert(down.schema("k").dataType == IntegerType)
    assert(down.collect().head.getInt(0) == 7)
  }

  test("enforce keeps nulls under nullable target (df.to nullability is lazy — SURVEY §7 risk 3)") {
    val df = Seq(Some("x"), None).toDF("r_name")
      .withColumn("r_regionkey", lit(1))
      .select("r_regionkey", "r_name")
    val out = Silver.enforce(df, Schemas.region).collect()
    assert(out.count(_.isNullAt(1)) == 1)
  }

  test("validate accepts a conforming frame and rejects missing/mistyped fields") {
    val good = Tables.region(spark, sf)
    Silver.validate(good, Schemas.region) // must not throw
    val missing = good.drop("r_name")
    val e1 = intercept[IllegalArgumentException](Silver.validate(missing, Schemas.region))
    assert(e1.getMessage.contains("missing field"))
    val mistyped = good.withColumn("r_name", lit(1))
    val e2 = intercept[IllegalArgumentException](Silver.validate(mistyped, Schemas.region))
    assert(e2.getMessage.contains("type mismatch"))
  }

  test("dedup is idempotent and keyed dedup keeps one row per key") {
    val li = Tables.lineitem(spark, sf)
    val once = Silver.dedup(li)
    assert(once.count() == Silver.dedup(once).count())
    val keyed = Silver.dedup(li, Seq("l_orderkey"))
    assert(keyed.count() == li.select("l_orderkey").distinct().count())
  }

  test("fkOrphans finds planted orphans and nothing else") {
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf)
    assert(Silver.fkOrphans(o, c, col("o_custkey") === col("c_custkey")).count() == 0)
    val withOrphan = o.unionAll(o.limit(1).withColumn("o_custkey", lit(-1L)))
    assert(Silver.fkOrphans(withOrphan, c,
      col("o_custkey") === col("c_custkey")).count() == 1)
  }

  test("enumViolations flags out-of-domain and null values only") {
    val o = Tables.orders(spark, sf)
    assert(Silver.enumViolations(o, "o_orderstatus",
      Schemas.enums(("orders", "o_orderstatus"))).count() == 0)
    val bad = o.limit(3).withColumn("o_orderstatus", lit("ZZ"))
      .unionAll(o.limit(2).withColumn("o_orderstatus", lit(null: String)))
    assert(Silver.enumViolations(bad, "o_orderstatus",
      Schemas.enums(("orders", "o_orderstatus"))).count() == 5)
  }
}
