package graft

import org.apache.spark.sql.functions._

import graft.engine.{Pipeline, Tables}

/** O1/O2 — end-to-end medallion smoke test at sf0.001 + retry semantics. */
class PipelineSpec extends SparkSpecBase {

  test("retry succeeds after transient failures with 2x backoff") {
    var calls = 0
    val out = Pipeline.retry(attempts = 3, initialBackoffMs = 1) {
      calls += 1
      if (calls < 3) sys.error("transient")
      "ok"
    }
    assert(out == "ok" && calls == 3)
  }

  test("retry rethrows after exhausting attempts") {
    var calls = 0
    intercept[RuntimeException] {
      Pipeline.retry(attempts = 3, initialBackoffMs = 1) {
        calls += 1; sys.error("permanent")
      }
    }
    assert(calls == 3)
  }

  test("silver observe() metrics account rows without extra passes") {
    val out = tmpDir("graft-pipeline-obs")
    Pipeline.bronze(spark, sf, out)
    val metrics = Pipeline.silver(spark, out)
    assert(metrics.keySet == Tables.names.toSet)
    metrics.foreach { case (t, (rowsIn, rowsOut)) =>
      assert(rowsIn >= rowsOut, s"$t: dedup cannot add rows")
      // the observed output count must equal what actually landed
      assert(rowsOut == Tables.table(spark, s"$out/silver", t).count(),
        s"$t: observed rows_out != written rows")
    }
    // observed input/output counts match the independent batch counts
    metrics.foreach { case (t, (rowsIn, rowsOut)) =>
      assert(rowsIn == Tables.raw(spark, s"$out/bronze", t).count())
      assert(rowsOut ==
        Tables.raw(spark, s"$out/bronze", t).dropDuplicates().count())
    }
  }

  test("bronze->silver->gold runs end-to-end and lands a partitioned fact") {
    val out = tmpDir("graft-pipeline")
    val stages = Pipeline.run(spark, sf, out, initialBackoffMs = 1)
    assert(stages == Seq("bronze", "silver", "gold"))

    // silver landed every table, readable through the same loaders
    assert(Tables.table(spark, s"$out/silver", "orders").count() ==
      Tables.orders(spark, sf).count())
    // CSV-detoured nation survived the format round-trip
    assert(Tables.table(spark, s"$out/silver", "nation").count() == 25)

    // gold fact is hive-partitioned and complete
    val fact = spark.read.parquet(s"$out/gold/fact_orders")
    assert(fact.count() == Tables.orders(spark, sf).count())
    val parts = new java.io.File(s"$out/gold/fact_orders")
      .listFiles().map(_.getName).filter(_.startsWith("year="))
    assert(parts.nonEmpty)
    // dims landed
    assert(spark.read.parquet(s"$out/gold/dim_date").count() == 2557)
    assert(spark.read.parquet(s"$out/gold/dim_review")
      .filter(col("review_id").isNull).count() == 0)
  }
}
