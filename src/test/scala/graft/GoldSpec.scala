package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.engine.{Gold, Tables}

/** Gold builders + the write-path round-trip with a partition-pruning
  * assertion (VERDICT r1 "What's missing" #7). */
class GoldSpec extends SparkSpecBase {

  test("factOrders preserves order count, no null PKs, derives date_key") {
    val f = Gold.factOrders(spark, sf)
    val nOrders = Tables.orders(spark, sf).count()
    assert(f.count() == nOrders)
    assert(f.filter(col("order_id").isNull).count() == 0)
    val r = f.filter(col("order_id") === 1).select("date_key", "year", "month").collect()
    if (r.nonEmpty) {
      val (dk, y, m) = (r.head.getLong(0), r.head.getLong(1), r.head.getLong(2))
      assert(dk == y * 10000 + m * 100 + dk % 100)
    }
  }

  test("dimDate covers 1995..2001 with correct weekend flags") {
    val d = Gold.dimDate(spark, sf)
    assert(d.count() == 2557) // 7 years incl. leap days
    val jan1995 = d.filter(col("cal_date") === "1995-01-01").collect().head
    assert(jan1995.getAs[Boolean]("is_weekend")) // a Sunday
    assert(jan1995.getAs[String]("day_name") == "Sunday")
    assert(jan1995.getAs[Long]("date_key") == 19950101L)
  }

  test("dimPart's category join never matches (behavioral parity with the reference)") {
    val p = Gold.dimPart(spark, sf)
    assert(p.filter(col("category_id").isNotNull ||
      col("category_name").isNotNull).count() == 0)
    assert(p.count() == Tables.part(spark, sf).count())
  }

  test("writePartitioned lays out year/month and reads prune partitions") {
    val out = tmpDir("graft-gold") + "/fact_orders"
    Gold.writePartitioned(Gold.factOrders(spark, sf), out)
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("year="))
    assert(dirs.nonEmpty, "expected hive year= partition dirs")

    val back = spark.read.parquet(out)
    val q = back.filter(col("year") === 1995 && col("month") === 3)
    val scans = q.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    // partition filters reached the scan, and only one partition is read
    assert(scans.head.partitionFilters.nonEmpty, "partition filters must reach the scan")
    val selected = scans.head.relation.location.listFiles(
      scans.head.partitionFilters, Nil).map(_.files.size).sum
    val allFiles = scans.head.relation.location.listFiles(Nil, Nil).map(_.files.size).sum
    assert(selected < allFiles, s"pruning must cut files: $selected vs $allFiles")
    // and the pruned read still returns the right rows
    val expected = Gold.factOrders(spark, sf)
      .filter(col("year") === 1995 && col("month") === 3).count()
    assert(q.count() == expected)
  }

  test("dim-side filter dynamically prunes the fact scan (DPP fires)") {
    // the read-path twin of the S4 layout: a fact ⋈ dim_date join whose
    // only date restriction sits on the DIM side must still prune the
    // fact's year/month partitions — via a dynamicpruning subquery on
    // the scan (static pruning can't see through the join; at 100 TB the
    // difference is scanning one year vs the whole table)
    val out = tmpDir("graft-gold-dpp") + "/fact_orders"
    Gold.writePartitioned(Gold.factOrders(spark, sf), out)
    val fact = spark.read.parquet(out)
    val dim = Gold.dimDate(spark, sf)
      .filter(col("month_name") === "March" && col("year") === 1995)
      .select(col("year").as("d_year"), col("month").as("d_month"))
      .distinct()
    val q = fact.join(dim,
        col("year") === col("d_year") && col("month") === col("d_month"))
      .agg(count(lit(1)).as("n"))
    val n = q.collect().head.getLong(0)
    val scans = q.queryExecution.executedPlan.toString
    assert(scans.contains("dynamicpruning"),
      s"fact scan must carry a dynamicpruning subquery:\n$scans")
    val expected = Gold.factOrders(spark, sf)
      .filter(col("year") === 1995 && col("month") === 3).count()
    assert(n == expected)
  }

  test("overwritePartitions rewrites only the updated month (idempotent backfill)") {
    val out = tmpDir("graft-gold-dyn") + "/fact_orders"
    val fact = Gold.factOrders(spark, sf)
    Gold.writePartitioned(fact, out)
    val before = spark.read.parquet(out)
    val othersBefore = before.filter(!(col("year") === 1995 && col("month") === 3))
      .count()
    val targetBefore = before.filter(col("year") === 1995 && col("month") === 3)
      .count()
    assert(targetBefore > 0, "need a non-empty month to rewrite")
    // materialize BEFORE the overwrite replaces the partition's files
    val sumBefore = before.filter(col("year") === 1995 && col("month") === 3)
      .agg(sum(graft.engine.Num.cents(col("total_price")))).collect().head.getLong(0)

    // backfill: re-run one month with corrected prices (doubled)
    val corrected = fact.filter(col("year") === 1995 && col("month") === 3)
      .withColumn("total_price", col("total_price") * 2)
    Gold.overwritePartitions(corrected, out)

    val after = spark.read.parquet(out)
    // untouched partitions: same rows as before
    assert(after.filter(!(col("year") === 1995 && col("month") === 3)).count()
      == othersBefore)
    // rewritten partition: new values, same row count
    val target = after.filter(col("year") === 1995 && col("month") === 3)
    assert(target.count() == targetBefore)
    val sumAfter = target
      .agg(sum(graft.engine.Num.cents(col("total_price")))).collect().head.getLong(0)
    assert(sumAfter == 2 * sumBefore)
  }

  test("dimReview sentiment derivation is total on matched rows") {
    val r = Gold.dimReview(spark, sf)
    assert(r.filter(col("sentiment_score").isNotNull &&
      col("sentiment_label").isNull).count() == 0)
  }
}
