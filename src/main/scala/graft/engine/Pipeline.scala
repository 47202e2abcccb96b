package graft.engine

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions.{count, lit}

import graft.sources.Sources

/** Sequential medallion pipeline runner with retry (O1/O2, SURVEY.md §2.12):
  * the reference's Step Functions DAG (extract → silver → gold, ref
  * stepfunctions.tf:8–226) with its 3-attempt / 2×-backoff retry policy
  * (ref stepfunctions.tf:17–22), as ordinary sequential Scala.
  *
  * Layering composes through the filesystem exactly like the reference's
  * S3 buckets: each stage writes `$out/<layer>/<table>.parquet` and the next
  * stage reads it back through the same [[Tables]] loaders (the layout is
  * loader-compatible by construction). Gold facts land hive-partitioned by
  * year/month ([[Gold.writePartitioned]]) so downstream readers get
  * partition pruning — the reference's one real performance feature.
  */
object Pipeline {

  /** O2 — retry with exponential backoff (3 attempts, 2× — ref
    * stepfunctions.tf:17–22). Deliberately driver-side control flow: retry
    * wraps whole stages, never per-row work. */
  def retry[T](attempts: Int = 3, initialBackoffMs: Long = 1000)(f: => T): T = {
    var backoff = initialBackoffMs
    var left = attempts
    while (true) {
      try return f
      catch {
        // NonFatal only: retrying after an OutOfMemoryError re-runs a full
        // stage on a corrupted heap, and swallowing InterruptedException
        // breaks cancellation — both must propagate immediately.
        case e: Throwable if scala.util.control.NonFatal(e) && left > 1 =>
          left -= 1
          Thread.sleep(backoff)
          backoff *= 2
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Full bronze→silver→gold run from a testdata dir into `$out/...`.
    * Returns the per-stage names executed (for the smoke test). */
  def run(spark: SparkSession, sfDir: String, out: String,
          initialBackoffMs: Long = 1000): Seq[String] = {
    val stages = Seq[(String, () => Unit)](
      "bronze" -> (() => bronze(spark, sfDir, out)),
      "silver" -> (() => silver(spark, out)),
      "gold"   -> (() => gold(spark, out)))
    stages.map { case (name, stage) =>
      retry(3, initialBackoffMs)(stage())
      name
    }
  }

  /** Bronze: land every source table as parquet, overwrite mode (ref
    * bronze_ingestion_script.py:60–61). One table routes through CSV to
    * exercise the S8 reader on real pipeline data. */
  def bronze(spark: SparkSession, sfDir: String, out: String): Unit =
    Tables.names.foreach { t =>
      val df = t match {
        // events: ns→µs timestamp normalization happens at ingest
        case "events" => Tables.events(spark, sfDir)
        case "nation" =>
          // CSV detour: land+read the nation table as headered CSV (S8)
          Sources.writeCsv(Tables.raw(spark, sfDir, "nation"), s"$out/landing/nation_csv")
          Sources.readCsv(spark, s"$out/landing/nation_csv", Schemas.nation)
        case other => Tables.raw(spark, sfDir, other)
      }
      df.write.mode("overwrite").parquet(s"$out/bronze/$t.parquet")
    }

  /** Silver: schema enforce + validate + dedup per table (ref
    * transformations_script.py:147–181). Returns per-table
    * (rows_in, rows_out) read from `observe()` metrics — row accounting
    * piggybacks on the write job itself (CollectMetrics), so the audit
    * costs zero extra passes over the data. The reference logs row counts
    * per table (transformations_script.py:171) with separate count()
    * actions; at 100 TB a second pass per table is a second full scan. */
  def silver(spark: SparkSession, out: String): Map[String, (Long, Long)] =
    Tables.names.map { t =>
      val obsIn = Observation(s"silver_in_$t")
      val obsOut = Observation(s"silver_out_$t")
      val raw = Tables.raw(spark, s"$out/bronze", t)
        .observe(obsIn, count(lit(1)).as("n"))
      val enforced = Schemas.all.get(t).map { s =>
        val e = Silver.enforce(raw, s)
        Silver.validate(e, s)
        e
      }.getOrElse(raw)
      Silver.dedup(enforced)
        .observe(obsOut, count(lit(1)).as("n"))
        .write.mode("overwrite").parquet(s"$out/silver/$t.parquet")
      t -> (obsIn.get("n").asInstanceOf[Long], obsOut.get("n").asInstanceOf[Long])
    }.toMap

  /** Gold: star-schema builders over the silver layer, fact partitioned by
    * year/month, dims unpartitioned (ref gold_data_curation_script.py). */
  def gold(spark: SparkSession, out: String): Unit = {
    val silverDir = s"$out/silver"
    Gold.writePartitioned(Gold.factOrders(spark, silverDir), s"$out/gold/fact_orders")
    Gold.writeDim(Gold.dimDate(spark, silverDir), s"$out/gold/dim_date")
    Gold.writeDim(Gold.dimCustomer(spark, silverDir), s"$out/gold/dim_customer")
    Gold.writeDim(Gold.dimRegionNation(spark, silverDir), s"$out/gold/dim_region_nation")
    Gold.writeDim(Gold.dimPart(spark, silverDir), s"$out/gold/dim_part")
    Gold.writeDim(Gold.dimReview(spark, silverDir), s"$out/gold/dim_review")
    Gold.writeDim(Gold.dimDispute(spark, silverDir), s"$out/gold/dim_dispute")
  }
}
