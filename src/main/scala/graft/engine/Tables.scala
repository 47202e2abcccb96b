package graft.engine

import java.util.Locale

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Loaders for the driver testdata layout (TESTDATA.md): one parquet file per
  * table under `/root/testdata/sf{0.001,0.01,0.1}/`.
  *
  * Mirrors the reference's source surface (SURVEY.md §2.1): the reference
  * reads JDBC tables (bronze_ingestion_script.py:49–57) and catalog/parquet
  * tables (transformations_script.py:147–153); here the analogous scan is a
  * plain parquet scan, which keeps Catalyst pushdown/pruning intact (the
  * `.explain` of every downstream query shows `PushedFilters`/`ReadSchema`
  * reaching these scans).
  *
  * At 100 TB these would be partitioned/bucketed table scans behind the same
  * `DataFrame` surface — nothing downstream assumes single-file inputs.
  */
object Tables {
  // Month/day names produced by date_format("MMMM"/"EEEE") must match
  // DuckDB's English monthname()/dayname() regardless of container locale.
  Locale.setDefault(Locale.US)

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** The events table stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects ([PARQUET_TYPE_ILLEGAL]). Read it as raw nanos
    * (legacy conf) and convert to TimestampType via exact integer division —
    * the same ns→µs truncation DuckDB's epoch_us() applies on its side. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
