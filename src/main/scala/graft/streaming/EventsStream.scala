package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.engine.{Num, Schemas}

/** Structured Streaming surface (SURVEY.md §2.9 — optional in the
  * reference, which is batch-only; this is the streaming twin of
  * [[graft.engine.Kpis.eventsHourly]]).
  *
  * `groupBy(window(...))` is the *same* operator in batch and streaming —
  * the plan below is byte-for-byte the batch aggregation plus a watermark,
  * which is what lets StreamingSpec assert stream ≡ batch on a static
  * directory.
  *
  * At scale: the file source lists new files incrementally; the watermark
  * bounds state (closed hour windows are evicted); `event_type` cardinality
  * keys the state store. For a 100 TB/day stream the only knobs that change
  * are trigger interval and state-store provider (RocksDB).
  */
object EventsStream {

  /** Raw on-disk schema of the events table: `ts` is parquet
    * TIMESTAMP(NANOS), scanned as long under nanosAsLong. */
  val rawSchema: StructType = StructType(
    Schemas.events.map {
      case StructField("ts", _, n, m) => StructField("ts", LongType, n, m)
      case f => f
    })

  /** Hourly tumbling-window aggregate over a parquet file stream, 2-hour
    * watermark for late data. Columns match Kpis.eventsHourly exactly. */
  def hourly(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(rawSchema)
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        Num.dollars(sum(Num.cents(col("value")))).as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n_events"), col("total_value"))
      .withColumn("avg_value", col("total_value") / col("n_events"))
}
