package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-format sources/sinks beyond parquet (S8, SURVEY.md §2.1): the
  * reference's bronze layer lands CSV/JSON (ref README.md:49; all fixtures
  * are CSV under dummy_data_v2/, incl. multi-line quoted text in
  * quote_requests.csv).
  *
  * Readers take an **explicit schema** — schema inference reads the data
  * twice and guesses types, both wrong at 100 TB. Options mirror what the
  * reference's fixtures need: header row, quoted fields, embedded newlines
  * (`multiLine`).
  */
object Sources {

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true, multiLine: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("multiLine", multiLine.toString)
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite")
      .option("header", header.toString)
      .option("quote", "\"")
      .option("escape", "\"")
      // Spark's CSV writer trims field whitespace by DEFAULT — silent
      // corruption of any text value with leading/trailing spaces (and a
      // round-trip that no longer equals the parquet original).
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** ORC — the other columnar interchange format warehouses hand around;
    * types round-trip losslessly (unlike CSV), so the reader takes the
    * written schema as-is. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** XML — Spark 4's native XML source (the Databricks spark-xml lineage,
    * merged upstream): row-per-element with an explicit schema, the
    * interchange shape B2B feeds still arrive in. Explicit `rowTag` on
    * both sides; schema passed to the reader for the same
    * no-inference-at-scale reason as CSV/JSON. */
  def readXml(spark: SparkSession, path: String, schema: StructType,
              rowTag: String): DataFrame =
    spark.read.schema(schema).option("rowTag", rowTag).xml(path)

  def writeXml(df: DataFrame, path: String, rowTag: String): Unit =
    df.write.mode("overwrite").option("rowTag", rowTag).xml(path)
}
