package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Sources

/** S8 — CSV/JSON readers, incl. the reference's hardest fixture shape:
  * multi-line quoted text fields (dummy_data_v2/quote_requests.csv). */
class SourcesSpec extends SparkSpecBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("body", StringType)))

  test("CSV survives embedded newlines, quotes and commas under multiLine") {
    val df = Seq(
      (1L, "plain text"),
      (2L, "line one\nline two, with comma"),
      (3L, "a \"quoted\" phrase")).toDF("id", "body")
    val path = tmpDir("graft-csv")
    Sources.writeCsv(df, path)
    val back = Sources.readCsv(spark, path, schema)
    assert(back.count() == 3)
    val m = back.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(2L) == "line one\nline two, with comma")
    assert(m(3L) == "a \"quoted\" phrase")
  }

  test("JSON round-trips with explicit schema") {
    val df = Seq((1L, "x"), (2L, null.asInstanceOf[String])).toDF("id", "body")
    val path = tmpDir("graft-json")
    Sources.writeJson(df, path)
    val back = Sources.readJson(spark, path, schema)
    assert(back.count() == 2)
    assert(back.filter(col("body").isNull).count() == 1)
  }
}
