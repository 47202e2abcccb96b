package graft.sources

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source + sink (S1/S7, SURVEY.md §2.1): the reference's entry point
  * (per-table JDBC scans of PostgreSQL, ref bronze_ingestion_script.py:49–57)
  * and exit point (Redshift load with a `CREATE TABLE IF NOT EXISTS` DDL
  * preaction, ref s3_to_redshift_script.py:48–130, :149–162).
  *
  * The surface is plain `spark.read/write.format("jdbc")` so Catalyst's JDBC
  * pushdown (filters, column pruning, `partitionColumn` parallel scans)
  * applies unchanged. Locally exercised against embedded Derby
  * (`jdbc:derby:memory:…`, the only JDBC engine in /opt/spark/jars) by
  * JdbcSpec; against a warehouse the url/driver are the only difference.
  *
  * At scale: reads should pass `partitionColumn/lowerBound/upperBound/
  * numPartitions` (one JDBC connection per partition); writes batch via
  * `batchsize`. Both are pass-through options here.
  */
object Jdbc {

  def read(spark: SparkSession, url: String, table: String,
           options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(options)
      .load()

  /** Write with optional DDL preaction, the reference's
    * CREATE-TABLE-IF-NOT-EXISTS-then-append pattern. The preaction runs on
    * the driver over a plain JDBC connection before the distributed write
    * (exactly like Glue's `preactions`). */
  def write(df: DataFrame, url: String, table: String,
            ddlPreaction: Option[String] = None,
            mode: SaveMode = SaveMode.Append): Unit = {
    ddlPreaction.foreach { ddl =>
      val conn = DriverManager.getConnection(url, new Properties())
      try {
        val st = conn.createStatement()
        try st.execute(ddl) finally st.close()
      } finally conn.close()
    }
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .mode(mode)
      .save()
  }
}
