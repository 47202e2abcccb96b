package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.sources.Jdbc

/** S1/S7 — JDBC source + sink with DDL preaction, against embedded Derby
  * (the only JDBC engine shipped in /opt/spark/jars). The production path
  * (Postgres/Redshift) differs only in url/driver. */
class JdbcSpec extends SparkSpecBase {
  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("sink with DDL preaction then source round-trips the nation table") {
    val nation = Tables.nation(spark, sf)
    Jdbc.write(nation, url, "nation_rt",
      ddlPreaction = Some(
        "CREATE TABLE nation_rt (n_nationkey INT, n_name VARCHAR(64), n_regionkey INT)"),
      mode = SaveMode.Append)
    val back = Jdbc.read(spark, url, "nation_rt")
    assert(back.count() == nation.count())
    // Derby uppercases identifiers; compare case-insensitively.
    val names = back.columns.map(_.toLowerCase).toSet
    assert(names == Set("n_nationkey", "n_name", "n_regionkey"))
    val spark25 = back.filter(col("N_NATIONKEY") === 24).select("N_NAME")
      .collect().map(_.getString(0))
    val orig = nation.filter(col("n_nationkey") === 24).select("n_name")
      .collect().map(_.getString(0))
    assert(spark25.sameElements(orig))
  }

  test("append mode accumulates across writes (warehouse-load semantics)") {
    val region = Tables.region(spark, sf)
    Jdbc.write(region, url, "region_rt",
      ddlPreaction = Some("CREATE TABLE region_rt (r_regionkey INT, r_name VARCHAR(64))"))
    Jdbc.write(region, url, "region_rt") // no preaction on second load
    assert(Jdbc.read(spark, url, "region_rt").count() == 2 * region.count())
  }
}
