package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The two `private[sql]` touchpoints a library needs to hand Catalyst a
  * custom [[LogicalPlan]] node (`Dataset.ofRows`) and to read a frame's
  * analyzed plan (attribute resolution for the node's expressions). Lives
  * under `org.apache.spark.sql.graft` for exactly that access and nothing
  * else — every other line of this repo stays on public API. This is the
  * standard integration shim shape used by open Spark extensions
  * (Delta/Sedona/Iceberg all carry one). */
object Shim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed
}
