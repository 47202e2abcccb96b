package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the `private[sql]` Column↔Expression converters —
  * the supported way for a library to expose a custom Catalyst
  * [[Expression]] as a user-facing [[Column]] (same technique as
  * spark-connectors in the wild: a tiny object inside the sql package
  * namespace, nothing else). */
object SqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
