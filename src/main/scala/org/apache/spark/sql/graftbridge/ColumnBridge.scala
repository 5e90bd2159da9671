package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge.
  *
  * Spark 4 moved `Column` to the backend-agnostic sql-api layer; the classic
  * converters (`ExpressionUtils.column/expression`) are `private[sql]`, so a
  * library registering its own Catalyst expressions needs this one-file shim
  * inside the `org.apache.spark.sql` package tree — the same technique Spark
  * connectors use. No other internals are touched.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
