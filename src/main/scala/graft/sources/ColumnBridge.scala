package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the classic Column ↔ catalyst Expression converters,
  * which are `private[sql]` in Spark 4 (columnNodeSupport.scala). The
  * graft custom expressions ([[graft.sources.LineParseExpr]]) need a
  * Column wrapper for the DataFrame API; this is the supported classic
  * conversion, just re-exported — no behavior of Spark is touched. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
