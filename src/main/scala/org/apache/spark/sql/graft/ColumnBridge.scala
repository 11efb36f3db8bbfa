package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4.x made the Column <-> catalyst Expression bridge `private[sql]`
  * (columnNodeSupport.scala). This shim re-exports the two conversions for
  * graft's custom expressions — the standard pattern for libraries that ship
  * native Catalyst expressions against the classic API. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
