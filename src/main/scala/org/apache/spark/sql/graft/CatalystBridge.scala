package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  * Spark 4 hides the Expression-backed Column constructor behind
  * `private[sql]` (columnNodeSupport.scala); extension libraries reach
  * it from a subpackage of org.apache.spark.sql — the standard pattern
  * for Catalyst-level extensions.
  */
object CatalystBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
