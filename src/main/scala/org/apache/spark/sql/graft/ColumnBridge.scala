package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column representation-agnostic and gated the classic
  * Column↔Expression bridge behind private[sql]. Custom Catalyst
  * expressions (graft.expressions.*) need that bridge to surface as
  * Columns, so this shim lives in the sql package tree — the standard
  * pattern for Catalyst-extending libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
