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

  /** Wrap a manually built LogicalPlan as a DataFrame (Dataset.ofRows is
    * private[sql] in Spark 4) — needed by operators that construct
    * custom logical nodes (graft.plans.AsofMergeJoin).
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
