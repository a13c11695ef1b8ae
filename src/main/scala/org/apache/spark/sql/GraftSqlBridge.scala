package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` Column↔Expression conversion, so
  * graft's custom Catalyst expressions (e.g. `graft.functions.DotProduct`)
  * can be exposed through the public Column API. This is the conventional
  * pattern for third-party Catalyst extensions; nothing else from the
  * private surface is touched.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a (resolved) logical plan as a DataFrame — how the MV gates
    * return the ALREADY-REWRITTEN plan, so `graft.plans.MvRewrite` can
    * be uninstalled at gate exit while the caller's terminal action
    * still executes the routed (MV-reading) plan.
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
