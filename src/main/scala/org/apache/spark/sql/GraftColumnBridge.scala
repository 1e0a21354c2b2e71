package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-private Column ⇄ Expression converters (Spark 4 moved
  * Column onto ColumnNode; `classic.ExpressionUtils` is private[sql]).
  * Lives in the spark.sql package purely for access; no Spark internals
  * are modified.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Eagerly converts the ColumnNode tree to a catalyst expression (the
    * lazy `ExpressionUtils.expression` wrapper survives into codegen
    * unresolved when embedded via a function-registry builder).
    */
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** DataFrame over a logical plan (`Dataset.ofRows` is private[sql]) —
    * lets table-function builders hand a TABLE(...) argument's plan to the
    * DataFrame-level operators and return the composed plan.
    */
  def dataset(spark: SparkSession,
              plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (classic-only API). */
  def plan(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed
}
