package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column ↔ Expression conversion so
  * graft can surface custom Catalyst Expressions as user-facing Columns.
  * Spark 4 removed the public `new Column(expr)` constructor; the
  * supported conversion lives in `classic.ExpressionUtils`, which is
  * sql-private — hence this one-file shim in the sql package (the same
  * pattern Spark connector/extension libraries use).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Session-converted catalyst expression for a Column. Unlike
    * `expression(c)` (a lazy ColumnNode wrapper that only standard
    * Dataset operations later convert), this runs the session's
    * ColumnNode→Expression converter eagerly — required when the
    * expression is embedded in a CUSTOM logical plan, where the generic
    * analyzer resolution sees the expression tree as-is. */
  def expression(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[classic.SparkSession].expression(c)

  /** Register a temp function on a live session (sessionState is
    * sql-private; config-time registration goes through
    * graft.functions.GraftExtensions instead). */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")

  /** Wrap a custom LogicalPlan as a DataFrame (`Dataset.ofRows` is
    * sql-private in Spark 4). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan backing a DataFrame. */
  def logicalPlan(df: DataFrame):
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Install an extra planner strategy on a live session (the
    * config-time path is `spark.sql.extensions`). */
  def addStrategy(spark: SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Unit =
    if (!spark.experimental.extraStrategies.contains(strategy)) {
      spark.experimental.extraStrategies =
        strategy +: spark.experimental.extraStrategies
    }
}
