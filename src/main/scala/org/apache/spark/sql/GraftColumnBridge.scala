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

  /** Register a temp function on a live session (sessionState is
    * sql-private; config-time registration goes through
    * graft.functions.GraftExtensions instead). */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
