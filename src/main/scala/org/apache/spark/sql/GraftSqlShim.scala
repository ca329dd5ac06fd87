package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to two `private[sql]` seams the public API doesn't expose
  * in Spark 4 (the Column/ColumnNode split moved Column↔Expression
  * conversion behind `classic.ExpressionUtils`): wrap a custom Catalyst
  * Expression as a Column and back. Nothing else is reached through here. */
object GraftSqlShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Idempotent runtime registration of a scalar function builder. */
  def registerFunction(
      spark: SparkSession,
      name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression
  ): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
