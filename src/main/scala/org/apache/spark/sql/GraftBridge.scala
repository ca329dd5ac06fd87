package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to Spark's private[sql] Column↔Expression conversions
  * (Spark 4 moved `Column.expr` behind `classic.ExpressionUtils`). Standard
  * extension-library pattern: one object inside the spark.sql package, no
  * behavior of its own. */
object GraftBridge {
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
}
