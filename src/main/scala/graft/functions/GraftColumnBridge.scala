package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the private[sql] Column <-> Expression conversions
  * (org.apache.spark.sql.classic.ExpressionUtils) for the engine's custom
  * Catalyst expressions. Lives in the org.apache.spark.sql package solely
  * to satisfy the private[sql] access qualifier — standard extension
  * pattern for libraries shipping native expressions. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
