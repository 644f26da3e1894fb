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

  /** EAGER Column → Expression conversion: `expression` returns a lazy
    * ColumnNodeExpression wrapper (whose `.sql` renders as a fake function
    * call), while this walks the column node tree to the real Catalyst
    * expression — what rule-config export needs to render SQL. */
  def resolvedExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
