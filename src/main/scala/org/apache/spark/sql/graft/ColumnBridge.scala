package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Bridge between the public Column API and Catalyst Expressions.
  * Spark 4 hides `Column.expr` behind `private[sql]` ColumnNode
  * plumbing; extension libraries that ship custom Expressions (as this
  * one does for text hashing) need exactly these two conversions.
  *
  * Column → Expression uses the eager converter, not
  * ExpressionUtils.expression: the lazy ColumnNodeExpression wrapper
  * reports itself resolved, so UnresolvedFunctions hidden inside it
  * would never be analyzed when the expression is returned from a
  * FunctionRegistry builder (GraftFunctions).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)
}

/** Non-blocking access to Observation metrics: `Observation.get` blocks
  * indefinitely and `getOrEmpty` is private[sql] — RuleEngine polls
  * this to read the row counter its batch rules observe.
  */
object ObservationBridge {
  def getOrEmpty(obs: org.apache.spark.sql.Observation): Map[String, Any] =
    obs.getOrEmpty
}
