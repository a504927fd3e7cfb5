package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Catalyst Expression bridge for Spark 4's classic runtime
  * (the public `Column(Expression)` constructor was removed in the Spark
  * Connect refactor; `ExpressionUtils` is `private[sql]`, hence this shim
  * package — the standard pattern for connector libraries shipping native
  * expressions).
  */
object Exprs {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
}
