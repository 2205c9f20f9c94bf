package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Column ⇄ Expression bridge for function registration: Spark 4 moved the
  * classic conversions behind `private[sql]`, so this one-file subpackage of
  * org.apache.spark.sql re-exposes exactly the two conversions
  * GraftExtensions needs. No Spark internals are reimplemented here.
  *
  * The Column→Expression direction converts EAGERLY (the converter walks
  * the ColumnNode tree into real catalyst nodes): the lazy
  * `ExpressionUtils.expression` wrapper stays Unevaluable when returned
  * from a FunctionRegistry builder, because analysis has already passed the
  * point where the wrapper would be unwrapped.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter.apply(c.node)
}
