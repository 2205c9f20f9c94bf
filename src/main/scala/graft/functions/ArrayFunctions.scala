package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.functions.expressions.ArrayIntersectSize

/** Column fronts for the native array expressions. */
object ArrayFunctions {
  /** `|distinct(a) ∩ b|` == `size(array_intersect(a, b))`, allocation-free. */
  def intersectSize(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayIntersectSize(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
