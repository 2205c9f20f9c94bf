package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.functions.expressions.{ArrayIntersectSize, XxHash64Elements}

/** Column fronts for the native array expressions. */
object ArrayFunctions {
  /** `|distinct(a) ∩ b|` == `size(array_intersect(a, b))`, allocation-free. */
  def intersectSize(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayIntersectSize(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Per-element xxhash64 == `transform(a, t => xxhash64(t))`, codegen'd
    * (the transform lambda runs interpreted — bit identity pinned in
    * VectorExpressionsSpec).
    */
  def xxhash64Elements(a: Column): Column =
    ColumnBridge.column(XxHash64Elements(ColumnBridge.expression(a)))
}
