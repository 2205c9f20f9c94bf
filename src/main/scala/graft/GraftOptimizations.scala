package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.ArrayType
import graft.functions.expressions.ArrayIntersectSize

/** Catalyst optimizer rule (SURVEY.md §7.4 ladder, the `Rule[LogicalPlan]`
  * rung): users who write the natural `size(array_intersect(a, b))` get the
  * allocation-free counting expression automatically — the built-in
  * materializes the intersection array only for `size` to discard it.
  *
  * Rewrite fires only for `legacySizeOfNull = false` (the default):
  * under the legacy flag `size(null)` is -1 while the counting expression
  * is null-propagating, so legacy plans are left untouched. It also fires
  * only for element types whose HashSet equality matches the built-in
  * (string/integral/boolean/date/timestamp — NOT float/double, binary, or
  * nested types, where java equality diverges from array_intersect's:
  * 0.0 vs -0.0, identity-equals byte arrays, mixed row representations).
  *
  * Installed via GraftExtensions (builder path) or
  * [[GraftOptimizations.install]] on a live session
  * (`spark.experimental.extraOptimizations`).
  */
object IntersectSizeRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ai @ ArrayIntersect(a, b), false)
          if (ai.dataType match {
            case ArrayType(et, _) => ArrayIntersectSize.supportsElementType(et)
            case _ => false
          }) => ArrayIntersectSize(a, b)
    }
}

object GraftOptimizations {
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(IntersectSizeRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ IntersectSizeRewrite
}
