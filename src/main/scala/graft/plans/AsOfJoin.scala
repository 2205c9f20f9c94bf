package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native AS-OF join (SURVEY.md §7.4 ladder, case (c) — the whole-operator
  * rung: custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`, registered
  * through the same `extraStrategies`/`SparkSessionExtensions` seam as the
  * optimizer rules). Inner as-of with a lookback tolerance: each left row
  * matches the LATEST right row with the same key and
  * `rightTime ∈ (leftTime − tolerance, leftTime]`; `rightTieBreak` makes
  * the pick total when right times tie (max tie-break value wins, matching
  * the `ORDER BY time DESC, id DESC … rn = 1` composition).
  *
  * Why a custom operator: the composable forms are either a banded
  * interval join + per-left-row window (an extra shuffle + a sort over the
  * CANDIDATE blow-up — every left row materializes its whole lookback
  * window before rank-1 keeps one row) or a union-tag trick. This node
  * declares `ClusteredDistribution`(key) + (key, time, tie) ordering on
  * BOTH children and lets `EnsureRequirements` insert the exchanges/sorts —
  * the planner still owns data movement — then streams ONE O(n+m) merge
  * pass per partition holding exactly one buffered right row. No candidate
  * multiplication, no window state: the 100 TB shape for event-to-quote /
  * attribution joins.
  *
  * Contract: `leftTime`/`rightTime` evaluate to LongType (micros — cast
  * timestamps with `unix_micros`); keys share a dataType; null key or time
  * never matches. Output = left.output ++ right.output: matched rows only
  * when inner, every left row when `isOuter` (unmatched — including
  * null-key/time left rows, SQL LEFT JOIN style — carry a nulled right
  * side, and the right attributes turn nullable).
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Expression,
    toleranceMicros: Long,
    isOuter: Boolean = false) extends BinaryNode {
  // left-outer keeps every left row (SQL LEFT JOIN semantics: null key /
  // time rows survive too) with the right side nulled when unmatched
  override def output: Seq[Attribute] =
    if (isOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] into [[AsOfJoinExec]]; installed next to the
  * optimizer rules in `GraftOptimizations.install` /
  * `GraftExtensions.apply`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, rtb, tol, outer) =>
      AsOfJoinExec(lk, rk, lt, rt, rtb, tol, outer,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sorted-merge as-of physical operator. Children arrive key-clustered and
  * (key, time, tie)-sorted — `requiredChildDistribution` /
  * `requiredChildOrdering` declare it, EnsureRequirements provides it —
  * so each partition is one forward scan: advance the right iterator while
  * its (key, time) is ≤ the current left row's, remembering only the last
  * same-key right row seen (that row IS the rank-1 candidate: latest time,
  * and among equal times the greatest tie-break, because the sort put it
  * last). Emit when it is inside the tolerance window. State: ONE copied
  * right row; complexity O(|left| + |right|) per partition.
  */
case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Expression,
    toleranceMicros: Long,
    isOuter: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    if (isOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTieBreak, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val tol = toleranceMicros
    val outer = isOuter
    val nRightCols = right.output.size
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val lkBound = BindReferences.bindReference(leftKey, left.output)
    val ltBound = BindReferences.bindReference(leftTime, left.output)
    val rkBound = BindReferences.bindReference(rightKey, right.output)
    val rtBound = BindReferences.bindReference(rightTime, right.output)
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight: InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(nRightCols)
      new Iterator[InternalRow] {
        // one-row lookahead into the right side (rows are reused buffers —
        // anything retained across next() must be copied)
        private var rHead: InternalRow = advanceRight()
        private var bestKey: Any = null
        private var bestTime: Long = 0L
        private var bestRow: InternalRow = null
        private var pending: InternalRow = null

        private def advanceRight(): InternalRow = {
          while (rIter.hasNext) {
            val r = rIter.next()
            if (rkBound.eval(r) != null && rtBound.eval(r) != null) return r
          }
          null
        }

        private def findNext(): Unit = {
          while (pending == null && lIter.hasNext) {
            val l = lIter.next()
            val lk = lkBound.eval(l)
            val ltv = ltBound.eval(l)
            if (lk == null || ltv == null) {
              if (outer) pending = proj(joined(l, nullRight))
            } else {
              val lt = ltv.asInstanceOf[Long]
              // consume right rows with (key < lk) or (key == lk, time <= lt)
              var continue = rHead != null
              while (continue) {
                val rk = rkBound.eval(rHead)
                val c = keyOrd.compare(rk, lk)
                if (c < 0) {
                  rHead = advanceRight()
                } else if (c == 0 &&
                    rtBound.eval(rHead).asInstanceOf[Long] <= lt) {
                  bestKey = rk
                  bestTime = rtBound.eval(rHead).asInstanceOf[Long]
                  bestRow = rHead.copy()
                  rHead = advanceRight()
                } else {
                  continue = false
                }
                if (rHead == null) continue = false
              }
              if (bestRow != null && keyOrd.compare(bestKey, lk) == 0 &&
                  bestTime <= lt && bestTime > lt - tol) {
                pending = proj(joined(l, bestRow))
              } else if (outer) {
                pending = proj(joined(l, nullRight))
              }
            }
          }
        }

        override def hasNext: Boolean = { findNext(); pending != null }
        override def next(): InternalRow = {
          findNext()
          val r = pending; pending = null; r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
