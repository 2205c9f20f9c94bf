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
  *
  * `nearest = true` switches to the pandas `merge_asof
  * direction='nearest'` contract (r9): match the same-key right row
  * minimizing |rightTime − leftTime| subject to |Δt| ≤ tolerance
  * (INCLUSIVE on both sides, vs backward's half-open lookback), equal
  * distance broken toward the backward row, equal times broken by max
  * `rightTieBreak` in BOTH directions. Same single merge pass; state grows
  * from one buffered row to two (backward best + the max-tie row of the
  * first forward timestamp).
  *
  * `forward = true` (r10) is `direction='forward'`: match the EARLIEST
  * same-key right row with `rightTime ∈ [leftTime, leftTime + tolerance]`
  * (inclusive both ends), equal times broken by max `rightTieBreak`. Same
  * merge pass holding only the forward buffer — consumed pre-left rows are
  * discarded, never copied, so forward is the cheapest direction.
  *
  * `allowExact = false` (r10, pandas `allow_exact_matches=False`)
  * excludes `rightTime == leftTime` rows from matching in every
  * direction: backward becomes the open window (lt − tol, lt), forward
  * [lt, …] becomes (lt, lt + tol], nearest requires |Δt| > 0. The
  * equal-time run is still retained for LATER left rows where it is
  * strictly in the past (nearest/backward keep its max-tie row as the
  * backward candidate; forward proves it useless — a row at time lt can
  * never be a strict-future match for any left time ≥ lt — and drops it).
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Expression,
    toleranceMicros: Long,
    isOuter: Boolean = false,
    nearest: Boolean = false,
    forward: Boolean = false,
    allowExact: Boolean = true) extends BinaryNode {
  require(!(nearest && forward), "nearest and forward are exclusive directions")
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
    case AsOfJoin(l, r, lk, rk, lt, rt, rtb, tol, outer, near, fwd, exact) =>
      AsOfJoinExec(lk, rk, lt, rt, rtb, tol, outer, near, fwd, exact,
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
    nearest: Boolean,
    forward: Boolean,
    allowExactMatches: Boolean,
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
    val near = nearest
    val fwd = forward
    val exactOk = allowExactMatches
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
        // nearest mode's second buffered row: the max-tie-break right row
        // at the single first-forward timestamp for the current key. It
        // sits logically BEFORE rHead in the sorted stream (its equal-time
        // run was already consumed), so the backward consume loop drains it
        // first when a later left row passes its time.
        private var fwdKey: Any = null
        private var fwdTime: Long = 0L
        private var fwdRow: InternalRow = null
        // nearest + allowExact=false only: the max-tie row of a popped
        // == lt run. It becomes the BACKWARD candidate only once a left
        // row with a STRICTLY later time arrives — writing it straight
        // into bestRow corrupted the candidate for left rows at the SAME
        // timestamp (property-test find, r12: of two equal-(key, time)
        // left rows, the second lost its true backward match because the
        // equal-time row had replaced it and the exact guard then
        // rejected the replacement).
        private var eqKey: Any = null
        private var eqTime: Long = 0L
        private var eqRow: InternalRow = null
        private var pending: InternalRow = null

        private def advanceRight(): InternalRow = {
          while (rIter.hasNext) {
            val r = rIter.next()
            if (rkBound.eval(r) != null && rtBound.eval(r) != null) return r
          }
          null
        }

        // logical right-stream head: the forward buffer, then rHead
        private def headRow: InternalRow = if (fwdRow != null) fwdRow else rHead
        private def popRight(): Unit =
          if (fwdRow != null) fwdRow = null else rHead = advanceRight()

        private def findNext(): Unit = {
          while (pending == null && lIter.hasNext) {
            val l = lIter.next()
            val lk = lkBound.eval(l)
            val ltv = ltBound.eval(l)
            if (lk == null || ltv == null) {
              if (outer) pending = proj(joined(l, nullRight))
            } else {
              val lt = ltv.asInstanceOf[Long]
              // fold a stashed equal-time run into the backward candidate
              // once it is strictly in this left row's past; a stash from
              // another key is dead (left is (key, time)-sorted)
              if (eqRow != null) {
                val cmp = keyOrd.compare(eqKey, lk)
                if (cmp != 0) { eqRow = null }
                else if (eqTime < lt) {
                  bestKey = eqKey; bestTime = eqTime; bestRow = eqRow
                  eqRow = null
                }
              }
              // consume right rows with (key < lk) or (key == lk) and a
              // time strictly before lt — or AT lt when exact matches are
              // allowed and a direction that matches backward is active
              // (in forward mode the == lt run must survive the consume so
              // it can be buffered as the forward candidate). Keys are
              // evaluated off reused row buffers, so anything retained
              // across an iterator advance — key value included — is
              // copied (UTF8String etc. would otherwise be overwritten).
              var continue = headRow != null
              while (continue) {
                val h = headRow
                val rk = rkBound.eval(h)
                val c = keyOrd.compare(rk, lk)
                val consume =
                  if (c < 0) true
                  else if (c > 0) false
                  else {
                    val rt = rtBound.eval(h).asInstanceOf[Long]
                    if (exactOk && !fwd) rt <= lt else rt < lt
                  }
                if (consume) {
                  if (c == 0 && !fwd) {
                    bestKey = InternalRow.copyValue(rk)
                    bestTime = rtBound.eval(h).asInstanceOf[Long]
                    bestRow = h.copy()
                  }
                  popRight()
                } else continue = false
                if (headRow == null) continue = false
              }
              // the backward candidate this left row gets to use is fixed
              // NOW (the equal-time handling below stashes into eqRow, so
              // bestRow is stable — the snapshot keeps that independence
              // explicit)
              val bRow = bestRow; val bKey = bestKey; val bTime = bestTime
              // allow_exact_matches=false: the same-key == lt run can never
              // match THIS left row, but must not block the forward buffer.
              // Pop it: nearest/backward keep its max-tie row as the
              // backward candidate for later (strictly greater) left times;
              // forward discards it (a row at time lt is never a strict
              // future match for any left time ≥ lt).
              if (!exactOk && (near || fwd)) {
                var run = headRow != null
                while (run) {
                  val h = headRow
                  val rk = rkBound.eval(h)
                  if (keyOrd.compare(rk, lk) == 0 &&
                      rtBound.eval(h).asInstanceOf[Long] == lt) {
                    if (!fwd) {
                      // STASH, don't promote: this run is a valid backward
                      // candidate only for strictly later left times; a
                      // later left row at the SAME lt must still see the
                      // pre-run bestRow (see eqRow declaration)
                      eqKey = InternalRow.copyValue(rk)
                      eqTime = lt
                      eqRow = h.copy()
                    }
                    popRight()
                    run = headRow != null
                  } else run = false
                }
              }
              // nearest/forward: materialize the forward candidate — the
              // max-tie row of the first same-key timestamp at/after lt.
              // Rows with equal (key, time) are consecutive
              // (tie-break-sorted), so keeping the last of the run costs
              // O(run) once, and the run rows can never serve a LATER left
              // row differently (for any left row, only the max-tie row at
              // a timestamp can win).
              if ((near || fwd) && fwdRow == null && rHead != null) {
                val rk = rkBound.eval(rHead)
                if (keyOrd.compare(rk, lk) == 0) {
                  val tf = rtBound.eval(rHead).asInstanceOf[Long]
                  fwdKey = InternalRow.copyValue(rk)
                  fwdTime = tf
                  fwdRow = rHead.copy()
                  rHead = advanceRight()
                  var run = rHead != null
                  while (run) {
                    val nk = rkBound.eval(rHead)
                    if (keyOrd.compare(nk, lk) == 0 &&
                        rtBound.eval(rHead).asInstanceOf[Long] == tf) {
                      fwdRow = rHead.copy()
                      rHead = advanceRight()
                      run = rHead != null
                    } else run = false
                  }
                }
              }
              val exactGuardB = exactOk || bTime < lt
              val backOk =
                if (fwd) false
                else if (near)
                  bRow != null && keyOrd.compare(bKey, lk) == 0 &&
                    lt - bTime <= tol && exactGuardB
                else
                  bRow != null && keyOrd.compare(bKey, lk) == 0 &&
                    bTime <= lt && bTime > lt - tol && exactGuardB
              val fwdOk = (near || fwd) && fwdRow != null &&
                keyOrd.compare(fwdKey, lk) == 0 && fwdTime - lt <= tol &&
                fwdTime >= lt && (exactOk || fwdTime > lt)
              if (backOk && (!fwdOk || lt - bTime <= fwdTime - lt)) {
                // equal distance → backward wins (the pandas convention)
                pending = proj(joined(l, bRow))
              } else if (fwdOk) {
                pending = proj(joined(l, fwdRow))
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
