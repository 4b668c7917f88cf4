package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, BoundReference, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the whole-operator Catalyst extension
  * (logical node → strategy → physical operator, registered through
  * [[graft.GraftExtensions]]): for every left row, attach the LATEST
  * right row with the same key and `rightTime ≤ leftTime`, or NULLs
  * when none exists.
  *
  * Why a physical operator when [[graft.operators.Relational.asofJoin]]
  * already composes the semantics from union + window: the composed
  * form must (1) union BOTH tables into one shuffle, moving every left
  * column through the exchange twice (once padded with NULL right
  * columns), and (2) run a last-ignoreNulls window PER carried right
  * column over the merged stream. This operator shuffles each side once
  * on its own key, sorts each side `(key, time)` — exactly the
  * SortMergeJoin machinery, reused via `requiredChildDistribution` /
  * `requiredChildOrdering`, so EnsureRequirements plans the exchanges
  * and AQE still re-optimizes them — and then a single forward-only
  * merge pass emits the matches with O(1) state (the last right row
  * seen for the current key). No column rides a shuffle it doesn't
  * need; adding a tenth carried right column adds no window pass.
  *
  * Contract notes (the shared NULL contract, pinned against the
  * composed form in RelationalSpec's null-semantics case):
  *  - NULL keys never match (SQL join semantics); NULL left keys emit
  *    the NULL-padded row.
  *  - NULL right timestamps never match (rt <= lt is unknowable) and
  *    are consumed, not stalled on — sorted NULLS FIRST they head the
  *    key group, and stopping there would mask every valid match.
  *  - NULL left timestamps emit the NULL-padded row.
  *  - Ties `rightTime == leftTime` DO match (at-or-before), and among
  *    equal (key, time) right rows the LAST in sort order wins —
  *    callers wanting a deterministic winner under exact-tie timestamps
  *    should pre-collapse the right side to one row per (key, time)
  *    (the q222 fixture does).
  *  - Interpreted (non-codegen) merge loop: the per-row work is two
  *    comparisons and an occasional row copy; the operator's cost is
  *    the sorts, which ARE codegen/radix-backed Spark machinery.
  *
  * Measured (same-session interleaved A/B, `graft.Prof asof_ab`,
  * sf0.1 events-vs-orders with ONE carried column): composed
  * 0.51-0.72 s vs native 0.47-0.60 s — ~8% ahead even in the
  * composition's best case; the gap is structural in the carried-column
  * count (each extra column adds a full window pass to the composed
  * form and only a projected field here) and in scale (the composed
  * union moves every left column through the shuffle padded AND real).
  */
case class AsofJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    rightValues: Seq[Attribute],
    outRight: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ outRight

  override def producedAttributes: AttributeSet = AttributeSet(outRight)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: one physical translation, children planned later. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lt, rt, rv, outR) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rv, outR) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    rightValues: Seq[Attribute],
    outRight: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ outRight

  // the SortMergeJoin contract: co-partition on the keys, sort each
  // side (key, time); EnsureRequirements inserts the exchanges/sorts
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
    ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)) ::
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTimeIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTimeIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
    require(lKeyIdx >= 0 && lTimeIdx >= 0 && rKeyIdx >= 0 && rTimeIdx >= 0,
      "as-of join attributes must come from the child plans")
    val lKeyRef = BoundReference(lKeyIdx, leftKey.dataType, leftKey.nullable)
    val lTimeRef = BoundReference(lTimeIdx, leftTime.dataType,
      leftTime.nullable)
    val rKeyRef = BoundReference(rKeyIdx, rightKey.dataType,
      rightKey.nullable)
    val rTimeRef = BoundReference(rTimeIdx, rightTime.dataType,
      rightTime.nullable)
    val rValIdx = rightValues.map(a =>
      right.output.indexWhere(_.exprId == a.exprId)).toArray
    require(rValIdx.forall(_ >= 0), "carried right columns must resolve")
    val outTypes = output.map(_.dataType).toArray
    val nRightVals = rightValues.length
    val nLeft = left.output.length

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outTypes)
      val outRow = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(nLeft + nRightVals)
      // single-element lookahead over the right side; retained rows are
      // COPIED (Spark row iterators reuse buffers)
      var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
      var lastMatch: InternalRow = null
      var lastMatchKey: Any = null
      def advanceRight(lk: Any, lt: Any): Unit = {
        var go = rHead != null
        while (go) {
          val rk = rKeyRef.eval(rHead)
          val cmp = if (rk == null) -1 else keyOrd.compare(rk, lk)
          if (cmp < 0) {
            // right rows of earlier (or NULL) keys can never match a
            // later left row — flush any stale match from them
            if (lastMatchKey != null && keyOrd.compare(lastMatchKey, lk) != 0)
              { lastMatch = null; lastMatchKey = null }
            rHead = if (rIter.hasNext) rIter.next() else null
            go = rHead != null
          } else if (cmp == 0) {
            val rt = rTimeRef.eval(rHead)
            if (rt == null) {
              // a NULL right timestamp can never satisfy rt <= lt, and
              // sorted NULLS FIRST it HEADS its key group — it must be
              // consumed and skipped, or the merge stalls on it and every
              // valid match behind it is silently lost (NULL-padded)
              rHead = if (rIter.hasNext) rIter.next() else null
              go = rHead != null
            } else if (lt != null && timeOrd.compare(rt, lt) <= 0) {
              lastMatch = rHead.copy()
              lastMatchKey = rk
              rHead = if (rIter.hasNext) rIter.next() else null
              go = rHead != null
            } else go = false
          } else go = false
        }
      }
      lIter.map { lRow =>
        val lk = lKeyRef.eval(lRow)
        var i = 0
        while (i < nLeft) {
          outRow.update(i, lRow.get(i, outTypes(i)))
          i += 1
        }
        val lt = lTimeRef.eval(lRow)
        val matched =
          // NULL left key or NULL left time: rt <= lt is unknowable, so
          // no right row matches (SQL comparison semantics; same result
          // as the composed form, where a NULLS-FIRST left time precedes
          // every right row in its key group)
          if (lk == null || lt == null) null
          else {
            advanceRight(lk, lt)
            if (lastMatch != null && lastMatchKey != null &&
              keyOrd.compare(lastMatchKey, lk) == 0) lastMatch else null
          }
        var j = 0
        while (j < nRightVals) {
          outRow.update(nLeft + j,
            if (matched == null) null
            else matched.get(rValIdx(j), outTypes(nLeft + j)))
          j += 1
        }
        proj(outRow)
      }
    }
  }
}
