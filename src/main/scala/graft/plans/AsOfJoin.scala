package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of (backward) join — the whole-operator extension path
  * (SURVEY.md §2.B joins row; guide: LogicalPlan + Strategy + SparkPlan):
  * for every left row, attach the LATEST right row of the same key with
  * `rightTime < leftTime`, or nulls if none.
  *
  * Execution model: both sides are hash-clustered on the key and sorted by
  * (key, time) — Spark's EnsureRequirements inserts the exchanges/sorts —
  * then a single streaming merge per partition emits each left row with a
  * one-row "last match" carry. State per partition is ONE buffered right
  * row: O(1) memory regardless of key cardinality or time range, which is
  * what makes this beat the window-over-union formulation (r33: full
  * sort + window state) at 100 TB.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrdering = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrdering = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val rightWidth = right.output.length
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val project = UnsafeProjection.create(outAttrs, outAttrs)
      val buffered = rIter.buffered

      // one-row carry: the latest right row seen for `matchKey`
      var matchKey: Any = null
      var matchRow: InternalRow = null

      lIter.map { lRow =>
        val lk = lKeyB.eval(lRow)
        val lt = lTimeB.eval(lRow)
        if (lk == null || lt == null) {
          // null key/time matches nothing (standard join null semantics)
          project(joined(lRow, nullRight))
        } else {
          // consume right rows that are strictly before (lk, lt); null-keyed
          // or null-timed right rows can never match — skip them (they sort
          // first under Ascending, so they are drained up front)
          var advance = true
          while (advance && buffered.hasNext) {
            val rRow = buffered.head
            val rk = rKeyB.eval(rRow)
            if (rk == null) {
              buffered.next()
            } else {
              val cmp = keyOrdering.compare(rk, lk)
              if (cmp < 0) {
                buffered.next() // earlier key: skip past
              } else if (cmp == 0) {
                val rt = rTimeB.eval(rRow)
                if (rt == null) {
                  buffered.next() // null time sorts first, never matches
                } else if (timeOrdering.compare(rt, lt) < 0) {
                  matchKey = rk
                  matchRow = buffered.next().copy()
                } else {
                  advance = false
                }
              } else {
                advance = false
              }
            }
          }
          val matched = matchRow != null && matchKey != null &&
            keyOrdering.compare(matchKey.asInstanceOf[Any], lk) == 0
          project(joined(lRow, if (matched) matchRow else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical node to its exec (registered via
  * `GraftExtensions` / `spark.experimental.extraStrategies`).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}
