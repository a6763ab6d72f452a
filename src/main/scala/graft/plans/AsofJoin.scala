package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, Ascending}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF join as a first-class operator (builder-brief category (c):
  * custom LogicalPlan + Strategy + SparkPlan, registered through
  * SparkSessionExtensions) — Spark has no native as-of join between two
  * datasets; the composition workaround (union + window) loses the
  * two-sided schema.
  *
  * Semantics: for every left row, attach the right row with the same
  * key and the greatest time ≤ the left row's time (NULLs if none).
  *
  * Execution: both sides hash-co-partitioned by key (Spark's
  * EnsureRequirements inserts the exchanges) and sorted by (key, time);
  * one streaming merge pass per partition — no buffering beyond a single
  * right row, so memory is O(1) per task regardless of skew, and the
  * whole operator costs exactly one shuffle per side, like a sort-merge
  * join.
  */
case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut   = left.output
    val rightOut  = right.output
    val lKey      = leftKey
    val rKey      = rightKey
    val lTime     = leftTime
    val rTime     = rightTime
    val numRight  = rightOut.length
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj  = UnsafeProjection.create(Seq(lKey), leftOut)
      val rKeyProj  = UnsafeProjection.create(Seq(rKey), rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rightOut)
      val outProj   = UnsafeProjection.create(output, leftOut ++ rightOut)
      val nullRight = new GenericInternalRow(numRight)
      val joined    = new JoinedRow

      val rBuf = rIter.buffered
      var matchedKey: Long  = 0L
      var hasMatch: Boolean = false
      var matched: InternalRow = null

      // NULL keys/times follow SQL comparison semantics: they match
      // nothing. A left row with NULL key or time gets the null-padded
      // right side; right rows with NULL key or time are skipped (they
      // sort first under Ascending, so skipping keeps the merge order).
      def nullAt(r: InternalRow, proj: UnsafeProjection): Boolean =
        proj(r).isNullAt(0)
      def valOf(r: InternalRow, proj: UnsafeProjection): Long =
        proj(r).getLong(0)

      lIter.map { lRow =>
        if (nullAt(lRow, lKeyProj) || nullAt(lRow, lTimeProj)) {
          outProj(joined(lRow, nullRight))
        } else {
          val k = valOf(lRow, lKeyProj)
          val t = valOf(lRow, lTimeProj)
          // drop state from a previous (smaller) key
          if (hasMatch && matchedKey != k) { hasMatch = false; matched = null }
          // advance the right side while it is behind (key, time)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            if (nullAt(rBuf.head, rKeyProj) || nullAt(rBuf.head, rTimeProj)) {
              rBuf.next()
            } else {
              val rk = valOf(rBuf.head, rKeyProj)
              if (rk < k) { rBuf.next() }
              else if (rk == k && valOf(rBuf.head, rTimeProj) <= t) {
                matched = rBuf.next().copy()
                matchedKey = k
                hasMatch = true
              } else advancing = false
            }
          }
          val r = if (hasMatch && matchedKey == k) matched else nullRight
          outProj(joined(lRow, r))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical node to its exec. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}
