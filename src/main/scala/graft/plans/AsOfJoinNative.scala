package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  AttributeReference, AttributeSet, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan,
  SparkStrategy}

/** Native backward as-of join — the custom-operator preference order's
  * tier (c): a whole-operator `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan`, registered through `SparkSessionExtensions`
  * (GraftExtensions). Spark has no ASOF JOIN; the library's default
  * formulation is the union-and-sweep window (functions.AsOfJoin,
  * q50), which pays one shuffle of LEFT+RIGHT unioned rows plus a
  * per-group sort of the union. This operator keeps the same exchange
  * count but shuffles each side separately (no union row widening:
  * probe rows never carry null payload slots through the exchange,
  * reference rows never carry null probe columns) and replaces the
  * window's carry-forward state machine with a streaming two-pointer
  * merge — O(1) state per partition, no window buffer.
  *
  * Semantics (identical to AsOfJoin.backward, spec-asserted): for each
  * left row, the payload of the right row in the same key group with
  * the greatest `time <= left.time`, ties broken by greatest
  * `tieBreak`; unmatched left rows get null payload. Like the window
  * form (whose partitionBy groups nulls), null keys match null keys.
  * Null right times never produce a candidate; null left times match
  * nothing.
  *
  * Scale: requiredChildDistribution co-partitions both sides on the
  * key (EnsureRequirements inserts the two exchanges + in-partition
  * sorts); the merge itself is a single forward pass over both sorted
  * streams. AQE applies to the child exchanges as usual. The operator
  * does not participate in whole-stage codegen (the sweep is a
  * stateful merge, not an expression pipeline); its inputs and outputs
  * still sit inside codegen'd stages on both sides.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightTieBreak: Attribute,
    rightPayload: Seq[Attribute],
    payloadOut: Seq[AttributeReference])
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  /** Everything the operator consumes from its children — keeps
    * ColumnPruning from stripping pass-through left columns or the
    * right-side key/time/payload columns. */
  override def references: AttributeSet =
    AttributeSet(left.output ++ rightKeys ++
      Seq(rightTime, rightTieBreak) ++ rightPayload)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightTieBreak: Attribute,
    rightPayload: Seq[Attribute],
    payloadOut: Seq[AttributeReference])
  extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) ::
      ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ Seq(rightTime, rightTieBreak))
      .map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lTimeIdx = leftOut.indexWhere(_.exprId == leftTime.exprId)
    val rTimeIdx = rightOut.indexWhere(_.exprId == rightTime.exprId)
    val timeType = leftTime.dataType
    val numPayload = payloadOut.size
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val rPayloadB = rightPayload
    val outB = output
    val payloadOutB: Seq[Attribute] = payloadOut

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rightOut)
      val payloadProj = UnsafeProjection.create(rPayloadB, rightOut)
      val resultProj = UnsafeProjection.create(outB, leftOut ++ payloadOutB)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(
        lKeysB.map(_.dataType))
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      val nullPayload = new GenericInternalRow(numPayload)
      val joined = new JoinedRow
      val rBuf = rIter.buffered

      new Iterator[InternalRow] {
        // last consumed same-key reference payload + its key (copied —
        // projections reuse their output rows)
        private var candidate: UnsafeRow = _
        private var candidateKey: UnsafeRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          val lTimeIsNull = lRow.isNullAt(lTimeIdx)
          val lTime = if (lTimeIsNull) null else lRow.get(lTimeIdx, timeType)
          // consume: all earlier-key reference rows, plus same-key rows
          // with null time (sorted first, never candidates) or
          // time <= left.time
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rHead = rBuf.head
            val cmp = keyOrd.compare(rKeyProj(rHead), lKey)
            val consume =
              if (cmp < 0) true
              else if (cmp > 0) false
              else if (rHead.isNullAt(rTimeIdx)) true
              else !lTimeIsNull &&
                timeOrd.lteq(rHead.get(rTimeIdx, timeType), lTime)
            if (consume) {
              val rRow = rBuf.next()
              if (cmp == 0 && !rRow.isNullAt(rTimeIdx)) {
                candidate = payloadProj(rRow).copy()
                candidateKey = lKey.copy()
              }
            } else advancing = false
          }
          val matched = candidate != null &&
            keyOrd.compare(candidateKey, lKey) == 0
          resultProj(joined(lRow, if (matched) candidate else nullPayload))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Plans AsOfJoinPlan → AsOfJoinExec; injected via
  * GraftExtensions.injectPlannerStrategy. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(planLater(p.left), planLater(p.right), p.leftKeys,
        p.rightKeys, p.leftTime, p.rightTime, p.rightTieBreak,
        p.rightPayload, p.payloadOut) :: Nil
    case _ => Nil
  }
}
