package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering,
  SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Whole-operator as-of join: for each left row, the LAST right row of
  * the same key with `rightTime <= leftTime` (ties among right rows at
  * equal time broken by `rightTieBreak`, ascending — the last one wins).
  *
  * This is the planner-level counterpart of
  * `graft.ops.TimeSeries.asOfJoin` (union + last_value window). The
  * custom physical operator needs the same single hash exchange per side
  * and one local sort, but then streams BOTH sides through a per-partition
  * merge with O(1) state — no unioned wide-row shuffle, no window-frame
  * buffering, and the right side's payload never travels through a
  * struct column. At 100 TB: shuffle volume is each side's own width,
  * and peak memory per task is one candidate row.
  *
  * Contract: join keys and times must be non-null (null keys/times sort
  * first and would match each other, unlike SQL equality — filter them
  * out upstream, as the reference's parsed streams do).
  *
  * Registered by [[graft.GraftExtensions]] via injectPlannerStrategy —
  * the reference's temporal lookup join (`LogAnalysis.java:211-212`,
  * cache-TTL dim lookup) generalized to event-time correctness.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans the logical AsOfJoin onto the merge exec. */
case class AsOfJoinStrategy() extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tie) =>
      AsOfJoinExec(lk, rk, lt, rt, tie, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Both sides hash-clustered on the key — ONE exchange each (or zero if
    * already co-partitioned; EnsureRequirements co-partitions the pair).
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** Local sort by (key, time) — the merge scans each partition once.
    * The right side additionally sorts by the tiebreak so "last right row
    * at equal time" is deterministic.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime :+ rightTieBreak).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched left rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lOut = left.output
    val rOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val keyTimeTypes = keyTypes :+ leftTime.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyTimeProj = UnsafeProjection.create(leftKeys :+ leftTime, lOut)
      val rKeyTimeProj = UnsafeProjection.create(rightKeys :+ rightTime, rOut)
      val lKeyProj = UnsafeProjection.create(leftKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rightKeys, rOut)
      val keyTimeOrd = RowOrdering.createNaturalAscendingOrdering(keyTimeTypes)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      // Bind against a nullable view of the right side: the unmatched
      // case substitutes an all-null row, and a non-nullable
      // BoundReference would skip the isNullAt check and read garbage.
      val resultProj = UnsafeProjection.create(output, lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      new Iterator[InternalRow] {
        // Last right row (and its key) with (key, time) <= the current
        // left row's — the only cross-row state the merge keeps.
        private var candidate: InternalRow = _
        private var candidateKey: UnsafeRow = _ // computed lazily from candidate
        private var candidateKeyValid = false
        private var pendingRight: InternalRow = _ // lookahead, not yet consumed
        // Projection of pendingRight, cached so a lookahead row stalled
        // across MANY left rows (the common case once the merge is ahead)
        // is projected once, not once per left row. Buffer reuse is safe:
        // rKeyTimeProj is not called again until pendingRight is replaced.
        private var pendingKeyTime: UnsafeRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKeyTime = lKeyTimeProj(lRow)
          var scan = true
          while (scan && (pendingRight != null || rIter.hasNext)) {
            if (pendingRight == null) {
              pendingRight = rIter.next()
              pendingKeyTime = rKeyTimeProj(pendingRight)
            }
            if (keyTimeOrd.compare(pendingKeyTime, lKeyTime) <= 0) {
              // Consumed: becomes the new best candidate. Copy — the
              // child iterator reuses its row buffer. Its key projection
              // is deferred: only the LAST consumed row's key is ever
              // compared, so eagerly projecting every consumed row would
              // do O(right) extra projections+copies per partition.
              candidate = pendingRight.copy()
              candidateKeyValid = false
              pendingRight = null
            } else scan = false
          }
          val matched = candidate != null && {
            if (!candidateKeyValid) {
              candidateKey = rKeyProj(candidate).copy()
              candidateKeyValid = true
            }
            keyOrd.compare(candidateKey, lKeyProj(lRow)) == 0
          }
          numOutputRows += 1
          if (matched) numMatched += 1
          resultProj(joined(lRow, if (matched) candidate else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
