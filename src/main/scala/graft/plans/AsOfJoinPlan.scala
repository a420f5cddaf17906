package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeSet, Descending, GenericInternalRow,
  JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Whole-operator Catalyst extension for the as-of join — rung (c) of the
  * custom-operator ladder (SURVEY.md §2.3): a first-class `LogicalPlan`
  * node, a planner `Strategy`, and a sort-merge `SparkPlan`, injectable
  * via `SparkSessionExtensions` (see [[graft.functions.GraftExtensions]]).
  *
  * Semantics (same contract as the composed [[graft.operators.AsOfJoin]],
  * which remains the (a)-rung formulation; reference behavior:
  * /root/reference — event alignment queries): for every left row, attach
  * the payload of the single right row with the largest `rightTime <=
  * leftTime` (or smallest `rightTime >= leftTime` when `forward`) within
  * the same key; SQL comparison semantics — a NULL key or NULL timestamp
  * on either side matches nothing, and the payload is one whole right row.
  *
  * Why a dedicated physical operator beats the union+window composition:
  *  - each side is shuffled once on its OWN key columns and sorted once
  *    (`requiredChildOrdering`) — Catalyst's EnsureRequirements places the
  *    exchanges, and reuses an existing compatible partitioning (e.g. a
  *    bucketed table or an upstream aggregation on the same key) where the
  *    union formulation always pays a fresh shuffle of the concatenation;
  *  - the merge is a streaming single pass per partition holding ONE
  *    candidate row — no window buffer, no struct packing/unpacking, no
  *    side-tag columns, and the left rows never leave their original
  *    column layout;
  *  - at 100 TB the shuffle volume is the whole cost: this plan moves
  *    `|L| + pruned(|R|)` rows exactly once, which is the lower bound.
  */
final case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute],
    payloadOut: Seq[Attribute],
    forward: Boolean) extends BinaryNode {

  require(leftKeys.length == rightKeys.length && payload.length == payloadOut.length)

  override def output: Seq[Attribute] = left.output ++ payloadOut
  // payloadOut are minted by this node (fresh exprIds, nullable): without
  // declaring them produced, `missingInput` would flag the plan unresolved.
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: injected per-session (`spark.experimental.extraStrategies`,
  * done idempotently by [[graft.operators.AsOfJoin.native]]) or cluster-wide
  * via `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, p, po, fwd) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, p, po, fwd) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join. Children are hash-clustered on their key columns
  * and sorted `(keys ASC, time ASC|DESC)`; each partition is merged in one
  * streaming pass that keeps exactly one candidate right row.
  */
final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute],
    payloadOut: Seq[Attribute],
    forward: Boolean) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // Traversal direction: backward as-of walks time ascending (candidate =
  // most recent prior), forward walks descending (candidate = earliest
  // subsequent) — one merge loop serves both with a sign flip.
  private def timeDir = if (forward) Descending else Ascending

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, timeDir),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, timeDir))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val (lOut, rOut) = (left.output, right.output)
    val (lk, rk, lt, rt, p, po, fwd) =
      (leftKeys, rightKeys, leftTime, rightTime, payload, payloadOut, forward)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      new AsOfMergeIterator(lIter, rIter, lOut, rOut, lk, rk, lt, rt, p, po,
        fwd, numOutputRows, numMatched)
    }
  }
}

/** One-pass merge of two (keys ASC, time dir) sorted partitions.
  *
  * Holds a single candidate (the latest qualifying right row in traversal
  * order, copied — sorter iterators reuse their row buffers) plus a one-row
  * lookahead of the right stream. Rows with a NULL key or NULL time on the
  * right are skipped; a left row with a NULL key or time short-circuits to
  * the unmatched output without consuming the right stream.
  */
private final class AsOfMergeIterator(
    lIter: Iterator[InternalRow],
    rIter: Iterator[InternalRow],
    leftOutput: Seq[Attribute],
    rightOutput: Seq[Attribute],
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute],
    payloadOut: Seq[Attribute],
    forward: Boolean,
    numOutputRows: SQLMetric,
    numMatched: SQLMetric) extends Iterator[InternalRow] {

  private val lKeyProj = UnsafeProjection.create(leftKeys, leftOutput)
  private val rKeyProj = UnsafeProjection.create(rightKeys, rightOutput)
  private val lTimeProj = UnsafeProjection.create(Seq(leftTime), leftOutput)
  private val rTimeProj = UnsafeProjection.create(Seq(rightTime), rightOutput)
  private val payloadProj = UnsafeProjection.create(payload, rightOutput)
  private val keyOrd: Ordering[InternalRow] =
    RowOrdering.createNaturalAscendingOrdering(leftKeys.map(_.dataType))
  private val timeOrd: Ordering[InternalRow] =
    RowOrdering.createNaturalAscendingOrdering(Seq(leftTime.dataType))
  // sign folds the direction into one comparison: qualify <=> dirCmp <= 0
  private val sign = if (forward) -1 else 1

  private val nullPayload = new GenericInternalRow(payload.length)
  private val joined = new JoinedRow
  private val resultProj = UnsafeProjection.create(
    (leftOutput ++ payloadOut).map(identity), leftOutput ++ payloadOut)

  private var rHead: InternalRow = _            // lookahead, NOT copied
  private var rExhausted = false
  private var candPayload: UnsafeRow = _        // copied
  private var candKey: UnsafeRow = _            // copied

  private def advanceRight(): Unit =
    if (rIter.hasNext) rHead = rIter.next() else { rHead = null; rExhausted = true }

  override def hasNext: Boolean = lIter.hasNext

  override def next(): InternalRow = {
    val lRow = lIter.next()
    val lKey = lKeyProj(lRow)
    val lTimeRow = lTimeProj(lRow)
    val lValid = !lKey.anyNull && !lTimeRow.isNullAt(0)
    if (lValid) {
      var done = rExhausted
      while (!done) {
        if (rHead == null) advanceRight()
        if (rHead == null) done = true
        else {
          val rKey = rKeyProj(rHead)
          if (rKey.anyNull || rTimeProj(rHead).isNullAt(0)) {
            rHead = null // skip null-keyed / null-timed right rows
          } else {
            val kc = keyOrd.compare(rKey, lKey)
            if (kc < 0) rHead = null // behind every remaining left key
            else if (kc > 0) done = true
            else if (sign * timeOrd.compare(rTimeProj(rHead), lTimeRow) <= 0) {
              candPayload = payloadProj(rHead).copy()
              candKey = rKey.copy()
              rHead = null
            } else done = true // same key, right row is in the future
          }
        }
      }
    }
    val matched =
      lValid && candKey != null && keyOrd.compare(candKey, lKey) == 0
    if (matched) numMatched += 1
    numOutputRows += 1
    resultProj(joined(lRow, if (matched) candPayload else nullPayload))
  }
}
