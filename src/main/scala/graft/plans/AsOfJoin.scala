package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BoundReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join: for every left row, attach the latest right
  * row of the same key with `rightTime < leftTime` (strict), or nulls.
  *
  * The physical operator declares `ClusteredDistribution` on the keys and
  * a (key, time) sort order for both children, so EnsureRequirements
  * plants exactly one hash exchange + sort per side; the join itself is a
  * linear merge scan per partition with O(1) state (the last candidate
  * right row). This is the plan shape a dedicated engine gives the
  * operator — no window buffering of the union, no per-key materialization.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
        Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  // rows keep the left child's clustering (zipPartitions is per-partition);
  // advertising it saves downstream key-clustered ops a redundant exchange
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    val numRightFields = right.output.length
    val resultSchema = output
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val leftKeyTime = Seq(leftKey, leftTime)
    val rightKeyTime = Seq(rightKey, rightTime)
    val leftOutput = left.output
    val rightOutput = right.output

    // bind the projection against NULLABLE right attributes — the original
    // (non-nullable) ones would codegen null-check-free field reads and
    // turn the null-extension row into zeros
    val inputSchema = left.output ++ right.output.map(_.withNullability(true))
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(resultSchema, inputSchema)
      // codegen'd (key, time) extraction — bound ONCE per partition; the
      // round-1 version walked interpreted expression trees per row (and
      // evaluated rightTime twice per advanced right row): 8.5× slower
      // than the window-based plan on identical semantics
      val lktProj = UnsafeProjection.create(leftKeyTime, leftOutput)
      val rktProj = UnsafeProjection.create(rightKeyTime, rightOutput)
      // codegen'd comparators over the projected 2-field (key, time) rows
      val keyComp = GenerateOrdering.generate(
        Seq(SortOrder(BoundReference(0, keyType, nullable = true), Ascending)))
      val timeComp = GenerateOrdering.generate(
        Seq(SortOrder(BoundReference(1, timeType, nullable = true), Ascending)))
      val joined = new JoinedRow
      val rightNulls = new GenericInternalRow(numRightFields)
      val rBuf = rIter.buffered
      // last right row whose key we were scanning + its projected (key,
      // time); O(1) state — copied out of the iterator's reused buffers
      var candidate: InternalRow = null
      var candidateKt: InternalRow = null

      lIter.map { l =>
        val lkt = lktProj(l)
        if (lkt.isNullAt(0) || lkt.isNullAt(1)) {
          // SQL semantics: null key/time never matches (sorted NULLS FIRST,
          // so these are the partition's leading left rows)
          proj(joined(l, rightNulls))
        } else {
          // consume right rows that are strictly before (k, t)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rkt = rktProj(rBuf.head)
            if (rkt.isNullAt(0) || rkt.isNullAt(1)) {
              rBuf.next() // null key/time on the right can never match
            } else {
              val kc = keyComp.compare(rkt, lkt)
              if (kc < 0) {
                rBuf.next() // right key behind left key: its matches are gone
              } else if (kc == 0 && timeComp.compare(rkt, lkt) < 0) {
                candidateKt = rkt.copy()
                candidate = rBuf.next().copy()
              } else {
                advancing = false
              }
            }
          }
          val matched = candidate != null && keyComp.compare(candidateKt, lkt) == 0
          proj(joined(l, if (matched) candidate else rightNulls))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
