package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BoundReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.DataFrame

/** AS-OF JOIN as a first-class operator: logical node + planner strategy +
  * physical merge — the SURVEY §7.4 preference-order path (c), used where
  * the operator's *physical algorithm* (a single forward merge of two
  * co-partitioned sorted streams) is worth owning rather than encoding
  * through union+window (q19, `TemporalJoins.asofJoin`, which widens every
  * row with the other side's null columns and runs a WindowExec buffer).
  * Both formulations are one shuffle per side; the exec here never
  * materializes a window frame and carries no tag/null-widened rows.
  *
  * Semantics (LEFT as-of, backward): for each left row, the LAST right row
  * of the same key with rightTime <= leftTime, in (rightTime, tieBreak)
  * order; unmatched lefts pad nulls. Ties at equal key+time resolve to the
  * greatest tieBreak — identical to the window form's
  * `last(...) over (order by ts, tag, id)`. Keys/times are assumed
  * non-null (nulls order first under Ascending and would match as
  * "earliest"; filter upstream if that is not the intent).
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    rightTie: Seq[Attribute]) extends BinaryNode {
  // right side nullable: unmatched left rows pad nulls
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Physical merge. Declaring ClusteredDistribution on both children +
  * per-child sort orders delegates ALL data movement to EnsureRequirements
  * (the CoGroupExec pattern): the planner inserts the two hash exchanges
  * and sorts, reuses them when the input is already partitioned (e.g. a
  * bucketed table), and AQE still coalesces the shuffles — none of which a
  * hand-rolled repartition call would get. The merge itself is O(n_l+n_r)
  * per partition with O(1) state: one lookahead row and one retained
  * match copy. */
case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression, rightTie: Seq[Expression],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // the as-of result is 1:1 with the left input — left's partitioning
  // survives, so a downstream groupBy(user) reuses the exchange
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightTie.map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExpr = leftKey
    val rKeyExpr = rightKey
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lKeyExpr), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rKeyExpr), rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val keyOrd = GenerateOrdering.generate(Seq(SortOrder(
        BoundReference(0, lKeyExpr.dataType, nullable = true), Ascending)))
      val timeOrd = GenerateOrdering.generate(Seq(SortOrder(
        BoundReference(0, lTimeExpr.dataType, nullable = true), Ascending)))
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)
      // bind against NULLABLE right attrs — unmatched lefts pad a null row,
      // and a non-nullable binding would codegen away the null check and
      // read 0s out of the padding
      val resultProj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))

      new Iterator[InternalRow] {
        private var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
        // retained copies — sorted-stream rows are buffer-reused by Spark
        private var lastMatch: InternalRow = null
        private var lastMatchKey: UnsafeRow = null
        private def advanceRight(): Unit =
          rHead = if (rIter.hasNext) rIter.next() else null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTime = lTimeProj(l)
          var scanning = true
          while (scanning && rHead != null) {
            val kc = keyOrd.compare(rKeyProj(rHead), lKey)
            if (kc < 0) {
              // right key precedes every remaining left key (both sorted):
              // this right row can never match again — drop it
              advanceRight()
            } else if (kc == 0 && timeOrd.compare(rTimeProj(rHead), lTime) <= 0) {
              lastMatch = rHead.copy()
              lastMatchKey = lKey.copy()
              advanceRight()
            } else {
              scanning = false // right is ahead of this left row
            }
          }
          val matched = lastMatch != null && lastMatchKey != null &&
            keyOrd.compare(lastMatchKey, lKey) == 0
          resultProj(joiner(l, if (matched) lastMatch else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: push left-side filter conjuncts below the AsOfJoin.
  * Catalyst's own PushDownPredicates cannot see through an unknown
  * logical node, so without this a `result.filter(left-col predicate)`
  * scans and merges the FULL left side before filtering — at 100 TB
  * that is the difference between a partition-pruned scan and a
  * full-table pass. Pushing LEFT-column predicates is semantics-
  * preserving because the as-of left join is 1:1 per left row and
  * match selection never reads another left row's columns; predicates
  * touching right-side (match) columns stay above. */
object PushFilterThroughAsOfJoin
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsOfJoin) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(aj.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(push.reduce(And), aj.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Planner strategy: one case, registered either per-session through
  * `AsOf.join` (experimental.extraStrategies, idempotent) or
  * deployment-wide via `spark.sql.extensions=graft.functions.GraftExtensions`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tie) =>
      AsOfJoinExec(lk, rk, lt, rt, tie, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level entry point. The right side's columns must be renamed
  * disjoint from the left's (fresh aliases) — the usual self-join rule. */
object AsOf {
  def join(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           rightTie: Seq[String] = Nil): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(PushFilterThroughAsOfJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushFilterThroughAsOfJoin
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column '$n' not found among ${p.output.map(_.name).mkString(", ")}"))
    graft.plans.SqlShim.ofRows(spark,
      AsOfJoin(lp, rp, attr(lp, leftKey), attr(rp, rightKey),
        attr(lp, leftTime), attr(rp, rightTime), rightTie.map(attr(rp, _))))
  }
}
