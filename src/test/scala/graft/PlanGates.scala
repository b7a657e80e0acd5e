package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate,
  Distinct, Filter, GlobalLimit, Join, LocalLimit, LocalRelation, LogicalPlan,
  OneRowRelation, Project, RepartitionOperation, ResolvedHint, Sample, Sort,
  SubqueryAlias, Union, Window => LogicalWindow, BROADCAST}
import org.apache.spark.sql.catalyst.expressions.NamedExpression
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.{LocalTableScanExec, SparkPlan}

/** Shared structural machinery for the plan gates ([[JoinGateSpec]],
  * [[AggGateSpec]]): proofs that a physical subtree's output cardinality
  * is bounded by CONSTRUCTION — by a constant, a dimension, or the
  * partition count — rather than by the data volume. */
object PlanGates {

  /** Grouping columns minted from `spark_partition_id()` — bounded by
    * the partition count, never by the data (the `Stats.rangePrefix*`
    * discipline). */
  def partitionAxisOnly(a: BaseAggregateExec): Boolean =
    a.groupingExpressions.nonEmpty && a.groupingExpressions.forall(e =>
      e.name.startsWith("__pid") || e.name.startsWith("__tp"))

  /** True when `side`'s output row count is provably bounded by
    * construction. The bound must DOMINATE the root — a `plan.exists`
    * sweep would accept `bigTable.join(oneRowAgg)` or a join placed
    * ABOVE a limit, both of which grow with the data. So: recurse from
    * the root, descending only through nodes whose output cardinality
    * cannot exceed the bound established below them — single-child
    * passthroughs (project/filter/sort/exchange/coalesce/window),
    * aggregates (output ≤ input), and joins/unions ALL of whose inputs
    * are themselves bounded (a product/sum of constants is a
    * constant). Expand/Generate multiply cardinality and correctly
    * fall through to `false`. */
  def boundedByConstruction(side: SparkPlan): Boolean = side match {
    // bounding shapes
    case a: BaseAggregateExec
        if a.groupingExpressions.isEmpty || partitionAxisOnly(a) => true
    case _: org.apache.spark.sql.execution.GlobalLimitExec => true
    case _: org.apache.spark.sql.execution.LocalLimitExec => true
    // orderBy+limit plans as these two instead of Global/LocalLimit;
    // both output ≤ the literal limit (the ivfSeeds centroid pick)
    case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
    case _: org.apache.spark.sql.execution.CollectLimitExec => true
    case _: LocalTableScanExec => true
    // any other aggregate's output never exceeds its input
    case a: BaseAggregateExec => boundedByConstruction(a.child)
    // a join or union of all-bounded inputs stays bounded; joins with
    // one unbounded input do NOT (one probe row may match many rows)
    case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
      // (CartesianProductExec is a BaseJoinExec — covered here)
      boundedByConstruction(j.left) && boundedByConstruction(j.right)
    case u: org.apache.spark.sql.execution.UnionExec =>
      u.children.forall(boundedByConstruction)
    // single-child output-cardinality-preserving wrappers
    case p @ (_: org.apache.spark.sql.execution.ProjectExec
        | _: org.apache.spark.sql.execution.FilterExec
        | _: org.apache.spark.sql.execution.SortExec
        | _: org.apache.spark.sql.execution.CoalesceExec
        | _: org.apache.spark.sql.execution.window.WindowExec
        | _: org.apache.spark.sql.execution.WholeStageCodegenExec
        | _: org.apache.spark.sql.execution.InputAdapter
        | _: org.apache.spark.sql.execution.exchange.Exchange) =>
      boundedByConstruction(p.children.head)
    case _ => false
  }

  /** The [[boundedByConstruction]] dominance walk over LOGICAL plans —
    * the shape the broadcast-growth gate ([[BroadcastGateSpec]]) sweeps,
    * because an explicit `broadcast()` hint lives on the optimized
    * logical `Join`, not on a physical node. Same semantics: recurse
    * from the root only through nodes whose output cardinality cannot
    * exceed the bound established below them. Scans (files, JDBC,
    * streaming) and cardinality-multiplying nodes (Generate, Expand)
    * fall through to `false`. */
  def boundedByConstructionLogical(p: LogicalPlan): Boolean = p match {
    // bounding shapes
    case _: GlobalLimit | _: LocalLimit => true
    case _: LocalRelation | _: OneRowRelation => true
    case a: Aggregate
        if a.groupingExpressions.isEmpty || partitionAxisOnlyLogical(a) => true
    // any other aggregate's output never exceeds its input
    case a: Aggregate => boundedByConstructionLogical(a.child)
    case d: Distinct => boundedByConstructionLogical(d.child)
    case d: Deduplicate => boundedByConstructionLogical(d.child)
    case s: Sample => boundedByConstructionLogical(s.child)
    // a join or union of all-bounded inputs stays bounded
    case j: Join =>
      boundedByConstructionLogical(j.left) && boundedByConstructionLogical(j.right)
    case u: Union => u.children.forall(boundedByConstructionLogical)
    // single-child output-cardinality-preserving wrappers
    case w @ (_: Project | _: Filter | _: Sort | _: SubqueryAlias
        | _: ResolvedHint | _: LogicalWindow | _: RepartitionOperation) =>
      boundedByConstructionLogical(w.children.head)
    case _ => false
  }

  /** Logical twin of [[partitionAxisOnly]]: grouping only on
    * `spark_partition_id()`-minted columns. */
  def partitionAxisOnlyLogical(a: Aggregate): Boolean =
    a.groupingExpressions.nonEmpty && a.groupingExpressions.forall {
      case n: NamedExpression =>
        n.name.startsWith("__pid") || n.name.startsWith("__tp")
      case _ => false
    }

  /** Joins in `plan` carrying an explicit BROADCAST hint whose hinted
    * side is NOT bounded by construction — the scale-killer class a
    * stats-driven auto-broadcast can't produce (the planner stops
    * broadcasting when the side outgrows the threshold, but a hint
    * FORCES the broadcast at any size; VERDICT r11 finding #1 was
    * exactly such a hint on a corpus-growing centroid table). */
  /** Count of explicit BROADCAST-hinted join sides in `plan`, bounded
    * or not — the whitelist-hygiene denominator: a whitelisted query
    * whose hint disappears entirely is stale in a DIFFERENT way than
    * one whose hinted side became structurally bounded, and the gate
    * should name which. */
  def broadcastHintCount(plan: LogicalPlan): Int = plan.collect {
    case j: Join =>
      Seq(j.hint.leftHint, j.hint.rightHint).count(
        _.exists(_.strategy.contains(BROADCAST)))
  }.sum

  def unboundedBroadcastHints(plan: LogicalPlan): Seq[String] = plan.collect {
    case j: Join =>
      Seq((j.hint.leftHint, j.left, "left"),
          (j.hint.rightHint, j.right, "right")).collect {
        case (Some(h), side, label)
            if h.strategy.contains(BROADCAST) &&
              !boundedByConstructionLogical(side) =>
          s"broadcast-hint:$label(${side.nodeName})"
      }
  }.flatten
}
