package graft

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
}
