package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  * Spark 4 made the converters `private[sql]`, so third-party expression
  * libraries expose them via a shim in the `org.apache.spark.sql`
  * package — the standard extension-point pattern. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Execute a raw LogicalPlan as a DataFrame (`Dataset.ofRows` went
    * `private[sql]` with the Spark 4 connect split) — used by optimizer
    * rules that need a statistics probe over a subplan. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** True iff `key` was EXPLICITLY set on this session. The public
    * `RuntimeConfig.getOption` falls back to a registered conf entry's
    * DEFAULT (SQLConf.getConfString does), so it cannot distinguish
    * "user set spark.sql.adaptive.enabled=true" from "never touched" —
    * `SQLConf.contains` checks the explicit-settings map only. Needed
    * by [[graft.ops.Pin.pinAligned]]'s restore-by-unset branch. */
  def explicitlySet(spark: org.apache.spark.sql.SparkSession,
      key: String): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.conf.contains(key)
}
