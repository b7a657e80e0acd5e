package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics operators over event logs: ordered conversion
  * funnels and cohort retention. The reference's event handling stops at
  * per-table upserts (scripts/events has no analytics layer); these are
  * the standard OLAP companions every event warehouse grows, and both
  * are oracle-expressible so they ride the exact-correctness gate.
  *
  * Scale notes: both operators shuffle the event log exactly once on
  * the user key. The funnel folds each user's stage events with the
  * codegen'd `aggregate` higher-order function over a per-user sorted
  * array — per-user event counts are activity-bounded, the standard
  * assumption behind every sessionizer (q33 makes it too). No window
  * over a global sort, no self-join per stage.
  */
object Analytics {

  /** Ordered conversion funnel: a user reaches stage k when an event of
    * `stages(k-1)` occurs STRICTLY after the time they reached stage
    * k-1 (classic funnel semantics — a same-timestamp later stage does
    * not count, and out-of-order stage events are skipped, not
    * re-ordered). Returns one row per stage:
    * (stage_idx 1-based, stage, n_users reaching it).
    *
    * One shuffle (groupBy user); the fold runs inside whole-stage
    * codegen; stage counts come off a single partial aggregate and a
    * driver-free `stack` unpivot.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      s"funnel stages must be non-empty and distinct, got $stages")
    require(stages.forall(_.matches("[A-Za-z0-9_ .-]+")),
      s"funnel stage names must be plain identifiers, got $stages")

    // event_type -> 1-based stage index; non-stage events dropped at the scan
    val idx = stages.zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (st, i)) => when(col(typeCol) === st, lit(i + 1)).otherwise(acc)
    }
    val perUser = events
      .select(col(userCol).as("u"), col(tsCol).as("ts"), idx.as("stage_idx"))
      .filter(col("stage_idx").isNotNull)
      .groupBy(col("u"))
      .agg(sort_array(collect_list(struct(col("ts"), col("stage_idx")))).as("evs"))

    // Fold in time order: advance iff the event is the next needed stage
    // and strictly after the previous reach time.
    val depth = aggregate(
      col("evs"),
      struct(lit(0).as("depth"),
        lit("1800-01-01 00:00:00").cast("timestamp").as("reached")),
      (acc, e) =>
        when(e.getField("stage_idx") === acc.getField("depth") + 1 &&
          (acc.getField("depth") === 0 ||
            e.getField("ts") > acc.getField("reached")),
          struct((acc.getField("depth") + 1).as("depth"),
            e.getField("ts").as("reached")))
          .otherwise(acc),
      acc => acc.getField("depth"))

    val depths = perUser.select(depth.as("depth"))
    val sums = stages.indices.map(i =>
      sum(when(col("depth") >= i + 1, 1L).otherwise(0L)).as(s"n$i"))
    val one = depths.agg(sums.head, sums.tail: _*)
    val stack = stages.zipWithIndex
      .map { case (s, i) => s"${i + 1}, '$s', n$i" }.mkString(", ")
    one.select(expr(
      s"stack(${stages.size}, $stack) AS (stage_idx, stage, n_users)"))
  }

  /** Last-touch conversion attribution: each conversion event is
    * credited to the user's most recent touch event (row-order
    * predecessor under (ts, tieCol)) of an attributable type, provided
    * it happened within `windowSeconds`; conversions with no in-window
    * touch credit `"none"`. Returns (touch_type, n_conversions).
    *
    * One shuffle + one sort per user (the q33 sessionize cost shape):
    * the last touch rides a running `last(..., ignoreNulls)` window
    * over ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING — no
    * touch×conversion self-join, no per-conversion probe. */
  def lastTouchAttribution(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, touchTypes: Seq[String],
      conversionType: String, windowSeconds: Long): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(conversionType),
      s"touch types must be non-empty and exclude the conversion type, " +
        s"got $touchTypes / $conversionType")
    require(windowSeconds > 0, s"attribution window must be positive, got $windowSeconds")
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col(typeCol).isin(touchTypes.map(x => x: Any): _*),
      struct(col(tsCol).as("ts"), col(typeCol).as("typ")))
    events
      .withColumn("__lt", last(touch, ignoreNulls = true).over(byUser))
      .filter(col(typeCol) === conversionType)
      .select(
        when(col("__lt").isNull ||
          unix_micros(col(tsCol)) - unix_micros(col("__lt.ts")) >
            windowSeconds * 1000000L, lit("none"))
          .otherwise(col("__lt.typ")).as("touch_type"))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_conversions"))
  }

  /** Weekly cohort retention: cohort = ISO week (Monday-truncated) of a
    * user's first event; a (cohort_week, week_offset) cell counts the
    * distinct cohort users active in that later week. week_offset 0 is
    * by construction the cohort size. One shuffle on user for the
    * first-event aggregate, one distinct on (user, week) — the join is
    * user-keyed and AQE-sized.
    */
  def cohortRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val first = events
      .groupBy(col(userCol).as("u"))
      .agg(min(col(tsCol)).as("first_ts"))
      .select(col("u"),
        date_trunc("week", col("first_ts")).cast("date").as("cohort_week"))
    val weekly = events
      .select(col(userCol).as("u"),
        date_trunc("week", col(tsCol)).cast("date").as("week"))
      .distinct()
    weekly.join(first, "u")
      .groupBy(col("cohort_week"),
        // both sides are Monday-truncated, so the day gap is an exact
        // multiple of 7 and the integer division is lossless
        (datediff(col("week"), col("cohort_week")) / 7).cast("int")
          .as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
