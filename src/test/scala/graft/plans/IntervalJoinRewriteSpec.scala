package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class IntervalJoinRewriteSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def points = Seq(
    (1L, ts("2024-01-01 00:00:00")),
    (2L, ts("2024-01-01 05:59:59")),
    (3L, ts("2024-01-01 06:00:00")),
    (4L, ts("2024-01-02 12:00:00")),
    (5L, ts("2024-03-01 00:00:00")))
    .toDF("pid", "pt")

  private def ranges = Seq(
    (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 06:00:00")),
    (11L, ts("2024-01-01 03:00:00"), ts("2024-01-03 00:00:00")),
    (12L, ts("2024-01-05 00:00:00"), ts("2024-01-04 00:00:00")))
    .toDF("rid", "r_start", "r_end")

  private def naiveJoin: DataFrame =
    points.join(ranges, col("pt") >= col("r_start") && col("pt") < col("r_end"))

  /** Run `body` with the rewrite installed and its bin conf set. */
  private def withRule[A](binSeconds: Long)(body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ IntervalJoinRewrite
    spark.conf.set(IntervalJoinRewrite.binConfKey, binSeconds.toString)
    try body
    finally {
      spark.conf.unset(IntervalJoinRewrite.binConfKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq IntervalJoinRewrite)
    }
  }

  test("naive interval join is rewritten to an equi-join with same results") {
    val expected = naiveJoin.select("pid", "rid").as[(Long, Long)].collect().toSet
    assert(expected == Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L), (4L, 11L)))
    withRule(6 * 3600) {
      val df = naiveJoin
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"rewrite did not fire:\n$plan")
      assert(plan.contains("__graft_bin"), s"bin key missing:\n$plan")
      assert(df.select("pid", "rid").as[(Long, Long)].collect().toSet == expected)
    }
  }

  test("rule is inert without the conf, and leaves equi-key joins alone") {
    // no conf: naive join stays a nested loop (rule returns plan unchanged)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ IntervalJoinRewrite
    try {
      val plan = naiveJoin.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq IntervalJoinRewrite)
    }
    // equi key present: Catalyst already hash-joins; the rule must not touch it
    withRule(3600) {
      val keyed = points.withColumn("k", col("pid") % 2)
        .join(ranges.withColumn("k", col("rid") % 2),
          Seq("k"))
        .filter(col("pt") >= col("r_start") && col("pt") < col("r_end"))
      val plan = keyed.queryExecution.executedPlan.toString
      assert(!plan.contains("__graft_bin"), s"rule fired on an equi-key join:\n$plan")
    }
  }

  test("malformed bin conf disables the rule instead of failing every query") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ IntervalJoinRewrite
    spark.conf.set(IntervalJoinRewrite.binConfKey, "60s")
    try {
      // must not throw NumberFormatException from inside the optimizer
      val plan = naiveJoin.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    } finally {
      spark.conf.unset(IntervalJoinRewrite.binConfKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq IntervalJoinRewrite)
    }
  }

  test("enabled without a bin width: the rule derives one and still matches the naive join") {
    val expected = naiveJoin.select("pid", "rid").as[(Long, Long)].collect().toSet
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ IntervalJoinRewrite
    spark.conf.set(IntervalJoinRewrite.enabledConfKey, "true")
    try {
      val df = naiveJoin
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"derived rewrite did not fire:\n$plan")
      assert(plan.contains("__graft_bin"), s"bin key missing:\n$plan")
      assert(df.select("pid", "rid").as[(Long, Long)].collect().toSet == expected)
    } finally {
      spark.conf.unset(IntervalJoinRewrite.enabledConfKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq IntervalJoinRewrite)
    }
  }

  test("residual conjuncts survive the rewrite") {
    def joined = points.join(ranges,
      col("pt") >= col("r_start") && col("pt") < col("r_end") &&
        col("pid") =!= col("rid") % 7) // extra cross-side predicate
    // expected set collected with the rule UNINSTALLED
    val expected = joined.select("pid", "rid").as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty)
    withRule(6 * 3600) {
      val df = joined
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("__graft_bin"), s"rewrite did not fire:\n$plan")
      assert(df.select("pid", "rid").as[(Long, Long)].collect().toSet == expected)
    }
  }
}
