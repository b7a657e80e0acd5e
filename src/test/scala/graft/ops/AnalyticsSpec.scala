package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class AnalyticsSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnel: ordered strict-after stage advancement") {
    import spark.implicits._
    val ev = Seq(
      // u1 completes the funnel in order
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:10:00"), "purchase"),
      // u2 clicks BEFORE viewing — the early click must not count
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 09:30:00"), "view"),
      // u3 view and click share a timestamp — strict-after rejects it
      (3L, ts("2024-01-01 08:00:00"), "view"),
      (3L, ts("2024-01-01 08:00:00"), "click"),
      // u4 has only non-stage events
      (4L, ts("2024-01-01 07:00:00"), "error"),
      // u5 purchases without clicking — depth stays 1
      (5L, ts("2024-01-01 06:00:00"), "view"),
      (5L, ts("2024-01-01 06:30:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")

    val out = Analytics.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .orderBy("stage_idx")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))

    assert(out === Seq((1, "view", 4L), (2, "click", 1L), (3, "purchase", 1L)))
  }

  test("funnel: later re-occurrence advances after an early skip") {
    import spark.implicits._
    // click at 09:00 (too early), view 09:30, click again 10:00 → depth 2
    val ev = Seq(
      (7L, ts("2024-01-01 09:00:00"), "click"),
      (7L, ts("2024-01-01 09:30:00"), "view"),
      (7L, ts("2024-01-01 10:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Analytics.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).orderBy("stage_idx")
      .collect().map(r => r.getLong(2)).toSeq
    assert(out === Seq(1L, 1L, 0L))
  }

  test("funnel rejects duplicate or empty stage lists") {
    import spark.implicits._
    val ev = Seq((1L, ts("2024-01-01 00:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    intercept[IllegalArgumentException] {
      Analytics.funnel(ev, "user_id", "ts", "event_type", Seq("a", "a"))
    }
    intercept[IllegalArgumentException] {
      Analytics.funnel(ev, "user_id", "ts", "event_type", Nil)
    }
  }

  test("lastTouchAttribution: last in-window touch wins; stale → none") {
    import spark.implicits._
    val ev = Seq(
      // u1: view then click then purchase → credited to click
      (1L, 10L, ts("2024-01-01 10:00:00"), "view"),
      (1L, 11L, ts("2024-01-01 10:05:00"), "click"),
      (1L, 12L, ts("2024-01-01 10:10:00"), "purchase"),
      // u2: touch outside the 7-day window → none
      (2L, 20L, ts("2024-01-01 00:00:00"), "view"),
      (2L, 21L, ts("2024-01-09 00:00:01"), "purchase"),
      // u3: no touch at all → none
      (3L, 30L, ts("2024-01-02 00:00:00"), "purchase"),
      // u4: touch AFTER the purchase must not count
      (4L, 40L, ts("2024-01-03 00:00:00"), "purchase"),
      (4L, 41L, ts("2024-01-03 01:00:00"), "click")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = Analytics.lastTouchAttribution(ev, "user_id", "ts", "event_id",
      "event_type", Seq("view", "click"), "purchase", 7L * 24 * 3600)
      .orderBy("touch_type").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out === Seq(("click", 1L), ("none", 3L)), out.mkString(", "))
  }

  test("lastTouchAttribution rejects a conversion type listed as a touch") {
    import spark.implicits._
    val ev = Seq((1L, 1L, ts("2024-01-01 00:00:00"), "purchase"))
      .toDF("user_id", "event_id", "ts", "event_type")
    intercept[IllegalArgumentException](
      Analytics.lastTouchAttribution(ev, "user_id", "ts", "event_id",
        "event_type", Seq("purchase"), "purchase", 60L))
  }

  test("cohortRetention: Monday cohorts, offset 0 is cohort size") {
    import spark.implicits._
    val ev = Seq(
      // u1 first active week of Jan 1 (Monday), returns week of Jan 8
      (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-10 10:00:00")),
      // u2 same cohort, never returns
      (2L, ts("2024-01-03 10:00:00")),
      // u3 cohort of Jan 8, returns two weeks later
      (3L, ts("2024-01-08 10:00:00")),
      (3L, ts("2024-01-22 10:00:00"))
    ).toDF("user_id", "ts")

    val out = Analytics.cohortRetention(ev, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))

    assert(out === Seq(
      ("2024-01-01", 0, 2L), ("2024-01-01", 1, 1L),
      ("2024-01-08", 0, 1L), ("2024-01-08", 2, 1L)))
  }
}
