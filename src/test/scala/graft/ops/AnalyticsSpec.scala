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

  test("abConversionTest: planted arm-correlated conversions flag significant") {
    import spark.implicits._
    val users = (1L to 200L)
    val arms = users.toDF("u")
      .withColumn("arm", Corpus.hashSplit(col("u"), "t:", Seq("80" -> "a"), "b"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // arm-a users purchase, arm-b users only view → pa=1, pb=0
    val ev = users.map { u =>
      (u, if (arms(u) == "a") "purchase" else "view")
    }.toDF("user_id", "event_type")
    val out = Analytics.abConversionTest(ev, "user_id", "event_type",
      "purchase", "t:", "80").collect().head
    assert(out.getLong(0) + out.getLong(2) == 200L)
    assert(out.getLong(1) == out.getLong(0) && out.getLong(3) == 0L)
    assert(out.getInt(5) == 1, s"extreme split must be significant: $out")
  }

  test("abConversionTest: universal conversion is inconclusive (null z), not Inf") {
    import spark.implicits._
    val ev = (1L to 50L).map(u => (u, "purchase")).toDF("user_id", "event_type")
    val out = Analytics.abConversionTest(ev, "user_id", "event_type",
      "purchase", "t:", "80").collect().head
    assert(out.isNullAt(4) && out.isNullAt(5), s"degenerate se must yield nulls: $out")
  }

  test("linearTrend: recovers a planted exact line; degenerate groups → null") {
    import spark.implicits._
    val pts = Seq(
      // g1: y = 3x + 7 exactly
      ("g1", 0L, 7L), ("g1", 1L, 10L), ("g1", 2L, 13L), ("g1", 3L, 16L),
      // g2: single point → null fit
      ("g2", 5L, 5L),
      // g3: zero x-variance → null fit
      ("g3", 2L, 1L), ("g3", 2L, 9L))
      .toDF("g", "x", "y")
    val out = Analytics.linearTrend(pts, "g", col("x"), col("y"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), Option(r.get(2)), Option(r.get(3))))
    assert(out(0) === (("g1", Some(3.0), Some(7.0))), out.mkString(", "))
    assert(out(1) === (("g2", None, None)))
    assert(out(2) === (("g3", None, None)))
  }

  test("itemCooccurrence: exact cosine, support filter, deterministic cap") {
    import spark.implicits._
    // items 1,2 co-occur for 3 users; item 3 only with user 1
    val inter = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L), (3L, 2L) // duplicate interaction dedups
    ).toDF("u", "i")
    val out = Analytics.itemCooccurrence(inter, "u", "i",
      minCo = 2L, maxItemsPerUser = 10, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    // only (1,2): co=3, n_1=3, n_2=3 → sim = 3/3 = 1.0; (1,3)/(2,3) have co=1 < 2
    assert(out === Seq((1L, 2L, 3L, 1.0)), out.mkString(", "))

    // cap=2 keeps the two smallest items per user: user 1's item 3 is
    // dropped BEFORE counting, so n_3 would be 0 (and no pair survives)
    val capped = Analytics.itemCooccurrence(inter, "u", "i",
      minCo = 1L, maxItemsPerUser = 2, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.toSeq == Seq((1L, 2L)), s"cap must drop item 3: ${capped.toSeq}")
  }

  test("sessionPaths: gap splits sessions, paths capped and counted") {
    import spark.implicits._
    val ev = Seq(
      // u1 session 1: a>b ; session 2 (2h later): a>b
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, 2L, ts("2024-01-01 10:05:00"), "b"),
      (1L, 3L, ts("2024-01-01 13:00:00"), "a"),
      (1L, 4L, ts("2024-01-01 13:05:00"), "b"),
      // u2 one session: a>b
      (2L, 5L, ts("2024-01-01 09:00:00"), "a"),
      (2L, 6L, ts("2024-01-01 09:10:00"), "b"),
      // u3 one long session: 7 events, path capped at 5
      (3L, 7L, ts("2024-01-01 09:00:00"), "c"),
      (3L, 8L, ts("2024-01-01 09:01:00"), "c"),
      (3L, 9L, ts("2024-01-01 09:02:00"), "c"),
      (3L, 10L, ts("2024-01-01 09:03:00"), "c"),
      (3L, 11L, ts("2024-01-01 09:04:00"), "c"),
      (3L, 12L, ts("2024-01-01 09:05:00"), "c"),
      (3L, 13L, ts("2024-01-01 09:06:00"), "c")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = Analytics.sessionPaths(ev, "user_id", "ts", "event_id",
      "event_type", gapSeconds = 1800L, maxLen = 5, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out === Seq(("a>b", 3L), ("c>c>c>c>c", 1L)), out.mkString(", "))
  }

  test("funnelDurations: duration measured first-reach to last-reach, zero buckets kept") {
    import spark.implicits._
    val ev = Seq(
      // u1 completes in 30s → le_1m
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:00:10"), "click"),
      (1L, ts("2024-01-01 10:00:30"), "purchase"),
      // u2 completes in 2h → le_1d
      (2L, ts("2024-01-01 08:00:00"), "view"),
      (2L, ts("2024-01-01 08:30:00"), "click"),
      (2L, ts("2024-01-01 10:00:00"), "purchase"),
      // u3 never completes — excluded
      (3L, ts("2024-01-01 09:00:00"), "view")
    ).toDF("user_id", "ts", "event_type")
    val out = Analytics.funnelDurations(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"),
      Seq("le_1m" -> 60L, "le_1h" -> 3600L, "le_1d" -> 86400L), "gt_1d")
      .orderBy("bucket_idx").collect()
      .map(r => (r.getString(1), r.getLong(2)))
    assert(out === Seq(("le_1m", 1L), ("le_1h", 0L), ("le_1d", 1L), ("gt_1d", 0L)),
      out.mkString(", "))
  }

  test("funnelDurations rejects unsorted bucket thresholds") {
    import spark.implicits._
    val ev = Seq((1L, ts("2024-01-01 00:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    intercept[IllegalArgumentException](
      Analytics.funnelDurations(ev, "user_id", "ts", "event_type",
        Seq("view"), Seq("a" -> 100L, "b" -> 50L), "rest"))
  }

  test("eventTransitions: exact counts and micro-rounded row-normalized p") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, 2L, ts("2024-01-01 10:01:00"), "b"),
      (1L, 3L, ts("2024-01-01 10:02:00"), "a"),
      (1L, 4L, ts("2024-01-01 10:03:00"), "c"),
      (2L, 5L, ts("2024-01-01 10:00:00"), "a"),
      (2L, 6L, ts("2024-01-01 10:01:00"), "b")
    ).toDF("user_id", "event_id", "ts", "event_type")
    // transitions: a→b ×2, a→c ×1, b→a ×1 (u2's trailing b has no next)
    // → P(b|a)=2/3, P(c|a)=1/3, P(a|b)=1/1
    val out = Analytics.eventTransitions(ev, "user_id", "ts", "event_id", "event_type")
      .orderBy("cur", "next").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out === Seq(
      ("a", "b", 2L, 0.666667), ("a", "c", 1L, 0.333333), ("b", "a", 1L, 1.0)),
      out.mkString(", "))
  }

  test("rfmSegments: distributed exact ntile matches Spark's window ntile") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // 37 purchases across 23 users with heavy metric ties — the case
    // where ntile must split equal metrics across buckets by user order
    val ev = (1L to 37L).map { i =>
      val u = i % 23 + 1
      (u, i, ts(f"2024-01-${i % 28 + 1}%02d 12:00:00"), "purchase", (i % 5) * 10.0 + 0.25)
    }.toDF("user_id", "event_id", "ts", "event_type", "value")
    val got = Analytics.rfmSegments(ev, "user_id", "ts", "event_type",
      "purchase", "value")
    val expect = got.select("user_id", "r_days", "f", "m_cents")
      .withColumn("r_q", ntile(5).over(
        Window.orderBy(col("r_days").desc, col("user_id"))))
      .withColumn("f_q", ntile(5).over(Window.orderBy(col("f"), col("user_id"))))
      .withColumn("m_q", ntile(5).over(Window.orderBy(col("m_cents"), col("user_id"))))
    val g = got.orderBy("user_id").collect().map(_.toSeq)
    val e = expect.orderBy("user_id").collect().map(_.toSeq)
    assert(g.toSeq == e.toSeq,
      s"closed-form ntile diverged from window ntile:\n${g.zip(e).filter(p => p._1 != p._2).mkString("\n")}")
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

  test("linearAttribution: every conversion credits exactly 1e6; remainder to earliest") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(base.getTime + m * 60000L)
    val ev = Seq(
      // user 1: three touches (view, view, click) then a purchase —
      // 1e6/3: base 333333 ×3, remainder 1 to the EARLIEST (a view)
      (1L, ts(0), "view", 10L), (1L, ts(1), "view", 11L),
      (1L, ts(2), "click", 12L), (1L, ts(3), "purchase", 13L),
      // user 2: purchase with no touches → 'none'
      (2L, ts(5), "purchase", 20L),
      // user 3: touch AFTER the purchase must not credit
      (3L, ts(9), "purchase", 30L), (3L, ts(10), "click", 31L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val got = graft.ops.Analytics.linearAttribution(ev, "user_id", "ts",
      "event_id", "event_type", Seq("view", "click"), "purchase", 3600L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_conversions"), r.getAs[Long]("credit_micro"))).toMap
    assert(got("view") == ((1L, 666667L)), got.toString)   // 333334 + 333333
    assert(got("click") == ((1L, 333333L)), got.toString)
    assert(got("none") == ((2L, 2000000L)), got.toString)
    assert(got.values.map(_._2).sum == 3000000L, "credit leaked")
  }

  test("kaplanMeier: censoring holds subjects at risk; terminal time drops to 0") {
    import spark.implicits._
    // durations: 1(event), 2(event), 2(censored), 3(event)
    // t=1: n=4, d=1 → S=3/4; t=2: n=3, d=1 (censor counts in n, not d)
    // → S=1/2; t=3: n=1, d=1 → terminal, S=0
    val df = Seq((1L, true), (2L, true), (2L, false), (3L, true))
      .toDF("dur", "ev")
    val rows = graft.ops.Analytics.kaplanMeier(df, col("dur"), col("ev"))
      .orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getAs[Long]("surv_micro")))
    assert(rows.toSeq == Seq(
      (1L, 4L, 1L, 750000L),
      (2L, 3L, 1L, 500000L),
      (3L, 1L, 1L, 0L)), rows.toSeq.toString)
    // dropping the censored row would misreport S(2) as 1/2·... —
    // prove the censor changed the curve: without it S(2) = 3/4·1/2
    val without = graft.ops.Analytics.kaplanMeier(
      Seq((1L, true), (2L, true), (3L, true)).toDF("dur", "ev"),
      col("dur"), col("ev"))
      .orderBy("t").collect().map(_.getAs[Long]("surv_micro"))
    assert(without.toSeq == Seq(666667L, 333333L, 0L), without.toSeq.toString)
  }
}
