package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

class StatefulSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stateful sessionization: sessions survive micro-batch boundaries") {
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[RawEvent]
    val q = EventPipeline.sessionizeStream(stream.toDS(), gapSeconds = 1800,
      watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()

    // batch 1: two events 10 min apart — one open session
    stream.addData(
      RawEvent(1L, ts("2024-01-01 10:00:00")),
      RawEvent(1L, ts("2024-01-01 10:10:00")))
    q.processAllAvailable()
    assert(spark.table("sessions_out").count() == 0) // still open

    // batch 2: +20 min (same session, state carried across batches),
    // then a 2-hour gap closes it
    stream.addData(
      RawEvent(1L, ts("2024-01-01 10:30:00")),
      RawEvent(1L, ts("2024-01-01 13:00:00")))
    q.processAllAvailable()
    val closed = spark.table("sessions_out").as[ClosedSession].collect()

    assert(closed.length == 1)
    val s = closed.head
    assert(s.user_id == 1L)
    assert(s.n_events == 3L) // 10:00, 10:10, 10:30 — across two micro-batches
    assert(s.session_start == ts("2024-01-01 10:00:00"))
    assert(s.session_end == ts("2024-01-01 10:30:00"))

    // user 1 goes idle with a session open at 13:00. Other-user traffic
    // advances the watermark past 13:00 + gap, so the event-time timeout
    // must close user 1's final session WITHOUT another user-1 event —
    // this is what bounds state for idle keys (round 1's NoTimeout never
    // closed it and kept the state forever).
    stream.addData(RawEvent(2L, ts("2024-01-01 16:00:00")))
    q.processAllAvailable()
    stream.addData(RawEvent(2L, ts("2024-01-01 16:01:00")))
    q.processAllAvailable()
    val after = spark.table("sessions_out").as[ClosedSession].collect()
    q.stop()
    val u1Final = after.filter(c => c.user_id == 1L && c.session_seq == 2L)
    assert(u1Final.length == 1, s"idle session not closed by timeout: ${after.toSeq}")
    assert(u1Final.head.n_events == 1L)
    assert(u1Final.head.session_start == ts("2024-01-01 13:00:00"))
    assert(u1Final.head.session_end == ts("2024-01-01 13:00:00"))
  }

  test("native session_window aggregates a watermarked stream (q137's live twin)") {
    import org.apache.spark.sql.functions._
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[RawEvent]
    val q = stream.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("start"), col("n"))
      .writeStream.outputMode("append")
      .format("memory").queryName("sw_out").start()
    // one 2-event session, then other-user traffic pushes the watermark
    // far past its close so the append-mode result finalizes
    stream.addData(
      RawEvent(1L, ts("2024-01-01 10:00:00")),
      RawEvent(1L, ts("2024-01-01 10:10:00")))
    q.processAllAvailable()
    stream.addData(RawEvent(2L, ts("2024-01-01 14:00:00")))
    q.processAllAvailable()
    stream.addData(RawEvent(2L, ts("2024-01-01 15:00:00")))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sw_out")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    assert(out.exists(r => r._1 == 1L && r._2 == ts("2024-01-01 10:00:00") && r._3 == 2L),
      s"user-1 session not finalized: ${out.toSeq}")
  }

  test("streaming funnel: advances survive batches, match the batch twin in-order") {
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[TypedEvent]
    val q = EventPipeline.funnelStream(stream.toDS(),
      Seq("view", "click", "purchase"), watermark = "10 minutes",
      horizonSeconds = 24 * 3600)
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_out").start()

    // batch 1: u1 views; u2 clicks BEFORE viewing (skip); u3 view+click
    // at the same timestamp (strict-after rejects the click)
    stream.addData(
      TypedEvent(1L, ts("2024-01-01 10:00:00"), "view"),
      TypedEvent(2L, ts("2024-01-01 09:00:00"), "click"),
      TypedEvent(2L, ts("2024-01-01 09:30:00"), "view"),
      TypedEvent(3L, ts("2024-01-01 08:00:00"), "view"),
      TypedEvent(3L, ts("2024-01-01 08:00:00"), "click"))
    q.processAllAvailable()
    val b1 = spark.table("funnel_out").as[FunnelAdvance].collect()
    assert(b1.count(_.stage_idx == 1) == 3, s"batch1: ${b1.toSeq}")
    assert(b1.count(_.stage_idx == 2) == 0, "early/same-ts clicks must not advance")

    // batch 2: u1 clicks then purchases — state carried across batches;
    // the full funnel completes and emits both advances
    stream.addData(
      TypedEvent(1L, ts("2024-01-01 10:05:00"), "click"),
      TypedEvent(1L, ts("2024-01-01 10:10:00"), "purchase"))
    q.processAllAvailable()
    val b2 = spark.table("funnel_out").as[FunnelAdvance].collect()
    q.stop()
    assert(b2.count(_.stage_idx == 2) == 1 && b2.count(_.stage_idx == 3) == 1)

    // live funnel counts (count per stage over the advance log) match
    // the batch operator on the same events delivered in order
    import org.apache.spark.sql.functions.col
    val static = spark.createDataFrame(Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 09:30:00"), "view"),
      (3L, ts("2024-01-01 08:00:00"), "view"),
      (3L, ts("2024-01-01 08:00:00"), "click"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:10:00"), "purchase")))
      .toDF("user_id", "ts", "event_type")
    val batch = graft.ops.Analytics.funnel(static, "user_id", "ts",
      "event_type", Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    val live = b2.groupBy(_.stage_idx).view.mapValues(_.length.toLong).toMap
    assert((1 to 3).forall(i => batch(i) == live.getOrElse(i, 0L)),
      s"live $live vs batch $batch")
  }
}
