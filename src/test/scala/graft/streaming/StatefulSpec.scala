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
}
