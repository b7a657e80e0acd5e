package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Round-9 durability gate: the replay e2e tests prove exactly-once
  * WITHIN one query run; this spec proves it ACROSS a restart — the
  * query is stopped cold between micro-batches and a brand-new query
  * instance resumes from the checkpoint dir. A restarted run gets a
  * fresh runId, so every state store provider reloads from checkpoint
  * files, not from the in-memory provider cache — the same path a JVM
  * crash on a real cluster takes. Runs under the RocksDB state store
  * (the cluster-scale provider) and asserts: (a) keyed GroupState
  * written BEFORE the stop drives advances emitted AFTER it, and (b)
  * the keyed sink's final contents are identical to an uninterrupted
  * run of the same batches — no lost state, no duplicated output. */
class RestartDurabilitySpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val stages = Seq("view", "click", "purchase")

  // three batches; the funnel state that makes u1's purchase an advance
  // (depth=2) is established in batch 2, BEFORE the restart point
  private val batch1 = Seq(
    TypedEvent(1L, ts("2024-01-01 10:00:00"), "view"),
    TypedEvent(2L, ts("2024-01-01 10:00:00"), "view"))
  private val batch2 = Seq(
    TypedEvent(1L, ts("2024-01-01 10:05:00"), "click"))
  private val batch3 = Seq(
    TypedEvent(1L, ts("2024-01-01 10:10:00"), "purchase"),
    TypedEvent(2L, ts("2024-01-01 10:12:00"), "click"))

  /** Run the three batches through funnelStream → mergeBatchSink,
    * optionally stopping the query cold after batch 2 and resuming
    * with a NEW query instance from the same checkpoint. */
  private def run(restart: Boolean): Seq[Row] = {
    implicit val sql = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-restart-ckpt").toString
    val sink = java.nio.file.Files.createTempDirectory("graft-restart-sink")
      .resolve("advances").toString
    val stream = MemoryStream[TypedEvent]
    def start() = EventPipeline
      .funnelStream(stream.toDS(), stages, watermark = "10 minutes",
        horizonSeconds = 24 * 3600)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch((ds: org.apache.spark.sql.Dataset[FunnelAdvance], id: Long) =>
        EventPipeline.mergeBatchSink(sink, Seq("user_id", "stage_idx"))(ds.toDF(), id))
      .start()

    val q1 = start()
    stream.addData(batch1: _*); q1.processAllAvailable()
    stream.addData(batch2: _*); q1.processAllAvailable()
    if (restart) q1.stop()
    val q2 = if (restart) start() else q1
    stream.addData(batch3: _*); q2.processAllAvailable()
    q2.stop()
    spark.read.parquet(sink)
      .select("user_id", "stage_idx", "stage", "ts")
      .collect().toSeq.sortBy(_.toString)
  }

  test("funnelStream resumes from its RocksDB checkpoint after a cold " +
    "stop: state survives, keyed sink is exactly-once vs an " +
    "uninterrupted run") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val restarted = run(restart = true)
      val straight = run(restart = false)
      assert(restarted == straight,
        s"restarted run diverged from uninterrupted run:\n" +
          s"  restarted: $restarted\n  straight:  $straight")
      // and the absolute contents are right: u1 walks all three stages
      // (stage 3 REQUIRES the pre-restart depth=2 state), u2 reaches 2
      val got = restarted.map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(got == Set((1L, 1), (1L, 2), (1L, 3), (2L, 1), (2L, 2)),
        s"advance set wrong: $got")
    } finally {
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
