package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.warehouse.Warehouse

/** Structured-Streaming-compatible event transforms (SURVEY §2.10).
  *
  * The reference has no stream processing — its incremental-ness is the
  * idempotent batch upsert (reference: scripts/database/database.py:51-73).
  * We model ingestion as pure DataFrame→DataFrame functions that run
  * identically over a static frame (batch refresh, DuckDB-oracle-checked
  * via q10/q33) and under `readStream` (watermark + windowed state). The
  * merge sink is the `foreachBatch` body.
  */
object EventPipeline {

  /** Hourly tumbling-window rollup. On a stream, apply after
    * `withWatermark("ts", ...)`; uses `window()` so state is bounded. */
  def hourlyRollupStreaming(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("sum_value"))

  /** Batch twin of [[hourlyRollupStreaming]] (same grouping, no watermark
    * needed) — what q10_event_hourly checks against DuckDB. */
  def hourlyRollupBatch(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** foreachBatch body: merge a micro-batch into the keyed table at
    * `tablePath` (create on first batch). Parquet overwrite of the merged
    * result — at cluster scale this table would be bucketed by the key so
    * the anti-join side stays shuffle-free. */
  def mergeBatchSink(tablePath: String, keys: Seq[String])(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val merged =
      if (new java.io.File(tablePath).exists()) {
        val existing = spark.read.parquet(tablePath)
        Warehouse.mergeByKey(existing, batch, keys)
      } else batch
    val tmp = tablePath + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    // atomic-ish swap (single-FS local semantics; object stores would
    // version the table instead)
    val fs = new java.io.File(tablePath)
    if (fs.exists()) {
      val old = new java.io.File(tablePath + ".old")
      if (old.exists()) old.delete()
      fs.renameTo(old)
    }
    new java.io.File(tmp).renameTo(new java.io.File(tablePath))
  }
}
