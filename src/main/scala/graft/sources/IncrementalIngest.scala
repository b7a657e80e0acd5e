package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch-incremental file ingest: process only landing-zone files not
  * yet recorded in a processed-files LEDGER — the batch twin of
  * Structured Streaming's file-source checkpoint, for pipelines that
  * run as scheduled batches (the reference's cron-style re-scrapes,
  * e.g. scripts/bills/bills_federal.py re-walking a download tree)
  * rather than always-on streams.
  *
  * Contract (the standard landing-zone pattern): files are IMMUTABLE
  * once landed. A name reappearing with a different size means that
  * contract broke upstream, and the op raises rather than silently
  * serving whichever version the ledger happened to record.
  * Processing is at-least-once: the ledger commit runs only after the
  * caller's write succeeds, so a crash in between re-processes that
  * batch on the next run — idempotent sinks ([[graft.warehouse
  * .Warehouse.mergeByKey]]) absorb the replay.
  *
  * Scale shape: the ledger (one row per file EVER ingested — years of
  * batches) is never collected to the driver; the set difference is a
  * distributed anti-join, and only the NEW names come back — bounded
  * by the batch, not by table lifetime. The directory listing itself
  * is driver-side O(files-on-disk), the same cost every file source
  * pays. */
object IncrementalIngest {

  /** Files under `inputDir` not yet in the ledger, as (name, bytes),
    * name-sorted. Hidden/underscore files are ignored (Spark sink
    * metadata, manifests). Raises on an immutability violation. */
  def newFiles(spark: SparkSession, inputDir: String,
      ledgerPath: String): Seq[(String, Long)] = {
    import spark.implicits._
    val hPath = new Path(inputDir)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    val listed = fs.listStatus(hPath).filter { s =>
      val n = s.getPath.getName
      s.isFile && !n.startsWith("_") && !n.startsWith(".")
    }.map(s => (s.getPath.getName, s.getLen)).toSeq
    if (!fs.exists(new Path(ledgerPath))) return listed.sorted
    val ledger = spark.read.parquet(ledgerPath)
      .select(col("file"), col("bytes").as("__ledger_bytes"))
      .dropDuplicates("file")
    val onDisk = listed.toDF("file", "bytes")
    val changed = onDisk.join(ledger, Seq("file"))
      .filter(col("bytes") =!= col("__ledger_bytes"))
      .limit(1).collect()
    if (changed.nonEmpty) {
      val r = changed.head
      throw new IllegalStateException(
        s"landing-zone file ${r.getString(0)} changed size " +
          s"(${r.getLong(2)} → ${r.getLong(1)} bytes) after ingest — " +
          "landed files are immutable; republish under a new name")
    }
    onDisk.join(ledger, Seq("file"), "left_anti")
      .as[(String, Long)].collect().toSeq.sorted
  }

  /** Record files as processed (call AFTER the downstream write
    * succeeds — the at-least-once boundary). Append-only: one small
    * parquet file per batch; compact the ledger with
    * [[graft.warehouse.Warehouse.compact]] when batches accumulate. */
  def commit(spark: SparkSession, ledgerPath: String,
      files: Seq[(String, Long)]): Unit = {
    import spark.implicits._
    if (files.nonEmpty)
      files.toDF("file", "bytes").withColumn("ingested_batch",
        lit(java.util.UUID.randomUUID().toString))
        .write.mode("append").parquet(ledgerPath)
  }

  /** The full sandwich: read only the new files (explicit path list —
    * a stray concurrent writer can't ride in), hand the frame to
    * `write`, and commit the ledger iff it succeeds. Returns the
    * ingested file names (empty = nothing new, `write` not called). */
  def ingest(spark: SparkSession, inputDir: String, ledgerPath: String)(
      read: Seq[String] => DataFrame)(write: DataFrame => Unit): Seq[String] = {
    val nf = newFiles(spark, inputDir, ledgerPath)
    if (nf.nonEmpty) {
      val paths = nf.map { case (n, _) => new Path(inputDir, n).toString }
      write(read(paths))
      commit(spark, ledgerPath, nf)
    }
    nf.map(_._1)
  }
}
