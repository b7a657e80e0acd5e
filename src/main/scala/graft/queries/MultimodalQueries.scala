package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.multimodal.Multimodal

/** Multimodal-column surface: documents' text encoded to binary stands in
  * for opaque image/audio payloads; byte-level plumbing is real, codec is
  * stubbed (see [[graft.multimodal.Multimodal]]). */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Binary metadata extraction (stub decode) — byte-arithmetic oracle
    "q34_multimodal_meta" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .withColumn("meta", Multimodal.decodeStub(col("payload")))
        .select(col("doc_id"),
          length(col("payload")).as("n_bytes"),
          col("meta.format").as("format"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          hex(substring(col("payload"), 1, 8)).as("head_hex"))
        .orderBy(col("doc_id"))
    }),

    // Partition-parallel feature extraction + frame sampling (rows-only).
    // The feature vector itself is exposed as a scalar digest: the driver's
    // rows-only checker sorts rows in pandas, which cannot hash a raw
    // array<double> cell (round-1 q35 crash). MultimodalSpec covers the
    // array form directly.
    "q35_multimodal_features" -> ((s, dir) => {
      val df = t(s, dir, "documents")
        .withColumn("payload", encode(col("text"), "UTF-8"))
      Multimodal.featurize(df, "payload")
        .select(col("doc_id"), col("n_bytes"),
          xxhash64(to_json(col("features"))).as("features_digest"),
          size(Multimodal.frameSample(col("payload"), 64, 16)).as("n_frames"),
          length(Multimodal.resizeStub(col("payload"), 128)).as("resized_bytes"))
        .orderBy(col("doc_id"))
    }),

    // Binary near-dup by exact shared strided frames (the multimodal
    // dedup member): planted twins = payload + 2 trailing bytes share
    // almost every frame; unrelated payloads share ~none (16-byte exact
    // collisions don't happen by chance). Golden-pinned — no DuckDB twin
    // for the capped-bucket kernel
    "q83_binary_neardup" -> ((s, dir) => {
      val base = t(s, dir, "documents")
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .select(col("doc_id"), col("payload"))
      val twins = base
        .withColumn("doc_id", col("doc_id") + 1000000)
        .withColumn("payload", concat(col("payload"), encode(lit(" x"), "UTF-8")))
      Multimodal.binaryNearDups(base.unionByName(twins), "doc_id", "payload",
        stride = 32, frameLen = 16, minShared = 2)
        .orderBy(col("a_id"), col("b_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q34_multimodal_meta" ->
      """SELECT doc_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  CASE WHEN octet_length(encode(text)) % 3 = 0 THEN 'png'
        |       WHEN octet_length(encode(text)) % 3 = 1 THEN 'jpg'
        |       ELSE 'webp' END AS format,
        |  octet_length(encode(text)) % 640 + 1 AS width,
        |  (octet_length(encode(text)) * 7) % 480 + 1 AS height,
        |  hex(encode(text))[1:16] AS head_hex
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
