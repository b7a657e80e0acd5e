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

    // Frame-sampling manifest, ORACLE-checked: the strided FrameSample
    // codegen kernel's output (count, sampled bytes, first/last frame)
    // reproduced independently by DuckDB blob slicing — the video
    // frame-extract plumbing proven byte-exact, not just rows-only
    "q201_frame_manifest" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .withColumn("frames", Multimodal.frameSample(col("payload"), 64, 16))
        .select(col("doc_id"),
          size(col("frames")).as("n_frames"),
          expr("aggregate(frames, 0L, (a, f) -> a + CAST(length(f) AS BIGINT))")
            .as("sampled_bytes"),
          hex(element_at(col("frames"), 1)).as("first_hex"),
          hex(element_at(col("frames"), size(col("frames")))).as("last_hex"))
        .orderBy(col("doc_id"))
    }),

    // Chunked-storage manifest: fixed 256-byte chunk rows per payload —
    // the multipart-upload shape a blob store ingests; dynamic-offset
    // binary substring both sides, chunk set hash-compared
    "q202_chunk_manifest" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .withColumn("n", length(col("payload")))
        .select(col("doc_id"), col("payload"),
          explode(expr("sequence(0, CAST((n + 255) div 256 AS INT) - 1)"))
            .as("chunk_idx"))
        .select(col("doc_id"), col("chunk_idx"),
          length(expr("substring(payload, chunk_idx * 256 + 1, 256)"))
            .as("chunk_bytes"),
          hex(expr("substring(payload, chunk_idx * 256 + 1, 8)"))
            .as("chunk_head_hex"))
        .orderBy(col("doc_id"), col("chunk_idx"))
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
        .withColumn("doc_id", col("doc_id") + 1099511627776L)
        .withColumn("payload", concat(col("payload"), encode(lit(" x"), "UTF-8")))
      Multimodal.binaryNearDups(base.unionByName(twins), "doc_id", "payload",
        stride = 32, frameLen = 16, minShared = 2)
        .orderBy(col("a_id"), col("b_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    // DuckDB cannot slice BLOBs — the twin slices the HEX string
    // (2 chars per byte, 1-based inclusive [a:b]) instead
    "q201_frame_manifest" ->
      """WITH p AS (SELECT doc_id, hex(encode(text)) AS h,
        |    octet_length(encode(text)) AS n FROM documents),
        |f AS (SELECT doc_id, h, n, (n + 63) // 64 AS n_frames FROM p),
        |s AS (SELECT doc_id,
        |    CAST(sum(least(16, n - i * 64)) AS BIGINT) AS sampled_bytes
        |  FROM f, unnest(generate_series(0, n_frames - 1)) AS u(i)
        |  GROUP BY 1)
        |SELECT f.doc_id, CAST(f.n_frames AS INT) AS n_frames,
        |  s.sampled_bytes,
        |  h[1:32] AS first_hex,
        |  h[CAST((n_frames - 1) * 64 * 2 + 1 AS INT)
        |    : CAST((n_frames - 1) * 64 * 2
        |        + 2 * least(16, n - (n_frames - 1) * 64) AS INT)]
        |    AS last_hex
        |FROM f JOIN s USING (doc_id) ORDER BY doc_id""".stripMargin,

    "q202_chunk_manifest" ->
      """WITH p AS (SELECT doc_id, hex(encode(text)) AS h,
        |    octet_length(encode(text)) AS n FROM documents)
        |SELECT doc_id, CAST(i AS INT) AS chunk_idx,
        |  CAST(least(256, n - i * 256) AS INT) AS chunk_bytes,
        |  h[CAST(i * 512 + 1 AS INT)
        |    : CAST(i * 512 + 2 * least(8, n - i * 256) AS INT)]
        |    AS chunk_head_hex
        |FROM p, unnest(generate_series(0, (n + 255) // 256 - 1)) AS u(i)
        |ORDER BY doc_id, chunk_idx""".stripMargin,

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
