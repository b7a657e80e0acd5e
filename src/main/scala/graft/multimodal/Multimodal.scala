package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Multimodal-column operators: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, and make the Spark-side
  * plumbing (schema, batching, partition-parallel feature extraction)
  * real while the actual codec is STUBBED — this container has no
  * image/audio libraries, so `decodeStub` derives deterministic fake
  * metadata from the payload bytes. A production deployment swaps
  * `decodeStub` for a real decoder with the same column contract.
  */
object Multimodal {

  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    ColumnBridge.column(e)
  private def e(col: Column) = ColumnBridge.expression(col)

  /** 16-bucket byte-value histogram (codegen'd custom expression). */
  def byteHistogram(bin: Column): Column = c(ByteHistogram(e(bin)))

  /** Stride-sample fixed-length "frames" out of an opaque payload. */
  def frameSample(bin: Column, stride: Int, frameLen: Int): Column =
    c(FrameSample(e(bin), stride, frameLen))

  /** STUB decoder: deterministic fake (format, width, height) metadata
    * from payload length and first byte — stands in for an image decode;
    * the schema contract is what downstream operators program against. */
  def decodeStub(bin: Column): Column = {
    val n = length(bin)
    struct(
      when(n % 3 === 0, "png").when(n % 3 === 1, "jpg").otherwise("webp").as("format"),
      (n % 640 + 1).as("width"),
      ((n * 7) % 480 + 1).as("height"))
  }

  /** "Resize": truncate the payload to maxBytes (stub for a real
    * re-encode; preserves the binary-in/binary-out contract). */
  def resizeStub(bin: Column, maxBytes: Int): Column =
    substring(bin, 1, maxBytes)

  /** L1-normalized histogram feature vector from a binary payload —
    * byte-level feature extraction that IS real (not stubbed). */
  def histogramFeatures(bin: Column): Column = {
    val h = byteHistogram(bin)
    val total = greatest(length(bin).cast("double"), lit(1.0))
    transform(h, x => round(x.cast("double") / total, 6))
  }

  /** Attach multimodal features to a frame with a binary column. */
  def featurize(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("meta", decodeStub(col(binCol)))
      .withColumn("features", histogramFeatures(col(binCol)))
      .withColumn("n_bytes", length(col(binCol)))

  /** Exact shared-frame near-dup pairs over binary payloads — the
    * multimodal member of the dedup family: two payloads sharing
    * `minShared` distinct strided `frameLen`-byte frames are flagged
    * (re-encoded copies, containered duplicates, byte-level partial
    * containment). Byte-histogram cosine does NOT work for this on
    * homogeneous corpora — measured: same-vocabulary docs' histograms
    * reach cosine 0.9995 between UNRELATED pairs while 2-byte-appended
    * twins sit at 0.997, i.e. no separating threshold exists — whereas
    * exact 16-byte frame collisions between unrelated payloads are
    * ~impossible, so frame overlap separates perfectly. Plumbing is the
    * same capped-bucket kernel as the text ops
    * ([[graft.ops.Dedup.sharedWindowPairs]]); only 8-byte frame hashes
    * cross the exchange. Returns (a_id, b_id, n_shared). */
  def binaryNearDups(df: DataFrame, idCol: String, binCol: String,
      stride: Int = 32, frameLen: Int = 16,
      minShared: Int = 2, maxBucket: Int = 256): DataFrame = {
    // hash BEFORE distinct: array_distinct over array<binary> takes
    // Spark's quadratic non-hash path (BinaryType has no proper equals
    // for the hash-set fast path) — O(frames²) byte compares per row on
    // a megabyte payload; distinct over the longs is the hash-set path
    // and is semantically identical modulo the xxhash64 collisions the
    // kernel already accepts
    val banded = df.select(col(idCol).as("id"),
      explode(array_distinct(transform(
        frameSample(col(binCol), stride, frameLen),
        f => xxhash64(f)))).as("bk"))
    graft.ops.Dedup.countedPairs(banded, maxBucket, minShared)
  }
}
