package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering for write-time
  * organization of 100 TB tables. Parquet row groups carry min/max
  * statistics per column; a scan with a selective predicate skips any
  * file/row-group whose stats exclude it — but only if the writer
  * CLUSTERED the data so each file covers a narrow value range. A sort
  * on one column gives perfect skipping on that column and none on any
  * other; interleaving the bits of several columns (Morton / z-order)
  * gives every interleaved column locality, so bounding-box pruning
  * works for predicates on ANY of them. This is the standard layout
  * trick of lakehouse table formats, built here from plain Spark
  * primitives: a bit-twiddling z-value Column + repartitionByRange on it.
  */
object Layout {

  /** Spread the low 16 bits of `x` so one empty bit separates each data
    * bit (0b1111 → 0b01010101): four magic-mask multiply-free steps, the
    * classic constant-time Morton spreading — codegen-friendly arithmetic
    * on longs, no UDF, no loop. */
  private def spread16(x: Column): Column = {
    val a = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton (z-order) value of two dimension columns, each first
    * clamped into [0, 65536) by the caller-supplied bucketization (pass
    * raw columns only if they already fit 16 bits). Even bits carry `x`,
    * odd bits carry `y`. Pure arithmetic — stays inside whole-stage
    * codegen and is exactly reproducible in any engine with shifts and
    * masks (the DuckDB oracle runs the same four-step spreading). */
  def zValue(x: Column, y: Column): Column =
    spread16(x.cast("long").bitwiseAND(lit(0xFFFFL))).bitwiseOR(
      shiftleft(spread16(y.cast("long").bitwiseAND(lit(0xFFFFL))), 1))

  /** N-dimensional Morton value — bit `i` of dimension `d` lands at
    * position `i·N + d` — for layouts clustered on more than two
    * columns (the (lat, lon, time) case). Built as a flat OR-chain of
    * shift-and-mask terms (`bitsPerDim × N` of them): less elegant than
    * [[zValue]]'s four magic-mask steps, but the magic constants only
    * exist for the 2-D interleave, and the chain is still pure codegen
    * arithmetic with no UDF. `N · bitsPerDim` must fit a positive long
    * (≤ 63 bits); each dimension is masked into `[0, 2^bitsPerDim)`.
    * For N = 2 this is bit-identical to [[zValue]] (LayoutSpec). */
  def zValueN(dims: Seq[Column], bitsPerDim: Int): Column = {
    val n = dims.size
    require(n >= 2, s"zValueN needs at least 2 dimensions, got $n")
    require(bitsPerDim > 0 && n * bitsPerDim <= 63,
      s"n*bitsPerDim must be in (0, 63]: $n * $bitsPerDim")
    val mask = (1L << bitsPerDim) - 1
    dims.zipWithIndex.map { case (c, d) =>
      val x = c.cast("long").bitwiseAND(lit(mask))
      (0 until bitsPerDim).map(i =>
        shiftleft(shiftrightunsigned(x, i).bitwiseAND(lit(1L)), i * n + d))
        .reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** Cluster `df` into `numFiles` z-ordered shards on two dimension
    * columns: range-partition by z-value (sampled range bounds — no
    * global sort) and sort each shard locally so row groups inside a
    * file are tight too. Each output file then covers a compact z-range,
    * i.e. a small rectangle in (x, y) space — min/max stats prune it for
    * predicates on either dimension. The z column is dropped before the
    * write; pass `keepZ = true` to keep it for inspection. */
  def zOrderShards(df: DataFrame, x: Column, y: Column, numFiles: Int,
      keepZ: Boolean = false): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive: $numFiles")
    require(!df.columns.contains("__z"), "zOrderShards reserves column __z")
    val z = df.withColumn("__z", zValue(x, y))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
    if (keepZ) z else z.drop("__z")
  }

  /** Hilbert-curve clustering key (graft.functions.HilbertKernel):
    * strictly better locality than [[zValue]] — consecutive curve
    * positions are always grid neighbors, so range-sharded files cover
    * tighter bounding boxes (LayoutSpec measures it). Each input is
    * masked into [0, 2^order). */
  def hilbertValue(x: Column, y: Column, order: Int = 16): Column =
    graft.functions.hilbertIndex(x, y, order)

  /** [[zOrderShards]] with the Hilbert key. */
  def hilbertShards(df: DataFrame, x: Column, y: Column, numFiles: Int,
      order: Int = 16): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive: $numFiles")
    require(!df.columns.contains("__h"), "hilbertShards reserves column __h")
    df.withColumn("__h", hilbertValue(x, y, order))
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
  }

  /** File-skipping efficacy of a layout, measured the way an engine
    * actually prunes: rows are cut into `nFiles` equal files in
    * `orderMetric` order (exact distributed ntile — no global sort),
    * each file keeps (min, max) zone-map stats on x and y, and a box
    * query touches a file iff both ranges overlap the box. Comparing
    * the same box under a Z-order metric vs a linear key is the
    * quantified answer to "why cluster at all" — rows_scanned over
    * rows_matched is the read amplification the layout buys down.
    *
    * Returns one row: layout, n_files, files_touched, rows_matched,
    * rows_scanned. */
  def fileSkipStats(df: DataFrame, orderMetric: Column, tieCol: Column,
      nFiles: Int, xCol: Column, yCol: Column,
      xLo: Long, xHi: Long, yLo: Long, yHi: Long,
      label: String): DataFrame = {
    require(nFiles >= 2, s"nFiles must be >= 2, got $nFiles")
    require(xLo <= xHi && yLo <= yHi, "box bounds must be ordered")
    val base = df.select(orderMetric.as("__m"), tieCol.as("__t"),
      xCol.cast("long").as("x"), yCol.cast("long").as("y"))
    val filed = Analytics.ntileExact(base, col("__m"), col("__t"),
      nFiles, "file_id")
    val perFile = filed.groupBy(col("file_id"))
      .agg(min(col("x")).as("minx"), max(col("x")).as("maxx"),
        min(col("y")).as("miny"), max(col("y")).as("maxy"),
        count(lit(1)).as("n"),
        sum(when(col("x").between(xLo, xHi)
          && col("y").between(yLo, yHi), 1L).otherwise(0L)).as("matched"))
      .withColumn("touched",
        col("maxx") >= xLo && col("minx") <= xHi
          && col("maxy") >= yLo && col("miny") <= yHi)
    perFile.agg(count(lit(1)).as("n_files"),
        sum(when(col("touched"), 1L).otherwise(0L)).as("files_touched"),
        sum(col("matched")).as("rows_matched"),
        sum(when(col("touched"), col("n")).otherwise(0L)).as("rows_scanned"))
      .select(lit(label).as("layout"), col("n_files"), col("files_touched"),
        col("rows_matched"), col("rows_scanned"))
  }
}
