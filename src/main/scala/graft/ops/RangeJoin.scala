package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range-containment) join: every point row is matched to
  * every range row whose half-open interval `[start, end)` contains it.
  * The interval sibling of [[AsOfJoin]] (SURVEY §2.4's non-equi family).
  *
  * Naive Spark spells this as a join on `pt >= start && pt < end` — a
  * non-equi predicate with no equi-key, which Catalyst can only execute
  * as a broadcast nested loop (fine for a dimension-sized range side,
  * fatal when both sides are big: O(|points|·|ranges|) compares and the
  * range side must fit in memory whole). The scale form here converts
  * containment into an EQUI-join on a time bin: each point lands in
  * exactly one bin of width `binSeconds`, each range explodes into the
  * bins its span covers, and the exact predicate re-verifies each
  * candidate. Because a point has exactly ONE bin, a matching
  * (point, range) pair meets in exactly one bin — no duplicate
  * elimination shuffle is needed.
  *
  * Cost model: the shuffle carries |points| + Σ(span/binSeconds + 1)
  * rows; pick `binSeconds` near the median range span so typical ranges
  * explode into ~2 bins. A hot bin (event burst) is ordinary equi-join
  * skew — AQE's skew-join split applies, no custom salting needed.
  *
  * Every explode is capped at [[RangeJoin.MaxBinsPerRange]] bins per
  * row: one open-ended or sentinel-dated range (end = 9999-12-31) with
  * a small bin width would otherwise materialize a multi-billion-element
  * sequence and OOM an executor. A row over the cap RAISES (per-row,
  * lazy) rather than being clamped or dropped — a sentinel date in the
  * range side is a data bug upstream filtering must resolve, and either
  * silent choice (truncating the range's coverage or skipping it)
  * silently loses matches.
  */
object RangeJoin {

  /** Upper bound on bins a single range row may explode into — 5–6
    * orders of magnitude above the ~2-bin design point, so it only
    * fires on genuinely pathological spans (a sentinel end = 9999-12-31
    * against a 1-second bin is ~2.5e11 bins), while capping the
    * worst-case explode memory at ~8 MB/row. A deliberately-mismatched
    * bin width (stress tests, exploratory queries) stays under it. */
  val MaxBinsPerRange: Long = 1L << 20

  /** `endBin` guarded by the per-row cap: raises with the offending
    * span instead of exploding an unbounded sequence. */
  private def cappedEndBin(startBin: Column, endBin: Column): Column =
    when(endBin - startBin >= MaxBinsPerRange,
      raise_error(concat(
        lit(s"range spans more than $MaxBinsPerRange bins ("),
        endBin - startBin + 1,
        lit(" ) — filter sentinel/open-ended ranges or raise binSeconds")))
        .cast("long"))
      .otherwise(endBin)

  /** Inner interval join of timestamp `ptCol` in `points` against
    * `[startCol, endCol)` in `ranges` via the binned equi-join above.
    * Empty or inverted ranges (`end <= start`) match nothing and are
    * dropped before the explode (`sequence` would raise on a descending
    * span). Column names must not collide across the two inputs apart
    * from the bin key this op adds and removes. */
  def binnedIntervalJoin(points: DataFrame, ranges: DataFrame,
      ptCol: String, startCol: String, endCol: String,
      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive: $binSeconds")
    require(!points.columns.contains("__bin") && !ranges.columns.contains("__bin"),
      "binnedIntervalJoin reserves column __bin")
    val binMicros = binSeconds * 1000000L
    def binOf(tsCol: String) = floor(unix_micros(col(tsCol)) / binMicros)
    val binnedPts = points.withColumn("__bin", binOf(ptCol))
    val binnedRanges = ranges
      .filter(col(endCol) > col(startCol))
      // end is exclusive, but a range ending exactly on a bin boundary
      // still owns that boundary instant's bin-mates below it; covering
      // bins floor(start/W)..floor(end/W) errs one bin wide at worst —
      // the exact predicate prunes it
      .withColumn("__bin", explode(sequence(binOf(startCol),
        cappedEndBin(binOf(startCol), binOf(endCol)))))
    binnedPts.join(binnedRanges, Seq("__bin"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__bin")
  }

  /** Interval-OVERLAP join: every `a` interval matched to every `b`
    * interval it overlaps (half-open: `aStart < bEnd && bStart < aEnd`).
    * The interval×interval generalization of [[binnedIntervalJoin]] —
    * overlapping sessions, co-occurrence windows, temporal containment.
    *
    * Both sides explode into covered bins and equi-join on the bin; an
    * overlapping pair shares every bin of its (non-empty) intersection,
    * so it would meet once per shared bin — the FIRST-shared-bin guard
    * (`__bin == greatest(a's start bin, b's start bin)`) keeps exactly
    * one meeting per pair, making the join dedup-free: no
    * `dropDuplicates` exchange over the candidate set. Inverted/empty
    * intervals are dropped before the explode. Column names must not
    * collide across inputs. */
  def binnedOverlapJoin(a: DataFrame, b: DataFrame,
      aStart: String, aEnd: String, bStart: String, bEnd: String,
      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive: $binSeconds")
    val reserved = Seq("__bin", "__sa", "__sb")
    require(!reserved.exists(c => a.columns.contains(c) || b.columns.contains(c)),
      s"binnedOverlapJoin reserves columns ${reserved.mkString(", ")}")
    val binMicros = binSeconds * 1000000L
    def binOf(tsCol: String) = floor(unix_micros(col(tsCol)) / binMicros)
    val aBinned = a.filter(col(aEnd) > col(aStart))
      .withColumn("__sa", binOf(aStart))
      .withColumn("__bin", explode(sequence(col("__sa"),
        cappedEndBin(col("__sa"), binOf(aEnd)))))
    val bBinned = b.filter(col(bEnd) > col(bStart))
      .withColumn("__sb", binOf(bStart))
      .withColumn("__bin", explode(sequence(col("__sb"),
        cappedEndBin(col("__sb"), binOf(bEnd)))))
    aBinned.join(bBinned, Seq("__bin"))
      .filter(col("__bin") === greatest(col("__sa"), col("__sb")))
      .filter(col(aStart) < col(bEnd) && col(bStart) < col(aEnd))
      .drop("__bin", "__sa", "__sb")
  }
}
