package graft.ops

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism for compute-heavy per-row passes
  * (optimization round 15, guide §2: derive partitioning from the input
  * instead of trusting the scan split count).
  *
  * The quadratic/fused kernels in this library (brute-force kNN scoring,
  * MinHash/SimHash signatures, PPJoin token prep, exact cosine verify)
  * put their heavy compute in the stage that READS the corpus — which is
  * exactly right at 100 TB, where a table scans as thousands of splits.
  * But a SMALL input (one parquet file under
  * `spark.sql.files.maxPartitionBytes`) is one split, so the whole O(n²)
  * or O(n·k) pass lands on a single core while the other N−1 idle: the
  * round-15 profile showed q109's 4.6 s and q73's 4.5 s each spent in
  * ONE task of a 32-core session.
  *
  * [[widen]] repartitions such a frame to the session's default
  * parallelism — and is a structural NO-OP whenever the frame already
  * has at least that many partitions (the at-scale case), so the
  * exchange it adds exists only where the work would otherwise
  * serialize. Round-robin repartition is deterministic under Spark's
  * sort-before-repartition (SPARK-23207, on by default) and every
  * consumer kernel is partitioning-independent by this library's
  * oracle/golden discipline (bounded-heap top-k with total-order
  * tie-breaks, integer partial aggregates), which FanOutSpec pins by
  * asserting bit-identical outputs with and without the widen. */
object Fan {

  /** Repartition `df` to the session default parallelism iff it
    * currently has fewer partitions; identity otherwise. */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // physical partition count of the frame as planned (file splits for
    // a scan); computing it costs one plan translation, no job
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
