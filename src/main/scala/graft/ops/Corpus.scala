package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for training-data pipelines:
  * deterministic hash splits, benchmark-contamination scoring, and
  * sequence packing. All set-oriented (no driver loops), shuffle-minimal,
  * and engine-portable — each has an exact SQL twin, so every one is
  * DuckDB-oracle-checked rather than rows-only.
  */
object Corpus {

  /** Deterministic hash-bucket assignment: compare the md5 hex prefix of
    * (salt + key) against ascending per-split hex thresholds. Properties
    * that matter at 100 TB: a doc's split never changes as other docs
    * arrive (pure function of the key), the operator is map-only (zero
    * shuffles, no global sort, no sampling pass), and md5-hex +
    * lexicographic compare behave identically in any engine. `cuts` are
    * (exclusive-upper-hex-threshold, label) pairs; a 2-hex-digit prefix
    * gives 1/256 resolution ("cd" ≈ 80.1%, "e6" ≈ 89.8%). Rows past the
    * last cut get `rest`. For near-duplicate-aware splitting (no twin
    * straddles the boundary) see [[Dedup]] + the q50 leakage-safe split —
    * this operator is the plain i.i.d. baseline. */
  def hashSplit(key: Column, salt: String, cuts: Seq[(String, String)],
      rest: String): Column = {
    // md5 yields lowercase hex and the chained when() evaluates in list
    // order, so a misordered or uppercase cut list would silently
    // mis-assign every row — reject it at entry instead
    val thresholds = cuts.map(_._1)
    require(thresholds.forall(_.matches("[0-9a-f]+")),
      s"hashSplit cuts must be lowercase hex, got: ${thresholds.mkString(", ")}")
    require(thresholds == thresholds.sorted,
      s"hashSplit cuts must be ascending, got: ${thresholds.mkString(", ")}")
    val h = substring(md5(concat(lit(salt), key.cast("string"))), 1, 2)
    val chained = cuts.foldLeft(Option.empty[Column]) {
      case (None, (cut, label)) => Some(when(h < cut, label))
      case (Some(c), (cut, label)) => Some(c.when(h < cut, label))
    }
    chained.map(_.otherwise(rest)).getOrElse(lit(rest))
  }

  /** All word n-grams of a token-array column as space-joined strings
    * (possibly with repeats — wrap in `array_distinct` for the set).
    * The `size >= n` guard matters: an unguarded `sequence(1, size-n+1)`
    * silently becomes a DESCENDING sequence [1, 0] on short docs. */
  def wordNgrams(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      transform(sequence(lit(1), size(tokens) - (n - 1)),
        i => array_join(slice(tokens, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Benchmark-contamination scoring: for every probe doc, how many of
    * its distinct word n-grams appear in ANY benchmark doc. The standard
    * train-set decontamination check (n-gram overlap against eval sets).
    *
    * Scale shape: the benchmark gram set is tiny relative to the corpus
    * (eval suites vs 100 TB of training text) and is broadcast — the
    * probe side is exploded ONCE, left-joined against the broadcast
    * gram set, and aggregated in a single pass (count of grams + count
    * of membership hits); the only wide exchange is that per-doc count
    * aggregation on the doc id, which partitions evenly. Docs shorter
    * than n tokens have no grams and are absent from the output. */
  def contamination(docs: DataFrame, isBench: Column, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val toks = split(trim(col(textCol)), "\\s+")
    val ex = docs.select(col(idCol), toks.as("t"), isBench.as("is_bench"))
      .select(col(idCol), col("is_bench"),
        explode(array_distinct(wordNgrams(col("t"), n))).as("gram"))
    val bench = ex.filter(col("is_bench")).select("gram").distinct()
      .withColumn("hit", lit(1))
    ex.filter(!col("is_bench"))
      .join(broadcast(bench), Seq("gram"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_contaminated"))
  }

  /** Scale path for [[contamination]] when the benchmark gram set is too
    * large to broadcast as a join build side (a full eval-suite union at
    * 100 TB corpus scale): the bench grams collapse into Spark's native
    * Bloom-filter sketch ([[graft.functions.bloomFilterAgg]] — partial
    * aggregation OR-merges per-partition filters, so only O(partitions)
    * sketch blobs cross the exchange and one blob reaches the driver, the
    * same collect-a-sketch shape as Spark's own runtime filtering). Probe
    * grams are prefiltered MAP-SIDE against the sketch literal; only the
    * tiny maybe-contaminated survivor set pays the exact gram join, so a
    * Bloom false positive can never inflate a count — output is
    * value-identical to [[contamination]]. The exact-verify join shuffles
    * the bench grams once; the probe side that reaches it is the survivor
    * set, not the corpus. */
  def contaminationBloom(docs: DataFrame, isBench: Column, idCol: String,
      textCol: String, n: Int, expectedItems: Long = 1L << 20): DataFrame = {
    val toks = split(trim(col(textCol)), "\\s+")
    val ex = docs.select(col(idCol), toks.as("t"), isBench.as("is_bench"))
      .select(col(idCol), col("is_bench"),
        explode(array_distinct(wordNgrams(col("t"), n))).as("gram"))
    val probe = ex.filter(!col("is_bench")).select(col(idCol), col("gram"))
    val benchGrams = ex.filter(col("is_bench")).select("gram").distinct()
    val nGrams = probe.groupBy(idCol).agg(count(lit(1)).as("n_grams"))
    val bloom = benchGrams
      .agg(graft.functions.bloomFilterAgg(xxhash64(col("gram")), expectedItems))
      .head.get(0)
    if (bloom == null) // empty benchmark set: nothing can be contaminated
      return nGrams.withColumn("n_contaminated", lit(0L))
        .select(col(idCol), col("n_grams"), col("n_contaminated"))
    val survivors = probe.filter(
      graft.functions.bloomMightContain(lit(bloom.asInstanceOf[Array[Byte]]),
        xxhash64(col("gram"))))
    val hits = survivors.join(benchGrams, Seq("gram"))
      .groupBy(idCol).agg(count(lit(1)).as("n_contaminated"))
    nGrams.join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
  }

  /** Scale path for percentile-band filtering: two narrow passes instead
    * of a per-group sort — approx_percentile bounds per group (a tiny
    * aggregate, broadcast back), then a map-side filter. The cume_dist
    * ranking (q64) is exact but sorts each group on one reducer, which
    * caps parallelism at the group count; this variant keeps arbitrarily
    * large groups parallel at the cost of sketch-accuracy bounds.
    * Contract differences vs the rank path, beyond sketch error: banding
    * is VALUE-inclusive, so a group whose scores all tie keeps every row
    * ([lo,hi] collapses onto the tied value) where a cume_dist band may
    * keep none; and a NULL group value is a group like any other (the
    * bounds join is null-safe). */
  def quantileBand(docs: DataFrame, groupCol: String, scoreCol: Column,
      lo: Double, hi: Double, accuracy: Int = 10000): DataFrame = {
    val reserved = Set("__score", "__lo", "__hi", "__g")
    require(!docs.columns.exists(reserved),
      s"quantileBand reserves columns ${reserved.mkString(", ")}")
    val scored = docs.withColumn("__score", scoreCol)
    val bounds = scored.groupBy(col(groupCol).as("__g"))
      .agg(percentile_approx(col("__score"), lit(lo), lit(accuracy)).as("__lo"),
        percentile_approx(col("__score"), lit(hi), lit(accuracy)).as("__hi"))
    scored.join(broadcast(bounds), col(groupCol) <=> col("__g"))
      .filter(col("__score") >= col("__lo") && col("__score") <= col("__hi"))
      .drop("__g", "__lo", "__hi", "__score")
  }

  /** Sequence packing: assign docs to fixed token-budget bins in
    * `orderCol` order WITHIN each `groupCol` shard —
    * bin = running-tokens-before-this-doc div budget, so consecutive
    * docs fill a bin to the budget (with bounded overflow: the doc that
    * crosses the boundary stays in the earlier bin, the classic
    * approximate-packing contract). Per-shard windows are the scale
    * story: each shard packs independently in parallel — there is no
    * global sort, and at 100 TB `groupCol` is the writer shard. Returns
    * the input plus (n_tok, bin). */
  def packBins(docs: DataFrame, groupCol: String, orderCol: String,
      tokenCol: Column, budget: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.withColumn("n_tok", tokenCol)
      .withColumn("cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("bin", expr(s"cum_before div $budget"))
      .drop("cum_before")
  }
}
