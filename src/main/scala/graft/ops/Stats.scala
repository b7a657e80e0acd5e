package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Pin.PinSyntax

/** Distributed exact order statistics — quantiles, rank-sum AUC,
  * median/MAD outliers — built on the value-HISTOGRAM prefix-rank
  * construction (the q121 ntile machinery generalized): group by the
  * metric VALUE first, window over the distinct-value histogram, and
  * join ranks back. The only sorts are over per-group distinct values
  * (bounded by value cardinality, not row count), so a 100 TB frame
  * with a few million distinct cents sorts a few million histogram
  * rows — never the frame itself.
  *
  * Engine-portable by construction: every rank, cutoff, and score is
  * integer arithmetic until one final well-separated rounding, so the
  * DuckDB oracle's native window forms hash-match exactly (the q88/q90
  * discipline applied to order statistics).
  */
object Stats {

  /** Range-partitioned global prefix sums over a DISTINCT-keyed
    * histogram — the scale-safe replacement for `Window.orderBy(key)`
    * running sums, which move EVERY histogram row to one partition and
    * become the bottleneck exactly when the value domain is continuous
    * (distinct cardinality ≈ row count: AUC scores, KS statistics,
    * survival durations). Construction: range-shuffle on the key and
    * pin the partition ids (localCheckpoint — the pid↔boundary pairing
    * must come from ONE execution of the range exchange, or the local
    * sums and the offsets could disagree on boundaries), per-partition
    * running sums under a PARTITIONED window, per-partition totals
    * (one row per partition) turned into exclusive offsets by a
    * triangular self-join on the tiny partition axis — no
    * unpartitioned window anywhere in the plan — and global inclusive
    * prefix = offset + local sum.
    *
    * Null-aware exactly like window `sum`: a prefix whose addends so
    * far are all null is null, not 0. Adds one INCLUSIVE running-sum
    * column per requested (srcCol → outCol) under the key's ascending
    * total order; exclusive prefixes follow at the call site as
    * `incl − value`. Key values must be distinct per row (histogram
    * frames are, by their groupBy construction). */
  private[graft] def rangePrefixSums(hist: DataFrame, keys: Seq[String],
      sums: Seq[(String, String)], numParts: Int = 32): DataFrame =
    rangePrefix(hist, keys, sums, useMax = false, inclusive = true, numParts)

  /** EXCLUSIVE global prefix MAX under the key order — same
    * range-partitioned construction as [[rangePrefixSums]] (the
    * triangular-offset decomposition is agnostic to the monoid), the
    * scale-safe replacement for
    * `Window.orderBy(k).rowsBetween(unboundedPreceding, -1)` running
    * maxes (skyline fronts). Exclusive composes cleanly for max —
    * global-excl(row) = greatest(all preceding partitions' totals,
    * partition-local exclusive max) — whereas deriving it from an
    * inclusive max would need a second (lag) window. First row of the
    * order gets NULL, matching window-max-over-empty-frame. */
  private[graft] def rangePrefixMaxExclusive(hist: DataFrame,
      keys: Seq[String], maxes: Seq[(String, String)],
      numParts: Int = 32): DataFrame =
    rangePrefix(hist, keys, maxes, useMax = true, inclusive = false, numParts)

  private def rangePrefix(hist: DataFrame, keys: Seq[String],
      aggs: Seq[(String, String)], useMax: Boolean, inclusive: Boolean,
      numParts: Int): DataFrame = {
    require(aggs.nonEmpty && aggs.map(_._2).distinct.size == aggs.size,
      s"rangePrefix needs distinct output names, got ${aggs.map(_._2)}")
    def fold(c: Column): Column = if (useMax) max(c) else sum(c)
    val keyCols = keys.map(col)
    // NOT layout-aligned (deliberate, work-channel-measured): unlike
    // the iterative graph kernels, this layout is consumed ONCE per
    // consumer, and of the three consumers only the window exchanges
    // full rows (totals/offsets exchange post-partial-agg, ~nothing) —
    // an aligned relayout costs exactly the one exchange it saves,
    // plus the extra in-pin pass. Aligned pinning pays only where
    // rounds amortize the relayout (see Pin.pinAligned).
    val withPid = hist.repartitionByRange(numParts, keyCols: _*)
      .withColumn("__pid", spark_partition_id())
      .pinned
    val local = Window.partitionBy(col("__pid")).orderBy(keyCols: _*)
      .rowsBetween(Window.unboundedPreceding, if (inclusive) 0 else -1)
    val withLoc = aggs.foldLeft(withPid) { case (d, (src, out)) =>
      d.withColumn(s"__loc_$out", fold(col(src)).over(local))
    }
    val totAggs = aggs.map { case (src, out) => fold(col(src)).as(s"__t_$out") }
    val totals = withPid.groupBy(col("__pid").as("__tp"))
      .agg(totAggs.head, totAggs.tail: _*)
    val offAggs = aggs.map { case (_, out) =>
      fold(col(s"b.__t_$out")).as(s"__off_$out") }
    val offs = totals.as("a")
      .join(totals.as("b"), col("b.__tp") < col("a.__tp"), "left")
      .groupBy(col("a.__tp").as("__pid"))
      .agg(offAggs.head, offAggs.tail: _*)
    val joined = withLoc.join(broadcast(offs), Seq("__pid"))
    aggs.foldLeft(joined) { case (d, (_, out)) =>
      // null semantics match the window forms: sum is null only while
      // ALL addends so far are null; greatest already skips nulls and
      // returns null only when both sides are
      d.withColumn(out,
        if (useMax) greatest(col(s"__loc_$out"), col(s"__off_$out"))
        else when(col(s"__loc_$out").isNull && col(s"__off_$out").isNull,
          lit(null))
          .otherwise(coalesce(col(s"__loc_$out"), lit(0))
            + coalesce(col(s"__off_$out"), lit(0))))
    }.drop("__pid" +: aggs.flatMap { case (_, o) =>
      Seq(s"__loc_$o", s"__off_$o") }: _*)
  }

  /** Per-GROUP inclusive cumulative counts over a (g, v, c) histogram
    * without per-group windows: a `Window.partitionBy(g).orderBy(v)`
    * running sum activates one task per GROUP, so three return-flags
    * serialize a 300k-row histogram onto three cores. Decomposition:
    * global [[rangePrefixSums]] over the concatenated (g, v) total
    * order — big groups split across range partitions, every core busy
    * — minus each group's start offset (prefix over the group-total
    * frame, itself range-partitioned). Identical values by
    * construction: cum_g(v) = globalCum(g,v) − offset(g).
    * Returns the histogram plus `n` (group total) and `cum`
    * (inclusive within-group cumulative). */
  private def groupedCum(hist: DataFrame): DataFrame = {
    val withIncl = rangePrefixSums(hist, Seq("g", "v"), Seq("c" -> "__gincl"))
    // group totals from the ALREADY-materialized ranged frame (the
    // helper checkpoints it) — deriving them from `hist` would re-run
    // the full upstream histogram aggregation a second time
    val gtot = withIncl.select(col("g"), col("c"))
      .groupBy(col("g")).agg(sum(col("c")).as("n"))
    val goff = rangePrefixSums(gtot, Seq("g"), Seq("n" -> "__gtotincl"))
      .withColumn("__goff", col("__gtotincl") - col("n"))
      .select(col("g"), col("n"), col("__goff"))
    // null-SAFE group join: `Seq("g")` equi-join drops NULL group keys,
    // silently losing the null band that SQL GROUP BY keeps (the same
    // class of bug fixed in quantileNormalize's pooled join)
    withIncl.join(goff.withColumnRenamed("g", "__jg"),
        col("g") <=> col("__jg"))
      .withColumn("cum", col("__gincl") - col("__goff"))
      .drop("__jg", "__gincl", "__goff")
  }

  /** Exact discrete quantiles (SQL `percentile_disc` semantics: the
    * smallest value whose cumulative count reaches rank
    * ceil(p/100 × n), computed as the INTEGER `(n·p + 99) div 100`)
    * per group over an integral metric column.
    *
    * Returns one row per group: `group, n, q<p>` for each requested
    * percentile. Scale shape: one partial-agg rollup to the
    * (group, value) histogram, one per-group window over distinct
    * values, one dimension-cardinality final agg. The full frame
    * shuffles once (to the histogram); rows never sort globally. */
  def quantilesDisc(df: DataFrame, groupCol: Column, valueCol: Column,
      percentiles: Seq[Int]): DataFrame = {
    require(percentiles.nonEmpty && percentiles.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1, 100], got $percentiles")
    val hist = df
      .groupBy(groupCol.as("g"), valueCol.cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val cum = groupedCum(hist)
    // rank cutoff ceil(p·n/100) as INTEGER arithmetic — `(n·p+99) div
    // 100`, never float division (whose representation error can cross
    // an integer boundary exactly at the ranks that matter)
    val qCols = percentiles.map { p =>
      min(when(col("cum") >= expr(s"(n * $p + 99) DIV 100"), col("v")))
        .as(s"p$p")
    }
    cum.groupBy(col("g"))
      .agg(max(col("n")).as("n"), qCols: _*)
  }

  /** WEIGHTED [[quantilesDisc]]: the smallest value whose cumulative
    * WEIGHT reaches ceil(p·W/100) — "the median transaction weighted
    * by quantity" class of question; same histogram-prefix shape, the
    * counts replaced by integer weight sums (DECIMAL(38,0) past the
    * long regime). */
  def quantilesDiscWeighted(df: DataFrame, groupCol: Column,
      valueCol: Column, weightCol: Column,
      percentiles: Seq[Int]): DataFrame = {
    require(percentiles.nonEmpty && percentiles.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1, 100], got $percentiles")
    val hist = df
      .select(groupCol.as("g"), valueCol.cast("long").as("v"),
        weightCol.cast("long").as("__w"))
      .filter(when(col("__w") >= 0, lit(true)).otherwise(raise_error(
        concat(lit("quantilesDiscWeighted needs non-negative weights, got "),
          col("__w")))))
      .groupBy(col("g"), col("v"))
      .agg(sum(col("__w").cast("decimal(38,0)")).as("c"))
    val cum = groupedCum(hist)
    val qCols = percentiles.map { p =>
      min(when(col("cum") >= expr(s"(n * $p + 99) DIV 100"), col("v")))
        .as(s"p$p")
    }
    cum.groupBy(col("g"))
      .agg(max(col("n")).cast("long").as("total_weight"), qCols: _*)
  }

  /** Exact INTERPOLATED quantiles (SQL `percentile_cont` semantics) per
    * group, reported ×100 so the linear interpolation stays integer:
    * 0-based position (n−1)·p/100 splits into rank r = ·div 100 and
    * fraction f = ·mod 100, and p×100 = v_r·(100−f) + v_{r+1}·f — no
    * float lerp to round apart across engines (the [[quantilesDisc]]
    * histogram shape with two rank probes per percentile). */
  def quantilesCont(df: DataFrame, groupCol: Column, valueCol: Column,
      percentiles: Seq[Int]): DataFrame = {
    require(percentiles.nonEmpty && percentiles.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1, 100], got $percentiles")
    val hist = df
      .groupBy(groupCol.as("g"), valueCol.cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val cum = groupedCum(hist)
    val qCols = percentiles.flatMap { p =>
      // v_lo at 0-based rank r ⟺ cum ≥ r+1; v_hi at r+1 ⟺ cum ≥ r+2
      // (null when r+1 = n, i.e. f = 0 — coalesced away below)
      Seq(
        min(when(col("cum") >= expr(s"(n - 1) * $p DIV 100 + 1"), col("v")))
          .as(s"__lo$p"),
        min(when(col("cum") >= expr(s"(n - 1) * $p DIV 100 + 2"), col("v")))
          .as(s"__hi$p"))
    }
    val agg = cum.groupBy(col("g"))
      .agg(max(col("n")).as("n"), qCols: _*)
    val outCols = col("g") +: col("n") +: percentiles.map { p =>
      (col(s"__lo$p") * (lit(100) - expr(s"(n - 1) * $p % 100"))
        + coalesce(col(s"__hi$p"), col(s"__lo$p"))
          * expr(s"(n - 1) * $p % 100")).as(s"p${p}_x100")
    }
    agg.select(outCols: _*)
  }

  /** Two-sample Kolmogorov–Smirnov distance between the label=true and
    * label=false score distributions — EXACT and distributed: from the
    * shared score histogram, D = max |cum₁/n₁ − cum₂/n₂| is computed as
    * the integer max |cum₁·n₂ − cum₂·n₁| over distinct scores, divided
    * once at the end (DECIMAL(38,0) keeps n₁·n₂-scale products exact
    * past 2⁶³). The α=0.05 threshold 1.358·√((n₁+n₂)/(n₁·n₂)) is the
    * one float expression — identical IEEE ops on identical integers on
    * both engines, micro-floored once.
    *
    * Returns one row: n1, n2, d_micro, crit_micro, rejected. An empty
    * side raises (a KS test against nothing is a pipeline bug). */
  def ksTest2(df: DataFrame, valueCol: Column, labelCol: Column): DataFrame = {
    val hist = df
      .groupBy(valueCol.cast("long").as("v"))
      .agg(sum(labelCol.cast("int")).cast("long").as("c1"),
        sum(when(labelCol, 0).otherwise(1)).cast("long").as("c2"))
    // continuous scores make distinct-v ≈ row count, so the running
    // sums ride the range-partitioned prefix construction — never an
    // unpartitioned window over the score histogram
    val cum = rangePrefixSums(hist, Seq("v"),
      Seq("c1" -> "cum1", "c2" -> "cum2"))
    val totals = hist.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    cum.crossJoin(totals)
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        max(abs(col("cum1").cast("decimal(38,0)") * col("n2")
          - col("cum2").cast("decimal(38,0)") * col("n1"))).as("__dnum"))
      .select(col("n1"), col("n2"),
        expr("""CASE WHEN n1 > 0 AND n2 > 0
               |  THEN CAST(__dnum * 1000000
               |       DIV (CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)
               |  ELSE raise_error('ksTest2 needs both samples non-empty')
               |END""".stripMargin).as("d_micro"),
        floor(lit(1.358) * sqrt((col("n1") + col("n2")).cast("double")
          / (col("n1").cast("double") * col("n2").cast("double")))
          * lit(1e6)).cast("long").as("crit_micro"))
      .withColumn("rejected", col("d_micro") > col("crit_micro"))
  }

  /** Exact Pearson correlation matrix over integer-scaled metrics —
    * the profiling companion of q131's OLS: all five moments per pair
    * (Σx, Σy, Σxy, Σx², Σy²) accumulate in DECIMAL(38,0) in ONE scan
    * (never one pass per pair), and the closed form
    * (nΣxy − ΣxΣy)/√((nΣx² − (Σx)²)(nΣy² − (Σy)²)) runs on doubles
    * cast once from exact decimals — correctly-rounded casts of
    * identical integers, so both engines see the same IEEE inputs.
    * Returns one row per unordered pair: var_a, var_b, n, corr_micro
    * (null when either variance is zero — a constant column has no
    * correlation, not corr 0). */
  def corrMatrix(df: DataFrame, vars: Seq[(String, Column)]): DataFrame = {
    require(vars.size >= 2, s"corrMatrix needs >= 2 variables, got ${vars.size}")
    require(vars.map(_._1).distinct.size == vars.size, "variable names must be unique")
    val base = df.select(vars.map { case (n, c) =>
      c.cast("long").as(n) }: _*)
    val names = vars.map(_._1)
    // operands cast to DECIMAL BEFORE the row-level products — long
    // squares overflow past |v| ~ 3·10⁹
    val moments =
      names.map(n => sum(col(n).cast("decimal(38,0)")).as(s"s_$n")) ++
      names.map(n => sum(col(n).cast("decimal(38,0)") * col(n)).as(s"q_$n")) ++
      (for (i <- names.indices; j <- i + 1 until names.size) yield
        sum(col(names(i)).cast("decimal(38,0)") * col(names(j)))
          .as(s"x_${names(i)}_${names(j)}"))
    val agg = base.agg(count(lit(1)).as("n"), moments: _*)
    val pairRows = (for (i <- names.indices; j <- i + 1 until names.size) yield {
      val (a, b) = (names(i), names(j))
      struct(lit(a).as("var_a"), lit(b).as("var_b"),
        expr(s"""CASE
          |  WHEN (n * q_$a - s_$a * s_$a) = 0 OR (n * q_$b - s_$b * s_$b) = 0
          |  THEN CAST(NULL AS BIGINT)
          |  ELSE CAST(floor(
          |    CAST(n * x_${a}_$b - s_$a * s_$b AS DOUBLE)
          |    / sqrt(CAST(n * q_$a - s_$a * s_$a AS DOUBLE)
          |           * CAST(n * q_$b - s_$b * s_$b AS DOUBLE))
          |    * 1000000 + 0.5) AS BIGINT)
          |END""".stripMargin).as("corr_micro"))
    })
    agg.select(col("n"), explode(array(pairRows: _*)).as("p"))
      .select(col("p.var_a").as("var_a"), col("p.var_b").as("var_b"),
        col("n"), col("p.corr_micro").as("corr_micro"))
  }

  /** Two-sketch Kolmogorov–Smirnov distance over SHARED bucket keys —
    * the streaming-drift form of [[ksTest2]]: both sides are (e, sub)
    * log-histogram bucket counts ([[sketchBuckets]] output for ONE
    * group, `g` ignored), D = max |cumA·nB − cumB·nA| over the merged
    * bucket axis, micro-rounded once. Bucketing adds ≤1/subBuckets
    * resolution error to D — the standard binned-KS trade. Returns one
    * row: n_a, n_b, d_micro. */
  def ksFromBuckets(a: DataFrame, b: DataFrame): DataFrame = {
    val ca = a.groupBy(col("e"), col("sub")).agg(sum(col("c")).as("ca"))
    val cb = b.groupBy(col("e"), col("sub")).agg(sum(col("c")).as("cb"))
    val merged = ca.join(cb, Seq("e", "sub"), "full_outer")
      .select(col("e"), col("sub"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    // BOUNDED single-partition window, by construction: the axis is
    // sketch buckets — (log-scale exponent e) × subBuckets — whose
    // cardinality is fixed by the sketch resolution (≈ a few hundred
    // rows for any input size), never by row or distinct-value count.
    // This is the documented histogram-discipline whitelist case; the
    // row-scale cumulatives (AUC/KS/KM) ride rangePrefixSums instead.
    val w = Window.orderBy(col("e"), col("sub"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = merged
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
    val totals = merged.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    cum.crossJoin(totals)
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(abs(col("cuma").cast("decimal(38,0)") * col("n_b")
          - col("cumb").cast("decimal(38,0)") * col("n_a"))).as("__dnum"))
      .select(col("n_a"), col("n_b"),
        expr("""CASE WHEN n_a > 0 AND n_b > 0
               |  THEN CAST(__dnum * 1000000
               |       DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)
               |  ELSE raise_error('ksFromBuckets needs both sketches non-empty')
               |END""".stripMargin).as("d_micro"))
  }

  /** Pearson chi-square independence test over two categorical columns
    * — exact-rational cell terms: (o·n − rt·ct)² / (n·rt·ct) equals
    * (o−e)²/e without ever materializing the fractional expected count,
    * numerators squared in DECIMAL(38,0) (they pass 2⁵³ at ~10⁶ rows),
    * one nano rounding per cell, exact integer Σ. Returns one row:
    * n, n_cells, dof, chi2_nano. Zero-margin categories cannot occur
    * (a category only exists through observed rows). */
  def chi2Independence(df: DataFrame, rowCol: Column, colCol: Column): DataFrame = {
    val obs = df.groupBy(rowCol.as("r"), colCol.as("k"))
      .agg(count(lit(1)).as("__o"))
    val rt = obs.groupBy(col("r")).agg(sum(col("__o")).as("rt"))
    val ct = obs.groupBy(col("k")).agg(sum(col("__o")).as("ct"))
    val n = obs.agg(sum(col("__o")).as("n"))
    // the FULL margin grid, not just observed cells: an unobserved
    // (r, k) still contributes (0−e)²/e = rt·ct/n — dropping empties
    // deflates exactly the statistic that detects strong dependence
    rt.crossJoin(ct)
      .join(obs, Seq("r", "k"), "left")
      .withColumn("o", coalesce(col("__o"), lit(0L))).crossJoin(n)
      // operands cast to DECIMAL BEFORE the products (o·n alone passes
      // 2⁶³ at ~3·10⁹ rows); the squared deviation must stay under
      // DECIMAL(38,0), i.e. |o·n − rt·ct| < 10¹⁴·√10 — ample for any
      // per-category deviation this side of 10⁷×10⁷ margins
      .withColumn("term_nano", expr(
        """CAST(((CAST(o AS DECIMAL(38,0)) * n - CAST(rt AS DECIMAL(38,0)) * ct)
          |       * (CAST(o AS DECIMAL(38,0)) * n - CAST(rt AS DECIMAL(38,0)) * ct))
          |       * 1000000000
          |     DIV (CAST(n AS DECIMAL(38,0)) * rt * ct) AS BIGINT)"""
          .stripMargin))
      .agg(max(col("n")).as("n"), count(lit(1)).as("n_cells"),
        ((countDistinct(col("r")) - 1) * (countDistinct(col("k")) - 1))
          .as("dof"),
        sum(col("term_nano")).as("chi2_nano"))
  }

  /** Exact ROC AUC via the Mann–Whitney rank-sum with midrank tie
    * handling — the distributed form of "sort by score, sum positive
    * ranks" that never sorts the frame: ranks come from the score
    * histogram (2·midrank(v) = 2·cumBefore(v) + cnt(v) + 1, an
    * INTEGER), so Σ 2·midrank over positives is exact, and
    * AUC = (Σ2R − n₊(n₊+1)) / (2·n₊·n₋) is a ratio of exact integers
    * rounded once to micro units.
    *
    * Returns a single row: n, n_pos, auc_micro, gini_micro. Degenerate
    * label distributions (no positives or no negatives) raise — an
    * AUC over one class is a pipeline bug, not a 0.5. */
  def aucExact(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val hist = df
      .groupBy(scoreCol.cast("long").as("v"))
      .agg(count(lit(1)).as("c"),
        sum(labelCol.cast("int")).cast("long").as("cpos"))
    // continuous scores make distinct-v ≈ row count: the rank prefix
    // rides the range-partitioned construction (exclusive prefix =
    // inclusive − own count; c ≥ 1 everywhere so incl is never null)
    val cum = rangePrefixSums(hist, Seq("v"), Seq("c" -> "__incl"))
      .withColumn("cum_before", col("__incl") - col("c"))
      .drop("__incl")
    // rank sums accumulate in DECIMAL(38,0) (the q131/q103 exact-moment
    // discipline): Σ2R grows as n·n and n²·10⁶ overflows BIGINT past
    // ~6M rows — decimal keeps the arithmetic exact to 38 digits
    val agg = cum.agg(
      sum(col("c")).as("n"),
      sum(col("cpos")).as("n_pos"),
      sum(col("cpos").cast("decimal(38,0)")
        * (col("cum_before") * 2 + col("c") + lit(1)).cast("decimal(38,0)"))
        .as("sum2r"))
    agg
      // floor(x·1e6 + 0.5) on an exact integer ratio: num/den with
      // num = Σ2R − n₊(n₊+1) ≥ 0, den = 2·n₊·n₋ — all-integer DIV,
      // no float division anywhere (num·1e6 overflows double's 53-bit
      // mantissa at ~1e5 rows, so a double path would be WRONG, not
      // just untidy). The degenerate-label raise is woven INTO the
      // consumed column (the strict-date pattern,
      // functions/package.scala) so pruning can't drop it.
      .select(col("n"), col("n_pos"),
        expr("""CASE WHEN n_pos > 0 AND n - n_pos > 0
               |  THEN ((sum2r - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1))
               |          * 1000000
               |        + CAST(n_pos AS DECIMAL(38,0)) * (n - n_pos))
               |       DIV (CAST(n_pos AS DECIMAL(38,0)) * (n - n_pos) * 2)
               |  ELSE raise_error(concat(
               |    'aucExact needs both classes present, got n_pos=',
               |    CAST(n_pos AS STRING), ' of n=', CAST(n AS STRING)))
               |END""".stripMargin).cast("long").as("auc_micro"))
      .withColumn("gini_micro", col("auc_micro") * 2 - 1000000L)
  }

  /** Robust per-group outlier profile from EXACT median and MAD: for
    * each group, med = percentile_disc(0.5) of the integral metric,
    * MAD = percentile_disc(0.5) of |v − med|, and n_outliers counts
    * rows with |v − med| > k·MAD — all integer comparisons, so the
    * flag can never round apart from the oracle. The classic
    * mean/stddev z-score breaks under the very outliers it hunts;
    * median/MAD does not (50% breakdown point).
    *
    * Two histogram passes over the frame (value, then deviation) —
    * each the quantilesDisc scale shape; the per-group medians ride a
    * broadcast join back onto the second pass. */
  def medianMadOutliers(df: DataFrame, groupCol: Column, valueCol: Column,
      k: Int = 3): DataFrame = {
    require(k > 0, s"MAD multiplier must be positive, got $k")
    val base = df.select(groupCol.as("g"), valueCol.cast("long").as("v"))
    val med = quantilesDisc(base, col("g"), col("v"), Seq(50))
      .select(col("g"), col("p50").as("med"))
    val dev = base.join(broadcast(med), Seq("g"))
      .withColumn("d", abs(col("v") - col("med")))
    val mad = quantilesDisc(dev, col("g"), col("d"), Seq(50))
      .select(col("g"), col("p50").as("mad"))
    dev.join(broadcast(mad), Seq("g"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum(when(col("d") > col("mad") * k, 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** Decile lift / gains table — the model-targeting companion of
    * [[aucExact]]: rows ranked by score DESC (ties broken by `tieCol`
    * — the total order both engines share), cut into `buckets` equal
    * slices by [[Analytics.ntileExact]] (the distributed exact ntile —
    * no global sort), then per slice the positive rate, its lift over
    * the base rate, and the cumulative capture of all positives.
    * "Top decile captures 4× base rate" is the sentence this op exists
    * to make exact.
    *
    * All-integer micro arithmetic on non-negative operands, so Spark's
    * truncating DIV and the oracle's flooring // agree; sums ride
    * DECIMAL(38,0) past the 2⁶³ regime. A label-free frame raises (a
    * lift table over zero positives is a pipeline bug, not a row of
    * nulls). */
  def decileLift(df: DataFrame, scoreCol: Column, labelCol: Column,
      tieCol: Column, buckets: Int = 10): DataFrame = {
    require(buckets >= 2 && buckets <= 1000,
      s"buckets must be in [2, 1000], got $buckets")
    val base = df.select(scoreCol.cast("long").as("__v"),
      labelCol.cast("int").cast("long").as("__pos"), tieCol.as("__tie"))
    val ranked = Analytics.ntileExact(base, -col("__v"), col("__tie"),
      buckets, "decile")
    val b = ranked.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_b"), sum(col("__pos")).as("npos_b"))
    val tot = b.agg(sum(col("n_b")).as("n"), sum(col("npos_b")).as("npos"))
    // BOUNDED single-partition window: the frame has exactly `buckets`
    // rows (require-gated ≤ 1000) regardless of input size
    val cumW = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, 0)
    b.crossJoin(tot)
      .withColumn("cum_pos", sum(col("npos_b")).over(cumW))
      .select(col("decile"), col("n_b"), col("npos_b"),
        expr("""CASE WHEN npos > 0
               |  THEN CAST(CAST(npos_b AS DECIMAL(38,0)) * 1000000
               |            DIV n_b AS BIGINT)
               |  ELSE raise_error('decileLift needs at least one positive label')
               |END""".stripMargin).cast("long").as("rate_micro"),
        expr("""CAST(CAST(npos_b AS DECIMAL(38,0)) * n * 1000000
               |     DIV (CAST(n_b AS DECIMAL(38,0)) * npos) AS BIGINT)"""
          .stripMargin).as("lift_micro"),
        expr("CAST(CAST(cum_pos AS DECIMAL(38,0)) * 1000000 DIV npos AS BIGINT)")
          .as("cum_capture_micro"))
  }

  /** DDSketch-style mergeable log-histogram quantiles over a POSITIVE
    * integral metric: bucket = (ilog2(v), sub) with `subBuckets`
    * linear sub-divisions of each binary octave — relative error ≤
    * 1/subBuckets, bucket counts merge by addition in ANY order (the
    * property that makes the sketch streamable and shardable, unlike
    * exact quantiles' ordered prefix).
    *
    * The estimate for percentile p is the LOWER BOUND of the first
    * bucket whose cumulative count reaches rank (n·p + 99) div 100 —
    * deterministic integers end-to-end. ilog2 is float-log2 with an
    * exact boundary correction (compare against pow(2, b)), the same
    * closed form the SQL oracle runs, so engines cannot disagree at
    * octave boundaries.
    *
    * Returns per group: n, est_p50, est_p90, est_p99. Callers wanting
    * an error gauge join against [[quantilesDisc]] (q145 does). */
  def sketchQuantiles(df: DataFrame, groupCol: Column, valueCol: Column,
      subBuckets: Int = 8): DataFrame =
    sketchQuantilesFromBuckets(
      sketchBuckets(df, groupCol, valueCol, subBuckets), subBuckets)

  /** The sketch's bucketize half: (g, e, sub, c) counts. Bucket counts
    * from ANY partitioning — or any set of batches — merge by summing
    * `c` per (g, e, sub) before [[sketchQuantilesFromBuckets]]; the
    * streaming quantile sink is exactly that composition. */
  def sketchBuckets(df: DataFrame, groupCol: Column, valueCol: Column,
      subBuckets: Int = 8): DataFrame = {
    requireSubBuckets(subBuckets)
    val v = col("__v")
    val b0 = floor(log2(v)).cast("long")
    // float log2 with an exact boundary correction — then the raise
    // for non-positive input woven into the consumed octave column
    val corrected =
      when(pow(lit(2.0), (b0 + 1).cast("double")) <= v.cast("double"), b0 + 1)
        .when(pow(lit(2.0), b0.cast("double")) > v.cast("double"), b0 - 1)
        .otherwise(b0)
    df.select(groupCol.as("g"), valueCol.cast("long").as("__v"))
      .withColumn("e", when(v > 0, corrected).otherwise(raise_error(
        concat(lit("sketchQuantiles needs positive values, got "), v))))
      // linear sub-bucket inside the octave: (v − 2^e)·m div 2^e —
      // all-integer once e is fixed (shiftleft is the exact power)
      .withColumn("sub",
        expr(s"(__v - shiftleft(1L, CAST(e AS INT))) * $subBuckets" +
          " DIV shiftleft(1L, CAST(e AS INT))"))
      .groupBy(col("g"), col("e"), col("sub"))
      .agg(count(lit(1)).as("c"))
  }

  /** The sketch's estimate half over (possibly merged) bucket counts. */
  def sketchQuantilesFromBuckets(buckets: DataFrame,
      subBuckets: Int): DataFrame = {
    requireSubBuckets(subBuckets)
    val withLo = buckets
      // bucket lower bound back in value units: 2^e + sub·2^e div m
      .withColumn("lo",
        expr(s"shiftleft(1L, CAST(e AS INT))" +
          s" + sub * shiftleft(1L, CAST(e AS INT)) DIV $subBuckets"))
    val byG = Window.partitionBy(col("g")).orderBy(col("e"), col("sub"))
    val cum = withLo
      .withColumn("cum", sum(col("c")).over(byG))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("g"))))
    cum.groupBy(col("g"))
      .agg(max(col("n")).as("n"),
        min(when(col("cum") >= expr("(n * 50 + 99) DIV 100"), col("lo")))
          .as("est_p50"),
        min(when(col("cum") >= expr("(n * 90 + 99) DIV 100"), col("lo")))
          .as("est_p90"),
        min(when(col("cum") >= expr("(n * 99 + 99) DIV 100"), col("lo")))
          .as("est_p99"))
  }

  /** KMV (k-minimum-values) distinct-count sketch per group (Bar-Yossef
    * et al. 2002): keep the k smallest 60-bit md5-derived hash values of
    * the key; with h_k the k-th minimum over the hash space M = 2^60,
    * the distinct estimate is (k-1)·M / h_k. A group with fewer than k
    * distinct hashes holds ALL of them, so the sketch degrades to the
    * EXACT count (est = n_hashes) — both branches are graded (sf0.001
    * exercises exact, sf0.01+ the estimator).
    *
    * Why next to HLL (q45): KMV is the sketch whose estimate a SQL
    * oracle can reproduce EXACTLY — the hash is engine-portable md5 and
    * the estimator is one integer division, so q172 is oracle-checked
    * where HLL can only be golden-pinned. Mergeability is structural:
    * min-k(A ∪ B) = min-k(min-k(A) ∪ min-k(B)) — the same
    * [[graft.functions.collectMinK]] bounded-heap partial aggregate the
    * LSH buckets use, so partial sketches combine map-side and a
    * per-group sort never happens (StatsSpec pins merge ≡ direct).
    *
    * Scale shape: one distinct on (group, hash) — the only exchange —
    * then one partial-aggregated heap fold; output is group-sized.
    * Estimator error is ~1/√(k-2) relative (k=64 → ~13%); raise k for
    * tighter counts, the heap stays O(k) per group either way. */
  def kmvDistinct(df: DataFrame, groupCol: Column, keyCol: Column,
      k: Int): DataFrame = {
    require(k >= 2 && k <= 65536, s"kmvDistinct k must be in [2, 65536], got $k")
    val h = df
      .select(groupCol.as("g"),
        conv(substring(md5(concat(lit("kmv:"), keyCol.cast("string"))), 1, 15),
          16, 10).cast("long").as("hv"))
      .distinct()
    h.groupBy(col("g"))
      .agg(graft.functions.collectMinK(col("hv"), lit(0L), k).as("mk"))
      .withColumn("n_hashes", col("mk.n"))
      .withColumn("h_k",
        when(col("n_hashes") >= k,
          element_at(col("mk.items"), k).getField("id")).otherwise(lit(0L)))
      .select(col("g"), col("n_hashes"),
        least(col("n_hashes"), lit(k.toLong)).as("n_kept"), col("h_k"),
        when(col("n_hashes") < k, col("n_hashes")).otherwise(expr(
          s"CAST((CAST(${k - 1} AS DECIMAL(38,0)) * 1152921504606846976) div h_k AS BIGINT)"))
          .as("est_distinct"))
  }

  /** Join-cardinality estimation from two KMV sketches (Beyer et al.,
    * SIGMOD 2007) — the optimizer-grade use of [[kmvDistinct]]: estimate
    * |A ∩ B| distinct join keys WITHOUT joining. Both sides are
    * sketched with the SAME salted hash; the union sketch K is the
    * min-k of the two kept sets (a k-bounded in-row merge), and with
    * kInt = |{h ∈ K : h ∈ K_A ∧ h ∈ K_B}| the estimate is
    * est_inter = kInt · est_union / k. When the union holds fewer than
    * k hashes both sketches are exhaustive and every figure degrades to
    * EXACT — the same honest-degrade contract as [[kmvDistinct]].
    *
    * Returns ONE row: exact n_a / n_b / n_inter (the ground truth the
    * gauge is judged against) plus est_a / est_b / k_int / est_inter.
    * All integer arithmetic (60-bit hashes, HUGEINT-safe divisions), so
    * the q178 DuckDB twin reproduces the ESTIMATES exactly, not just
    * the truths.
    *
    * Scale shape: each side is one distinct + one bounded-heap fold;
    * the exact intersection is one semi-join on hash (dropped in a
    * production estimator — it is here because the gauge's point is
    * estimate-vs-truth); everything downstream is three one-row frames
    * cross-joined. */
  def kmvJoinEstimate(a: DataFrame, b: DataFrame, aKey: Column, bKey: Column,
      k: Int): DataFrame = {
    require(k >= 2 && k <= 65536, s"kmvJoinEstimate k must be in [2, 65536], got $k")
    def hashes(df: DataFrame, key: Column) = df.select(
      conv(substring(md5(concat(lit("kmv:"), key.cast("string"))), 1, 15),
        16, 10).cast("long").as("hv")).distinct()
    def sketch(h: DataFrame, side: String) = h
      .agg(graft.functions.collectMinK(col("hv"), lit(0L), k).as("mk"))
      .select(col("mk.n").as(s"n_$side"),
        expr("transform(mk.items, x -> x.id)").as(s"ks_$side"))
    val ha = hashes(a, aKey).pinned // two consumers: sketch + exact
    val hb = hashes(b, bKey).pinned
    val inter = ha.join(hb, Seq("hv"), "left_semi")
      .agg(count(lit(1)).as("n_inter"))
    val M = 1152921504606846976L // 2^60 hash space
    def estSide(side: String) = when(col(s"n_$side") < k, col(s"n_$side"))
      .otherwise(expr(s"CAST((CAST(${k - 1} AS DECIMAL(38,0)) * $M)" +
        s" div element_at(ks_$side, $k) AS BIGINT)"))
    sketch(ha, "a").crossJoin(sketch(hb, "b")).crossJoin(inter)
      .withColumn("ku", expr(
        s"slice(array_sort(array_distinct(concat(ks_a, ks_b))), 1, $k)"))
      .withColumn("est_union", when(size(col("ku")) < k,
          size(col("ku")).cast("long"))
        .otherwise(expr(s"CAST((CAST(${k - 1} AS DECIMAL(38,0)) * $M)" +
          s" div element_at(ku, $k) AS BIGINT)")))
      .withColumn("k_int", size(expr(
        "array_intersect(array_intersect(ku, ks_a), ks_b)")).cast("long"))
      .select(col("n_a"), col("n_b"), col("n_inter"),
        estSide("a").as("est_a"), estSide("b").as("est_b"), col("k_int"),
        when(size(col("ku")) < k, col("k_int")).otherwise(expr(
          s"CAST((CAST(k_int AS DECIMAL(38,0)) * est_union) div $k AS BIGINT)"))
          .as("est_inter"))
  }

  /** Cross-group QUANTILE NORMALIZATION (the Bolstad et al. 2003
    * preprocessing classic): each group's value is replaced by the
    * POOLED distribution's value at the same relative rank, so every
    * group ends up with an identical marginal distribution — the
    * source-debiasing step before comparing quality scores across
    * crawls whose scales drifted. The rank map is pure integer
    * arithmetic, `mapped = (rk−1)(n_pool−1) div (n_group−1) + 1`
    * (singleton groups map to the pooled median), so both engines land
    * on the same pooled order statistic and q189 is hash-exact.
    *
    * Scale shape: the pooled rank `row_number() OVER (ORDER BY v, g,
    * id)` is decomposed as histogram prefix offset (distinct-v counts
    * through [[rangePrefixSums]] — no unpartitioned window) plus a
    * v-PARTITIONED tie rank over (g, id) — bit-identical to the global
    * sort spelling, with no single-partition stage anywhere. */
  def quantileNormalize(df: DataFrame, groupCol: Column, idCol: Column,
      valueCol: Column): DataFrame = {
    val base = df.select(groupCol.as("g"), idCol.as("id"),
      valueCol.cast("long").as("v"))
      .pinned // four consumers: group ranks, pool ranks, sizes, hist
    val ns = base.groupBy(col("g")).agg(count(lit(1)).as("ns"))
    val np = base.agg(count(lit(1)).as("np"))
    val ranked = base.withColumn("rk", row_number().over(
      Window.partitionBy(col("g")).orderBy(col("v"), col("id"))))
    val vHist = base.groupBy(col("v")).agg(count(lit(1)).as("__c"))
    val vOffs = rangePrefixSums(vHist, Seq("v"), Seq("__c" -> "__incl"))
      .select(col("v").as("__vo"), (col("__incl") - col("__c")).as("__voff"))
    // NULL-SAFE equality: a null metric forms its own (first-ranked)
    // histogram value under orderBy-nulls-first, exactly as the global
    // row_number ranked it — a plain equi-join would drop those rows
    // and with them every group row whose mapped rank lands in the
    // null band
    val pooled = base.join(vOffs, col("v") <=> col("__vo"))
      .withColumn("prk", col("__voff") + row_number().over(
        Window.partitionBy(col("v")).orderBy(col("g"), col("id"))))
      .select(col("prk"), col("v").as("norm_v"))
    ranked.join(ns, Seq("g")).crossJoin(np)
      .withColumn("mapped", when(col("ns") === 1, expr("(np + 1) div 2"))
        .otherwise(expr("((rk - 1) * (np - 1)) div (ns - 1) + 1")))
      .join(pooled, col("mapped") === col("prk"))
      .select(col("g"), col("id"), col("v"), col("norm_v"))
  }

  /** Exact per-group GINI coefficient via the rank-sum identity
    * G = (2·Σ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx) over ascending-sorted
    * non-negative values — the standard inequality index ("is this
    * source three mega-docs in a trenchcoat", quantified to one
    * number; q166's Pareto curve is the graphical cousin). Ties
    * contribute identically under any tie order, so the per-group
    * rank window is deterministic where it matters; one DECIMAL
    * division micro-rounds the result.
    *
    * Scale shape: one per-group sort (the rank window) + one partial
    * agg; groups process independently. */
  def gini(df: DataFrame, groupCol: Column, idCol: Column,
      valueCol: Column): DataFrame = {
    val base = df.select(groupCol.as("g"), idCol.as("id"),
      valueCol.cast("long").as("v"))
    val ranked = base.withColumn("rk", row_number().over(
      Window.partitionBy(col("g")).orderBy(col("v"), col("id"))).cast("long"))
    ranked.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"),
        sum(col("rk") * col("v")).as("t"))
      .withColumn("__ok", when(col("sum_v") > 0, col("sum_v"))
        .otherwise(raise_error(lit("gini needs a positive value sum"))))
      .select(col("g"), col("n"), col("sum_v"),
        expr("CAST(((2 * CAST(t AS DECIMAL(38,0)) - (n + 1) * sum_v)" +
          " * 1000000) DIV (CAST(n AS DECIMAL(38,0)) * __ok) AS BIGINT)")
          .as("gini_micro"))
  }

  private def requireSubBuckets(subBuckets: Int): Unit =
    require(subBuckets >= 2 && subBuckets <= 256
        && (subBuckets & (subBuckets - 1)) == 0,
      s"subBuckets must be a power of two in [2, 256] (keeps every " +
        s"bucket bound exact integer math), got $subBuckets")
}
