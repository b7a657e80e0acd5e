package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pipeline-health monitoring: the first sign of an upstream incident
  * in a continuous ingest is usually a RATE anomaly — a crawler stuck
  * in a loop triples one source's hourly volume, a dead feed zeroes it.
  * Catching that from the data itself (not from infra metrics) is what
  * these ops are for, the observability sibling of [[Observability]]'s
  * kernel telemetry. */
object Monitoring {

  /** Trailing z-score spike detection over per-(key, hour) counts:
    * an hour is a `spike` when its count exceeds trailing-mean +
    * z × trailing-stddev over the previous `trailHours` observed hours
    * (`warmup` until `minHistory` hours of history exist, `ok`
    * otherwise).
    *
    * Engine-portable by construction (DuckDB-oracle-exact): mean and
    * variance derive from EXACT integer window sums (Σn, Σn², count) —
    * never from avg()/stddev() aggregates, whose internal float
    * summation order differs across engines and across partitionings
    * of the same engine. Every double here is produced by the same
    * IEEE operations on the same integers, so the flag can never
    * flicker between runs.
    *
    * The window is row-based over OBSERVED hours: a silent feed
    * compresses its trailing window rather than diluting it with
    * zeros. Production calendars that want explicit empty hours join a
    * time spine upstream. Scale shape: one partial-agg rollup, then
    * one window exchange partitioned by key — per-key series process
    * independently. */
  def rateSpikes(events: DataFrame, tsCol: Column, keyCol: Column,
      trailHours: Int = 24, minHistory: Int = 12, z: Double = 3.0): DataFrame =
    rateSpikesFromHourly(events
      .groupBy(keyCol.as("key"), date_trunc("hour", tsCol).as("hour"))
      .agg(count(lit(1)).as("n")), trailHours, minHistory, z)

  /** [[rateSpikes]] over a pre-aggregated (key, hour, n) series — the
    * entry point when counts are maintained incrementally (the
    * streaming sink merges per-batch counts, then evaluates here). */
  def rateSpikesFromHourly(hourly: DataFrame, trailHours: Int = 24,
      minHistory: Int = 12, z: Double = 3.0): DataFrame = {
    require(trailHours >= 2 && minHistory >= 2 && minHistory <= trailHours,
      s"need 2 <= minHistory <= trailHours, got $minHistory/$trailHours")
    val w = Window.partitionBy(col("key")).orderBy(col("hour"))
      .rowsBetween(-trailHours, -1)
    hourly
      .withColumn("t_cnt", count(col("n")).over(w))
      .withColumn("t_sum", sum(col("n")).over(w))
      .withColumn("t_sum2", sum(col("n") * col("n")).over(w))
      .withColumn("mean", col("t_sum").cast("double") / col("t_cnt"))
      .withColumn("variance", greatest(
        (col("t_sum2").cast("double") -
          col("t_sum").cast("double") * col("t_sum") / col("t_cnt"))
          / (col("t_cnt") - 1), lit(0.0)))
      .withColumn("status",
        when(col("t_cnt") < minHistory, "warmup")
          .when(col("n") > col("mean") + lit(z) * sqrt(col("variance")), "spike")
          .otherwise("ok"))
      .select(col("key"), col("hour"), col("n"), col("status"))
  }

  /** Per-dimension distribution drift between two embedding snapshots
    * (reference vs current) — the monitor a corpus pipeline runs after
    * every embedding-model rollout or ingest wave: a mean shift in a few
    * dimensions is the first sign the upstream encoder changed or a new
    * source skews the space, caught from the data itself before any
    * downstream index quietly degrades.
    *
    * Oracle-exact by the integer discipline ([[rateSpikes]]'s rule
    * applied per dimension): elements quantize to integer micros, the
    * per-dim first/second moments accumulate as DECIMAL(38,0) — exact at
    * any corpus size — and the reported mean/z columns are the same IEEE
    * double expressions over those integers on any engine.
    *
    * Output per dim: ref/cur mean (micro), |shift| (micro), and a
    * two-sample z score (milli; null when both variances are zero).
    * Scale shape: each side is one partial-aggregated explode→groupBy
    * reduced to d rows before its exchange; the join is d × d tiny. */
  def embeddingDrift(ref: DataFrame, cur: DataFrame, vecCol: String): DataFrame = {
    def moments(df: DataFrame, side: String): DataFrame =
      df.select(posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "x")))
        .withColumn("xm", round(col("x") * 1e6).cast("long"))
        .groupBy(col("dim"))
        .agg(sum(col("xm").cast("decimal(38,0)")).as(s"s_$side"),
          sum((col("xm") * col("xm")).cast("decimal(38,0)")).as(s"s2_$side"),
          count(lit(1)).as(s"n_$side"))
    def mean(side: String): Column =
      col(s"s_$side").cast("double") / col(s"n_$side") / 1e6
    def variance(side: String): Column =
      col(s"s2_$side").cast("double") / col(s"n_$side") / 1e12 -
        mean(side) * mean(side)
    val denom = sqrt(variance("ref") / col("n_ref") + variance("cur") / col("n_cur"))
    moments(ref, "ref").join(moments(cur, "cur"), Seq("dim"))
      .select(col("dim"),
        round(col("s_ref").cast("double") / col("n_ref")).cast("long")
          .as("ref_mean_micro"),
        round(col("s_cur").cast("double") / col("n_cur")).cast("long")
          .as("cur_mean_micro"),
        when(denom === 0, lit(null).cast("long"))
          .otherwise(round(abs(mean("ref") - mean("cur")) / denom * 1000).cast("long"))
          .as("z_milli"))
      .withColumn("shift_micro", abs(col("ref_mean_micro") - col("cur_mean_micro")))
      .select(col("dim"), col("ref_mean_micro"), col("cur_mean_micro"),
        col("shift_micro"), col("z_milli"))
  }

  /** One-sided CUSUM level-shift detector (Page 1954) over an already
    * bucketed series — the persistent-drift complement to
    * [[rateSpikes]]' single-bucket z-score: a +20% volume step too
    * small to trip a spike gate accumulates in the CUSUM until it
    * crosses. Per group: the allowance k = the group's own mean (so the
    * statistic drifts only on above-mean runs), S_i = max(0,
    * S_{i-1} + (x_i − k)), flagged when S_i ≥ thresholdPct% of mean.
    *
    * The recursion is computed CLOSED-FORM: S_i = C_i − min(0,
    * min_{j≤i} C_j) with C the running deviation sum — two window
    * functions, no iterative fold, so it is one exchange per group and
    * DuckDB-oracle-exact (all arithmetic in integer micro-units; the
    * mean is an integer division).
    *
    * Scale shape: input is the bucketed rollup (dimension × buckets),
    * already tiny relative to raw events; the windows partition by
    * group, so series process independently. */
  def cusumShift(buckets: DataFrame, groupCol: Column, orderCol: Column,
      valueCol: Column, thresholdPct: Int = 200): DataFrame = {
    require(thresholdPct >= 1, s"thresholdPct must be >= 1, got $thresholdPct")
    val base = buckets.select(groupCol.as("g"), orderCol.as("b"),
      valueCol.cast("long").as("v"))
    val stats = base.groupBy(col("g"))
      .agg(sum(col("v")).as("__tot"), count(lit(1)).as("__nb"))
      .select(col("g"), expr("(__tot * 1000000) div __nb").as("mean_micro"))
    val wcum = Window.partitionBy(col("g")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(stats, Seq("g"))
      .withColumn("__dev", col("v") * 1000000L - col("mean_micro"))
      .withColumn("__cum", sum(col("__dev")).over(wcum))
      .withColumn("cusum_micro",
        col("__cum") - least(min(col("__cum")).over(wcum), lit(0L)))
      .withColumn("flagged", col("cusum_micro") * 100L >=
        col("mean_micro") * thresholdPct)
      .select(col("g"), col("b"), col("v"), col("mean_micro"),
        col("cusum_micro"), col("flagged"))
  }
}
