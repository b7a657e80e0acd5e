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
}
