package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}

/** Surface-wide scale gate (round-8): NO query on the driver surface may
  * plan an unpartitioned Window over a row-scale frame. An unpartitioned
  * WindowExec moves its whole input to ONE task — fine for frames whose
  * cardinality is bounded by CONSTRUCTION (sketch buckets, decile rows,
  * per-source allocation keys, calendar days), fatal for frames that
  * grow with the data (the round-6 AUC lesson). Every query whose
  * optimized plan retains an unpartitioned Window must therefore appear
  * in the justified whitelist below; everything row-scale rides
  * `Stats.rangePrefixSums` / `rangePrefixMaxExclusive` instead
  * (StatsSpec pins the op-level plans; this spec sweeps the whole
  * 220-query surface so a new query can't silently reintroduce one).
  *
  * The whitelist maps query name → why its windowed frame is bounded.
  * A whitelisted query whose plan STOPS having an unpartitioned window
  * fails the gate too — stale entries hide regressions. */
class WindowGateSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private val bounded: Map[String, String] = Map(
    "q148_decile_lift" ->
      "cumulative capture over the DECILE frame: exactly `buckets` rows (require-gated <= 1000) for any input size",
    "q163_budget_allocation" ->
      "Hamilton largest-remainder rank over allocation KEYS (per-source dimension, tens to thousands) - the method needs the global remainder order",
    "q174_stratified_sample" ->
      "same Hamilton allocation as q163, one row per STRATUM (market segments: single digits)",
    "q188_rolling_corr" ->
      "7-day rolling frame keyed by calendar DAY - cardinality is the date span, not the event count",
    "q199_dedup_curve" ->
      "top-down cumulative over tau BANDS: 50000-micro steps in [500000, 950000], <= 10 rows by construction",
    "q204_share_of_parent" ->
      "grand-total Window.partitionBy() over the nation x region rollup (dimension-bounded: 25 rows)",
    "q210_rolling_kmv" ->
      "7-day rolling sketch-union frame keyed by calendar DAY, like q188")

  test("every unpartitioned window on the query surface sits on a bounded frame") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, mk) =>
        val df =
          try mk(spark, sf)
          catch { case e: Throwable =>
            fail(s"$name failed to build at sf0.001: $e") }
        val unpart = df.queryExecution.optimizedPlan.collect {
          case w: LWindow if w.partitionSpec.isEmpty => w
        }
        if (unpart.nonEmpty) Some(name) else None
    }
    val unlisted = offenders.filterNot(bounded.contains)
    assert(unlisted.isEmpty,
      s"queries planning an unpartitioned window over an unjustified " +
        s"frame: ${unlisted.mkString(", ")} — either port the cumulative " +
        "to Stats.rangePrefixSums or whitelist it here with a " +
        "bounded-cardinality justification")
    val stale = bounded.keySet -- offenders.toSet
    assert(stale.isEmpty,
      s"stale whitelist entries (no unpartitioned window planned " +
        s"anymore): ${stale.mkString(", ")} — remove them so the gate " +
        "stays honest")
  }
}
