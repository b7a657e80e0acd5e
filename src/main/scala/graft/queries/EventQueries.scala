package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.Tables.t
import graft.functions._
import graft.ops.Pin.PinSyntax

/** Event-stream operators (SURVEY §2.10): the batch forms of the
  * Structured Streaming transforms in [[graft.streaming.EventPipeline]] —
  * identical DataFrame→DataFrame functions run under readStream in
  * production and over a static frame here for the oracle.
  */
object EventQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Tumbling event-time window aggregation (hourly rollup)
    "q10_event_hourly" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("hour"), col("event_type"))
    }),

    // F14 — pseudo-JSON "~{…}" column parse
    // (reference: scripts/bills/vote_matching.py:14-20)
    "q27_pseudo_json" -> ((s, dir) => {
      val schema = StructType(Seq(StructField("k", LongType)))
      t(s, dir, "events")
        .withColumn("props_pseudo", concat(lit("~"), col("props")))
        .select(col("event_id"),
          parsePseudoJson(col("props_pseudo"), schema).getField("k").as("k"))
        .orderBy(col("event_id"))
    }),

    // Sessionization: a >30-minute gap per user starts a new session —
    // the batch equivalent of session windows (lag + cumulative flag sum)
    "q33_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // Interval join via binned equi-join (ops/RangeJoin): events against
    // overlapping daily windows [day-6h, day+30h) — a point can match two
    // windows, so this is a genuine interval join, not bucketization. The
    // naive spelling (join on ts BETWEEN) is a broadcast nested loop;
    // the binned form is an equi-join AQE can treat like any other
    "q68_interval_join" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("ts"), col("value"))
      val periods = ev.select(date_trunc("day", col("ts")).as("day")).distinct()
        .select((col("day") - expr("INTERVAL 6 HOURS")).as("p_start"),
          (col("day") + expr("INTERVAL 30 HOURS")).as("p_end"))
      graft.ops.RangeJoin.binnedIntervalJoin(ev, periods,
        "ts", "p_start", "p_end", binSeconds = 6 * 3600)
        .groupBy(col("p_start"), col("p_end"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("p_start"))
    }),

    // Interval-OVERLAP join (ops/RangeJoin.binnedOverlapJoin): daily
    // 30-hour windows vs 12-hour-shifted 24-hour windows — every pair
    // meets in exactly its first shared bin (no dedup exchange), the
    // exact predicate verifies
    "q80_overlap_join" -> ((s, dir) => {
      val days = t(s, dir, "events")
        .select(date_trunc("day", col("ts")).as("day")).distinct()
      val a = days.select(col("day").as("a_start"),
        (col("day") + expr("INTERVAL 30 HOURS")).as("a_end"))
      val b = days.select((col("day") + expr("INTERVAL 12 HOURS")).as("b_start"),
        (col("day") + expr("INTERVAL 36 HOURS")).as("b_end"))
      graft.ops.RangeJoin.binnedOverlapJoin(a, b,
        "a_start", "a_end", "b_start", "b_end", binSeconds = 6 * 3600)
        .orderBy(col("a_start"), col("b_start"))
    }),

    // SCD2 dimension build from a change log (warehouse/Warehouse
    // scd2FromLog): per-user event_type state runs with half-open
    // validity intervals; consecutive same-state rows collapse
    "q70_scd2" -> ((s, dir) => {
      graft.warehouse.Warehouse.scd2FromLog(
        t(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type")),
        "user_id", "ts", "event_id", Seq("event_type"))
        .orderBy(col("user_id"), col("valid_from"), col("event_type"))
    }),

    // Ordered conversion funnel (ops/Analytics.funnel): view → click →
    // purchase, strict-after semantics, one user-keyed shuffle and a
    // codegen'd per-user fold — no per-stage self-join
    "q113_funnel" -> ((s, dir) => {
      graft.ops.Analytics.funnel(t(s, dir, "events"),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
        .orderBy(col("stage_idx"))
    }),

    // Weekly cohort retention (ops/Analytics.cohortRetention): cohort =
    // Monday-truncated week of first event; offset-0 cells are cohort
    // sizes
    "q114_retention" -> ((s, dir) => {
      graft.ops.Analytics.cohortRetention(t(s, dir, "events"), "user_id", "ts")
        .orderBy(col("cohort_week"), col("week_offset"))
    }),

    // Last-touch attribution (ops/Analytics.lastTouchAttribution):
    // purchases credited to the most recent view/click within 7 days —
    // running ignoreNulls-last window, no touch×conversion self-join
    "q119_attribution" -> ((s, dir) => {
      graft.ops.Analytics.lastTouchAttribution(t(s, dir, "events"),
        "user_id", "ts", "event_id", "event_type",
        touchTypes = Seq("view", "click"), conversionType = "purchase",
        windowSeconds = 7L * 24 * 3600)
        .orderBy(col("touch_type"))
    }),

    // NATIVE session_window sessionization — the built-in operator the
    // custom q33 window spelling and the GroupState streaming
    // sessionizer bracket; its window end is last-event + gap (the
    // oracle mirrors that closed form)
    "q137_session_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("w.end").as("session_end"), col("n_events"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    // Salted skew join (ops/Skew.saltedJoin): events (skewed user
    // traffic) ⋈ per-user dimension — the oracle is the PLAIN join,
    // proving the salt is result-transparent; PlanSpec pins the salted
    // exchange shape
    "q134_salted_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("value"))
      val dim = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("user_events"))
      graft.ops.Skew.saltedJoin(ev, dim, "user_id", factor = 8)
        .select(col("user_id"), col("event_id"), col("user_events"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Rolling 7-day active users (the WAU curve): per-day distinct
    // actives expanded over the trailing week — the expansion is
    // per-(user, day) rows (already distinct-compressed), never raw
    // events
    "q135_rolling_active" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .select(col("user_id"), date_trunc("day", col("ts")).cast("date").as("day"))
        .distinct()
      daily
        .select(col("user_id"), explode(sequence(col("day"),
          date_add(col("day"), 6))).as("window_day"))
        .distinct()
        .groupBy(col("window_day"))
        .agg(count(lit(1)).as("wau"))
        .orderBy(col("window_day"))
    }),

    // A/B conversion readout (ops/Analytics.abConversionTest): md5-split
    // arms, exact counts, pooled two-proportion z micro-rounded
    "q132_ab_test" -> ((s, dir) => {
      graft.ops.Analytics.abConversionTest(t(s, dir, "events"),
        "user_id", "event_type", "purchase", salt = "ab:", armACut = "80",
        minConversions = 14L)
    }),

    // Per-type value trend (ops/Analytics.linearTrend): closed-form OLS
    // of value cents against seconds-since-2024 — exact decimal moment
    // sums, micro-rounded slope/intercept
    "q131_trend" -> ((s, dir) => {
      graft.ops.Analytics.linearTrend(t(s, dir, "events"), "event_type",
        x = expr("(unix_micros(ts) - 1704067200000000L) DIV 1000000"),
        y = floor(col("value") * 100 + lit(0.5)))
        .orderBy(col("event_type"))
    }),

    // Item-item collaborative filtering (ops/Analytics.itemCooccurrence)
    // over the event props item key: cosine on binary interactions,
    // capped users, exact-count micro-rounded similarity
    "q129_item_cf" -> ((s, dir) => {
      graft.ops.Analytics.itemCooccurrence(
        t(s, dir, "events").select(col("user_id"),
          get_json_object(col("props"), "$.k").cast("long").as("item")),
        "user_id", "item", minCo = 5L, maxItemsPerUser = 64, topK = 100)
    }),

    // Top session journey paths (ops/Analytics.sessionPaths): 30-min
    // gap sessions, first 5 event types as the path, top 20 by count
    "q124_session_paths" -> ((s, dir) => {
      graft.ops.Analytics.sessionPaths(t(s, dir, "events"),
        "user_id", "ts", "event_id", "event_type",
        gapSeconds = 1800L, maxLen = 5, topK = 20)
    }),

    // Funnel time-to-convert histogram (ops/Analytics.funnelDurations):
    // completed view→click→purchase funnels bucketed by exact-micros
    // wall time from first-view reach to purchase reach
    "q123_funnel_latency" -> ((s, dir) => {
      graft.ops.Analytics.funnelDurations(t(s, dir, "events"),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"),
        buckets = Seq("le_1m" -> 60L, "le_1h" -> 3600L, "le_1d" -> 86400L),
        restLabel = "gt_1d")
        .orderBy(col("bucket_idx"))
    }),

    // Funnel × experiment arm (composition: Analytics.funnel over each
    // md5-split arm) — the per-variant funnel readout an experiment
    // review actually looks at
    "q139_funnel_by_arm" -> ((s, dir) => {
      val ev = t(s, dir, "events").withColumn("arm",
        graft.ops.Corpus.hashSplit(col("user_id"), "ab:", Seq("80" -> "a"), "b"))
      val arms = Seq("a", "b").map { arm =>
        graft.ops.Analytics.funnel(ev.filter(col("arm") === arm),
          "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
          .withColumn("arm", lit(arm))
      }
      arms.reduce(_ unionByName _)
        .select(col("arm"), col("stage_idx"), col("stage"), col("n_users"))
        .orderBy(col("arm"), col("stage_idx"))
    }),

    // Transition dwell times (ops/Analytics.transitionDwell): where
    // users hesitate — exact integer dwell sums, micro-rounded means
    "q138_transition_dwell" -> ((s, dir) => {
      graft.ops.Analytics.transitionDwell(t(s, dir, "events"),
        "user_id", "ts", "event_id", "event_type")
        .orderBy(col("cur"), col("next"))
    }),

    // First-order Markov transition matrix (ops/Analytics
    // .eventTransitions): micro-rounded probabilities off exact counts
    "q120_event_transitions" -> ((s, dir) => {
      graft.ops.Analytics.eventTransitions(t(s, dir, "events"),
        "user_id", "ts", "event_id", "event_type")
        .orderBy(col("cur"), col("next"))
    }),

    // RFM segmentation (ops/Analytics.rfmSegments): quintiles via the
    // distributed exact-ntile — the oracle's native window ntile proves
    // the closed form
    "q121_rfm" -> ((s, dir) => {
      graft.ops.Analytics.rfmSegments(t(s, dir, "events"),
        "user_id", "ts", "event_type", "purchase", "value")
        .orderBy(col("user_id"))
    }),

    // Rate-anomaly monitoring: per-event-type hourly counts flagged
    // spike/ok/warmup by trailing z-score — mean/variance from EXACT
    // integer window sums, never avg()/stddev() (float summation order
    // differs across engines), which is what keeps an anomaly flag
    // oracle-exact
    "q90_rate_spikes" -> ((s, dir) => {
      graft.ops.Monitoring.rateSpikes(t(s, dir, "events"),
        col("ts"), col("event_type"))
        .withColumnRenamed("key", "event_type")
        .orderBy(col("event_type"), col("hour"))
    }),

    // Exact ROC AUC of the value signal against the purchase label via
    // the distributed Mann–Whitney rank-sum (ops/Stats.aucExact):
    // midranks from the score HISTOGRAM, never a global sort; the
    // all-integer 2·midrank form is what makes an AUC hash-exact
    // across engines (the q88 discipline applied to ranking metrics)
    "q143_auc" -> ((s, dir) => {
      graft.ops.Stats.aucExact(
        t(s, dir, "events").withColumn("cents",
          floor(col("value") * 100 + lit(0.5)).cast("long")),
        col("cents"), col("event_type") === "purchase")
    }),

    // Robust per-type value-anomaly profile: exact median + MAD (50%
    // breakdown point — mean/stddev z-scores break under the very
    // outliers they hunt), outliers = |v − med| > 3·MAD, all integer
    // comparisons (ops/Stats.medianMadOutliers, two histogram passes)
    "q144_mad_outliers" -> ((s, dir) => {
      graft.ops.Stats.medianMadOutliers(
        t(s, dir, "events").withColumn("cents",
          floor(col("value") * 100 + lit(0.5)).cast("long")),
        col("event_type"), col("cents"), k = 3)
        .withColumnRenamed("g", "event_type")
        .orderBy(col("event_type"))
    }),

    // Decile lift / gains table for the value→purchase signal
    // (ops/Stats.decileLift): deciles from the DISTRIBUTED exact ntile
    // (q121 machinery) over score DESC with event_id tie order — the
    // oracle runs native window ntile, the hash compare is the
    // equivalence proof; per-decile positive rate, lift, and
    // cumulative capture in all-integer micro units
    "q148_decile_lift" -> ((s, dir) => {
      graft.ops.Stats.decileLift(
        t(s, dir, "events").withColumn("cents",
          floor(col("value") * 100 + lit(0.5)).cast("long")),
        col("cents"), col("event_type") === "purchase", col("event_id"))
        .orderBy(col("decile"))
    }),

    // Two-sample Kolmogorov–Smirnov: does the purchase value
    // distribution differ from everything else's? Exact integer
    // sup-distance from the shared score histogram
    // (ops/Stats.ksTest2) — the distribution-shift cousin of q143's
    // AUC, with the α=0.05 decision pinned in the output
    "q150_ks_test" -> ((s, dir) => {
      graft.ops.Stats.ksTest2(
        t(s, dir, "events").withColumn("cents",
          floor(col("value") * 100 + lit(0.5)).cast("long")),
        col("cents"), col("event_type") === "purchase")
    }),

    // Chi-square independence of event_type × hour-of-day — the
    // seasonality-confound check behind any per-type rate comparison;
    // exact-rational cell terms, one nano rounding per cell
    // (ops/Stats.chi2Independence)
    "q151_chi2" -> ((s, dir) => {
      graft.ops.Stats.chi2Independence(t(s, dir, "events"),
        col("event_type"), hour(col("ts")))
    }),

    // Point-in-time enrichment: purchases joined to the SCD2 status
    // dimension (signup/error run-collapsed versions from
    // Warehouse.scd2FromLog) AS OF the purchase timestamp — the
    // versioned-dim composition every warehouse needs, planned as the
    // audited as-of union (no point-in-interval join explosion)
    "q168_pit_enrich" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      // one status event per (user, ts) — min event_id — so version
      // start timestamps are unique per user and the as-of is total
      val log0 = ev.filter(col("event_type").isin("signup", "error"))
        .groupBy(col("user_id"), col("ts"))
        .agg(min(col("event_id")).as("event_id"))
      val statusLog = log0.join(
        ev.select(col("event_id"), col("event_type").as("status")),
        Seq("event_id"))
      val versions = graft.warehouse.Warehouse.scd2FromLog(
          statusLog, "user_id", "ts", "event_id", Seq("status"))
        .select(col("user_id"), col("valid_from").as("vts"), col("status"))
      val facts = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      graft.ops.AsOfJoin.asOf(facts, versions, "user_id", "ts", "vts")
        .select(col("event_id"), col("user_id"), col("status"))
        .orderBy(col("event_id"))
    }),

    // Multi-touch linear attribution (ops/Analytics.linearAttribution):
    // each purchase splits exactly 10⁶ micro-credits across its
    // in-window prior views/clicks (remainder to the earliest — the
    // q163 Hamilton discipline applied to credit), so channel totals
    // reconcile to conversions·10⁶ by construction; q119's last-touch
    // is the 1-touch special case
    "q169_linear_attribution" -> ((s, dir) => {
      graft.ops.Analytics.linearAttribution(t(s, dir, "events"),
        "user_id", "ts", "event_id", "event_type",
        touchTypes = Seq("view", "click"), conversionType = "purchase",
        windowSeconds = 7L * 24 * 3600)
        .orderBy(col("touch_type"))
    }),

    // CUPED variance-reduced A/B means (ops/Analytics
    // .cupedAdjustedMeans, Deng et al. 2013): pre-period spend explains
    // away per-user level, θ from exact decimal moments pinned to
    // micro once, per-user adjustments INTEGER — the modern
    // experimentation readout next to q132's conversion z-test
    "q165_cuped" -> ((s, dir) => {
      graft.ops.Analytics.cupedAdjustedMeans(t(s, dir, "events"),
        "user_id", "ts", "event_type", "purchase", "value",
        salt = "ab:", armACut = "80", preDays = 15)
        .orderBy(col("arm"))
    }),

    // Incremental view maintenance (warehouse/Warehouse.aggState +
    // mergeAggState): the daily rollup maintained as mergeable partial
    // states — a 70%/30% id-split stands in for yesterday's state +
    // today's delta, and the ORACLE is the full recompute, so the hash
    // compare IS the maintained-view ≡ recompute proof
    // Duplicate-payment detection: a purchase repeating the SAME
    // (user, whole-dollar amount) within a day of the previous one —
    // the double-submit/fraud screen every payment pipeline runs;
    // exact gap carried for triage
    "q217_dup_payments" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"), col("dollars"))
        .orderBy(col("tus"), col("event_id"))
      t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          expr("CAST(floor(value + 0.5) AS BIGINT)").as("dollars"),
          unix_micros(col("ts")).as("tus"))
        .withColumn("prev_id", lag(col("event_id"), 1).over(w))
        .withColumn("gap_sec",
          expr("(tus - lag(tus, 1) OVER (PARTITION BY user_id, dollars" +
            " ORDER BY tus, event_id)) div 1000000"))
        .where(col("prev_id").isNotNull && col("gap_sec") <= 86400)
        .select(col("user_id"), col("dollars"), col("event_id"),
          col("prev_id"), col("gap_sec"))
        .orderBy(col("user_id"), col("dollars"), col("event_id"))
    }),

    // Burstiness (Fano factor / index of dispersion) of daily volumes
    // per type: variance-to-mean entirely in integer arithmetic —
    // (nΣx²−(Σx)²)·10⁶ div (n·Σx); ≈1e6 means Poisson-like, higher
    // means bursty — the traffic-shape gauge behind capacity planning
    "q214_burstiness" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("x"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"), sum(col("x")).as("total"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("event_type"), col("n_days"), col("total"),
          expr("(total * 1000) div n_days").as("mean_milli"),
          expr("((n_days * sxx - total * total) * 1000000)" +
            " div (n_days * total)").as("fano_micro"))
        .orderBy(col("event_type"))
    }),

    // Churn by acquisition type: users grouped by their FIRST event's
    // type, churned = no activity in the trailing 14 days of the
    // window — the retention readout marketing actually asks for
    "q215_churn" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          to_date(col("ts")).as("day"), col("event_id"))
      val cutoff = ev.agg(date_sub(max(col("day")), 14).as("cut"))
      val users = ev.groupBy(col("user_id"))
        .agg(min(struct(col("day"), col("event_id"),
          col("event_type").as("et"))).as("first"),
          max(col("day")).as("last_day"))
      users.crossJoin(cutoff)
        .groupBy(col("first.et").as("first_type"))
        .agg(count(lit(1)).as("n_users"),
          sum(when(col("last_day") <= col("cut"), 1L).otherwise(0L))
            .as("n_churned"))
        .select(col("first_type"), col("n_users"), col("n_churned"),
          expr("(n_churned * 1000000) div n_users").as("churn_micro"))
        .orderBy(col("first_type"))
    }),

    // Sketch-MERGE in action: per-day KMV min-k summaries merged over a
    // rolling 7-day window (in-row k-bounded union — the mergeability
    // q172 promises, exercised across window frames) next to the exact
    // rolling distinct; both estimate and truth are hash-compared
    "q210_rolling_kmv" -> ((s, dir) => {
      val k = 64
      val dd = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct().pinned // three consumers below
      val hv = dd.select(col("day"),
        conv(substring(md5(concat(lit("kmv:"), col("user_id").cast("string"))),
          1, 15), 16, 10).cast("long").as("hv"))
        .distinct()
      val daily = hv.groupBy(col("day"))
        .agg(graft.functions.collectMinK(col("hv"), lit(0L), k).as("mk"))
        .select(col("day"), col("mk.items.id").as("ks"))
      // CALENDAR-bounded frame (range over epoch days), not ROWS over
      // present days: the two agree only while the feed is gapless, and
      // the exact side below is calendar arithmetic — a gap would
      // silently widen a ROWS frame past 7 calendar days
      val w7 = Window.orderBy(datediff(col("day"), lit("1970-01-01")))
        .rangeBetween(-6, 0)
      val est = daily
        .withColumn("lists", collect_list(col("ks")).over(w7))
        .withColumn("ku",
          expr(s"slice(array_sort(array_distinct(flatten(lists))), 1, $k)"))
        .select(col("day"), size(col("ku")).as("n_kept"),
          when(size(col("ku")) < k, size(col("ku")).cast("long"))
            .otherwise(expr(s"CAST((CAST(${k - 1} AS DECIMAL(38,0))" +
              s" * 1152921504606846976) div element_at(ku, $k) AS BIGINT)"))
            .as("est_7d"))
      val days = dd.select(col("day")).distinct()
      val exact = dd
        .select(col("user_id"),
          explode(expr("sequence(day, date_add(day, 6))")).as("day"))
        .join(days, Seq("day"), "left_semi")
        .groupBy(col("day"))
        .agg(count_distinct(col("user_id")).as("exact_7d"))
      est.join(exact, "day")
        .select(col("day"), col("exact_7d"), col("n_kept"), col("est_7d"))
        .orderBy(col("day"))
    }),

    // KMV distinct-user sketch per event type vs the exact count — the
    // oracle-checkable sketch next to q45's golden-only HLL: md5 hashes
    // are engine-portable and the (k-1)·2^60/h_k estimator is one
    // integer division. sf0.001 has <k distinct users (exact branch);
    // sf0.01+ exercises the estimator branch
    // Decision-stump induction: the single best threshold split of the
    // value column for predicting "is this a purchase event" by
    // information gain — computed entirely over the value HISTOGRAM
    // (running class counts via range-partitioned prefix sums),
    // entropies in nano-nats from exact integer counts, one rounding
    // per side sum
    "q206_best_split" -> ((s, dir) => {
      val pts = t(s, dir, "events")
        .select(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("v"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      val hist = pts.groupBy(col("v"))
        .agg(count(lit(1)).as("nv"), sum(col("y")).as("pv"))
      val tot = pts.agg(count(lit(1)).as("n"), sum(col("y")).as("p"))
      def sideE(p: org.apache.spark.sql.Column,
          n: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        when(p === 0L || p === n, lit(0.0))
          .otherwise(-(p.cast("double") * log(p.cast("double") / n.cast("double"))
            + (n - p).cast("double")
              * log((n - p).cast("double") / n.cast("double"))))
      // running class counts over the value histogram ride the
      // range-partitioned prefix sums — the value domain is
      // cents-quantized but CONTINUOUS in origin, so an unpartitioned
      // Window.orderBy(v) here degrades exactly like AUC's did
      val splits = graft.ops.Stats.rangePrefixSums(hist, Seq("v"),
          Seq("nv" -> "nl", "pv" -> "pl"))
        .crossJoin(tot)
        .withColumn("nr", col("n") - col("nl"))
        .withColumn("pr", col("p") - col("pl"))
        .filter(col("nr") > 0)
        .withColumn("weighted_nano",
          floor((sideE(col("pl"), col("nl")) + sideE(col("pr"), col("nr")))
            / col("n").cast("double") * 1e9 + lit(0.5)).cast("long"))
        .withColumn("h0_nano",
          floor(sideE(col("p"), col("n")) / col("n").cast("double") * 1e9
            + lit(0.5)).cast("long"))
      splits
        .select(col("v").as("split_cents"), col("nl"), col("pl"),
          col("nr"), col("pr"), col("weighted_nano"),
          (col("h0_nano") - col("weighted_nano")).as("gain_nano"))
        .orderBy(col("weighted_nano"), col("split_cents"))
        .limit(1)
    }),

    // Session bounce/entry analytics over the q124 gap sessionization:
    // per entry event-type, sessions started there, bounce share
    // (single-event sessions), and mean session length in events
    "q207_bounce_rate" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val sess = t(s, dir, "events")
        .withColumn("prev", lag(col("ts"), 1).over(byUser))
        .withColumn("new_s", when(col("prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev")) >
            1800L * 1000000L, 1).otherwise(0))
        .withColumn("sid", sum(col("new_s")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(count(lit(1)).as("len"),
          min(struct(unix_micros(col("ts")).as("tus"), col("event_id"),
            col("event_type").as("et"))).as("first"))
      sess.groupBy(col("first.et").as("entry_type"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("len") === 1L, 1L).otherwise(0L)).as("n_bounces"),
          sum(col("len")).as("n_events"))
        .select(col("entry_type"), col("n_sessions"), col("n_bounces"),
          expr("(n_bounces * 1000000) div n_sessions").as("bounce_micro"),
          expr("(n_events * 1000) div n_sessions").as("mean_len_milli"))
        .orderBy(col("entry_type"))
    }),

    // New-vs-returning daily split: per day, active users whose FIRST
    // event ever is that day vs returning — the growth-accounting twin
    // of q114's cohort retention, one first-seen argmin + one rollup
    "q198_new_vs_returning" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val first = ev.groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
      ev.distinct()
        .join(first, "user_id")
        .groupBy(col("day"))
        .agg(sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
            .as("new_users"),
          sum(when(col("day") =!= col("first_day"), 1L).otherwise(0L))
            .as("returning_users"))
        .orderBy(col("day"))
    }),

    // Experiment power analysis from observed arms: with the q132 md5
    // split's observed conversion rates as (p1, p2), the per-arm sample
    // size needed to detect that lift at alpha=0.05 / power=0.80 —
    // n = (z_a + z_b)^2 (p1(1-p1) + p2(1-p2)) / (p1-p2)^2, constants
    // fixed, doubles micro-rounded once (the q90 discipline)
    "q195_power_analysis" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val arms = ev.groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
        .withColumn("arm", when(
          substring(md5(concat(lit("ab:"), col("user_id").cast("string"))), 1, 1)
            < lit("8"), "A").otherwise("B"))
        .groupBy(col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("converted")).as("conv"))
      val wide = arms.groupBy()
        .agg(sum(when(col("arm") === "A", col("n"))).as("n1"),
          sum(when(col("arm") === "A", col("conv"))).as("c1"),
          sum(when(col("arm") === "B", col("n"))).as("n2"),
          sum(when(col("arm") === "B", col("conv"))).as("c2"))
      wide.select(col("n1"), col("c1"), col("n2"), col("c2"),
          (col("c1").cast("double") / col("n1")).as("p1"),
          (col("c2").cast("double") / col("n2")).as("p2"))
        .withColumn("zz", lit((1.959964 + 0.841621) * (1.959964 + 0.841621)))
        .withColumn("n_required", when(abs(col("p1") - col("p2")) < 1e-12,
            lit(null).cast("long"))
          .otherwise(ceil((col("zz")
            * (col("p1") * (lit(1.0) - col("p1"))
              + col("p2") * (lit(1.0) - col("p2"))))
            / ((col("p1") - col("p2")) * (col("p1") - col("p2"))))
            .cast("long")))
        .select(col("n1"), col("c1"), col("n2"), col("c2"),
          floor(col("p1") * 1000000 + 0.5).cast("long").as("p1_micro"),
          floor(col("p2") * 1000000 + 0.5).cast("long").as("p2_micro"),
          col("n_required"))
        .orderBy(col("n1"))
    }),

    // Per-type winsorized mean of event values: values clamped at the
    // exact p01/p99 (q142 percentile_disc construction), then an exact
    // integer-cents mean — the robust-mean preprocessing that tames a
    // fat-tailed metric before dashboards average it
    "q196_winsorize" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_type"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      val cuts = graft.ops.Stats.quantilesDisc(ev, col("event_type"),
        col("cents"), Seq(1, 99))
        .select(col("g").as("event_type"), col("p1"), col("p99"))
      ev.join(cuts, "event_type")
        .withColumn("w", least(greatest(col("cents"), col("p1")), col("p99")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          min(col("p1")).as("lo_cents"), max(col("p99")).as("hi_cents"),
          sum(col("cents")).as("raw_sum"), sum(col("w")).as("win_sum"))
        .select(col("event_type"), col("n"), col("lo_cents"), col("hi_cents"),
          expr("(raw_sum * 100) div n").as("raw_mean_milli"),
          expr("(win_sum * 100) div n").as("win_mean_milli"))
        .orderBy(col("event_type"))
    }),

    // Date-spine gap fill: the per-type daily series completed over the
    // full calendar span (generated spine × types), missing days
    // zero-filled for counts and FORWARD-FILLED for the running total —
    // the shape every reporting layer needs before charting a series.
    // The synthetic feed has no gaps, so every 5th day is dropped
    // upstream to make the fill paths real, not vacuous
    "q187_gap_fill" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .filter(dayofmonth(to_date(col("ts"))) % 5 =!= 0)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).as("cents"))
      val span = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      val spine = span
        .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
        .crossJoin(daily.select(col("event_type")).distinct())
      val wff = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
          coalesce(col("n"), lit(0L)).as("n"),
          col("cents"))
        .withColumn("cents_ff",
          coalesce(last(col("cents"), ignoreNulls = true).over(wff), lit(0L)))
        .drop("cents")
        .orderBy(col("event_type"), col("day"))
    }),

    // Rolling 7-day Pearson correlation between the click and purchase
    // daily series — integer window moments (the q162 discipline made
    // rolling), one sqrt+rounding at the end; days without a complete
    // 7-day history emit null corr rather than a short-window artifact
    "q188_rolling_corr" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val two = daily.groupBy(col("day"))
        .agg(sum(when(col("event_type") === "click", col("n"))
            .otherwise(0L)).as("x"),
          sum(when(col("event_type") === "purchase", col("n"))
            .otherwise(0L)).as("y"))
      // calendar range frame, not ROWS over present days (the q210
      // discipline): k then counts PRESENT days in the 7-calendar-day
      // window, so a gap yields null corr instead of a frame that
      // silently reaches further back in time
      val w7 = Window.orderBy(datediff(col("day"), lit("1970-01-01")))
        .rangeBetween(-6, 0)
      two
        .withColumn("k", count(lit(1)).over(w7))
        .withColumn("sx", sum(col("x")).over(w7))
        .withColumn("sy", sum(col("y")).over(w7))
        .withColumn("sxx", sum(col("x") * col("x")).over(w7))
        .withColumn("syy", sum(col("y") * col("y")).over(w7))
        .withColumn("sxy", sum(col("x") * col("y")).over(w7))
        .withColumn("corr_milli", when(col("k") < 7, lit(null).cast("long"))
          .otherwise({
            val cov = col("k") * col("sxy") - col("sx") * col("sy")
            val vx = col("k") * col("sxx") - col("sx") * col("sx")
            val vy = col("k") * col("syy") - col("sy") * col("sy")
            when(vx === 0L || vy === 0L, lit(null).cast("long"))
              .otherwise(floor(cov.cast("double")
                / sqrt(vx.cast("double") * vy.cast("double"))
                * 1000 + lit(0.5)).cast("long"))
          }))
        .select(col("day"), col("x"), col("y"), col("corr_milli"))
        .orderBy(col("day"))
    }),

    // Day-of-week seasonality profile: per-type dow means and the
    // seasonal index (dow mean / overall mean), each a SINGLE integer
    // division so both engines round identically
    "q183_seasonality" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val dow = daily
        .withColumn("dow", (dayofweek(col("day")) - 1).cast("int"))
        .groupBy(col("event_type"), col("dow"))
        .agg(sum(col("n")).as("n_events"), count(lit(1)).as("n_days"))
      val overall = daily.groupBy(col("event_type"))
        .agg(sum(col("n")).as("tot"), count(lit(1)).as("days_tot"))
      dow.join(overall, "event_type")
        .select(col("event_type"), col("dow"), col("n_events"), col("n_days"),
          expr("(n_events * 1000000) div n_days").as("mean_micro"),
          expr("(n_events * days_tot * 1000000) div (n_days * tot)")
            .as("index_micro"))
        .orderBy(col("event_type"), col("dow"))
    }),

    // Telemetry debounce with gaps-and-islands semantics: bursts of
    // same-(user, type) events chained within 300 s collapse to one
    // keeper — the batch twin of client-side event throttling; exact
    // micros arithmetic, island starts counted per key
    "q184_event_debounce" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("tus"), col("event_id"))
      t(s, dir, "events")
        .withColumn("tus", unix_micros(col("ts")))
        .withColumn("prev", lag(col("tus"), 1).over(w))
        .withColumn("iskeep", when(col("prev").isNull
          || col("tus") - col("prev") > 300000000L, 1L).otherwise(0L))
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(col("iskeep")).as("n_kept"))
        .orderBy(col("user_id"), col("event_type"))
    }),

    // Watermark-delay advisor: per-type event-time lateness vs the
    // running max at arrival (arrival order = event_id), summarized by
    // exact p50/p95/p99 (ops/Stats.quantilesDisc) — "choose your
    // watermark from the data, not folklore"; seconds via integer
    // micros division
    "q185_lateness" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val withMax = t(s, dir, "events")
        .withColumn("tus", unix_micros(col("ts")))
        .withColumn("maxprev", max(col("tus")).over(w))
        .withColumn("late_sec", greatest(lit(0L),
          expr("(coalesce(maxprev, tus) - tus) div 1000000")))
      graft.ops.Stats.quantilesDisc(withMax, col("event_type"),
        col("late_sec"), Seq(50, 95, 99))
        .select(col("g").as("event_type"), col("n"),
          col("p50").as("p50_late_sec"), col("p95").as("p95_late_sec"),
          col("p99").as("p99_late_sec"))
        .orderBy(col("event_type"))
    }),

    // One-sided CUSUM level-shift detection over per-type daily counts
    // (Page 1954) — the persistent-drift complement to q90's z-score
    // spikes; the max(0, S+dev) recursion is computed closed-form as
    // two windows, so it is oracle-exact integer micro arithmetic
    "q175_cusum_shift" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      graft.ops.Monitoring.cusumShift(daily, col("event_type"), col("day"),
        col("n"), thresholdPct = 50)
        .select(col("g").as("event_type"), col("b").as("day"),
          col("v").as("n"), col("mean_micro"), col("cusum_micro"),
          col("flagged"))
        .orderBy(col("event_type"), col("day"))
    }),

    "q172_kmv_distinct" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val sk = graft.ops.Stats.kmvDistinct(ev, col("event_type"),
        col("user_id"), k = 64)
      val ex = ev.groupBy(col("event_type").as("g"))
        .agg(count_distinct(col("user_id")).as("n_exact"))
      sk.join(ex, "g")
        .select(col("g").as("event_type"), col("n_exact"), col("n_hashes"),
          col("n_kept"), col("h_k"), col("est_distinct"))
        .orderBy(col("event_type"))
    }),

    "q161_incremental_agg" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("cents", floor(col("value") * 100 + lit(0.5)).cast("long"))
        .withColumn("day", col("ts").cast("date"))
      val st = graft.warehouse.Warehouse.aggState(
        ev.filter(col("event_id") % 10 < 7), Seq("event_type", "day"),
        col("cents"))
      val dl = graft.warehouse.Warehouse.aggState(
        ev.filter(col("event_id") % 10 >= 7), Seq("event_type", "day"),
        col("cents"))
      graft.warehouse.Warehouse.mergeAggState(st, dl, Seq("event_type", "day"))
        .select(col("event_type"), col("day"), col("n"),
          col("sum_v").cast("long").as("sum_cents"),
          col("min_v").as("min_cents"), col("max_v").as("max_cents"))
        .orderBy(col("event_type"), col("day"))
    }),

    // Kaplan–Meier time-to-next-purchase curve
    // (ops/Analytics.kaplanMeier): inter-purchase day gaps are events,
    // each user's tail gap to the corpus max timestamp is right-
    // CENSORED — it still holds the user at risk without pretending a
    // purchase happened; log-space integer product, exp'd once
    "q153_survival" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val maxTs = ev.agg(max(col("ts")).as("mx"))
      val durations = ev
        .withColumn("next_ts", lead(col("ts"), 1).over(byUser))
        .crossJoin(maxTs)
        .select(
          when(col("next_ts").isNotNull,
            datediff(col("next_ts").cast("date"), col("ts").cast("date")))
            .otherwise(
              datediff(col("mx").cast("date"), col("ts").cast("date")))
            .as("dur"),
          col("next_ts").isNotNull.as("is_event"))
      graft.ops.Analytics.kaplanMeier(durations, col("dur"), col("is_event"))
        .withColumnRenamed("t", "t_days")
        .orderBy(col("t_days"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q10_event_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q27_pseudo_json" ->
      """SELECT event_id, CAST(props->>'k' AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    // NB: the oracle CAST(ts AS TIMESTAMP) pins DuckDB to micros regardless of
    // the writer's physical unit (the driver has shipped both NANOS and MICROS
    // events.parquet — Tables.events adapts on read), and the windowed sum is
    // cast back to BIGINT (DuckDB sum() yields HUGEINT) — representation pins,
    // not semantics.
    "q33_sessionize" ->
      """SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end
        |FROM (
        |  SELECT user_id, ts, event_id,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM (
        |    SELECT user_id, ts, event_id,
        |      CASE WHEN prev_ts IS NULL
        |             OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1
        |           ELSE 0 END AS new_session
        |    FROM (
        |      SELECT user_id, ts, event_id,
        |        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |      FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events))))
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "q68_interval_join" ->
      """WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        |periods AS (
        |  SELECT DISTINCT date_trunc('day', ts) - INTERVAL 6 HOUR AS p_start,
        |                  date_trunc('day', ts) + INTERVAL 30 HOUR AS p_end
        |  FROM ev)
        |SELECT p_start, p_end, count(*) AS n_events,
        |  round(sum(value), 2) AS sum_value
        |FROM ev e JOIN periods p ON e.ts >= p.p_start AND e.ts < p.p_end
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "q80_overlap_join" ->
      """WITH days AS (
        |  SELECT DISTINCT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day
        |  FROM events),
        |a AS (SELECT day AS a_start, day + INTERVAL 30 HOUR AS a_end FROM days),
        |b AS (SELECT day + INTERVAL 12 HOUR AS b_start,
        |             day + INTERVAL 36 HOUR AS b_end FROM days)
        |SELECT a_start, a_end, b_start, b_end FROM a, b
        |WHERE a_start < b_end AND b_start < a_end
        |ORDER BY a_start, b_start""".stripMargin,
    "q70_scd2" ->
      """WITH log AS (
        |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |runs AS (
        |  SELECT user_id, event_type, ts, event_id FROM (
        |    SELECT user_id, event_type, ts, event_id,
        |      lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |    FROM log)
        |  WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, event_type, ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
        |FROM runs ORDER BY user_id, valid_from, event_type""".stripMargin,
    // the greedy fold's reach time for stage k IS min(ts of stage-k
    // events strictly after reach k-1) — the iterative min-join CTEs
    // below are the same recurrence
    "q113_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |t1 AS (SELECT user_id, min(ts) AS r FROM ev
        |       WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (SELECT e.user_id, min(e.ts) AS r FROM ev e
        |       JOIN t1 ON e.user_id = t1.user_id
        |       WHERE e.event_type = 'click' AND e.ts > t1.r GROUP BY 1),
        |t3 AS (SELECT e.user_id, min(e.ts) AS r FROM ev e
        |       JOIN t2 ON e.user_id = t2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > t2.r GROUP BY 1)
        |SELECT * FROM (VALUES
        |  (1, 'view', (SELECT count(*) FROM t1)),
        |  (2, 'click', (SELECT count(*) FROM t2)),
        |  (3, 'purchase', (SELECT count(*) FROM t3)))
        |  AS v(stage_idx, stage, n_users)
        |ORDER BY stage_idx""".stripMargin,
    "q114_retention" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |first AS (
        |  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        |  FROM ev GROUP BY 1),
        |weekly AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
        |  FROM ev)
        |SELECT cohort_week,
        |  CAST(date_diff('day', cohort_week, week) / 7 AS INT) AS week_offset,
        |  count(*) AS n_users
        |FROM weekly JOIN first USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the q33 gap-session derivation adjusted to session_window's
    // HALF-OPEN window (a diff of exactly the gap starts a NEW session,
    // hence >= not >), with its closed form: start = min ts, end =
    // max ts + gap
    "q137_session_window" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        |  FROM (
        |    SELECT user_id, event_id, ts,
        |      CASE WHEN prev_ts IS NULL
        |             OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000 THEN 1
        |           ELSE 0 END AS new_session
        |    FROM (
        |      SELECT user_id, event_id, ts,
        |        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |          AS prev_ts
        |      FROM ev)))
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    // the oracle is the UNSALTED join — identical output is the whole
    // point of salting
    "q134_salted_join" ->
      """WITH dim AS (
        |  SELECT user_id, count(*) AS user_events FROM events GROUP BY 1)
        |SELECT e.user_id, e.event_id, d.user_events
        |FROM events e JOIN dim d ON e.user_id = d.user_id
        |ORDER BY e.user_id, e.event_id""".stripMargin,
    "q135_rolling_active" ->
      """WITH daily AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
        |  FROM events),
        |expanded AS (
        |  SELECT DISTINCT user_id,
        |    day + CAST(i AS INT) AS window_day
        |  FROM daily, unnest(generate_series(0, 6)) AS t(i))
        |SELECT window_day, count(*) AS wau
        |FROM expanded GROUP BY 1 ORDER BY 1""".stripMargin,
    // the q57 md5-split mirror + the z formula in the Spark expression's
    // exact float op order
    "q132_ab_test" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
        |         THEN 1 ELSE 0 END AS converted,
        |    CASE WHEN substr(md5('ab:' || user_id), 1, 2) < '80'
        |         THEN 'a' ELSE 'b' END AS arm
        |  FROM events GROUP BY user_id),
        |w AS (SELECT
        |    CAST(sum(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN arm = 'a' THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
        |    CAST(sum(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN arm = 'b' THEN converted ELSE 0 END) AS BIGINT) AS conv_b
        |  FROM pu),
        |sel AS (SELECT n_a, conv_a, n_b, conv_b,
        |    CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa,
        |    CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb,
        |    CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS pp
        |  FROM w),
        |fin AS (SELECT *,
        |    sqrt(pp * (1.0 - pp)
        |      * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))) AS se
        |  FROM sel)
        |SELECT n_a, conv_a, n_b, conv_b,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND se > 0
        |    THEN floor((pa - pb) / se * 1000000.0 + 0.5) / 1000000.0
        |    ELSE NULL END AS z,
        |  CAST(CASE WHEN n_a > 0 AND n_b > 0 AND se > 0
        |    THEN CASE WHEN abs((pa - pb) / se) > 1.959964 THEN 1 ELSE 0 END
        |    ELSE NULL END AS INT) AS significant
        |FROM fin""".stripMargin,
    // HUGEINT sums are DuckDB's exact twin of the decimal(38,0) sums;
    // both cast to DOUBLE only inside the fixed-order closed form
    "q131_trend" ->
      """WITH pts AS (
        |  SELECT event_type,
        |    (epoch_us(CAST(ts AS TIMESTAMP)) - 1704067200000000) // 1000000 AS x,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
        |  FROM events),
        |m AS (
        |  SELECT event_type, count(*) AS n,
        |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
        |  FROM pts GROUP BY 1)
        |SELECT event_type, n,
        |  CASE WHEN n >= 2 AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0.0
        |    THEN floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |        * 1000000.0 + 0.5) / 1000000.0
        |  ELSE NULL END AS slope,
        |  CASE WHEN n >= 2 AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0.0
        |    THEN floor((CAST(sy AS DOUBLE)
        |          - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |          / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |          * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
        |        * 1000000.0 + 0.5) / 1000000.0
        |  ELSE NULL END AS intercept
        |FROM m ORDER BY event_type""".stripMargin,
    // capped-then-counted discipline mirrored exactly: frequencies off
    // the CAPPED per-user sets, pairs from the same sets
    "q129_item_cf" ->
      """WITH capped AS (
        |  SELECT user_id,
        |    (list(DISTINCT CAST(props->>'k' AS BIGINT) ORDER BY CAST(props->>'k' AS BIGINT)))[1:64]
        |      AS items
        |  FROM events WHERE props->>'k' IS NOT NULL GROUP BY 1),
        |flat AS (SELECT user_id, unnest(items) AS i FROM capped),
        |cnt AS (SELECT i, count(*) AS n FROM flat GROUP BY 1),
        |pairs AS (
        |  SELECT a.i AS item_a, b.i AS item_b, count(*) AS co
        |  FROM flat a JOIN flat b
        |    ON a.user_id = b.user_id AND a.i < b.i
        |  GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT item_a, item_b, co, ca.n AS n_a, cb.n AS n_b,
        |  floor(CAST(co AS DOUBLE)
        |      / sqrt(CAST(ca.n * cb.n AS DOUBLE)) * 1000000.0 + 0.5)
        |    / 1000000.0 AS sim
        |FROM pairs JOIN cnt ca ON pairs.item_a = ca.i
        |  JOIN cnt cb ON pairs.item_b = cb.i
        |ORDER BY sim DESC, item_a, item_b LIMIT 100""".stripMargin,
    // same session derivation as q33; ORDER BY (n DESC, path) total
    // order makes the LIMIT exact
    "q124_session_paths" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, event_type, ts,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        |  FROM (
        |    SELECT user_id, event_id, event_type, ts,
        |      CASE WHEN prev_ts IS NULL
        |             OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1
        |           ELSE 0 END AS new_session
        |    FROM (
        |      SELECT user_id, event_id, event_type, ts,
        |        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |          AS prev_ts
        |      FROM ev))),
        |paths AS (
        |  SELECT user_id, sid,
        |    array_to_string((list(event_type ORDER BY ts, event_id))[1:5], '>')
        |      AS path
        |  FROM s GROUP BY 1, 2)
        |SELECT path, count(*) AS n FROM paths
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin,
    // same reach-time recurrence as q113; duration = purchase reach −
    // first-view reach in exact epoch micros
    "q123_funnel_latency" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |t1 AS (SELECT user_id, min(ts) AS r FROM ev
        |       WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (SELECT e.user_id, min(e.ts) AS r FROM ev e
        |       JOIN t1 ON e.user_id = t1.user_id
        |       WHERE e.event_type = 'click' AND e.ts > t1.r GROUP BY 1),
        |t3 AS (SELECT e.user_id, min(e.ts) AS r FROM ev e
        |       JOIN t2 ON e.user_id = t2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > t2.r GROUP BY 1),
        |d AS (SELECT epoch_us(t3.r) - epoch_us(t1.r) AS dur
        |      FROM t3 JOIN t1 ON t3.user_id = t1.user_id)
        |SELECT * FROM (VALUES
        |  (1, 'le_1m', (SELECT count(*) FROM d WHERE dur <= 60000000)),
        |  (2, 'le_1h', (SELECT count(*) FROM d
        |     WHERE dur > 60000000 AND dur <= 3600000000)),
        |  (3, 'le_1d', (SELECT count(*) FROM d
        |     WHERE dur > 3600000000 AND dur <= 86400000000)),
        |  (4, 'gt_1d', (SELECT count(*) FROM d WHERE dur > 86400000000)))
        |  AS v(bucket_idx, bucket, n_users)
        |ORDER BY bucket_idx""".stripMargin,
    "q139_funnel_by_arm" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
        |    CASE WHEN substr(md5('ab:' || user_id), 1, 2) < '80'
        |         THEN 'a' ELSE 'b' END AS arm
        |  FROM events),
        |t1 AS (SELECT arm, user_id, min(ts) AS r FROM ev
        |       WHERE event_type = 'view' GROUP BY 1, 2),
        |t2 AS (SELECT e.arm, e.user_id, min(e.ts) AS r FROM ev e
        |       JOIN t1 ON e.user_id = t1.user_id AND e.arm = t1.arm
        |       WHERE e.event_type = 'click' AND e.ts > t1.r GROUP BY 1, 2),
        |t3 AS (SELECT e.arm, e.user_id, min(e.ts) AS r FROM ev e
        |       JOIN t2 ON e.user_id = t2.user_id AND e.arm = t2.arm
        |       WHERE e.event_type = 'purchase' AND e.ts > t2.r GROUP BY 1, 2),
        |arms AS (SELECT DISTINCT arm FROM ev)
        |SELECT arm, stage_idx, stage, coalesce(n, 0) AS n_users FROM (
        |  SELECT a.arm, s.stage_idx, s.stage, c.n
        |  FROM arms a
        |  CROSS JOIN (VALUES (1, 'view'), (2, 'click'), (3, 'purchase'))
        |    AS s(stage_idx, stage)
        |  LEFT JOIN (
        |    SELECT arm, 1 AS stage_idx, count(*) AS n FROM t1 GROUP BY 1
        |    UNION ALL
        |    SELECT arm, 2, count(*) FROM t2 GROUP BY 1
        |    UNION ALL
        |    SELECT arm, 3, count(*) FROM t3 GROUP BY 1) c
        |    ON c.arm = a.arm AND c.stage_idx = s.stage_idx)
        |ORDER BY arm, stage_idx""".stripMargin,
    "q138_transition_dwell" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |pairs AS (
        |  SELECT event_type AS cur,
        |    lead(event_type) OVER w AS next,
        |    (epoch_us(lead(ts) OVER w) - epoch_us(ts)) // 1000000 AS dwell_s
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT cur, next, count(*) AS n,
        |  CAST(sum(dwell_s) AS BIGINT) AS total_dwell_s,
        |  floor(CAST(sum(dwell_s) AS DOUBLE) / count(*) * 1000000.0 + 0.5)
        |    / 1000000.0 AS mean_dwell_s
        |FROM pairs WHERE next IS NOT NULL
        |GROUP BY 1, 2 ORDER BY cur, next""".stripMargin,
    "q120_event_transitions" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |pairs AS (
        |  SELECT event_type AS cur,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next
        |  FROM ev),
        |cnt AS (SELECT cur, next, count(*) AS n FROM pairs
        |        WHERE next IS NOT NULL GROUP BY 1, 2),
        |marg AS (SELECT cur, CAST(sum(n) AS BIGINT) AS n_cur FROM cnt GROUP BY 1)
        |SELECT cur, next, n,
        |  floor(CAST(n AS DOUBLE) / CAST(n_cur AS DOUBLE) * 1000000.0 + 0.5)
        |    / 1000000.0 AS p
        |FROM cnt JOIN marg USING (cur)
        |ORDER BY cur, next""".stripMargin,
    // the oracle runs NATIVE window ntile under the same (metric,
    // user_id) total orders the distributed closed form uses — the hash
    // compare is the equivalence proof
    "q121_rfm" ->
      """WITH snap AS (
        |  SELECT max(CAST(ts AS TIMESTAMP)) AS s FROM events),
        |p AS (
        |  SELECT user_id, max(CAST(ts AS TIMESTAMP)) AS last_ts,
        |    count(*) AS f,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS m_cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |u AS (
        |  SELECT user_id,
        |    CAST(date_diff('day', CAST(last_ts AS DATE), CAST(s AS DATE)) AS INT)
        |      AS r_days,
        |    f, m_cents
        |  FROM p CROSS JOIN snap)
        |SELECT user_id, r_days, f, m_cents,
        |  CAST(ntile(5) OVER (ORDER BY r_days DESC, user_id) AS INT) AS r_q,
        |  CAST(ntile(5) OVER (ORDER BY f, user_id) AS INT) AS f_q,
        |  CAST(ntile(5) OVER (ORDER BY m_cents, user_id) AS INT) AS m_q
        |FROM u ORDER BY user_id""".stripMargin,
    // the IGNORE NULLS running-last window mirrors the Spark plan
    // one-to-one, including the (ts, event_id) tie order
    "q119_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |w AS (
        |  SELECT event_type, ts,
        |    last_value(CASE WHEN event_type IN ('view', 'click')
        |        THEN struct_pack(ts := ts, typ := event_type) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
        |  FROM ev)
        |SELECT CASE WHEN lt IS NULL
        |         OR epoch_us(ts) - epoch_us(lt.ts) > 604800000000
        |       THEN 'none' ELSE lt.typ END AS touch_type,
        |  count(*) AS n_conversions
        |FROM w WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // exact integer window sums (Σn, Σn², count) → identical IEEE
    // doubles in both engines; DuckDB sum() yields HUGEINT, pinned back
    // to BIGINT before the double math
    "q90_rate_spikes" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, hour, n,
        |    count(n) OVER tw AS t_cnt,
        |    CAST(sum(n) OVER tw AS BIGINT) AS t_sum,
        |    CAST(sum(n * n) OVER tw AS BIGINT) AS t_sum2
        |  FROM hourly
        |  WINDOW tw AS (PARTITION BY event_type ORDER BY hour
        |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, hour, n,
        |  CASE WHEN t_cnt < 12 THEN 'warmup'
        |       WHEN n > CAST(t_sum AS DOUBLE) / t_cnt
        |         + 3.0 * sqrt(greatest(
        |             (CAST(t_sum2 AS DOUBLE)
        |               - CAST(t_sum AS DOUBLE) * t_sum / t_cnt)
        |               / (t_cnt - 1), CAST(0.0 AS DOUBLE)))
        |         THEN 'spike'
        |       ELSE 'ok' END AS status
        |FROM w ORDER BY event_type, hour""".stripMargin,

    // Mann–Whitney midrank closed form: 2·midrank(v) = 2·cumBefore(v)
    // + cnt(v) + 1 keeps every rank an integer; AUC is one integer
    // ratio micro-rounded once — hugeint on the DuckDB side mirrors
    // the Spark side's DECIMAL(38,0) rank sums
    "q143_auc" ->
      """WITH c AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |  FROM events),
        |h AS (SELECT v, count(*) AS c, sum(pos) AS cpos FROM c GROUP BY 1),
        |cum AS (SELECT v, c, cpos,
        |    coalesce(sum(c) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |  FROM h),
        |a AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |    CAST(sum(cpos) AS BIGINT) AS n_pos,
        |    sum(cpos * (2 * cb + c + 1)) AS sum2r
        |  FROM cum),
        |m AS (SELECT n, n_pos,
        |    CAST(((sum2r - n_pos * (n_pos + 1)) * 1000000
        |          + n_pos * (n - n_pos))
        |         // (n_pos * (n - n_pos) * 2) AS BIGINT) AS auc_micro
        |  FROM a)
        |SELECT n, n_pos, auc_micro,
        |  auc_micro * 2 - 1000000 AS gini_micro FROM m""".stripMargin,

    "q144_mad_outliers" ->
      """WITH c AS (SELECT event_type AS g,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        |  FROM events),
        |h AS (SELECT g, v, count(*) AS c FROM c GROUP BY 1, 2),
        |cm AS (SELECT g, v,
        |    sum(c) OVER (PARTITION BY g ORDER BY v) AS cum,
        |    sum(c) OVER (PARTITION BY g) AS n
        |  FROM h),
        |med AS (SELECT g,
        |    min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN v END) AS med
        |  FROM cm GROUP BY g),
        |d AS (SELECT c.g AS g, abs(c.v - m.med) AS dv, m.med AS med
        |  FROM c JOIN med m ON c.g = m.g),
        |dh AS (SELECT g, dv, count(*) AS c FROM d GROUP BY 1, 2),
        |dcm AS (SELECT g, dv,
        |    sum(c) OVER (PARTITION BY g ORDER BY dv) AS cum,
        |    sum(c) OVER (PARTITION BY g) AS n
        |  FROM dh),
        |mad AS (SELECT g,
        |    min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN dv END) AS mad
        |  FROM dcm GROUP BY g)
        |SELECT d.g AS event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(max(d.med) AS BIGINT) AS med,
        |  CAST(max(ma.mad) AS BIGINT) AS mad,
        |  CAST(sum(CASE WHEN d.dv > 3 * ma.mad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers
        |FROM d JOIN mad ma ON d.g = ma.g
        |GROUP BY d.g ORDER BY event_type""".stripMargin,

    // native window ntile over (score DESC, event_id) = the Spark
    // side's ntileExact(-score, event_id); all operands non-negative,
    // so DuckDB's flooring // equals Spark's truncating DIV
    "q148_decile_lift" ->
      """WITH c AS (SELECT event_id,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |  FROM events),
        |r AS (SELECT v, pos,
        |    CAST(ntile(10) OVER (ORDER BY v DESC, event_id) AS INT) AS decile
        |  FROM c),
        |b AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_b,
        |    CAST(sum(pos) AS BIGINT) AS npos_b
        |  FROM r GROUP BY 1),
        |t AS (SELECT CAST(sum(n_b) AS BIGINT) AS n,
        |    CAST(sum(npos_b) AS BIGINT) AS npos FROM b),
        |w AS (SELECT decile, n_b, npos_b, n, npos,
        |    CAST(sum(npos_b) OVER (ORDER BY decile) AS BIGINT) AS cum_pos
        |  FROM b CROSS JOIN t)
        |SELECT decile, n_b, npos_b,
        |  npos_b * 1000000 // n_b AS rate_micro,
        |  npos_b * n * 1000000 // (n_b * npos) AS lift_micro,
        |  cum_pos * 1000000 // npos AS cum_capture_micro
        |FROM w ORDER BY decile""".stripMargin,

    // D = max |cum1·n2 − cum2·n1| over the shared histogram — integer
    // sup-distance, one micro division; the critical value is the one
    // float expression, identical IEEE ops both sides
    "q150_ks_test" ->
      """WITH c AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |  FROM events),
        |h AS (SELECT v, CAST(sum(pos) AS BIGINT) AS c1,
        |    CAST(sum(1 - pos) AS BIGINT) AS c2
        |  FROM c GROUP BY 1),
        |t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |    CAST(sum(c2) AS BIGINT) AS n2 FROM h),
        |cum AS (SELECT
        |    CAST(sum(c1) OVER (ORDER BY v) AS BIGINT) AS cum1,
        |    CAST(sum(c2) OVER (ORDER BY v) AS BIGINT) AS cum2
        |  FROM h),
        |m AS (SELECT n1, n2,
        |    max(abs(cum1 * n2 - cum2 * n1)) AS dnum
        |  FROM cum CROSS JOIN t GROUP BY n1, n2)
        |SELECT n1, n2,
        |  CAST(dnum * 1000000 // (n1 * n2) AS BIGINT) AS d_micro,
        |  CAST(floor(1.358 * sqrt(CAST(n1 + n2 AS DOUBLE)
        |    / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))) * 1e6) AS BIGINT)
        |    AS crit_micro,
        |  CAST(dnum * 1000000 // (n1 * n2) AS BIGINT)
        |    > CAST(floor(1.358 * sqrt(CAST(n1 + n2 AS DOUBLE)
        |      / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))) * 1e6) AS BIGINT)
        |    AS rejected
        |FROM m""".stripMargin,

    // cell term (o·n − rt·ct)²·10⁹ // (n·rt·ct) — the exact-rational
    // form of (o−e)²/e; hugeint mirrors the Spark DECIMAL(38,0)
    "q151_chi2" ->
      """WITH ev AS (SELECT event_type AS r,
        |    hour(CAST(ts AS TIMESTAMP)) AS k FROM events),
        |o AS (SELECT r, k, CAST(count(*) AS BIGINT) AS o
        |  FROM ev GROUP BY 1, 2),
        |rt AS (SELECT r, CAST(sum(o) AS BIGINT) AS rt FROM o GROUP BY 1),
        |ct AS (SELECT k, CAST(sum(o) AS BIGINT) AS ct FROM o GROUP BY 1),
        |n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
        |grid AS (SELECT rt.r, ct.k, rt.rt, ct.ct,
        |    coalesce(o.o, 0) AS o
        |  FROM rt CROSS JOIN ct LEFT JOIN o USING (r, k)),
        |j AS (SELECT g.o, g.rt, g.ct, n.n,
        |    CAST(((CAST(g.o AS HUGEINT) * n.n - CAST(g.rt AS HUGEINT) * g.ct)
        |          * (CAST(g.o AS HUGEINT) * n.n - CAST(g.rt AS HUGEINT) * g.ct))
        |         * 1000000000
        |         // (CAST(n.n AS HUGEINT) * g.rt * g.ct) AS BIGINT)
        |      AS term_nano
        |  FROM grid g CROSS JOIN n),
        |d AS (SELECT count(DISTINCT r) AS nr, count(DISTINCT k) AS nk FROM o)
        |SELECT max(j.n) AS n, CAST(count(*) AS BIGINT) AS n_cells,
        |  CAST(max((d.nr - 1) * (d.nk - 1)) AS BIGINT) AS dof,
        |  CAST(sum(j.term_nano) AS BIGINT) AS chi2_nano
        |FROM j CROSS JOIN d""".stripMargin,

    // run-collapse + as-of spelled with windows: versions are status
    // runs, the valid version is the latest vts ≤ purchase ts
    "q168_pit_enrich" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |    CAST(ts AS TIMESTAMP) AS ts FROM events),
        |log0 AS (SELECT user_id, ts, min(event_id) AS event_id
        |  FROM ev WHERE event_type IN ('signup', 'error') GROUP BY 1, 2),
        |lg AS (SELECT l.user_id, l.ts, l.event_id, e.event_type AS status
        |  FROM log0 l JOIN ev e ON e.event_id = l.event_id),
        |runs AS (SELECT user_id, ts, status,
        |    lag(status) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev
        |  FROM lg),
        |vers AS (SELECT user_id, ts AS vts, status FROM runs
        |  WHERE prev IS NULL OR prev <> status),
        |facts AS (SELECT user_id, event_id, ts FROM ev
        |  WHERE event_type = 'purchase'),
        |j AS (SELECT f.event_id, f.user_id, v.status,
        |    row_number() OVER (PARTITION BY f.event_id
        |      ORDER BY v.vts DESC) AS rnk
        |  FROM facts f LEFT JOIN vers v
        |    ON f.user_id = v.user_id AND v.vts <= f.ts)
        |SELECT event_id, user_id, status FROM j WHERE rnk = 1
        |ORDER BY event_id""".stripMargin,

    // per-conversion Hamilton credit split: base 1e6//n to every
    // in-window touch, remainder to the earliest (tts, tid) — exact
    // integer totals both sides
    "q169_linear_attribution" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |    CAST(ts AS TIMESTAMP) AS ts FROM events),
        |conv AS (SELECT user_id AS u, ts AS cts, event_id AS cid
        |  FROM ev WHERE event_type = 'purchase'),
        |touch AS (SELECT user_id AS u, ts AS tts, event_id AS tid,
        |    event_type AS touch_type
        |  FROM ev WHERE event_type IN ('view', 'click')),
        |paired AS (SELECT c.cid, t.touch_type, t.tts, t.tid
        |  FROM conv c JOIN touch t ON c.u = t.u
        |  WHERE t.tts < c.cts
        |    AND t.tts >= c.cts - INTERVAL 604800 SECONDS),
        |ranked AS (SELECT cid, touch_type,
        |    count(*) OVER (PARTITION BY cid) AS n,
        |    row_number() OVER (PARTITION BY cid ORDER BY tts, tid) AS rk
        |  FROM paired),
        |credited AS (SELECT touch_type,
        |    CAST(count(DISTINCT cid) AS BIGINT) AS n_conversions,
        |    CAST(sum(1000000 // n
        |      + CASE WHEN rk <= 1000000 % n THEN 1 ELSE 0 END) AS BIGINT)
        |      AS credit_micro
        |  FROM ranked GROUP BY 1),
        |none AS (SELECT 'none' AS touch_type,
        |    CAST(count(*) AS BIGINT) AS n_conversions,
        |    CAST(count(*) * 1000000 AS BIGINT) AS credit_micro
        |  FROM conv WHERE cid NOT IN (SELECT cid FROM paired))
        |SELECT touch_type, n_conversions, credit_micro FROM credited
        |UNION ALL
        |SELECT touch_type, n_conversions, credit_micro FROM none
        |  WHERE n_conversions > 0
        |ORDER BY touch_type""".stripMargin,

    // θ and the adjustments mirror the Spark pipeline op-for-op:
    // hugeint moments ≙ DECIMAL(38,0), one micro pin for θ, integer
    // per-user adjustments, identical-double final divisions
    "q165_cuped" ->
      """WITH cut AS (SELECT CAST(min(CAST(ts AS TIMESTAMP)) AS DATE) + 15
        |    AS c FROM events),
        |pu AS (SELECT user_id,
        |    CAST(sum(CASE WHEN CAST(CAST(ts AS TIMESTAMP) AS DATE) < c
        |        THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN CAST(CAST(ts AS TIMESTAMP) AS DATE) >= c
        |        THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events CROSS JOIN cut
        |  WHERE event_type = 'purchase' GROUP BY user_id),
        |a AS (SELECT user_id, x, y,
        |    CASE WHEN substr(md5('ab:' || user_id), 1, 2) < '80'
        |      THEN 'a' ELSE 'b' END AS arm
        |  FROM pu),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS bign,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx
        |  FROM a),
        |th AS (SELECT bign, sx,
        |    CASE WHEN bign * sxx - sx * sx = 0 THEN CAST(0 AS BIGINT)
        |         ELSE CAST(floor(CAST(bign * sxy - sx * sy AS DOUBLE)
        |                / CAST(bign * sxx - sx * sx AS DOUBLE)
        |                * 1000000 + 0.5) AS BIGINT)
        |    END AS theta_micro
        |  FROM m),
        |adj AS (SELECT a.arm, a.y, th.theta_micro, th.bign,
        |    CAST(a.y AS HUGEINT) * 1000000 * th.bign
        |      - CAST(th.theta_micro AS HUGEINT)
        |        * (CAST(a.x AS HUGEINT) * th.bign - th.sx) AS adj_scaled
        |  FROM a CROSS JOIN th)
        |SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
        |  max(theta_micro) AS theta_micro,
        |  CAST(floor(CAST(sum(y) AS DOUBLE) * 1e6
        |    / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) AS raw_mean_micro,
        |  CAST(floor(CAST(sum(adj_scaled) AS DOUBLE)
        |    / (CAST(count(*) AS DOUBLE) * CAST(max(bign) AS DOUBLE)) + 0.5)
        |    AS BIGINT) AS cuped_mean_micro
        |FROM adj GROUP BY arm ORDER BY arm""".stripMargin,

    // min-k over the same md5-derived 60-bit hashes; the estimator is
    // one HUGEINT division, so sketch AND estimate are hash-compared
    // same histogram + one cumulative window; the entropy expression
    // mirrors the Scala operand order term for term
    "q206_best_split" ->
      """WITH pts AS (SELECT
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |hist AS (SELECT v, CAST(count(*) AS BIGINT) AS nv,
        |    CAST(sum(y) AS BIGINT) AS pv FROM pts GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS p FROM pts),
        |c AS (SELECT v,
        |    CAST(sum(nv) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS nl,
        |    CAST(sum(pv) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS pl
        |  FROM hist),
        |s AS (SELECT v, nl, pl, n - nl AS nr, p - pl AS pr, n, p
        |  FROM c CROSS JOIN tot WHERE n - nl > 0),
        |e AS (SELECT v, nl, pl, nr, pr,
        |    CAST(floor((
        |      (CASE WHEN pl = 0 OR pl = nl THEN 0.0
        |        ELSE -(CAST(pl AS DOUBLE)
        |            * ln(CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE))
        |          + CAST(nl - pl AS DOUBLE)
        |            * ln(CAST(nl - pl AS DOUBLE) / CAST(nl AS DOUBLE)))
        |        END)
        |      + (CASE WHEN pr = 0 OR pr = nr THEN 0.0
        |        ELSE -(CAST(pr AS DOUBLE)
        |            * ln(CAST(pr AS DOUBLE) / CAST(nr AS DOUBLE))
        |          + CAST(nr - pr AS DOUBLE)
        |            * ln(CAST(nr - pr AS DOUBLE) / CAST(nr AS DOUBLE)))
        |        END))
        |      / CAST(n AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS weighted_nano,
        |    CAST(floor((CASE WHEN p = 0 OR p = n THEN 0.0
        |        ELSE -(CAST(p AS DOUBLE)
        |            * ln(CAST(p AS DOUBLE) / CAST(n AS DOUBLE))
        |          + CAST(n - p AS DOUBLE)
        |            * ln(CAST(n - p AS DOUBLE) / CAST(n AS DOUBLE)))
        |        END)
        |      / CAST(n AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS h0_nano
        |  FROM s)
        |SELECT v AS split_cents, nl, pl, nr, pr, weighted_nano,
        |  h0_nano - weighted_nano AS gain_nano
        |FROM e ORDER BY weighted_nano, split_cents LIMIT 1""".stripMargin,

    "q207_bounce_rate" ->
      """WITH s AS (SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
        |    CASE WHEN lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w IS NULL
        |      OR epoch_us(CAST(ts AS TIMESTAMP))
        |        - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w
        |        > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |    ORDER BY CAST(ts AS TIMESTAMP), event_id)),
        |sid AS (SELECT user_id, event_id, event_type, tus,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM s),
        |sess AS (SELECT user_id, sid, CAST(count(*) AS BIGINT) AS len,
        |    min(struct_pack(tus := tus, event_id := event_id,
        |      event_type := event_type)) AS first
        |  FROM sid GROUP BY 1, 2)
        |SELECT first.event_type AS entry_type,
        |  CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(sum(CASE WHEN len = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_bounces,
        |  CAST(sum(CASE WHEN len = 1 THEN 1 ELSE 0 END) * 1000000
        |    // count(*) AS BIGINT) AS bounce_micro,
        |  CAST(sum(len) * 1000 // count(*) AS BIGINT) AS mean_len_milli
        |FROM sess GROUP BY 1 ORDER BY entry_type""".stripMargin,

    "q198_new_vs_returning" ->
      """WITH ev AS (SELECT DISTINCT user_id,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
        |f AS (SELECT user_id, min(day) AS first_day FROM ev GROUP BY 1)
        |SELECT day,
        |  CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
        |    AS new_users,
        |  CAST(sum(CASE WHEN day <> first_day THEN 1 ELSE 0 END) AS BIGINT)
        |    AS returning_users
        |FROM ev JOIN f USING (user_id)
        |GROUP BY 1 ORDER BY day""".stripMargin,

    "q195_power_analysis" ->
      """WITH u AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS converted
        |  FROM events GROUP BY 1),
        |a AS (SELECT CASE WHEN substr(md5('ab:' || user_id), 1, 1) < '8'
        |      THEN 'A' ELSE 'B' END AS arm, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(converted) AS BIGINT) AS conv
        |  FROM u GROUP BY 1),
        |w AS (SELECT
        |    CAST(sum(CASE WHEN arm = 'A' THEN n END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN arm = 'A' THEN conv END) AS BIGINT) AS c1,
        |    CAST(sum(CASE WHEN arm = 'B' THEN n END) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN arm = 'B' THEN conv END) AS BIGINT) AS c2
        |  FROM a),
        |p AS (SELECT n1, c1, n2, c2,
        |    CAST(c1 AS DOUBLE) / n1 AS p1,
        |    CAST(c2 AS DOUBLE) / n2 AS p2 FROM w)
        |SELECT n1, c1, n2, c2,
        |  CAST(floor(p1 * 1000000 + 0.5) AS BIGINT) AS p1_micro,
        |  CAST(floor(p2 * 1000000 + 0.5) AS BIGINT) AS p2_micro,
        |  CASE WHEN abs(p1 - p2) < 1e-12 THEN NULL
        |    ELSE CAST(ceil(((1.959964 + 0.841621) * (1.959964 + 0.841621)
        |      * (p1 * (1.0 - p1) + p2 * (1.0 - p2)))
        |      / ((p1 - p2) * (p1 - p2))) AS BIGINT) END AS n_required
        |FROM p ORDER BY n1""".stripMargin,

    "q196_winsorize" ->
      """WITH ev AS (SELECT event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |h AS (SELECT event_type, cents, count(*) AS c FROM ev GROUP BY 1, 2),
        |cum AS (SELECT event_type, cents,
        |    sum(c) OVER (PARTITION BY event_type ORDER BY cents
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(c) OVER (PARTITION BY event_type) AS n FROM h),
        |cuts AS (SELECT event_type,
        |    CAST(min(CASE WHEN cum >= (n * 1 + 99) // 100 THEN cents END)
        |      AS BIGINT) AS p1,
        |    CAST(min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN cents END)
        |      AS BIGINT) AS p99
        |  FROM cum GROUP BY 1)
        |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(min(p1) AS BIGINT) AS lo_cents,
        |  CAST(max(p99) AS BIGINT) AS hi_cents,
        |  CAST(sum(e.cents) * 100 // count(*) AS BIGINT) AS raw_mean_milli,
        |  CAST(sum(least(greatest(e.cents, p1), p99)) * 100 // count(*)
        |    AS BIGINT) AS win_mean_milli
        |FROM ev e JOIN cuts USING (event_type)
        |GROUP BY 1 ORDER BY event_type""".stripMargin,

    "q187_gap_fill" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM events
        |  WHERE day(CAST(CAST(ts AS TIMESTAMP) AS DATE)) % 5 <> 0
        |  GROUP BY 1, 2),
        |span AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
        |spine AS (SELECT t.event_type, CAST(u.d AS DATE) AS day
        |  FROM (SELECT DISTINCT event_type FROM daily) t,
        |       span, unnest(generate_series(span.lo, span.hi,
        |         INTERVAL 1 DAY)) AS u(d))
        |SELECT s.event_type, s.day, coalesce(d.n, 0) AS n,
        |  coalesce(last_value(d.cents IGNORE NULLS) OVER (
        |    PARTITION BY s.event_type ORDER BY s.day
        |    ROWS UNBOUNDED PRECEDING), 0) AS cents_ff
        |FROM spine s LEFT JOIN daily d USING (event_type, day)
        |ORDER BY event_type, day""".stripMargin,

    "q188_rolling_corr" ->
      """WITH daily AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1, 2),
        |two AS (SELECT day,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN n ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN n ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM daily GROUP BY 1),
        |w AS (SELECT day, x, y,
        |    CAST(count(*) OVER r AS BIGINT) AS k,
        |    CAST(sum(x) OVER r AS BIGINT) AS sx,
        |    CAST(sum(y) OVER r AS BIGINT) AS sy,
        |    CAST(sum(x * x) OVER r AS BIGINT) AS sxx,
        |    CAST(sum(y * y) OVER r AS BIGINT) AS syy,
        |    CAST(sum(x * y) OVER r AS BIGINT) AS sxy
        |  FROM two
        |  WINDOW r AS (ORDER BY day RANGE BETWEEN INTERVAL 6 DAY
        |    PRECEDING AND CURRENT ROW))
        |SELECT day, x, y,
        |  CASE WHEN k < 7 THEN NULL
        |       WHEN k * sxx - sx * sx = 0 OR k * syy - sy * sy = 0 THEN NULL
        |       ELSE CAST(floor(CAST(k * sxy - sx * sy AS DOUBLE)
        |         / sqrt(CAST(k * sxx - sx * sx AS DOUBLE)
        |              * CAST(k * syy - sy * sy AS DOUBLE))
        |         * 1000 + 0.5) AS BIGINT) END AS corr_milli
        |FROM w ORDER BY day""".stripMargin,

    // DuckDB dayofweek is already Sunday=0; Spark's is Sunday=1, so the
    // Spark side subtracts 1 — pinned by the hash compare
    "q183_seasonality" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |dw AS (SELECT event_type, CAST(dayofweek(day) AS INT) AS dow,
        |    CAST(sum(n) AS BIGINT) AS n_events,
        |    CAST(count(*) AS BIGINT) AS n_days
        |  FROM daily GROUP BY 1, 2),
        |o AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot,
        |    CAST(count(*) AS BIGINT) AS days_tot FROM daily GROUP BY 1)
        |SELECT d.event_type, d.dow, d.n_events, d.n_days,
        |  CAST(n_events * 1000000 // n_days AS BIGINT) AS mean_micro,
        |  CAST(n_events * days_tot * 1000000 // (n_days * tot) AS BIGINT)
        |    AS index_micro
        |FROM dw d JOIN o USING (event_type)
        |ORDER BY event_type, dow""".stripMargin,

    "q184_event_debounce" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events),
        |f AS (SELECT user_id, event_type,
        |    CASE WHEN lag(tus) OVER (PARTITION BY user_id, event_type
        |        ORDER BY tus, event_id) IS NULL
        |      OR tus - lag(tus) OVER (PARTITION BY user_id, event_type
        |        ORDER BY tus, event_id) > 300000000 THEN 1 ELSE 0 END
        |      AS iskeep
        |  FROM e)
        |SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(iskeep) AS BIGINT) AS n_kept
        |FROM f GROUP BY 1, 2 ORDER BY user_id, event_type""".stripMargin,

    // lateness vs the running max at arrival, then the q142 exact
    // percentile_disc construction per type
    "q185_lateness" ->
      """WITH e AS (SELECT event_type, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events),
        |l AS (SELECT event_type,
        |    greatest(0, (coalesce(max(tus) OVER (PARTITION BY event_type
        |      ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND 1 PRECEDING), tus) - tus) // 1000000) AS late_sec
        |  FROM e),
        |h AS (SELECT event_type, late_sec, count(*) AS c
        |  FROM l GROUP BY 1, 2),
        |c AS (SELECT event_type, late_sec,
        |    sum(c) OVER (PARTITION BY event_type ORDER BY late_sec
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(c) OVER (PARTITION BY event_type) AS n
        |  FROM h)
        |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
        |  CAST(min(CASE WHEN cum >= (n * 50 + 99) // 100
        |    THEN late_sec END) AS BIGINT) AS p50_late_sec,
        |  CAST(min(CASE WHEN cum >= (n * 95 + 99) // 100
        |    THEN late_sec END) AS BIGINT) AS p95_late_sec,
        |  CAST(min(CASE WHEN cum >= (n * 99 + 99) // 100
        |    THEN late_sec END) AS BIGINT) AS p99_late_sec
        |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin,

    // the same closed form in SQL: running deviation sum minus its
    // running minimum (floored at 0); every intermediate is CAST back
    // to BIGINT because DuckDB widens window sums to HUGEINT
    "q175_cusum_shift" ->
      """WITH d AS (SELECT event_type,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type,
        |    CAST(sum(n) * 1000000 // count(*) AS BIGINT) AS mean_micro
        |  FROM d GROUP BY 1),
        |c AS (SELECT d.event_type, day, n, mean_micro,
        |    CAST(sum(n * 1000000 - mean_micro) OVER (
        |      PARTITION BY d.event_type ORDER BY day
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM d JOIN m USING (event_type)),
        |s AS (SELECT event_type, day, n, mean_micro,
        |    CAST(cum - least(min(cum) OVER (
        |      PARTITION BY event_type ORDER BY day
        |      ROWS UNBOUNDED PRECEDING), 0) AS BIGINT) AS cusum_micro
        |  FROM c)
        |SELECT event_type, day, n, mean_micro, cusum_micro,
        |  cusum_micro * 100 >= mean_micro * 50 AS flagged
        |FROM s ORDER BY event_type, day""".stripMargin,

    "q217_dup_payments" ->
      """WITH p AS (SELECT user_id, event_id,
        |    CAST(floor(value + 0.5) AS BIGINT) AS dollars,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS tus
        |  FROM events WHERE event_type = 'purchase'),
        |w AS (SELECT user_id, dollars, event_id,
        |    lag(event_id) OVER win AS prev_id,
        |    (tus - lag(tus) OVER win) // 1000000 AS gap_sec
        |  FROM p
        |  WINDOW win AS (PARTITION BY user_id, dollars
        |    ORDER BY tus, event_id))
        |SELECT user_id, dollars, event_id, prev_id,
        |  CAST(gap_sec AS BIGINT) AS gap_sec
        |FROM w WHERE prev_id IS NOT NULL AND gap_sec <= 86400
        |ORDER BY user_id, dollars, event_id""".stripMargin,

    "q214_burstiness" ->
      """WITH d AS (SELECT event_type,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(x) AS BIGINT) AS total,
        |    CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM d GROUP BY 1)
        |SELECT event_type, n_days, total,
        |  CAST(total * 1000 // n_days AS BIGINT) AS mean_milli,
        |  CAST((n_days * sxx - total * total) * 1000000
        |    // (n_days * total) AS BIGINT) AS fano_micro
        |FROM m ORDER BY event_type""".stripMargin,

    "q215_churn" ->
      """WITH ev AS (SELECT user_id, event_type, event_id,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
        |c AS (SELECT max(day) - 14 AS cut FROM ev),
        |u AS (SELECT user_id,
        |    min(struct_pack(day := day, event_id := event_id,
        |      et := event_type)) AS first,
        |    max(day) AS last_day
        |  FROM ev GROUP BY 1)
        |SELECT first.et AS first_type, CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(CASE WHEN last_day <= cut THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_churned,
        |  CAST(sum(CASE WHEN last_day <= cut THEN 1 ELSE 0 END) * 1000000
        |    // count(*) AS BIGINT) AS churn_micro
        |FROM u CROSS JOIN c GROUP BY 1 ORDER BY first_type""".stripMargin,

    // per-day min-k lists merged by a window list-of-lists flatten —
    // the same k-bounded union the Spark side does in-row
    "q210_rolling_kmv" ->
      """WITH dd AS (SELECT DISTINCT user_id,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
        |hv AS (SELECT DISTINCT day,
        |    ('0x' || substr(md5('kmv:' || user_id), 1, 15))::BIGINT AS hv
        |  FROM dd),
        |rk AS (SELECT day, hv,
        |    row_number() OVER (PARTITION BY day ORDER BY hv) AS rn FROM hv),
        |dk AS (SELECT day, list(hv ORDER BY hv) AS ks
        |  FROM rk WHERE rn <= 64 GROUP BY day),
        |mg AS (SELECT day,
        |    flatten(list(ks) OVER (ORDER BY day
        |      RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)) AS fl
        |  FROM dk),
        |ku AS (SELECT day, list_sort(list_distinct(fl))[:64] AS ku FROM mg),
        |est AS (SELECT day, CAST(len(ku) AS INT) AS n_kept,
        |    CAST(CASE WHEN len(ku) < 64 THEN len(ku)
        |      ELSE (63::HUGEINT * 1152921504606846976) // ku[64]
        |      END AS BIGINT) AS est_7d
        |  FROM ku),
        |ex AS (SELECT d.day,
        |    CAST(count(DISTINCT dd.user_id) AS BIGINT) AS exact_7d
        |  FROM (SELECT DISTINCT day FROM dd) d
        |  JOIN dd ON dd.day BETWEEN d.day - 6 AND d.day
        |  GROUP BY 1)
        |SELECT day, exact_7d, n_kept, est_7d
        |FROM est JOIN ex USING (day) ORDER BY day""".stripMargin,

    "q172_kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT event_type,
        |    ('0x' || substr(md5('kmv:' || user_id), 1, 15))::BIGINT AS hv
        |  FROM events),
        |r AS (SELECT event_type, hv,
        |    row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS nh
        |  FROM h),
        |kth AS (SELECT event_type, CAST(max(nh) AS BIGINT) AS n_hashes,
        |    CAST(coalesce(max(CASE WHEN rn = 64 THEN hv END), 0) AS BIGINT)
        |      AS h_k
        |  FROM r GROUP BY event_type),
        |ex AS (SELECT event_type,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
        |  FROM events GROUP BY 1)
        |SELECT e.event_type, e.n_exact, k.n_hashes,
        |  CAST(least(k.n_hashes, 64) AS BIGINT) AS n_kept, k.h_k,
        |  CAST(CASE WHEN k.n_hashes < 64 THEN k.n_hashes
        |       ELSE (63::HUGEINT * 1152921504606846976) // k.h_k
        |       END AS BIGINT) AS est_distinct
        |FROM ex e JOIN kth k USING (event_type)
        |ORDER BY event_type""".stripMargin,

    // the oracle RECOMPUTES from scratch — hash equality proves the
    // merged incremental states reconstruct it exactly
    "q161_incremental_agg" ->
      """SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  CAST(min(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS min_cents,
        |  CAST(max(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS max_cents
        |FROM events GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin,

    // the KM product in log space: one nano-nat floor per event time
    // (the identical double pipeline as the Spark kernel), exact
    // integer prefix sum, exp'd once; a d = n_risk terminal time
    // surfaces surv_micro = 0 via the CASE, not via ln(0)
    "q153_survival" ->
      """WITH p AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'purchase'),
        |mx AS (SELECT max(ts) AS mx FROM p),
        |g AS (SELECT user_id, ts,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS next_ts
        |  FROM p),
        |dur AS (SELECT
        |    CASE WHEN next_ts IS NOT NULL
        |      THEN date_diff('day', CAST(ts AS DATE), CAST(next_ts AS DATE))
        |      ELSE date_diff('day', CAST(ts AS DATE), CAST(mx AS DATE))
        |    END AS t,
        |    next_ts IS NOT NULL AS ev
        |  FROM g CROSS JOIN mx),
        |h AS (SELECT CAST(t AS BIGINT) AS t,
        |    CAST(sum(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS m
        |  FROM dur GROUP BY 1),
        |tot AS (SELECT CAST(sum(m) AS BIGINT) AS n FROM h),
        |r AS (SELECT t, d, m,
        |    n - coalesce(CAST(sum(m) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |      AS n_risk
        |  FROM h CROSS JOIN tot),
        |e AS (SELECT t, n_risk, d,
        |    CASE WHEN d = n_risk THEN NULL
        |         ELSE CAST(floor(ln(CAST(n_risk - d AS DOUBLE)
        |                / CAST(n_risk AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)
        |    END AS term
        |  FROM r WHERE d > 0),
        |s AS (SELECT t, n_risk, d,
        |    CAST(sum(term) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS lnS_nano
        |  FROM e)
        |SELECT t AS t_days, n_risk, d, lnS_nano,
        |  CASE WHEN d = n_risk THEN 0
        |       ELSE CAST(floor(exp(CAST(lnS_nano AS DOUBLE) / 1e9) * 1e6
        |              + 0.5) AS BIGINT)
        |  END AS surv_micro
        |FROM s ORDER BY t_days""".stripMargin
  )
}
