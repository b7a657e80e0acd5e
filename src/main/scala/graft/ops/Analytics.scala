package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Pin.PinSyntax

/** Product-analytics operators over event logs: ordered conversion
  * funnels and cohort retention. The reference's event handling stops at
  * per-table upserts (scripts/events has no analytics layer); these are
  * the standard OLAP companions every event warehouse grows, and both
  * are oracle-expressible so they ride the exact-correctness gate.
  *
  * Scale notes: both operators shuffle the event log exactly once on
  * the user key. The funnel folds each user's stage events with the
  * codegen'd `aggregate` higher-order function over a per-user sorted
  * array — per-user event counts are activity-bounded, the standard
  * assumption behind every sessionizer (q33 makes it too). No window
  * over a global sort, no self-join per stage.
  */
object Analytics {

  /** Ordered conversion funnel: a user reaches stage k when an event of
    * `stages(k-1)` occurs STRICTLY after the time they reached stage
    * k-1 (classic funnel semantics — a same-timestamp later stage does
    * not count, and out-of-order stage events are skipped, not
    * re-ordered). Returns one row per stage:
    * (stage_idx 1-based, stage, n_users reaching it).
    *
    * One shuffle (groupBy user); the fold runs inside whole-stage
    * codegen; stage counts come off a single partial aggregate and a
    * driver-free `stack` unpivot.
    */
  /** The shared per-user fold behind [[funnel]] and [[funnelDurations]]:
    * one row per user with the reached depth, the stage-1 reach time,
    * and the deepest-stage reach time. */
  private def funnelFold(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      s"funnel stages must be non-empty and distinct, got $stages")
    require(stages.forall(_.matches("[A-Za-z0-9_ .-]+")),
      s"funnel stage names must be plain identifiers, got $stages")
    // event_type -> 1-based stage index; non-stage events dropped at the scan
    val idx = stages.zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (st, i)) => when(col(typeCol) === st, lit(i + 1)).otherwise(acc)
    }
    val perUser = events
      .select(col(userCol).as("u"), col(tsCol).as("ts"), idx.as("stage_idx"))
      .filter(col("stage_idx").isNotNull)
      .groupBy(col("u"))
      .agg(sort_array(collect_list(struct(col("ts"), col("stage_idx")))).as("evs"))
    // Fold in time order: advance iff the event is the next needed stage
    // and strictly after the previous reach time.
    val folded = aggregate(
      col("evs"),
      struct(lit(0).as("depth"),
        lit("1800-01-01 00:00:00").cast("timestamp").as("reached"),
        lit("1800-01-01 00:00:00").cast("timestamp").as("first")),
      (acc, e) =>
        when(e.getField("stage_idx") === acc.getField("depth") + 1 &&
          (acc.getField("depth") === 0 ||
            e.getField("ts") > acc.getField("reached")),
          struct((acc.getField("depth") + 1).as("depth"),
            e.getField("ts").as("reached"),
            when(acc.getField("depth") === 0, e.getField("ts"))
              .otherwise(acc.getField("first")).as("first")))
          .otherwise(acc))
    perUser.select(col("u"), folded.as("f"))
      .select(col("u"), col("f.depth").as("depth"),
        col("f.first").as("first_ts"), col("f.reached").as("reached_ts"))
  }

  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    val depths = funnelFold(events, userCol, tsCol, typeCol, stages)
      .select(col("depth"))
    val sums = stages.indices.map(i =>
      sum(when(col("depth") >= i + 1, 1L).otherwise(0L)).as(s"n$i"))
    val one = depths.agg(sums.head, sums.tail: _*)
    val stack = stages.zipWithIndex
      .map { case (s, i) => s"${i + 1}, '$s', n$i" }.mkString(", ")
    one.select(expr(
      s"stack(${stages.size}, $stack) AS (stage_idx, stage, n_users)"))
  }

  /** Time-to-convert histogram for COMPLETED funnels: per user that
    * reached the last stage, the wall time from reaching stage 1 to
    * reaching the last stage, bucketed by ascending integer second
    * thresholds (exact micros compares — no float binning) with a
    * terminal overflow bucket. All buckets are emitted, zeros included
    * (same one-row conditional-sum + stack shape as the funnel
    * itself). */
  def funnelDurations(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String],
      buckets: Seq[(String, Long)], restLabel: String): DataFrame = {
    require(buckets.nonEmpty, "funnelDurations needs at least one bucket")
    require(buckets.map(_._2) == buckets.map(_._2).sorted &&
      buckets.map(_._2).distinct.size == buckets.size,
      s"bucket thresholds must be strictly ascending, got ${buckets.map(_._2)}")
    val labels = buckets.map(_._1) :+ restLabel
    require(labels.distinct.size == labels.size &&
      labels.forall(_.matches("[A-Za-z0-9_ .-]+")),
      s"bucket labels must be unique plain identifiers, got $labels")
    val completed = funnelFold(events, userCol, tsCol, typeCol, stages)
      .filter(col("depth") === stages.size)
      .select((unix_micros(col("reached_ts")) - unix_micros(col("first_ts")))
        .as("dur"))
    val conds = buckets.map(_._2 * 1000000L).zipWithIndex.map {
      case (t, 0) => col("dur") <= t
      case (t, i) => col("dur") > buckets(i - 1)._2 * 1000000L && col("dur") <= t
    } :+ (col("dur") > buckets.last._2 * 1000000L)
    val sums = conds.zipWithIndex.map { case (c, i) =>
      sum(when(c, 1L).otherwise(0L)).as(s"n$i") }
    val one = completed.agg(sums.head, sums.tail: _*)
    val stack = labels.zipWithIndex
      .map { case (l, i) => s"${i + 1}, '$l', n$i" }.mkString(", ")
    one.select(expr(
      s"stack(${labels.size}, $stack) AS (bucket_idx, bucket, n_users)"))
  }

  /** [[eventTransitions]] enriched with dwell time: per (cur → next)
    * transition, the count plus total and mean dwell (seconds spent in
    * `cur` before moving on), mean micro-rounded off the exact integer
    * dwell-sum — where users hesitate, not just where they go. Same
    * plan shape as the probability matrix (one lead window, one
    * dimension-cardinality groupBy). */
  def transitionDwell(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String): DataFrame = {
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("__next", lead(col(typeCol), 1).over(byUser))
      .withColumn("__nextTs", lead(col(tsCol), 1).over(byUser))
      .filter(col("__next").isNotNull)
      .select(col(typeCol).as("cur"), col("__next").as("next"),
        ((unix_micros(col("__nextTs")) - unix_micros(col(tsCol)))
          / lit(1000000L)).cast("long").as("dwell_s"))
      .groupBy(col("cur"), col("next"))
      .agg(count(lit(1)).as("n"),
        sum(col("dwell_s")).as("total_dwell_s"),
        (floor(sum(col("dwell_s")).cast("double") / count(lit(1))
          * lit(1000000.0) + lit(0.5)) / lit(1000000.0)).as("mean_dwell_s"))
  }

  /** Two-proportion A/B conversion test: users are split into arms by
    * the engine's deterministic md5 hash split ([[Corpus.hashSplit]] —
    * assignment is a pure function of the user key, identical in any
    * engine and stable as traffic grows), conversion = "has ≥1 event of
    * `conversionType`", and the pooled two-proportion z statistic
    * decides significance. All counts are exact integers; z is one
    * fixed-order float expression micro-rounded at the end — the whole
    * experiment readout is oracle-exact. A user counts as converted at
    * `minConversions` or more conversion events (1 = the classic "did
    * convert" flag). Returns one row: (n_a, conv_a, n_b, conv_b, z,
    * significant = 1/0 at |z| > 1.96, null when inconclusive — int, not
    * boolean, so a null readout has one cross-engine representation). */
  def abConversionTest(events: DataFrame, userCol: String, typeCol: String,
      conversionType: String, salt: String, armACut: String,
      minConversions: Long = 1L): DataFrame = {
    require(minConversions >= 1, s"minConversions must be >= 1, got $minConversions")
    val perUser = events
      .groupBy(col(userCol).as("u"))
      .agg(when(sum(when(col(typeCol) === conversionType, 1L).otherwise(0L))
        >= minConversions, 1L).otherwise(0L).as("converted"))
      .withColumn("arm", Corpus.hashSplit(col("u"), salt,
        Seq(armACut -> "a"), "b"))
    val wide = perUser.agg(
      sum(when(col("arm") === "a", 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === "a", col("converted")).otherwise(0L)).as("conv_a"),
      sum(when(col("arm") === "b", 1L).otherwise(0L)).as("n_b"),
      sum(when(col("arm") === "b", col("converted")).otherwise(0L)).as("conv_b"))
    val naD = col("n_a").cast("double"); val nbD = col("n_b").cast("double")
    val pa = col("conv_a").cast("double") / naD
    val pb = col("conv_b").cast("double") / nbD
    val pPool = (col("conv_a") + col("conv_b")).cast("double") /
      ((col("n_a") + col("n_b")).cast("double"))
    val se = sqrt(pPool * (lit(1.0) - pPool) * (lit(1.0) / naD + lit(1.0) / nbD))
    val z = (pa - pb) / se
    wide.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      when(col("n_a") > 0 && col("n_b") > 0 && se > 0,
        floor(z * lit(1000000.0) + lit(0.5)) / lit(1000000.0))
        .otherwise(lit(null)).as("z"),
      when(col("n_a") > 0 && col("n_b") > 0 && se > 0,
        when(abs(z) > lit(1.959964), 1).otherwise(0))
        .otherwise(lit(null)).cast("int").as("significant"))
  }

  /** Group-wise simple linear regression (closed-form OLS) from EXACT
    * integer moment sums: slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²),
    * intercept = (Σy − slope·Σx) / n — per-group trend detection (is
    * this metric drifting?) as one partial-aggregated pass. `x` and `y`
    * MUST be integer-valued columns (epoch seconds, cents): the sums
    * accumulate as DECIMAL(38,0), so the fit is exact at any row count
    * and partitioning, and the only float math is the fixed-order final
    * formula — micro-rounded, hence oracle-exact. Degenerate groups
    * (n < 2 or zero x-variance) return null slope/intercept rather
    * than ±Inf. Contract: |x| and |y| must each fit in ~31 bits so the
    * per-row products stay inside long before the decimal sum (epoch
    * SECONDS relative to a recent base and integer cents both do). */
  def linearTrend(df: DataFrame, groupCol: String, x: Column,
      y: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val agged = df
      .select(col(groupCol), x.cast("long").as("__x"), y.cast("long").as("__y"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col("__x").cast(dec)).as("sx"),
        sum(col("__y").cast(dec)).as("sy"),
        sum((col("__x") * col("__y")).cast(dec)).as("sxy"),
        sum((col("__x") * col("__x")).cast(dec)).as("sxx"))
    val nD = col("n").cast("double")
    val det = (nD * col("sxx").cast("double")) -
      (col("sx").cast("double") * col("sx").cast("double"))
    val slope = (nD * col("sxy").cast("double")
      - col("sx").cast("double") * col("sy").cast("double")) / det
    val micro: Column => Column = c =>
      floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    agged.select(col(groupCol), col("n"),
      when(col("n") >= 2 && det =!= 0.0, micro(slope)).otherwise(lit(null))
        .as("slope"),
      when(col("n") >= 2 && det =!= 0.0,
        micro((col("sy").cast("double") - slope * col("sx").cast("double")) / nD))
        .otherwise(lit(null)).as("intercept"))
  }

  /** Item-item co-occurrence similarity (implicit-feedback
    * collaborative filtering, the classic ItemCF kernel): cosine over
    * binary user-item interactions, sim(a,b) = co(a,b) / √(n_a·n_b),
    * with a minimum co-occurrence support and a per-user item cap.
    * The cap is the scale guard: a user with U items contributes U²
    * pairs — power users blow up the pair exchange while adding the
    * least preference signal, so every serious ItemCF caps them. The
    * cap is DETERMINISTIC (items sorted ascending, first `maxItemsPerUser`
    * kept) and item frequencies n_i are counted AFTER capping, so the
    * cosine numerator and denominator describe the same interaction
    * matrix. Similarity micro-rounds off exact integer counts; top-k
    * under the (sim desc, item_a, item_b) total order — oracle-exact
    * end to end. One user-keyed aggregate, one in-row pair
    * comprehension (no user self-join), one pair-keyed count. */
  def itemCooccurrence(interactions: DataFrame, userCol: String,
      itemCol: String, minCo: Long, maxItemsPerUser: Int,
      topK: Int): DataFrame = {
    require(minCo >= 1 && maxItemsPerUser >= 2 && topK >= 1,
      s"itemCooccurrence needs minCo>=1, cap>=2, topK>=1, " +
        s"got $minCo/$maxItemsPerUser/$topK")
    val capped = interactions
      .select(col(userCol).as("u"), col(itemCol).cast("long").as("i"))
      .filter(col("i").isNotNull)
      .groupBy(col("u"))
      .agg(slice(array_sort(collect_set(col("i"))), 1, maxItemsPerUser)
        .as("items"))
    val counts = capped.select(explode(col("items")).as("i"))
      .groupBy(col("i")).agg(count(lit(1)).as("n"))
    val pairs = capped
      .select(explode(flatten(transform(col("items"), (a, ix) =>
        transform(slice(col("items"), ix + lit(2), size(col("items"))),
          b => struct(a.as("item_a"), b.as("item_b")))))).as("p"))
      .groupBy(col("p.item_a").as("item_a"), col("p.item_b").as("item_b"))
      .agg(count(lit(1)).as("co"))
      .filter(col("co") >= minCo)
    pairs
      .join(counts.select(col("i").as("item_a"), col("n").as("n_a")), Seq("item_a"))
      .join(counts.select(col("i").as("item_b"), col("n").as("n_b")), Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("co"), col("n_a"), col("n_b"),
        (floor(col("co").cast("double")
          / sqrt((col("n_a") * col("n_b")).cast("double"))
          * lit(1000000.0) + lit(0.5)) / lit(1000000.0)).as("sim"))
      .orderBy(col("sim").desc, col("item_a"), col("item_b"))
      .limit(topK)
  }

  /** Top session paths (journey mining): sessionize by inactivity gap
    * (the q33 rule), render each session's first `maxLen` event types
    * as a ">"-joined path string, and return the `topK` most frequent
    * paths under the total order (count desc, path asc) — the "what do
    * users actually do" report. One user-keyed window pass for session
    * ids (shared shape with sessionize), one session-keyed aggregate
    * whose per-session buffer is capped by maxLen after the in-group
    * sort, and a bounded TakeOrdered for the top-k. */
  def sessionPaths(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, gapSeconds: Long, maxLen: Int,
      topK: Int): DataFrame = {
    require(gapSeconds > 0 && maxLen >= 1 && topK >= 1,
      s"sessionPaths needs positive gap/maxLen/topK, got $gapSeconds/$maxLen/$topK")
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val sessions = events
      .withColumn("__prev", lag(col(tsCol), 1).over(byUser))
      .withColumn("__new", when(col("__prev").isNull ||
        unix_micros(col(tsCol)) - unix_micros(col("__prev")) >
          gapSeconds * 1000000L, 1).otherwise(0))
      .withColumn("__sid", sum(col("__new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sessions
      .groupBy(col(userCol), col("__sid"))
      .agg(array_join(transform(
        slice(sort_array(collect_list(struct(
          col(tsCol), col(tieCol), col(typeCol).as("t")))), 1, maxLen),
        e => e.getField("t")), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(topK)
  }

  /** First-order Markov transition matrix over each user's event
    * sequence: counts and probabilities of (event_type → next
    * event_type) under the (ts, tieCol) total order — the behavioral
    * fingerprint behind journey mining and next-event prediction
    * baselines. Probabilities are micro-rounded off exact integer
    * counts, so the whole matrix is oracle-exact. One shuffle + one
    * sort per user (lead window), then a dimension-cardinality
    * groupBy; the row-margin join is type-keyed and tiny. */
  def eventTransitions(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String): DataFrame = {
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .withColumn("__next", lead(col(typeCol), 1).over(byUser))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("cur"), col("__next").as("next"))
      .agg(count(lit(1)).as("n"))
    val margins = pairs.groupBy(col("cur")).agg(sum(col("n")).as("n_cur"))
    pairs.join(margins, Seq("cur"))
      .select(col("cur"), col("next"), col("n"),
        (floor(col("n").cast("double") / col("n_cur").cast("double")
          * lit(1000000.0) + lit(0.5)) / lit(1000000.0)).as("p"))
  }

  /** Distributed exact ntile(k): assigns the SAME bucket SQL's
    * `ntile(k) OVER (ORDER BY metric, user)` would — without ever
    * sorting the full frame in one partition. Construction: tie-rank
    * within each metric value (metric-KEYED window — scale-safe),
    * global offsets from range-partitioned prefix sums over the
    * distinct-metric HISTOGRAM ([[Stats.rangePrefixSums]] — no
    * unpartitioned window even when a continuous metric makes the
    * histogram row-sized), exact rank = offset +
    * tie-rank, then SQL's ntile closed form (first n%k buckets get
    * ⌈n/k⌉ rows) in integer `div` arithmetic. The q115/q88 spirit,
    * applied to ranking: the ORACLE runs native window ntile, this
    * runs the distributed equivalent, and the driver's hash compare is
    * the proof they agree. */
  private[ops] def ntileExact(df: DataFrame, metric: Column, userCol: Column,
      k: Int, out: String): DataFrame = {
    // three consumers below (tie-rank, histogram, total) — materialize
    // once so cascaded ntile layers don't recompute the whole chain per
    // consumer (the semDedup single-scan discipline); the frame is
    // per-user aggregated, orders of magnitude under the event log
    val withM = df.withColumn("__m", metric).pinned
    val counts = withM.groupBy(col("__m")).agg(count(lit(1)).as("__c"))
    // the distinct-metric histogram can approach row count when the
    // metric is continuous (cents sums, micro scores), so its prefix
    // offsets ride the range-partitioned construction — no
    // unpartitioned window anywhere in the ntile plan
    val offs = Stats.rangePrefixSums(counts, Seq("__m"), Seq("__c" -> "__incl"))
      .withColumn("__off", col("__incl") - col("__c"))
      .drop("__c", "__incl")
    val n = withM.agg(count(lit(1)).as("__n"))
    withM
      .withColumn("__tie", row_number().over(
        Window.partitionBy(col("__m")).orderBy(userCol)).cast("long"))
      .join(offs, Seq("__m"))
      .crossJoin(n)
      .withColumn("__rank", col("__off") + col("__tie"))
      .withColumn(out, expr(
        s"""CAST(CASE
           |  WHEN __rank <= (__n % $k) * (__n DIV $k + 1)
           |  THEN (__rank - 1) DIV (__n DIV $k + 1) + 1
           |  ELSE (__n % $k) + (__rank - (__n % $k) * (__n DIV $k + 1) - 1)
           |         DIV (__n DIV $k) + 1
           |END AS INT)""".stripMargin))
      .drop("__m", "__tie", "__off", "__n", "__rank")
  }

  /** RFM segmentation: per-user recency (days since last conversion,
    * against the corpus-wide max event time as the snapshot date),
    * frequency (conversion count), and monetary (exact integer cents),
    * each scored into quintiles under the TOTAL order (metric,
    * user_id) — quintile 5 is best in every dimension (most recent /
    * most frequent / highest spend). Only users with ≥1 conversion
    * appear. Quintiles come from [[ntileExact]] — identical semantics
    * to window ntile (the oracle runs the native window form), with no
    * unpartitioned stage anywhere: the per-metric histograms ride
    * range-partitioned prefix sums. */
  def rfmSegments(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, conversionType: String,
      valueCol: String): DataFrame = {
    val snapshot = events.agg(max(col(tsCol)).as("__snap"))
    val perUser = events
      .filter(col(typeCol) === conversionType)
      .groupBy(col(userCol).as("user_id"))
      .agg(max(col(tsCol)).as("__last"),
        count(lit(1)).as("f"),
        sum(floor(col(valueCol) * 100 + lit(0.5)).cast("long")).as("m_cents"))
      .crossJoin(snapshot)
      .select(col("user_id"),
        datediff(col("__snap").cast("date"), col("__last").cast("date"))
          .as("r_days"),
        col("f"), col("m_cents"))
    val scored = ntileExact(
      ntileExact(
        ntileExact(perUser, -col("r_days"), col("user_id"), 5, "r_q"),
        col("f"), col("user_id"), 5, "f_q"),
      col("m_cents"), col("user_id"), 5, "m_q")
    scored.select(col("user_id"), col("r_days"), col("f"), col("m_cents"),
      col("r_q"), col("f_q"), col("m_q"))
  }

  /** Last-touch conversion attribution: each conversion event is
    * credited to the user's most recent touch event (row-order
    * predecessor under (ts, tieCol)) of an attributable type, provided
    * it happened within `windowSeconds`; conversions with no in-window
    * touch credit `"none"`. Returns (touch_type, n_conversions).
    *
    * One shuffle + one sort per user (the q33 sessionize cost shape):
    * the last touch rides a running `last(..., ignoreNulls)` window
    * over ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING — no
    * touch×conversion self-join, no per-conversion probe. */
  def lastTouchAttribution(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, touchTypes: Seq[String],
      conversionType: String, windowSeconds: Long): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(conversionType),
      s"touch types must be non-empty and exclude the conversion type, " +
        s"got $touchTypes / $conversionType")
    require(windowSeconds > 0, s"attribution window must be positive, got $windowSeconds")
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col(typeCol).isin(touchTypes.map(x => x: Any): _*),
      struct(col(tsCol).as("ts"), col(typeCol).as("typ")))
    events
      .withColumn("__lt", last(touch, ignoreNulls = true).over(byUser))
      .filter(col(typeCol) === conversionType)
      .select(
        when(col("__lt").isNull ||
          unix_micros(col(tsCol)) - unix_micros(col("__lt.ts")) >
            windowSeconds * 1000000L, lit("none"))
          .otherwise(col("__lt.typ")).as("touch_type"))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_conversions"))
  }

  /** Weekly cohort retention: cohort = ISO week (Monday-truncated) of a
    * user's first event; a (cohort_week, week_offset) cell counts the
    * distinct cohort users active in that later week. week_offset 0 is
    * by construction the cohort size. One shuffle on user for the
    * first-event aggregate, one distinct on (user, week) — the join is
    * user-keyed and AQE-sized.
    */
  def cohortRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val first = events
      .groupBy(col(userCol).as("u"))
      .agg(min(col(tsCol)).as("first_ts"))
      .select(col("u"),
        date_trunc("week", col("first_ts")).cast("date").as("cohort_week"))
    val weekly = events
      .select(col(userCol).as("u"),
        date_trunc("week", col(tsCol)).cast("date").as("week"))
      .distinct()
    weekly.join(first, "u")
      .groupBy(col("cohort_week"),
        // both sides are Monday-truncated, so the day gap is an exact
        // multiple of 7 and the integer division is lossless
        (datediff(col("week"), col("cohort_week")) / 7).cast("int")
          .as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Multi-touch LINEAR attribution with EXACT integer credits: each
    * conversion splits 10⁶ micro-credits equally across its in-window
    * prior touches — base 10⁶ div n each, the 10⁶ mod n remainder to
    * the EARLIEST touches (Hamilton again), so every conversion
    * credits exactly 10⁶ and the channel totals add up to
    * conversions·10⁶ by construction (float splitting leaks credit;
    * this cannot). Touchless conversions credit `"none"`. The
    * conversion×touch pairing is a user-keyed join bounded by
    * touches-per-window — [[lastTouchAttribution]]'s window trick
    * can't produce the full touch SET, so the join is the honest plan.
    * Returns (touch_type, n_conversions, credit_micro). */
  def linearAttribution(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, touchTypes: Seq[String],
      conversionType: String, windowSeconds: Long): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(conversionType),
      s"touch types must be non-empty and exclude the conversion type, " +
        s"got $touchTypes / $conversionType")
    require(windowSeconds > 0, s"attribution window must be positive, got $windowSeconds")
    val conv = events.filter(col(typeCol) === conversionType)
      .select(col(userCol).as("u"), col(tsCol).as("cts"),
        col(tieCol).as("cid"))
    val touch = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("u"), col(tsCol).as("tts"),
        col(tieCol).as("tid"), col(typeCol).as("touch_type"))
    val paired = conv.join(touch, Seq("u"))
      .filter(col("tts") < col("cts")
        && col("tts") >= col("cts") - expr(s"INTERVAL $windowSeconds SECONDS"))
    val perConv = Window.partitionBy(col("cid"))
    val ranked = paired
      .withColumn("n", count(lit(1)).over(perConv))
      .withColumn("rk", row_number().over(
        perConv.orderBy(col("tts"), col("tid"))).cast("long"))
      .withColumn("credit",
        expr("1000000 DIV n") + when(col("rk") <= expr("1000000 % n"), 1L)
          .otherwise(0L))
    val credited = ranked.groupBy(col("touch_type"))
      .agg(countDistinct(col("cid")).as("n_conversions"),
        sum(col("credit")).as("credit_micro"))
    val none = conv.join(paired.select(col("cid")).distinct(),
        Seq("cid"), "left_anti")
      .agg(count(lit(1)).as("n_conversions"))
      .select(lit("none").as("touch_type"), col("n_conversions"),
        (col("n_conversions") * 1000000L).as("credit_micro"))
    credited.unionByName(none.filter(col("n_conversions") > 0))
  }

  /** CUPED variance-reduced A/B means (Deng et al. 2013): each user's
    * experiment-period metric y is adjusted by θ·(x − x̄) with x the
    * PRE-period metric and θ = cov(x,y)/var(x) pooled over all users —
    * the pre-period explains away persistent per-user spend level, so
    * arm means separate with tighter variance at the same N.
    *
    * Oracle-exact discipline: θ comes from exact DECIMAL moments and
    * is pinned to micro once; each user's adjustment is then the
    * INTEGER y·10⁶·N − θ_micro·(x·N − Σx) (scaling by N clears the
    * fractional mean), so the per-arm sums are exact and the one final
    * division runs on identical once-cast doubles. Arms are the q132
    * md5 split; zero pre-period variance degrades to θ = 0 (= plain
    * means), not a division blowup.
    *
    * Returns one row per arm: arm, n_users, theta_micro,
    * raw_mean_micro, cuped_mean_micro (micro-cents). */
  def cupedAdjustedMeans(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, conversionType: String, valueCol: String,
      salt: String, armACut: String, preDays: Int): DataFrame = {
    require(preDays > 0, s"preDays must be positive, got $preDays")
    val cents = floor(col(valueCol) * 100 + lit(0.5)).cast("long")
    val cut = events.agg(date_add(min(col(tsCol)).cast("date"), preDays)
      .as("__cut"))
    val perUser = events.filter(col(typeCol) === conversionType)
      .crossJoin(cut)
      .groupBy(col(userCol).as("user_id"))
      .agg(
        sum(when(col(tsCol).cast("date") < col("__cut"), cents)
          .otherwise(0L)).as("x"),
        sum(when(col(tsCol).cast("date") >= col("__cut"), cents)
          .otherwise(0L)).as("y"))
      .withColumn("arm",
        when(substring(md5(concat(lit(salt), col("user_id").cast("string"))),
          1, 2) < armACut, "a").otherwise("b"))
    val m = perUser.agg(count(lit(1)).as("bign"),
      sum(col("x").cast("decimal(38,0)")).as("sx"),
      sum(col("y").cast("decimal(38,0)")).as("sy"),
      sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
      sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"))
      .withColumn("theta_micro", expr(
        """CASE WHEN bign * sxx - sx * sx = 0 THEN CAST(0 AS BIGINT)
          |ELSE CAST(floor(CAST(bign * sxy - sx * sy AS DOUBLE)
          |       / CAST(bign * sxx - sx * sx AS DOUBLE) * 1000000 + 0.5)
          |     AS BIGINT) END""".stripMargin))
    perUser.crossJoin(m)
      .withColumn("adj_scaled",
        col("y").cast("decimal(38,0)") * 1000000L * col("bign")
          - col("theta_micro").cast("decimal(38,0)")
            * (col("x").cast("decimal(38,0)") * col("bign") - col("sx")))
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"),
        max(col("theta_micro")).as("theta_micro"),
        floor(sum(col("y")).cast("double") * 1e6
          / count(lit(1)).cast("double") + lit(0.5)).cast("long")
          .as("raw_mean_micro"),
        floor(sum(col("adj_scaled")).cast("double")
          / (count(lit(1)).cast("double") * max(col("bign")).cast("double"))
          + lit(0.5)).cast("long").as("cuped_mean_micro"))
  }

  /** Market-basket association rules over (basket, item) rows — pair
    * support, directional confidence, and lift, the co-purchase /
    * co-occurrence miner (items = products, tags, or n-gram features;
    * baskets = orders, sessions, or docs). Exact integer micro units
    * throughout; DECIMAL(38,0) carries the support·n products.
    *
    * Scale shape: one distinct to (basket, item), a basket-keyed
    * self-join whose fan-out is Σ|basket|² — bounded by the basket-size
    * cap a caller enforces upstream (a degenerate mega-basket would
    * square; that's a property of the PROBLEM, the classic a-priori
    * trade), margins broadcast back onto the pair frame. Returns every
    * pair with support ≥ `minSupport`; callers rank/limit. */
  /** Pair-support core of [[associationRules]]: distinct (basket,
    * item), basket-keyed self-join, support-filtered pair counts —
    * exposed so graph consumers (q155's co-purchase edges) skip the
    * margin joins they would only drop. */
  def pairSupport(df: DataFrame, basketCol: Column, itemCol: Column,
      minSupport: Int): (DataFrame, DataFrame) = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val d = df.select(basketCol.as("b"), itemCol.as("i")).distinct()
    // in-row pair comprehension over each basket's SORTED item array —
    // replaces a basket-keyed self-join (which re-shuffles d twice and
    // fans out through a join operator) with one group + a map-side
    // explode whose pairs partial-aggregate before the final exchange.
    // Sortedness makes x < y structural; same pair multiset, ~2× less
    // exchange volume (measured on the q154/q155/q180/q182/q186 family)
    val pairs = d.groupBy(col("b"))
      .agg(sort_array(collect_set(col("i"))).as("items"))
      .select(explode(expr(
        "flatten(transform(items, (x, ix) ->" +
          " transform(slice(items, ix + 2, size(items))," +
          " y -> struct(x AS item_a, y AS item_b))))")).as("p"))
      .groupBy(col("p.item_a").as("item_a"), col("p.item_b").as("item_b"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minSupport)
    (d, pairs)
  }

  def associationRules(df: DataFrame, basketCol: Column, itemCol: Column,
      minSupport: Int = 2): DataFrame = {
    val (d, pairs) = pairSupport(df, basketCol, itemCol, minSupport)
    val margins = d.groupBy(col("i")).agg(count(lit(1)).as("ci"))
    val nb = d.select(col("b")).distinct().agg(count(lit(1)).as("n_baskets"))
    pairs
      .join(broadcast(margins.select(col("i").as("item_a"), col("ci").as("c_a"))),
        Seq("item_a"))
      .join(broadcast(margins.select(col("i").as("item_b"), col("ci").as("c_b"))),
        Seq("item_b"))
      .crossJoin(nb)
      .select(col("item_a"), col("item_b"), col("c_ab"), col("c_a"),
        col("c_b"), col("n_baskets"),
        expr("CAST(CAST(c_ab AS DECIMAL(38,0)) * 1000000 DIV c_a AS BIGINT)")
          .as("conf_ab_micro"),
        expr("CAST(CAST(c_ab AS DECIMAL(38,0)) * 1000000 DIV c_b AS BIGINT)")
          .as("conf_ba_micro"),
        expr("""CAST(CAST(c_ab AS DECIMAL(38,0)) * n_baskets * 1000000
               |     DIV (CAST(c_a AS DECIMAL(38,0)) * c_b) AS BIGINT)"""
          .stripMargin).as("lift_micro"))
  }

  /** Kaplan–Meier survival estimator over right-censored durations —
    * the time-to-churn / time-to-next-conversion curve q114's cohort
    * grid cannot express (censoring: a user's last observed gap is a
    * LOWER bound, not an event; dropping or completing it biases the
    * curve, the textbook mistake this op exists to avoid).
    *
    * Distributed exact, the histogram discipline: one groupBy to the
    * (duration → events, total) histogram, at-risk counts from the
    * prefix sum over distinct durations (never a per-subject sort),
    * and the product ∏(1 − dᵢ/nᵢ) carried in LOG space — one
    * nano-nat-floored term per event time, summed as exact integers —
    * so partitioning cannot reorder a float product. `surv_micro`
    * exponentiates the pinned integer once (identical IEEE ops both
    * engines). A time where every remaining subject dies (d = n_risk)
    * has no finite log — its rows report lnS of the preceding times
    * and surv_micro = 0 exactly.
    *
    * Returns one row per distinct EVENT duration: t, n_risk, d,
    * lnS_nano, surv_micro. */
  def kaplanMeier(df: DataFrame, durationCol: Column,
      eventCol: Column): DataFrame = {
    val hist = df.groupBy(durationCol.cast("long").as("t"))
      .agg(sum(eventCol.cast("int")).cast("long").as("d"),
        count(lit(1)).as("m"))
    // continuous durations make distinct-t ≈ subject count, so both
    // running sums (at-risk prefix, log-survival accumulation) ride
    // the range-partitioned prefix construction — never an
    // unpartitioned window over the duration histogram
    val tot = hist.agg(sum(col("m")).as("__n"))
    val risk = graft.ops.Stats
      .rangePrefixSums(hist, Seq("t"), Seq("m" -> "__cum_m"))
      .crossJoin(tot)
      .withColumn("n_risk", col("__n") - (col("__cum_m") - col("m")))
    val terms = risk.filter(col("d") > 0)
      .withColumn("term_nano",
        when(col("d") === col("n_risk"), lit(null).cast("long"))
          .otherwise(floor(
            log((col("n_risk") - col("d")).cast("double")
              / col("n_risk").cast("double")) * lit(1e9) + lit(0.5))
            .cast("long")))
    graft.ops.Stats
      .rangePrefixSums(terms, Seq("t"), Seq("term_nano" -> "lnS_nano"))
      .select(col("t"), col("n_risk"), col("d"), col("lnS_nano"),
        when(col("d") === col("n_risk"), lit(0L))
          .otherwise(floor(exp(col("lnS_nano").cast("double") / lit(1e9))
            * lit(1e6) + lit(0.5)).cast("long")).as("surv_micro"))
  }

  /** 2-D Pareto front (skyline, Börzsönyi et al. 2001): every row whose
    * (x, y) is not dominated — no other point has x' ≤ x AND y' ≥ y
    * with at least one strict. MINIMIZES `xName`, MAXIMIZES `yName`
    * (negate a column to flip either sense). Returns the input rows
    * whose point lies on the front (equal undominated points all
    * survive — neither dominates the other).
    *
    * Scale shape — the value-histogram discipline, not a raw sort: only
    * the per-x MAXIMUM y can ever be on the front, so the first stage
    * is a partial-aggregated groupBy(x).max(y) — raw rows never sort.
    * The front test is then one running-max window over the distinct-x
    * histogram (bounded by x-cardinality — for a price column, the
    * number of distinct cents, not the table size), and survivors
    * semi-join back. Exact integer comparisons end to end; the DuckDB
    * NOT EXISTS brute-force twin (q178) is the dominance-semantics
    * proof. */
  def skyline2d(df: DataFrame, xName: String, yName: String): DataFrame = {
    val perX = df.groupBy(col(xName).cast("long").as("__x"))
      .agg(max(col(yName).cast("long")).as("__y"))
    // strictly-preceding running max over the distinct-x histogram via
    // the range-partitioned prefix construction — an unpartitioned
    // Window.orderBy(__x) serialized the whole histogram onto one task,
    // which degrades exactly like AUC did when x is continuous
    // (distinct cardinality ≈ row count)
    val front = Stats.rangePrefixMaxExclusive(
        perX, Seq("__x"), Seq("__y" -> "__pm"))
      .where(col("__pm").isNull || col("__pm") < col("__y"))
      .select(col("__x"), col("__y"))
    df.join(front,
      df(xName).cast("long") === front("__x")
        && df(yName).cast("long") === front("__y"), "left_semi")
  }
}
