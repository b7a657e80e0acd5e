package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, TimestampType}

/** Catalyst rewrite of naive interval-containment joins into the binned
  * equi-join of [[graft.ops.RangeJoin]] — so a user who writes the
  * natural spelling
  *
  *   points.join(ranges, pt >= start && pt < end)
  *
  * gets the scale plan without knowing the trick exists. Catalyst can
  * only execute a no-equi-key join as a broadcast nested loop (or a
  * cartesian product), which is O(|points|·|ranges|) compares and
  * requires one side in memory whole; the rewrite lands the same rows
  * via an equi-join on a time bin plus the original predicate as a
  * residual filter. Because each point owns exactly ONE bin, a matching
  * pair meets in exactly one bin and no dedup is needed — the rewrite
  * is row-for-row semantics-preserving (IntervalJoinRewriteSpec compares
  * against the unrewritten join).
  *
  * Opt-in, two ways: set `spark.graft.interval.join.bin.seconds` to a
  * positive bin width (choose ≈ the median range span), or set
  * `spark.graft.interval.join.enabled=true` alone and the rule DERIVES
  * the width per matched join — the approximate median span of (a
  * bounded 100k-row prefix of) the range side, the exact heuristic the
  * manual conf documents. The derivation runs one small aggregation
  * job from inside the optimizer (the same move Spark's own
  * partition-pruning and AQE stats probes make); it fires only when a
  * join actually matches, successful derivations are CACHED per
  * canonicalized join shape (each new action re-runs the optimizer, so
  * an uncached probe would re-pay the job per action), and any failure
  * falls back to not rewriting rather than failing the query. An
  * explicit bin.seconds always wins over derivation. Like the
  * hand-written
  * operator, the rewrite caps each range row's explode at
  * [[graft.ops.RangeJoin.MaxBinsPerRange]] bins and RAISES on a wider
  * span — without the cap, rewriting a sentinel-dated range
  * (end = 9999-12-31) would turn a working-but-slow nested-loop join
  * into an executor OOM; with it, the failure is loud and names the
  * fix (filter the sentinel rows or raise the bin width).
  * The rule fires only on
  * INNER joins whose condition contains a `pt >= start` / `pt < end`
  * (or `<=`/`BETWEEN`-style) conjunct pair over TimestampType columns
  * from opposite sides and NO cross-side equality conjunct — if an equi
  * key exists Catalyst already plans a hash join and the range predicate
  * rides along as an extra condition. Idempotent by the same test: the
  * rewritten join has an equality conjunct, so it never matches again
  * (required — injected optimizer rules run inside a fixed-point batch).
  *
  * Installed via `spark.sql.extensions=graft.GraftExtensions`
  * (cluster) or `spark.experimental.extraOptimizations` (session). */
object IntervalJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val binConfKey = "spark.graft.interval.join.bin.seconds"
  val enabledConfKey = "spark.graft.interval.join.enabled"

  private def binSeconds: Long = {
    val raw = conf.getConfString(binConfKey, "0")
    // a malformed value must not throw from inside the optimizer — that
    // would fail EVERY query in the session, not just interval joins
    try raw.trim.toLong
    catch {
      case _: NumberFormatException =>
        logWarning(s"$binConfKey='$raw' is not a long; interval-join rewrite disabled")
        0L
    }
  }

  private def deriveEnabled: Boolean =
    conf.getConfString(enabledConfKey, "false").trim.equalsIgnoreCase("true")

  /** Successful derivations, cached per canonicalized (start, end,
    * range side). Every ACTION on a DataFrame re-runs the optimizer, so
    * without this an uncached probe job fires per action on the same
    * interval-join frame — and a transiently failing probe could flip
    * that frame between binned and nested-loop plans across actions.
    * Bounded: cleared wholesale past 128 entries (a session optimizing
    * more distinct interval joins than that re-probes; the map never
    * grows without bound). Failures are NOT cached, so a transient
    * probe error can still recover to the fast plan on a later action
    * (results are identical either way; only the plan shape differs). */
  private val derivedCache = new java.util.concurrent.ConcurrentHashMap[
    (Expression, Expression, LogicalPlan), java.lang.Long]()

  private def deriveBinSecondsCached(start: Expression, end: Expression,
      rangeSide: LogicalPlan): Option[Long] = {
    val key = (start.canonicalized, end.canonicalized, rangeSide.canonicalized)
    Option(derivedCache.get(key)).map(_.longValue()).orElse {
      val derived = deriveBinSeconds(start, end, rangeSide)
      derived.foreach { w =>
        if (derivedCache.size >= 128) derivedCache.clear()
        derivedCache.put(key, w)
      }
      derived
    }
  }

  /** Derived bin width: approx median of (end − start) over a bounded
    * prefix of the range side, in whole seconds (≥ 1). The 100k-row
    * limit bounds the probe's cost no matter how large the range side
    * is; None (empty/failed probe) means "do not rewrite". */
  private def deriveBinSeconds(start: Expression, end: Expression,
      rangeSide: LogicalPlan): Option[Long] = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.ApproximatePercentile
    try {
      val span = Subtract(UnixMicros(end), UnixMicros(start))
      val probe = Aggregate(Nil,
        Seq(Alias(new ApproximatePercentile(span, Literal(0.5))
          .toAggregateExpression(), "median_span")()),
        GlobalLimit(Literal(100000),
          LocalLimit(Literal(100000),
            Filter(GreaterThan(end, start), rangeSide))))
      val row = org.apache.spark.sql.graftbridge.ColumnBridge
        .ofRows(org.apache.spark.sql.SparkSession.active, probe).head()
      if (row.isNullAt(0)) None
      else Some(math.max(1L, row.getLong(0) / 1000000L))
    } catch {
      case scala.util.control.NonFatal(e) =>
        // a failed stats probe must not fail the user's query — the
        // naive nested-loop plan still works, just slowly
        logWarning(s"interval-join bin derivation failed; not rewriting", e)
        None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val bin = binSeconds
    if (bin <= 0 && !deriveEnabled) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _) =>
        rewrite(j, cond, bin).getOrElse(j)
    }
  }

  /** pt >= start (either spelled direction). */
  private object GeqPair {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case GreaterThanOrEqual(pt, start) => Some((pt, start))
      case LessThanOrEqual(start, pt) => Some((pt, start))
      case _ => None
    }
  }

  /** pt < end (either spelled direction). */
  private object LtPair {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case LessThan(pt, end) => Some((pt, end))
      case GreaterThan(end, pt) => Some((pt, end))
      case _ => None
    }
  }

  private def rewrite(j: Join, cond: Expression, binSeconds: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def fromOneSide(e: Expression, side: LogicalPlan): Boolean =
      e.references.nonEmpty && e.references.subsetOf(side.outputSet) &&
        e.deterministic && e.dataType == TimestampType
    def crossSideEquality(e: Expression): Boolean = e match {
      case EqualTo(l, r) =>
        (l.references.subsetOf(j.left.outputSet) && r.references.subsetOf(j.right.outputSet)) ||
          (l.references.subsetOf(j.right.outputSet) && r.references.subsetOf(j.left.outputSet))
      case EqualNullSafe(l, r) =>
        (l.references.subsetOf(j.left.outputSet) && r.references.subsetOf(j.right.outputSet)) ||
          (l.references.subsetOf(j.right.outputSet) && r.references.subsetOf(j.left.outputSet))
      case _ => false
    }
    if (conjuncts.exists(crossSideEquality)) return None

    // find the containment pair: same pt on both conjuncts, start/end
    // from the opposite side (points may sit on either input)
    val candidates = for {
      GeqPair(pt1, start) <- conjuncts
      LtPair(pt2, end) <- conjuncts
      if pt1.semanticEquals(pt2)
      (ptSide, rangeSide) <- Seq((j.left, j.right), (j.right, j.left))
      if fromOneSide(pt1, ptSide) && fromOneSide(start, rangeSide) &&
        fromOneSide(end, rangeSide)
    } yield (pt1, start, end, ptSide, rangeSide)

    candidates.headOption.flatMap { case (pt, start, end, ptSide, rangeSide) =>
      // explicit conf wins; otherwise derive from the matched range side
      // (only now — deriving before a match would probe on every join)
      val effectiveBin =
        if (binSeconds > 0) Some(binSeconds)
        else deriveBinSecondsCached(start, end, rangeSide)
      effectiveBin.map(rewriteWithBin(j, cond, pt, start, end, ptSide, rangeSide, _))
    }
  }

  private def rewriteWithBin(j: Join, cond: Expression, pt: Expression,
      start: Expression, end: Expression, ptSide: LogicalPlan,
      rangeSide: LogicalPlan, binSeconds: Long): LogicalPlan = {
      val binMicros = Literal(binSeconds * 1000000L)
      // floor(unix_micros(ts) / binMicros) — double division + Floor,
      // the exact arithmetic of RangeJoin.binnedIntervalJoin (true
      // floor, correct for pre-epoch timestamps where integral division
      // would truncate toward zero)
      def binOf(ts: Expression): Expression =
        Cast(Floor(Divide(Cast(UnixMicros(ts), DoubleType),
          Cast(binMicros, DoubleType))), LongType)

      val ptBin = Alias(binOf(pt), "__graft_bin_pt")()
      val ptPlan = Project(ptSide.output :+ ptBin, ptSide)

      // per-row explode cap, same contract as RangeJoin.cappedEndBin:
      // raise on a pathological span instead of materializing an
      // unbounded bin sequence
      def cappedEndBin(startBin: Expression, endBin: Expression): Expression =
        CaseWhen(Seq((
          GreaterThanOrEqual(Subtract(endBin, startBin),
            Literal(graft.ops.RangeJoin.MaxBinsPerRange)),
          Cast(new RaiseError(Literal(
            s"range spans more than ${graft.ops.RangeJoin.MaxBinsPerRange} " +
              s"bins — filter sentinel/open-ended ranges or raise $binConfKey")),
            LongType))),
          Some(endBin))

      val rangeBinAttr = AttributeReference("__graft_bin_rg", LongType,
        nullable = true)()
      val rangePlan = Generate(
        // Sequence is TimeZoneAwareExpression: without an explicit
        // timeZoneId it reports unresolved and fails plan validation,
        // even over plain longs
        Explode(Sequence(binOf(start),
          cappedEndBin(binOf(start), binOf(end)), None,
          Some(conf.sessionLocalTimeZone))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(rangeBinAttr),
        // inverted/empty ranges match nothing; drop them BEFORE the
        // explode — Sequence raises on a descending span
        Filter(GreaterThan(end, start), rangeSide))

      val equiJoin = Join(ptPlan, rangePlan, Inner,
        Some(EqualTo(ptBin.toAttribute, rangeBinAttr)), j.hint)
      // the ORIGINAL condition re-verifies every candidate (and carries
      // any residual conjuncts beyond the containment pair)
      Project(j.output, Filter(cond, equiJoin))
  }
}
