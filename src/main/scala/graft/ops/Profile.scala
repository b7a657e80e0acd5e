package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level data profiling: one row per profiled column with row
  * count, null count, distinct count, and min/max (stringified so mixed
  * column types share one output schema). The data-quality companion to
  * [[Guards]] — a warehouse refresh profiles its inputs before trusting
  * them (the reference's failure mode is a KeyError three scripts deep).
  *
  * Scale shape: ONE aggregation over the table computes every
  * column's stats (a per-column loop would scan the table N times).
  * `approxDistinct = true` (the 100 TB default) uses HLL++ so the scan
  * stays a single partial+final aggregate; exact mode is precise but
  * Spark expands multiple COUNT(DISTINCT)s into one Expand pass per
  * column group — acceptable for dimension-sized tables, the documented
  * price of exactness on fact tables. The wide single-row result is
  * unpivoted to (column, n, n_null, n_distinct, min, max) rows with
  * `stack` — driver-side cost is one row either way. */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
      approxDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    // names are interpolated into the stack() selectExpr below — a quote
    // or backtick would corrupt the generated SQL; rename-then-profile
    cols.foreach(c => require(c.matches("[A-Za-z0-9_]+"),
      s"profile column names must be [A-Za-z0-9_]+, got '$c' — rename first"))
    def distinctOf(c: String): Column =
      if (approxDistinct) approx_count_distinct(col(c))
      else count_distinct(col(c))
    val aggs = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"__n_$c"),
        count(when(col(c).isNull, 1)).as(s"__null_$c"),
        distinctOf(c).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `__n_$c`, `__null_$c`, `__dist_$c`, `__min_$c`, `__max_$c`"
    }.mkString(", ")
    wide.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (col_name, n, n_null, n_distinct, min, max)")
  }

  /** Referential-integrity violations: child rows whose FK tuple has no
    * match in the parent (null FKs are NOT orphans — SQL FK semantics:
    * a null reference is "no reference", caught by a separate
    * [[nullViolations]] check if the column is also NOT NULL). Plan: a
    * LEFT ANTI join on the key tuple — AQE broadcasts dimension-sized
    * parents, shuffles fact-sized ones, exactly the join class the
    * engine already optimizes. */
  def orphans(child: DataFrame, parent: DataFrame,
      on: Seq[(String, String)]): DataFrame = {
    require(on.nonEmpty, "orphans needs at least one (childKey, parentKey) pair")
    val cond = on.map { case (c, p) => child(c) === parent(p) }.reduce(_ && _)
    val notNull = on.map { case (c, _) => child(c).isNotNull }.reduce(_ && _)
    child.filter(notNull).join(parent, cond, "left_anti")
  }

  /** Key-uniqueness violations: one row per KEY VALUE that occurs more
    * than once (with its count) — the PK/natural-key audit. */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "duplicateKeys needs at least one key column")
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)
  }

  /** NOT NULL violations: rows where any of `cols` is null. */
  def nullViolations(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "nullViolations needs at least one column")
    df.filter(cols.map(col(_).isNull).reduce(_ || _))
  }

  /** The dbt-style constraint suite rolled into one audit frame: each
    * named check contributes (check_name, n_violations) — zero is the
    * green row, so the audit is also the regression fixture ("this relation
    * was clean at ingest N"). Each violation frame keeps its own
    * optimal plan (anti-join / partial agg); the union is rows =
    * checks. */
  /** Functional-dependency DISCOVERY over candidate column pairs (the
    * data-profiling classic behind schema normalization and key
    * detection — Metanome/TANE family, restricted to unary FDs): A → B
    * holds iff every A value maps to exactly one B value, i.e. the
    * (A, B)-distinct count equals the A-distinct count. Reports both
    * counts plus the violation margin so "almost-FDs" (dirty data) are
    * visible, not just booleans.
    *
    * Scale shape: one partial-aggregated distinct per pair on
    * (A, B) — count_distinct(A) falls out of the same rollup via a
    * second aggregation over it; no row-level data leaves the
    * histograms. Pairs are checked independently and unioned
    * (candidate lists are schema-sized, not data-sized). */
  def functionalDependencies(df: DataFrame,
      pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "functionalDependencies needs candidate pairs")
    pairs.map { case (a, b) =>
      df.groupBy(col(a).as("__a"), col(b).as("__b"))
        .agg(count(lit(1)).as("__n"))
        .groupBy(col("__a"))
        .agg(count(lit(1)).as("__nb"))
        .agg(count(lit(1)).as("n_lhs"), sum(col("__nb")).as("n_pairs"))
        .select(lit(a).as("lhs"), lit(b).as("rhs"),
          col("n_lhs"), col("n_pairs"),
          (col("n_pairs") - col("n_lhs")).as("violations"),
          (col("n_pairs") === col("n_lhs")).as("holds"))
    }.reduce(_ unionByName _)
  }

  /** Inclusion-dependency DISCOVERY (FK-candidate detection): for each
    * (child column ⊆ parent column) candidate, the exact containment —
    * distinct child values, how many appear in the parent, and the
    * containment fraction in micro units. A declared-FK audit
    * ([[orphans]]) checks constraints you claim; this FINDS the ones
    * the schema forgot to declare (containment 1.0) and quantifies the
    * near-misses.
    *
    * Scale shape per candidate: two distinct projections + one
    * left-semi join on the value — value histograms, never rows. */
  def inclusionDependencies(
      candidates: Seq[(String, DataFrame, String, String, DataFrame, String)])
      : DataFrame = {
    require(candidates.nonEmpty, "inclusionDependencies needs candidates")
    candidates.map { case (childName, child, childCol,
        parentName, parent, parentCol) =>
      val cv = child.select(col(childCol).as("__v"))
        .where(col("__v").isNotNull).distinct()
      val pv = parent.select(col(parentCol).as("__v"))
        .where(col("__v").isNotNull).distinct()
      val nC = cv.agg(count(lit(1)).as("n_child"))
      val nIn = cv.join(pv, Seq("__v"), "left_semi")
        .agg(count(lit(1)).as("n_contained"))
      nC.crossJoin(nIn)
        .select(lit(s"$childName.$childCol").as("child"),
          lit(s"$parentName.$parentCol").as("parent"),
          col("n_child"), col("n_contained"),
          expr("CASE WHEN n_child = 0 THEN 1000000" +
            " ELSE (n_contained * 1000000) div n_child END")
            .as("containment_micro"),
          (col("n_contained") === col("n_child")).as("holds"))
    }.reduce(_ unionByName _)
  }

  def integrityAudit(checks: Seq[(String, DataFrame)]): DataFrame = {
    require(checks.nonEmpty && checks.map(_._1).distinct.size == checks.size,
      s"integrityAudit needs uniquely-named checks, got ${checks.map(_._1)}")
    checks.map { case (name, viol) =>
      viol.agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("check_name"), col("n_violations"))
    }.reduce(_ unionAll _)
  }
}
