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
  def integrityAudit(checks: Seq[(String, DataFrame)]): DataFrame = {
    require(checks.nonEmpty && checks.map(_._1).distinct.size == checks.size,
      s"integrityAudit needs uniquely-named checks, got ${checks.map(_._1)}")
    checks.map { case (name, viol) =>
      viol.agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("check_name"), col("n_violations"))
    }.reduce(_ unionAll _)
  }
}
