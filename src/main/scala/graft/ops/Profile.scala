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
}
