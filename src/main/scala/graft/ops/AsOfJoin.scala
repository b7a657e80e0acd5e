package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, attach the latest
  * right row with the same key and `rightTs <= leftTs` (or `<` in strict
  * mode). The temporal-resolution generalization of the reference's
  * current-role lookup (SURVEY W2).
  *
  * Implementation is the scalable union–sort–propagate form, NOT a
  * per-key range join: both sides are unioned with a side tag, sorted
  * within each key by (ts, side), and the last right-side payload is
  * propagated forward with `last(..., ignoreNulls)` over an unbounded
  * preceding frame. One shuffle on the key, linear work per partition —
  * the plan a native engine's as-of operator would produce.
  */
object AsOfJoin {

  /** `rightPayload` columns are attached to each left row (null when no
    * right row precedes it). Left columns are preserved. */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, strict: Boolean = false): DataFrame = {
    val rightPayload = right.columns.filter(c => c != key && c != rightTs).toSeq
    // side ordering inside one timestamp: non-strict -> right sorts BEFORE
    // left at equal ts (a right row at exactly leftTs matches); strict ->
    // left first, so an equal-ts right row is not yet visible
    val rightTag = if (strict) 1 else 0
    val leftTag = if (strict) 0 else 1

    val l = left.withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(leftTag))
      .withColumn("__payload", lit(null).cast(structType(right, rightPayload)))
    val r = right.select(
      (col(key) +: Seq(col(rightTs).as("__ts"), lit(rightTag).as("__side"),
        struct(rightPayload.map(col): _*).as("__payload"))): _*)
    val rAligned = l.columns.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null))
    }.select(l.columns.map(col).toIndexedSeq: _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(rAligned)
      .withColumn("__matched", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === leftTag && col(leftTs).isNotNull)
      .select(left.columns.map(col) ++
        rightPayload.map(c => col("__matched").getField(c).as(c)): _*)
  }

  private def structType(right: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => right.schema(c)))
}
