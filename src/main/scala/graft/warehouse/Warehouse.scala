package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed merge ("upsert") semantics of the reference's generic sink,
  * re-expressed as set-oriented batch operations
  * (reference: scripts/database/database.py:52-73 — INSERT … ON CONFLICT
  * (pks) DO UPDATE SET all non-PK columns, `created_at` excluded from
  * overwrite).
  *
  * Scale notes: both operators are single-shuffle on the key columns.
  * `mergeByKey` is the `foreachBatch` body for incremental refresh; at
  * cluster scale the existing side would be a bucketed table so the join
  * is shuffle-free on the big side.
  */
object Warehouse {

  /** Last-writer-wins merge of `incoming` into `existing` on `keys`.
    * Columns listed in `preserve` (e.g. `created_at`) keep the existing
    * row's value when the key already exists. Schemas must match. */
  def mergeByKey(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
      preserve: Seq[String] = Seq.empty): DataFrame = {
    val pres = preserve.filter(c => existing.columns.contains(c) && incoming.columns.contains(c))
    val incomingResolved =
      if (pres.isEmpty) incoming
      else {
        val old = existing.select((keys ++ pres).map(c => col(c).as(s"__old_$c")): _*)
        val joinCond = keys.map(k => incoming(k) === old(s"__old_$k")).reduce(_ && _)
        val joined = incoming.join(old, joinCond, "left")
        val cols = incoming.columns.map { c =>
          if (pres.contains(c)) coalesce(col(s"__old_$c"), incoming(c)).as(c)
          else incoming(c).as(c)
        }
        joined.select(cols.toIndexedSeq: _*)
      }
    existing.join(incoming.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(incomingResolved)
  }

  /** Write a frame as a bucketed (+ per-bucket sorted) managed table —
    * the cluster deployment of the warehouse side of [[mergeByKey]]:
    * a bucketed scan already satisfies the join's hashpartitioning
    * requirement, so the BIG side of every keyed merge/lookup joins
    * WITHOUT an exchange (only the small incoming batch shuffles to
    * match). BucketedMergeSpec asserts the exchange-free plan. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet").saveAsTable(table)

  /** Collapse a multi-batch union to one row per key: highest `ordering`
    * wins (ties broken deterministically by all remaining columns). The
    * batch analog of the reference's sequential per-row overwrite. */
  def dedupeByKey(df: DataFrame, keys: Seq[String], ordering: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering.desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
