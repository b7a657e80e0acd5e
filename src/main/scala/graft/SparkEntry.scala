package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — one named query per implemented operator from
  * SURVEY.md §2 plus the north-star LLM-data-pipeline operators, each
  * with DuckDB oracle SQL where SQL-expressible (queries without an
  * oracle entry get the driver's rows-only check and are golden-tested
  * in ScalaTest instead).
  *
  * Determinism rules for oracle parity (the driver hash-compares values):
  * every query ends in a total ORDER BY; money sums are computed in exact
  * integer cents; floating aggregates are rounded; column names are
  * aliased identically on both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q06_region_rollup")(spark, "/root/testdata/sf0.001")

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (CoreQueries.queries, CoreQueries.oracle),
      (EventQueries.queries, EventQueries.oracle),
      (TextQueries.queries, TextQueries.oracle),
      (DedupQueries.queries, DedupQueries.oracle),
      (VectorQueries.queries, VectorQueries.oracle),
      (GeoQueries.queries, GeoQueries.oracle),
      (MultimodalQueries.queries, MultimodalQueries.oracle),
      (SqlQueries.queries, SqlQueries.oracle),
      (CorpusQueries.queries, CorpusQueries.oracle),
      (GraphQueries.queries, GraphQueries.oracle),
      (RetrievalQueries.queries, RetrievalQueries.oracle))

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
