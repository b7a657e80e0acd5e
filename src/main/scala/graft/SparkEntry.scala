package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.functions._
import graft.warehouse.Warehouse

/** Driver contract — one named query per implemented operator from
  * SURVEY.md §2 (+ the north-star LLM-data-pipeline operators), each with
  * DuckDB oracle SQL where SQL-expressible.
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

  private def cents(c: Column): Column = round(c * 100).cast("long")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // P1/P2 — projection + predicate pushdown (SURVEY §2.3)
    "q01_pruned_scan" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp") && col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // A1/A4 — grouped aggregation, TPC-H Q1 shape (SURVEY §2.5)
    "q02_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // W1 — per-group top-k ranking (SURVEY §2.6)
    "q03_top_orders_per_cust" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // J2 — referential semi-join (SURVEY §2.4)
    "q04_semi_join" -> ((s, dir) => {
      val big = t(s, dir, "lineitem").filter(col("l_quantity") >= 49)
        .select(col("l_orderkey").as("o_orderkey"))
      t(s, dir, "orders").join(big, Seq("o_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // J2 complement — anti-join ("warn-drop" stream, SURVEY §2.4)
    "q05_anti_join" -> ((s, dir) => {
      val big = t(s, dir, "lineitem").filter(col("l_quantity") >= 49)
        .select(col("l_orderkey").as("o_orderkey"))
      t(s, dir, "orders").join(big, Seq("o_orderkey"), "left_anti")
        .select(col("o_orderkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    }),

    // J5 — broadcast dimension lookup joins + rollup (SURVEY §2.4/2.5)
    "q06_region_rollup" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_cust"),
          sum(cents(col("c_acctbal"))).as("acctbal_cents"))
        .orderBy(col("r_name"))
    }),

    // A3 — duplicate-key detection (SURVEY §2.5)
    "q07_dup_keys" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("key"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .orderBy(col("key"))
    }),

    // K1 — keyed last-writer-wins merge ("upsert" sink, SURVEY §2.2)
    "q08_merge_upsert" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val existing = orders.select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      val incoming = existing.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000)
      Warehouse.mergeByKey(existing, incoming, Seq("o_orderkey"))
        .orderBy(col("o_orderkey"))
    }),

    // W2 — temporal "current role" resolution (priority + as-of ordering)
    "q09_current_role" -> ((s, dir) => {
      val asOf = lit("1995-06-17").cast("timestamp")
      val ends = col("o_orderdate") + expr("INTERVAL 90 DAYS")
      val priority = when(col("o_orderdate") <= asOf && asOf < ends, 2)
        .when(col("o_orderdate") <= asOf, 1)
        .otherwise(0)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("priority").desc, col("o_orderdate").desc, col("o_orderkey").desc)
      t(s, dir, "orders")
        .withColumn("priority", priority)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("priority") > 0)
        .select(col("o_custkey"), col("o_orderkey").as("current_order"), col("priority"))
        .orderBy(col("o_custkey"))
    }),

    // §2.10 — event-time tumbling-window aggregation (batch form of the
    // Structured Streaming hourly rollup; see graft.streaming)
    "q10_event_hourly" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("hour"), col("event_type"))
    }),

    // F1/F15/F16 — scalar string functions (SURVEY §2.7)
    "q11_scalar_funcs" -> ((s, dir) => {
      t(s, dir, "part").select(
        col("p_partkey"),
        digitsOnly(col("p_brand")).as("brand_num"),
        element_at(split(col("p_name"), " "), 1).as("name_head"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_padded"),
        upper(trim(col("p_type"))).as("type_upper"))
        .orderBy(col("p_partkey"))
    }),

    // Text analysis — token counting (north-star)
    "q12_token_stats" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        length(col("text")).as("len_chars"))
        .orderBy(col("doc_id"))
    }),

    // Dedup — exact (hash-groupBy) over a synthetic 2-batch union
    "q13_dedup_exact" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val doubled = docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 1000000))
      doubled.groupBy(md5(col("text").cast("binary")).as("h"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n"))
        .orderBy(col("h"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pruned_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q02_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sum_base_cents,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q03_top_orders_per_cust" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q04_semi_join" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin,
    "q05_anti_join" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin,
    "q06_region_rollup" ->
      """SELECT r_name, count(*) AS n_cust,
        |  sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS acctbal_cents
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q07_dup_keys" ->
      """SELECT l_orderkey AS key, count(*) AS n FROM lineitem
        |GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""".stripMargin,
    "q08_merge_upsert" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1000
        |       ELSE o_totalprice END AS o_totalprice,
        |  o_orderstatus
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q09_current_role" ->
      """SELECT o_custkey, o_orderkey AS current_order, priority FROM (
        |  SELECT o_custkey, o_orderkey, priority,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY priority DESC, o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM (
        |    SELECT o_custkey, o_orderkey, o_orderdate,
        |      CASE WHEN o_orderdate <= TIMESTAMP '1995-06-17'
        |             AND TIMESTAMP '1995-06-17' < o_orderdate + INTERVAL 90 DAY THEN 2
        |           WHEN o_orderdate <= TIMESTAMP '1995-06-17' THEN 1
        |           ELSE 0 END AS priority
        |    FROM orders))
        |WHERE rn = 1 AND priority > 0
        |ORDER BY o_custkey""".stripMargin,
    "q10_event_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q11_scalar_funcs" ->
      """SELECT p_partkey,
        |  regexp_replace(p_brand, '[^0-9]', '', 'g') AS brand_num,
        |  split_part(p_name, ' ', 1) AS name_head,
        |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
        |  upper(trim(p_type)) AS type_upper
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q12_token_stats" ->
      """SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
        |  length(text) AS len_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q13_dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keeper, count(*) AS n FROM (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents)
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
