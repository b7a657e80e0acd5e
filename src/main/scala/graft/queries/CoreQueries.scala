package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.warehouse.Warehouse

/** Relational operator surface (SURVEY §2.3–§2.6): scans, filters, joins,
  * aggregations, windows, merge — each phrased over the synthetic star
  * schema with a bit-stable DuckDB oracle.
  *
  * Scale design notes (100 TB): every aggregation here is partial+final
  * hash agg (map-side combine); dimension joins are explicit
  * `broadcast()`; the only wide shuffles are on high-cardinality keys
  * (orderkey/custkey) which partition evenly; no driver-side loops.
  */
object CoreQueries {

  private def cents(c: Column): Column = round(c * 100).cast("long")

  private val asOfQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // As-of (point-in-time) join: each order picks up the customer's
    // reference order from the latest strictly-earlier order date
    // (union-sort-propagate implementation — one shuffle, see
    // graft.ops.AsOfJoin)
    "q49_asof_join" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val perDate = orders.groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("ref_order"))
      graft.ops.AsOfJoin.asOf(
        orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        perDate, "o_custkey", "o_orderdate", "o_orderdate", strict = true)
        .select(col("o_orderkey"), col("o_custkey"), col("ref_order").as("prev_order"))
        .orderBy(col("o_orderkey"))
    }))


  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame](

    // S9/K1 on the JDBC surface (sources/Jdbc): a lineitem slice is
    // upserted into embedded Derby (twice — the second run exercises the
    // idempotent merge path on the graded surface), read back through a
    // RANGE-PARTITIONED parallel JDBC scan, and aggregated. The oracle
    // computes the same rollup straight off the parquet, so a hash
    // match proves the write→upsert→partitioned-read loop is lossless.
    // Lifecycle: FIXED db name, dropped at entry (idempotent in-session)
    // and again after the 3-row aggregate materializes — Derby memory:
    // DBs otherwise persist on the heap for the JVM lifetime, so three
    // bench passes used to hold three orphan databases.
    "q220_jdbc_roundtrip" -> ((s, dir) => {
      val db = "memory:graftq220"
      def dropDb(): Unit =
        try {
          java.sql.DriverManager.getConnection(s"jdbc:derby:$db;drop=true")
          ()
        } catch {
          // 08006 = drop SUCCEEDED (Derby reports it as a connection
          // shutdown); XJ004 = db does not exist (first run)
          case e: java.sql.SQLException
              if e.getSQLState == "08006" || e.getSQLState == "XJ004" => ()
        }
      dropDb()
      val url = s"jdbc:derby:$db;create=true"
      // the synthetic lineitem is NOT unique on (orderkey, linenumber)
      // (sf0.01: 3862 rows, 2986 distinct pairs), and upsertByKey's
      // contract requires unique keys — pre-aggregate to a
      // deterministic per-key slice first, exactly as the oracle does
      val slice = t(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 1000)
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("long")).as("qty"),
          sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
            .as("cents"),
          min(col("l_returnflag")).as("l_returnflag"))
        // few writer connections: embedded Derby serializes row locks,
        // so 32 concurrent single-JVM writers just queue on the latch
        .coalesce(4)
      val tbl = "li_slice"
      graft.sources.Jdbc.createTableIfMissing(slice, url, tbl)
      graft.sources.Jdbc.ensureKeyIndex(url, tbl,
        Seq("l_orderkey", "l_linenumber"))
      graft.sources.Jdbc.upsertByKey(slice, url, tbl,
        Seq("l_orderkey", "l_linenumber"))
      graft.sources.Jdbc.upsertByKey(slice, url, tbl,
        Seq("l_orderkey", "l_linenumber"))
      val out = graft.sources.Jdbc.readPartitioned(s, url, tbl,
        "l_orderkey", 1L, 1000L, 8)
        .groupBy(col("l_returnflag"))
        .agg(sum(col("n_rows")).as("n"), sum(col("qty")).as("sum_qty"),
          sum(col("cents")).as("sum_cents"))
        .orderBy(col("l_returnflag"))
      // materialize the 3-row rollup eagerly so the DB can be dropped
      // NOW (a lazy frame would still need Derby alive at driver
      // execution time), then hand back a re-parallelized frame
      val rows = out.collect().toIndexedSeq
      val schema = out.schema
      dropDb()
      s.createDataFrame(
        s.sparkContext.parallelize(rows, 1), schema)
    }),

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

    // W2 — temporal "current role" resolution (priority + as-of ordering,
    // reference: scripts/people/people_utils.py:50-77)
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

    // F1/F15/F16 — scalar string functions (SURVEY §2.7)
    "q11_scalar_funcs" -> ((s, dir) => {
      // synthetic "Name (D-XX)" voter-name strings exercise the F4/F5
      // extract/standardize pair against the oracle, not just unit tests
      val synthName = concat(element_at(split(col("p_name"), " "), 1),
        lit(" (D-"), upper(substring(trim(col("p_type")), 1, 2)), lit(")"))
      t(s, dir, "part").select(
        col("p_partkey"),
        graft.functions.digitsOnly(col("p_brand")).as("brand_num"),
        element_at(split(col("p_name"), " "), 1).as("name_head"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_padded"),
        upper(trim(col("p_type"))).as("type_upper"),
        graft.functions.stateFromName(synthName).as("name_state"),
        graft.functions.standardizeName(synthName).as("name_std"))
        .orderBy(col("p_partkey"))
    }),

    // J1 — blocked fuzzy entity-resolution join: perturbed probe names
    // matched back to canonical customers; blocking on nationkey, scoring
    // by levenshtein ratio, window top-1, threshold 80
    // (reference: scripts/bills/vote_matching.py:106-270)
    "q14_fuzzy_match" -> ((s, dir) => {
      // blocking = (nationkey, name suffix) — the second key is the
      // standard ER trick (suffix/phonetic block) that keeps the
      // candidate set linear instead of block-quadratic
      val cust = t(s, dir, "customer")
      val probes = cust.filter(col("c_custkey") % 7 === 0)
        .select(col("c_custkey").as("probe_key"),
          regexp_replace(col("c_name"), "Customer#", "Customer #").as("probe_name"),
          col("c_nationkey").as("block_key"))
        .withColumn("block_sfx", substring(col("probe_name"), -2, 2))
      val cands = cust.select(col("c_custkey").as("cand_key"),
        col("c_name").as("cand_name"), col("c_nationkey").as("block_key"),
        substring(col("c_name"), -2, 2).as("block_sfx"))
      // early-abandon levenshtein: a pair needing > 5 edits can't clear the
      // 80 threshold at these name lengths, so clamp its score to 0 — the
      // top-1-above-threshold outcome is unchanged but each comparison
      // stops after the distance band is exceeded
      val boundedLev = levenshtein(col("probe_name"), col("cand_name"), 5)
      val score = when(boundedLev === -1, lit(0.0)).otherwise(
        round(lit(100.0) * (lit(1.0) - boundedLev.cast("double") /
          greatest(length(col("probe_name")), length(col("cand_name")), lit(1)).cast("double")), 2))
      val w = Window.partitionBy(col("probe_key"))
        .orderBy(col("score").desc, col("cand_key"))
      probes.join(cands, Seq("block_key", "block_sfx"))
        .withColumn("score", score)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("score") >= 80)
        .select(col("probe_key"), col("cand_key"), col("score"))
        .orderBy(col("probe_key"))
    }),

    // A1 — min_by/max_by derived fields per group
    // (reference: scripts/bills/bills_federal.py:127-128)
    "q24_minmax_by" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(max_by(col("o_orderkey"), col("o_totalprice")).as("priciest_order"),
          min_by(col("o_orderkey"), col("o_totalprice")).as("cheapest_order"),
          max(col("o_orderdate")).as("latest_date"))
        .orderBy(col("o_custkey"))
    }),

    // A2 — grouped distinct-set accumulation
    // (reference: scripts/bills/bills_federal.py:114-115,161)
    "q25_collect_set" -> ((s, dir) => {
      // NOT widened (round 15, measured): same verdict as q45 — the
      // scan-stage partial agg collapses rows cheaper than the widen
      // exchange it would take to parallelize it (1.35x same-window)
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(array_join(array_sort(collect_set(col("l_linestatus"))), ",").as("statuses"),
          count_distinct(col("l_suppkey")).as("n_supp"))
        .orderBy(col("l_returnflag"))
    }),

    // Hierarchical aggregation (ROLLUP) — engine completeness beyond the
    // reference's flat GROUP BYs
    "q26_rollup" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    }),

    // Frame-spec window — running sum per supplier in ship order.
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic data, so
    // the sort key includes quantity+price: remaining ties are full-row
    // duplicates, whose running sums form the same multiset either way.
    "q32_running_sum" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "lineitem")
        .withColumn("running_qty", sum(col("l_quantity")).over(w))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("running_qty"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // CDC apply (warehouse/Warehouse.applyCdc): highest-sequence op per
    // key wins, a terminal delete tombstones the key — K1's upsert plus
    // the delete channel; the winner is a map-side struct argmax, one
    // row per key crossing the exchange
    "q164_cdc_apply" -> ((s, dir) => {
      val log = t(s, dir, "orders").select(
        (col("o_orderkey") % 5000).as("key"),
        col("o_orderkey").as("seq"),
        when(col("o_orderkey") % 7 === 0, "D").otherwise("U").as("op"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"))
      graft.warehouse.Warehouse.applyCdc(log, "key", "seq", "op")
        .orderBy(col("key"))
    }),

    // Sorted-neighborhood record linkage (Hernández & Stolfo 1995): a
    // deterministically OCR-noised copy of every customer name (last
    // '0'/'1' → 'O'/'I') is re-linked by sorting the union and
    // comparing each record to its 5 successors with levenshtein <= 2 —
    // the classic blocking method next to q14's token-blocked fuzzy ER
    "q212_sorted_neighborhood" -> ((s, dir) => {
      val clean = t(s, dir, "customer")
        .select(col("c_custkey").as("id"), col("c_name").as("name"))
      val dirty = clean
        .withColumn("id", col("id") + 1099511627776L)
        .withColumn("name", expr(
          "concat(substring(name, 1, length(name) - 1)," +
            " translate(substring(name, length(name), 1), '01', 'OI'))"))
      // the global neighborhood rank is a prefix-COUNT under the
      // (name, id) total order — ride the range-partitioned prefix
      // sums instead of an unpartitioned row_number window, which
      // serialized the whole union onto one task (row-scale, not
      // histogram-scale: this frame is 2× the customer table)
      val all = graft.ops.Stats.rangePrefixSums(
          clean.unionByName(dirty).withColumn("__one", lit(1L)),
          Seq("name", "id"), Seq("__one" -> "rn"))
        .drop("__one")
      // the window offsets EXPLODE into an equi-join key — a bare
      // `rb BETWEEN ra+1 AND ra+5` range predicate plans as a nested
      // loop (900M comparisons at sf0.1); five shifted equi-join rows
      // per record keep it a hash join
      val a = all.select(col("rn").as("ra"), col("id").as("a_id"),
          col("name").as("a_name"))
        .withColumn("rb", explode(expr("sequence(ra + 1, ra + 5)")))
      val b = all.select(col("rn").as("rb"), col("id").as("b_id"),
        col("name").as("b_name"))
      a.join(b, Seq("rb"))
        .where(levenshtein(col("a_name"), col("b_name")) <= 2
          && col("a_id") =!= col("b_id"))
        .select(least(col("a_id"), col("b_id")).as("id_lo"),
          greatest(col("a_id"), col("b_id")).as("id_hi"),
          levenshtein(col("a_name"), col("b_name")).as("dist"))
        .distinct()
        .orderBy(col("id_lo"), col("id_hi"))
    }),

    // Hierarchical share-of-parent rollup: nation revenue as a share of
    // its region, region as a share of the total — the percent-of-
    // parent drill path every BI layer renders; exact cents, single
    // integer divisions
    "q204_share_of_parent" -> ((s, dir) => {
      val rev = t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
          .as("cents"))
      rev
        .withColumn("region_cents",
          sum(col("cents")).over(Window.partitionBy(col("r_name"))))
        .withColumn("total_cents", sum(col("cents")).over(Window.partitionBy()))
        .select(col("r_name"), col("n_name"), col("cents"),
          expr("(cents * 1000000) div region_cents").as("share_of_region_micro"),
          expr("(region_cents * 1000000) div total_cents")
            .as("region_share_micro"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // Forward as-of with tolerance: each order's NEXT order by the same
    // customer within 30 days (pandas merge_asof direction='forward'
    // semantics) — repeat-purchase gap analysis; null past tolerance
    "q205_next_order_gap" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("next_key", lead(col("o_orderkey"), 1).over(w))
        .withColumn("next_date", lead(col("o_orderdate"), 1).over(w))
        .withColumn("gap", datediff(col("next_date"), col("o_orderdate")))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          when(col("gap") <= 30, col("next_key")).as("next_within_30d"),
          when(col("gap") <= 30, col("gap")).as("gap_days"))
        .orderBy(col("o_orderkey"))
    }),

    // Warehouse catalog self-audit: one row per table with row and
    // column counts — the inventory check a nightly health job runs
    // before anything else trusts the warehouse
    "q200_catalog_audit" -> ((s, dir) => {
      graft.Tables.Names.map { name =>
        val df = t(s, dir, name)
        df.agg(count(lit(1)).as("n_rows"))
          .select(lit(name).as("table_name"), col("n_rows"),
            lit(df.schema.fields.length.toLong).as("n_cols"))
      }.reduce(_ unionByName _).orderBy(col("table_name"))
    }),

    // Bitemporal point lookup: "as of transaction cutoff T, what did we
    // believe each key's state was at valid time V" — the two-axis
    // as-of every corrections-bearing warehouse needs (SCD2/q168 track
    // valid time only). Restrict to tx <= cutoff (what was known),
    // then argmax (valid_from, tx) within the valid horizon
    "q192_bitemporal" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val log = o.select((col("o_orderkey") % 3000).as("key"),
        col("o_orderdate").as("valid_from"),
        col("o_orderkey").as("tx"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      val txCut = o.agg(expr("max(o_orderkey) div 2").as("tx_cut"))
      log.crossJoin(txCut)
        .filter(col("tx") <= col("tx_cut")
          && col("valid_from") <= lit("1999-01-01").cast("timestamp"))
        .groupBy(col("key"))
        .agg(max(struct(col("valid_from"), col("tx"), col("cents"))).as("m"))
        .select(col("key"), col("m.valid_from").as("valid_from"),
          col("m.tx").as("tx"), col("m.cents").as("cents"))
        .orderBy(col("key"))
    }),

    // Join-cardinality estimation from KMV sketches (Beyer 2007): how
    // many distinct custkeys would the orders⋈customer join touch,
    // WITHOUT joining — the optimizer-grade use of q172's sketch, with
    // exact truths alongside so the gauge judges its own estimate.
    // One-row output; every estimate is integer math the oracle
    // reproduces exactly
    "q178_kmv_join_est" -> ((s, dir) => {
      graft.ops.Stats.kmvJoinEstimate(
        t(s, dir, "orders"), t(s, dir, "customer"),
        col("o_custkey"), col("c_custkey"), k = 128)
        .orderBy(col("n_a"))
    })
  ) ++ asOfQueries

  val oracle: Map[String, String] = Map(
    // the round trip must be LOSSLESS: the oracle never sees Derby,
    // only the parquet the slice came from
    "q220_jdbc_roundtrip" ->
      """WITH slice AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents,
        |    min(l_returnflag) AS l_returnflag
        |  FROM lineitem WHERE l_orderkey <= 1000
        |  GROUP BY 1, 2)
        |SELECT l_returnflag,
        |  CAST(sum(n_rows) AS BIGINT) AS n,
        |  CAST(sum(qty) AS BIGINT) AS sum_qty,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM slice GROUP BY 1 ORDER BY 1""".stripMargin,
    "q212_sorted_neighborhood" ->
      """WITH clean AS (SELECT c_custkey AS id, c_name AS name FROM customer),
        |dirty AS (SELECT id + 1099511627776 AS id,
        |    substring(name, 1, length(name) - 1)
        |      || translate(substring(name, length(name), 1), '01', 'OI')
        |      AS name
        |  FROM clean),
        |a AS (SELECT id, name,
        |    row_number() OVER (ORDER BY name, id) AS rn
        |  FROM (SELECT * FROM clean UNION ALL SELECT * FROM dirty))
        |SELECT DISTINCT least(x.id, y.id) AS id_lo,
        |  greatest(x.id, y.id) AS id_hi,
        |  CAST(levenshtein(x.name, y.name) AS INT) AS dist
        |FROM a x JOIN a y ON y.rn > x.rn AND y.rn <= x.rn + 5
        |WHERE levenshtein(x.name, y.name) <= 2 AND x.id <> y.id
        |ORDER BY id_lo, id_hi""".stripMargin,

    "q204_share_of_parent" ->
      """WITH rev AS (SELECT r_name, n_name,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2),
        |w AS (SELECT r_name, n_name, cents,
        |    CAST(sum(cents) OVER (PARTITION BY r_name) AS BIGINT)
        |      AS region_cents,
        |    CAST(sum(cents) OVER () AS BIGINT) AS total_cents
        |  FROM rev)
        |SELECT r_name, n_name, cents,
        |  CAST(cents * 1000000 // region_cents AS BIGINT)
        |    AS share_of_region_micro,
        |  CAST(region_cents * 1000000 // total_cents AS BIGINT)
        |    AS region_share_micro
        |FROM w ORDER BY r_name, n_name""".stripMargin,

    "q205_next_order_gap" ->
      """WITH w AS (SELECT o_orderkey, o_custkey, o_orderdate,
        |    lead(o_orderkey) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS next_key,
        |    lead(o_orderdate) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS next_date
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderdate,
        |  CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
        |      CAST(next_date AS DATE)) <= 30 THEN next_key END
        |    AS next_within_30d,
        |  CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
        |      CAST(next_date AS DATE)) <= 30
        |    THEN CAST(date_diff('day', CAST(o_orderdate AS DATE),
        |      CAST(next_date AS DATE)) AS INT) END AS gap_days
        |FROM w ORDER BY o_orderkey""".stripMargin,

    // pragma_table_info counts the view's columns — no hardcoded
    // schema widths to drift out of date
    "q200_catalog_audit" -> {
      val rows = graft.Tables.Names.map { n =>
        s"""SELECT '$n' AS table_name,
           |  CAST((SELECT count(*) FROM $n) AS BIGINT) AS n_rows,
           |  CAST((SELECT count(*) FROM pragma_table_info('$n')) AS BIGINT)
           |    AS n_cols""".stripMargin
      }.mkString("(", ")\nUNION ALL\n(", ")")
      s"SELECT * FROM (\n$rows)\nORDER BY table_name"
    },
    "q192_bitemporal" ->
      """WITH log AS (SELECT o_orderkey % 3000 AS key,
        |    o_orderdate AS valid_from, o_orderkey AS tx,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |c AS (SELECT max(o_orderkey) // 2 AS tx_cut FROM orders),
        |f AS (SELECT key, valid_from, tx, cents FROM log CROSS JOIN c
        |  WHERE tx <= tx_cut AND valid_from <= TIMESTAMP '1999-01-01'),
        |r AS (SELECT key, valid_from, tx, cents,
        |    row_number() OVER (PARTITION BY key
        |      ORDER BY valid_from DESC, tx DESC) AS rn
        |  FROM f)
        |SELECT key, valid_from, tx, cents FROM r WHERE rn = 1
        |ORDER BY key""".stripMargin,
    // the whole estimator in SQL: min-k per side via row_number, the
    // union sketch re-ranked, scalar-subquery facts, HUGEINT divisions
    "q178_kmv_join_est" ->
      """WITH ha AS (SELECT DISTINCT
        |    ('0x' || substr(md5('kmv:' || o_custkey), 1, 15))::BIGINT AS hv
        |  FROM orders),
        |hb AS (SELECT DISTINCT
        |    ('0x' || substr(md5('kmv:' || c_custkey), 1, 15))::BIGINT AS hv
        |  FROM customer),
        |ra AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM ha),
        |rb AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM hb),
        |kua AS (SELECT hv FROM ra WHERE rn <= 128),
        |kub AS (SELECT hv FROM rb WHERE rn <= 128),
        |un AS (SELECT hv FROM kua UNION SELECT hv FROM kub),
        |ku AS (SELECT hv, rn FROM (
        |    SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM un)
        |  WHERE rn <= 128),
        |facts AS (SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM ha) AS n_a,
        |  (SELECT CAST(count(*) AS BIGINT) FROM hb) AS n_b,
        |  (SELECT CAST(count(*) AS BIGINT) FROM ha JOIN hb USING (hv))
        |    AS n_inter,
        |  (SELECT hv FROM ra WHERE rn = 128) AS hka,
        |  (SELECT hv FROM rb WHERE rn = 128) AS hkb,
        |  (SELECT CAST(count(*) AS BIGINT) FROM ku) AS szku,
        |  (SELECT hv FROM ku WHERE rn = 128) AS hku,
        |  (SELECT CAST(count(*) AS BIGINT) FROM ku
        |     WHERE hv IN (SELECT hv FROM kua)
        |       AND hv IN (SELECT hv FROM kub)) AS k_int)
        |SELECT n_a, n_b, n_inter,
        |  CAST(CASE WHEN n_a < 128 THEN n_a
        |    ELSE (127::HUGEINT * 1152921504606846976) // hka END AS BIGINT)
        |    AS est_a,
        |  CAST(CASE WHEN n_b < 128 THEN n_b
        |    ELSE (127::HUGEINT * 1152921504606846976) // hkb END AS BIGINT)
        |    AS est_b,
        |  k_int,
        |  CAST(CASE WHEN szku < 128 THEN k_int
        |    ELSE (k_int::HUGEINT *
        |      ((127::HUGEINT * 1152921504606846976) // hku)) // 128
        |    END AS BIGINT) AS est_inter
        |FROM facts ORDER BY n_a""".stripMargin,
    "q49_asof_join" ->
      """WITH per_date AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS ref_order
        |  FROM orders GROUP BY 1, 2),
        |w AS (
        |  SELECT o_custkey, o_orderdate,
        |    lag(ref_order) OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS prev_order
        |  FROM per_date)
        |SELECT o.o_orderkey, o.o_custkey, w.prev_order
        |FROM orders o JOIN w USING (o_custkey, o_orderdate)
        |ORDER BY o_orderkey""".stripMargin,
    "q01_pruned_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q02_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
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
        |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
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
    "q11_scalar_funcs" ->
      """SELECT p_partkey,
        |  regexp_replace(p_brand, '[^0-9]', '', 'g') AS brand_num,
        |  split_part(p_name, ' ', 1) AS name_head,
        |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
        |  upper(trim(p_type)) AS type_upper,
        |  regexp_extract(split_part(p_name, ' ', 1) || ' (D-' ||
        |    upper(substring(trim(p_type), 1, 2)) || ')',
        |    '(.+) \(.?-?([A-Z]{2})\)', 2) AS name_state,
        |  trim(regexp_replace(split_part(p_name, ' ', 1) || ' (D-' ||
        |    upper(substring(trim(p_type), 1, 2)) || ')',
        |    '\(.*?\)', '', 'g')) AS name_std
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q14_fuzzy_match" ->
      """SELECT probe_key, cand_key, score FROM (
        |  SELECT probe_key, cand_key, score,
        |    row_number() OVER (PARTITION BY probe_key
        |      ORDER BY score DESC, cand_key) AS rn
        |  FROM (
        |    SELECT p.probe_key, c.c_custkey AS cand_key,
        |      round(100.0 * (1.0 -
        |        CAST(levenshtein(p.probe_name, c.c_name) AS DOUBLE) /
        |        CAST(greatest(length(p.probe_name), length(c.c_name), 1) AS DOUBLE)), 2) AS score
        |    FROM (
        |      SELECT c_custkey AS probe_key,
        |        regexp_replace(c_name, 'Customer#', 'Customer #') AS probe_name,
        |        c_nationkey
        |      FROM customer WHERE c_custkey % 7 = 0) p
        |    JOIN customer c ON p.c_nationkey = c.c_nationkey
        |      AND right(p.probe_name, 2) = right(c.c_name, 2)))
        |WHERE rn = 1 AND score >= 80
        |ORDER BY probe_key""".stripMargin,
    "q24_minmax_by" ->
      """SELECT o_custkey,
        |  arg_max(o_orderkey, o_totalprice) AS priciest_order,
        |  arg_min(o_orderkey, o_totalprice) AS cheapest_order,
        |  max(o_orderdate) AS latest_date
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q25_collect_set" ->
      """SELECT l_returnflag,
        |  array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
        |  count(DISTINCT l_suppkey) AS n_supp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q26_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_cust
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q32_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  sum(l_quantity) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
        |FROM lineitem
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    // last-writer-wins spelled as a window; sequences are unique per
    // key by construction, so the Spark struct-argmax agrees exactly
    "q164_cdc_apply" ->
      """WITH log AS (SELECT o_orderkey % 5000 AS key, o_orderkey AS seq,
        |    CASE WHEN o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END AS op,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |r AS (SELECT key, seq, op, cents,
        |    row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rnk
        |  FROM log)
        |SELECT key, seq, op, cents FROM r
        |WHERE rnk = 1 AND op <> 'D' ORDER BY key""".stripMargin
  )
}
