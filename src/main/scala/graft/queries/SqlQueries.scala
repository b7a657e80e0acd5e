package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.functions._

/** Engine-completeness SQL surface: percentiles, set operators, pivot,
  * CUBE, ordered string aggregation, correlated subqueries (via the SQL
  * front-end), range-frame windows, accent stripping, deterministic ids,
  * and sketch-based distinct counting. */
object SqlQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact interpolated percentiles per group. Computed over integer
    // cents: the interpolation fraction then lands ≥ 0.05 from any
    // round(…,1) boundary, so the two engines' algebraically-equal but
    // ULP-different interpolation formulas cannot round apart.
    //
    // Rides Stats.quantilesCont (histogram + range-partitioned rank
    // probes), NOT the built-in `percentile`: the built-in buffers a
    // per-group value→count map whose final merge lands on ONE task,
    // and the distinct-cents domain GROWS with scale factor — a
    // multi-GB single-reducer hash map at 100×. quantilesCont's
    // integer closed form (v_r·(100−f)+v_{r+1}·f, ×100) is the same
    // math, so ÷100 reproduces the identical rounded values.
    "q36_percentile" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      // BOTH value columns ride ONE quantilesCont pass: tag each with a
      // metric key and make (metric, returnflag) the group — one
      // histogram shuffle + one prefix-sum stack instead of two (the
      // machinery's fixed cost, not its data volume, dominates locally)
      val tagged = li.select(col("l_returnflag").as("rf"),
          round(col("l_extendedprice") * 100).cast("long").as("v"),
          lit("c").as("m"))
        .unionByName(li.select(col("l_returnflag").as("rf"),
          col("l_quantity").cast("long").as("v"), lit("q").as("m")))
      graft.ops.Stats.quantilesCont(tagged,
          struct(col("m"), col("rf")), col("v"), Seq(25, 50, 90))
        .groupBy(col("g.rf").as("l_returnflag"))
        .agg(
          round(max(when(col("g.m") === "c", col("p50_x100"))) / 100.0, 1)
            .as("p50_cents"),
          round(max(when(col("g.m") === "c", col("p90_x100"))) / 100.0, 1)
            .as("p90_cents"),
          round(max(when(col("g.m") === "q", col("p25_x100"))) / 100.0, 1)
            .as("q1_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // Set operators: UNION / INTERSECT / EXCEPT (all distinct)
    "q37_setops" -> ((s, dir) => {
      val lo = t(s, dir, "orders").filter(col("o_totalprice") < 50000)
        .select(col("o_custkey").as("k"))
      val hi = t(s, dir, "orders").filter(col("o_totalprice") >= 100000)
        .select(col("o_custkey").as("k"))
      val union = lo.union(hi).distinct().withColumn("src", lit("union"))
      val inter = lo.intersect(hi).withColumn("src", lit("intersect"))
      val exc = lo.except(hi).withColumn("src", lit("except"))
      union.unionByName(inter).unionByName(exc)
        .orderBy(col("src"), col("k"))
        .select(col("src"), col("k"))
    }),

    // Pivot: order counts by priority × status (fixed pivot columns)
    "q38_pivot" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("o_orderpriority"))
    }),

    // CUBE over region × nation
    "q41_cube" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .cube(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    }),

    // Ordered string aggregation
    "q42_string_agg" -> ((s, dir) => {
      t(s, dir, "supplier")
        .groupBy(col("s_nationkey"))
        .agg(array_join(array_sort(collect_list(col("s_name"))), "|").as("suppliers"))
        .orderBy(col("s_nationkey"))
    }),

    // Correlated scalar subquery through the SQL front-end
    "q43_correlated_subquery" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("v_orders")
      s.sql("""
        SELECT o_orderkey, o_custkey,
          CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        FROM v_orders o
        WHERE o_totalprice > 1.8 * (
          SELECT avg(o_totalprice) FROM v_orders i WHERE i.o_custkey = o.o_custkey)
        ORDER BY o_orderkey""")
    }),

    // RANGE-frame window: sum of same-customer order prices within ±30 days
    "q44_range_window" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("v_orders2")
      s.sql("""
        SELECT o_custkey, o_orderkey,
          CAST(round(sum(o_totalprice) OVER (
            PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
            RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND INTERVAL 30 DAYS FOLLOWING
          ) * 100) AS BIGINT) AS window_cents
        FROM v_orders2
        ORDER BY o_custkey, o_orderkey""")
    }),

    // F6 — accent stripping over synthesized accented names
    "q40_unaccent" -> ((s, dir) => {
      val accented = translate(col("p_name"), "aeo", "áéō")
      t(s, dir, "part").select(
        col("p_partkey"),
        accented.as("accented"),
        unaccent(accented).as("plain"))
        .orderBy(col("p_partkey"))
    }),

    // F8/F9 — deterministic uuid5 + OCD id formatting (no SQL oracle:
    // DuckDB lacks SHA-1; bit-exactness is golden-tested vs CPython)
    "q39_ids" -> ((s, dir) => {
      t(s, dir, "orders").limit(1000).select(
        col("o_orderkey"),
        billId(concat(lit("ORD "), col("o_orderkey")),
          lit("ocd-division/country:us")).as("bill_id"),
        voteEventId(concat(lit("vote:"), col("o_orderkey"))).as("vote_event_id"))
        .orderBy(col("o_orderkey"))
    }),

    // Sketch-based distinct counting (HLL++) — approximate by design, so
    // rows-only; the scale story for COUNT(DISTINCT) at 100 TB
    "q45_approx_distinct" -> ((s, dir) => {
      // NOT widened (round 15, measured): fanning the scan out before
      // this aggregation traded a ~4 MB post-partial-agg exchange for a
      // 53 MB pre-agg one — 1.48x worse same-window; the scan-stage
      // partial agg IS the right place for this kernel
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
          count_distinct(col("l_partkey")).as("exact_parts"))
        .orderBy(col("l_returnflag"))
    }),

    // Morton (z-order) clustering key (ops/Layout.zValue): pure
    // shift-and-mask arithmetic, bit-identical in any engine — the write
    // path (Layout.zOrderShards) range-partitions on this value so every
    // output file covers a compact (x, y) rectangle and parquet min/max
    // stats prune scans on EITHER dimension (LayoutSpec proves the
    // bounding-box tightening vs an id-ordered layout)
    // Unicode NFC canonicalization (codegen NormalizeUnicode): the same
    // visible string in composed vs decomposed form breaks exact dedup /
    // line hashing / grams until canonicalized — the input appends a
    // decomposed "café" (e + U+0301), the output re-composes it
    "q79_normalize" -> ((s, dir) => {
      val decomposed = concat(col("p_name"), lit(" café"))
      t(s, dir, "part").select(col("p_partkey"),
        length(decomposed).as("len_raw"),
        normalizeNfc(decomposed).as("nfc"),
        length(normalizeNfc(decomposed)).as("len_nfc"))
        .orderBy(col("p_partkey"))
    }),

    // Column profiling (ops/Profile): one aggregation pass computes
    // every column's stats. Exact-distinct mode here for oracle parity,
    // over a DIMENSION table per the op's own contract — Spark expands
    // multi-COUNT(DISTINCT) into one input replica per distinct column,
    // which priced exact mode at 4.8s on the sf0.1 fact table; the
    // approx HLL++ single-pass mode is the fact-table path (OpsSpec)
    "q78_profile" -> ((s, dir) => {
      graft.ops.Profile.profile(t(s, dir, "part"),
        Seq("p_partkey", "p_brand", "p_type"), approxDistinct = false)
        .orderBy(col("col_name"))
    }),

    // Explicit GROUPING SETS + grouping() markers (the CUBE/ROLLUP
    // generalization — engine-completeness for OLAP report shapes)
    "q126_grouping_sets" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("v_customer_gs")
      t(s, dir, "nation").createOrReplaceTempView("v_nation_gs")
      t(s, dir, "region").createOrReplaceTempView("v_region_gs")
      s.sql("""
        SELECT r_name, n_name,
          CAST(grouping(r_name) AS INT) AS g_r,
          CAST(grouping(n_name) AS INT) AS g_n,
          count(*) AS n_cust
        FROM v_customer_gs
        JOIN v_nation_gs ON c_nationkey = n_nationkey
        JOIN v_region_gs ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name), (r_name, n_name), ())
        ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""")
    }),

    // LATERAL correlated subquery with per-row ORDER BY + LIMIT — the
    // SQL spelling of top-k-per-group (q03 is the DataFrame spelling)
    "q127_lateral_topk" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("v_customer_l")
      t(s, dir, "orders").createOrReplaceTempView("v_orders_l")
      // The top-2 rides an EXPLICIT row_number() window, not the
      // natural `ORDER BY ... LIMIT 2`: Spark decorrelates the latter
      // into global-sort → hash re-exchange → sort by the group key
      // ONLY → row_number with an EMPTY window order — the within-group
      // order survives the exchange only by fetch-order luck, which
      // holds in one JVM and BREAKS with multi-process executors
      // (caught by the round-10 local-cluster lane at sf0.1: the top-2
      // picks varied run to run). The explicit window keeps its ORDER
      // BY through decorrelation, so the pick is deterministic on any
      // cluster.
      s.sql("""
        SELECT c_custkey, o_orderkey, price_cents
        FROM v_customer_l c,
        LATERAL (
          SELECT o_orderkey, price_cents
          FROM (
            SELECT o_orderkey,
              CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
              row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM v_orders_l o WHERE o.o_custkey = c.c_custkey)
          WHERE rn <= 2) t
        ORDER BY c_custkey, price_cents DESC, o_orderkey""")
    }),

    // Analytic-window completeness: first/nth value over explicit
    // full-partition frames, percent_rank, cume_dist — exact rational
    // doubles, identical IEEE division in both engines
    "q128_window_suite" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("v_lineitem_w")
      s.sql("""
        SELECT l_suppkey, l_orderkey, l_linenumber,
          first_value(l_quantity) OVER w_full AS first_qty,
          nth_value(l_quantity, 2) OVER w_full AS second_qty,
          percent_rank() OVER w_ord AS pr,
          cume_dist() OVER w_ord AS cd
        FROM v_lineitem_w
        WINDOW
          w_full AS (PARTITION BY l_suppkey
            ORDER BY l_shipdate, l_orderkey, l_linenumber
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
          w_ord AS (PARTITION BY l_suppkey
            ORDER BY l_shipdate, l_orderkey, l_linenumber)
        ORDER BY l_suppkey, l_orderkey, l_linenumber""")
    }),

    // Referential/uniqueness/not-null constraint audit (ops/Profile
    // .integrityAudit): the dbt-style warehouse conformance suite —
    // each check keeps its own optimal anti-join/partial-agg plan
    "q122_integrity_audit" -> ((s, dir) => {
      val P = graft.ops.Profile
      val customer = t(s, dir, "customer")
      val orders = t(s, dir, "orders")
      val lineitem = t(s, dir, "lineitem")
      val part = t(s, dir, "part")
      val nation = t(s, dir, "nation")
      P.integrityAudit(Seq(
        "orders_customer_fk" ->
          P.orphans(orders, customer, Seq("o_custkey" -> "c_custkey")),
        "lineitem_orders_fk" ->
          P.orphans(lineitem, orders, Seq("l_orderkey" -> "o_orderkey")),
        "lineitem_part_fk" ->
          P.orphans(lineitem, part, Seq("l_partkey" -> "p_partkey")),
        "customer_nation_fk" ->
          P.orphans(customer, nation, Seq("c_nationkey" -> "n_nationkey")),
        "orders_pk_unique" -> P.duplicateKeys(orders, Seq("o_orderkey")),
        "lineitem_pk_unique" ->
          P.duplicateKeys(lineitem, Seq("l_orderkey", "l_linenumber")),
        "customer_name_not_null" ->
          P.nullViolations(customer, Seq("c_name"))))
        .orderBy(col("check_name"))
    }),

    // Hilbert clustering key (golden — the quadrant walk has no SQL
    // twin; q72/q82 keep the oracle-checked Morton variants): same
    // (x, y) derivation as q72, order-7 grid covers both axes
    "q133_hilbert" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          (col("doc_id") % 97).as("x"), ((col("doc_id") * 7) % 89).as("y"))
        .withColumn("h", graft.ops.Layout.hilbertValue(col("x"), col("y"), 7))
        .orderBy(col("h"), col("doc_id"))
    }),

    "q72_zorder" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          (col("doc_id") % 97).as("x"), ((col("doc_id") * 7) % 89).as("y"))
        .withColumn("z", graft.ops.Layout.zValue(col("x"), col("y")))
        .orderBy(col("z"), col("doc_id"))
    }),

    // 3-D Morton clustering key (ops/Layout.zValueN) — the (lat, lon,
    // time) layout case; flat shift-and-mask OR-chain, oracle-exact
    // against the same chain spelled in SQL
    "q82_zorder3" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          (col("doc_id") % 97).as("x"), ((col("doc_id") * 7) % 89).as("y"),
          ((col("doc_id") * 13) % 83).as("t3"))
        .withColumn("z", graft.ops.Layout.zValueN(
          Seq(col("x"), col("y"), col("t3")), bitsPerDim = 8))
        .orderBy(col("z"), col("doc_id"))
    }),

    // Exact DISTRIBUTED percentile_disc per group (ops/Stats
    // histogram-prefix-rank construction — the q121 machinery applied
    // to quantiles): the oracle runs the same closed form natively and
    // the hash compare proves the distributed ranks agree. Never
    // holds a group's values in one agg buffer — the 100 TB shape
    // (q36's interpolated sibling rides the same construction via
    // Stats.quantilesCont).
    "q142_exact_quantiles" -> ((s, dir) => {
      graft.ops.Stats.quantilesDisc(
        t(s, dir, "lineitem").withColumn("cents",
          floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")),
        col("l_returnflag"), col("cents"), Seq(25, 50, 75, 90, 99))
        .withColumnRenamed("g", "l_returnflag")
        .orderBy(col("l_returnflag"))
    }),

    // Mergeable log-histogram quantile sketch (DDSketch-style: binary
    // octave × 16 linear sub-buckets → ≤6.25% relative error bound)
    // next to the EXACT quantiles it approximates — the per-group
    // err*_micro columns ARE the measured error, and the oracle
    // recomputes sketch + exact + error natively, so the error gauge
    // itself is hash-verified. Bucket counts merge by addition in any
    // order: the streamable/shardable path exact prefix-ranks lack.
    "q145_sketch_quantiles" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").withColumn("cents",
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
      val sk = graft.ops.Stats.sketchQuantiles(
        li, col("l_returnflag"), col("cents"), subBuckets = 16)
      val ex = graft.ops.Stats.quantilesDisc(
        li, col("l_returnflag"), col("cents"), Seq(50, 90, 99)).drop("n")
      sk.join(ex, Seq("g"))
        .select(col("g").as("l_returnflag"), col("n"),
          col("est_p50"), col("p50"),
          expr("abs(est_p50 - p50) * 1000000 DIV p50").as("err50_micro"),
          col("est_p90"), col("p90"),
          expr("abs(est_p90 - p90) * 1000000 DIV p90").as("err90_micro"),
          col("est_p99"), col("p99"),
          expr("abs(est_p99 - p99) * 1000000 DIV p99").as("err99_micro"))
        .orderBy(col("l_returnflag"))
    }),

    // Exact DISTRIBUTED percentile_cont (q142's disc sibling): the
    // linear interpolation is reported ×100 so it stays INTEGER —
    // v_r·(100−f) + v_{r+1}·f with (r, f) from (n−1)·p divmod 100 —
    // and the oracle runs the identical closed form (native
    // quantile_cont would re-introduce the float lerp this avoids)
    "q149_cont_quantiles" -> ((s, dir) => {
      graft.ops.Stats.quantilesCont(
        t(s, dir, "lineitem").withColumn("cents",
          floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")),
        col("l_returnflag"), col("cents"), Seq(25, 50, 90))
        .withColumnRenamed("g", "l_returnflag")
        .orderBy(col("l_returnflag"))
    }),

    // Why cluster at all, quantified (ops/Layout.fileSkipStats): the
    // same box predicate under Z-order vs linear-key file layout, with
    // honest zone-map pruning (a file is read iff its min/max ranges
    // overlap the box). rows_scanned / rows_matched is the read
    // amplification the layout buys down — the number that justifies
    // q72/q82/q133 at 100 TB
    "q158_zorder_pruning" -> ((s, dir) => {
      val base = t(s, dir, "documents").select(col("doc_id"),
        (col("doc_id") % 97).as("x"), ((col("doc_id") * 7) % 89).as("y"))
      val z = base.withColumn("m",
        graft.ops.Layout.zValue(col("x"), col("y")))
      val lin = base.withColumn("m", col("doc_id"))
      graft.ops.Layout.fileSkipStats(z, col("m"), col("doc_id"), 64,
          col("x"), col("y"), 10, 30, 20, 40, "zorder")
        .unionByName(graft.ops.Layout.fileSkipStats(lin, col("m"),
          col("doc_id"), 64, col("x"), col("y"), 10, 30, 20, 40, "linear"))
        .orderBy(col("layout"))
    }),

    // UNPIVOT via the stack generator — wide metrics to long
    // (metric, val) rows, the reshape the warehouse surface was missing
    // Functional-dependency discovery (TANE-family unary FDs): which
    // column determines which — with violation margins so dirty
    // almost-FDs are visible. nation→region holds; the reverse cannot
    "q193_fd_discovery" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val nat = t(s, dir, "nation")
      val joined = cust.join(nat, col("c_nationkey") === col("n_nationkey"))
      graft.ops.Profile.functionalDependencies(joined, Seq(
        ("c_custkey", "c_name"), ("c_nationkey", "n_name"),
        ("n_name", "n_regionkey"), ("n_regionkey", "n_name"),
        ("c_mktsegment", "c_nationkey")))
        .orderBy(col("lhs"), col("rhs"))
    }),

    // Inclusion-dependency discovery (FK-candidate detection): exact
    // containment of child key columns in parent key columns — finds
    // the FKs the schema never declared, quantifies the near-misses
    "q194_fk_discovery" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val orders = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      val supp = t(s, dir, "supplier")
      graft.ops.Profile.inclusionDependencies(Seq(
        ("lineitem", li, "l_orderkey", "orders", orders, "o_orderkey"),
        ("orders", orders, "o_custkey", "customer", cust, "c_custkey"),
        ("lineitem", li, "l_suppkey", "supplier", supp, "s_suppkey"),
        ("orders", orders, "o_orderkey", "lineitem", li, "l_orderkey"),
        ("customer", cust, "c_custkey", "orders", orders, "o_custkey")))
        .orderBy(col("child"), col("parent"))
    }),

    // Benford first-digit audit over order totals — the classic
    // fabricated-numbers screen as a data-quality gauge: observed
    // first-significant-digit shares vs the log10(1 + 1/d) law, all in
    // integer micro-units (one ln per digit constant, micro-rounded)
    "q176_benford" -> ((s, dir) => {
      val d = t(s, dir, "orders")
        .select(substring(
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            .cast("string"), 1, 1).cast("int").as("digit"))
        .filter(col("digit") >= 1)
        .groupBy("digit").agg(count(lit(1)).as("n_obs"))
      d.crossJoin(d.agg(sum("n_obs").as("n")))
        .select(col("digit"), col("n_obs"),
          expr("(n_obs * 1000000) div n").as("obs_micro"),
          floor(log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0))
            * 1000000 + 0.5).cast("long").as("exp_micro"))
        .withColumn("dev_micro", abs(col("obs_micro") - col("exp_micro")))
        .orderBy("digit")
    }),

    // 2-D Pareto front (skyline): cheapest-for-the-size parts —
    // minimize retail price, maximize size (ops/Analytics.skyline2d:
    // per-price max-size histogram + one running-max window; the
    // NOT EXISTS oracle brute-forces dominance)
    "q177_skyline" -> ((s, dir) => {
      val parts = t(s, dir, "part").withColumn("price_cents",
        expr("CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)"))
      graft.ops.Analytics.skyline2d(parts, "price_cents", "p_size")
        .select(col("p_partkey"), col("price_cents"), col("p_size"))
        .orderBy(col("p_partkey"))
    }),

    "q159_unpivot" -> ((s, dir) => {
      t(s, dir, "part").select(col("p_partkey"),
          floor(col("p_retailprice") * 100 + lit(0.5)).cast("long")
            .as("retail_cents"),
          col("p_size").cast("long").as("sz"),
          length(col("p_name")).cast("long").as("name_len"))
        .selectExpr("p_partkey",
          "stack(3, 'retail_cents', retail_cents, 'size', sz, " +
            "'name_len', name_len) AS (metric, val)")
        .orderBy(col("p_partkey"), col("metric"))
    }),

    // Weighted exact quantiles (ops/Stats.quantilesDiscWeighted): the
    // price under which 25/50/90% of shipped QUANTITY falls — rank
    // cutoffs on cumulative weight, the volume-weighted twin of q142
    "q167_weighted_quantiles" -> ((s, dir) => {
      graft.ops.Stats.quantilesDiscWeighted(
        t(s, dir, "lineitem").withColumn("cents",
          floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")),
        col("l_returnflag"), col("cents"),
        col("l_quantity").cast("long"), Seq(25, 50, 90))
        .withColumnRenamed("g", "l_returnflag")
        .orderBy(col("l_returnflag"))
    }),

    // Exact Pearson correlation matrix over the four lineitem metrics
    // (ops/Stats.corrMatrix): all 14 moments in ONE scan via
    // DECIMAL(38,0) partial aggregates, closed form on once-cast
    // doubles — the data-profiling grid q78 lacked
    "q162_corr_matrix" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_quantity").cast("long").as("qty"),
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")
          .as("cents"),
        floor(col("l_discount") * 1000000 + lit(0.5)).cast("long")
          .as("disc"),
        floor(col("l_tax") * 1000000 + lit(0.5)).cast("long").as("tax"))
      graft.ops.Stats.corrMatrix(li, Seq(
          "qty" -> col("qty"), "cents" -> col("cents"),
          "disc" -> col("disc"), "tax" -> col("tax")))
        .orderBy(col("var_a"), col("var_b"))
    }),

    // Exact per-group mode from the value histogram — max count, ties
    // to the smallest value via one max(struct(c, −v)) partial
    // aggregate (no per-group sort)
    "q160_mode" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .withColumn("cents",
          floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
        .groupBy(col("l_returnflag"), col("cents")).agg(count(lit(1)).as("c"))
        .groupBy(col("l_returnflag"))
        .agg(max(struct(col("c"), (-col("cents")).as("nv"))).as("m"),
          count(lit(1)).as("n_distinct"))
        .select(col("l_returnflag"), (-col("m.nv")).as("mode_cents"),
          col("m.c").as("mode_count"), col("n_distinct"))
        .orderBy(col("l_returnflag"))
    })
  )

  /** One dimension's shift-and-mask OR-chain of the 3-D Morton value,
    * spelled in portable SQL (the q82 oracle twin of Layout.zValueN). */
  private def sqlSpread3(c: String, d: Int, bits: Int): String =
    (0 until bits).map(i => s"((($c >> $i) & 1) << ${i * 3 + d})").mkString(" | ")

  val oracle: Map[String, String] = Map(
    "q36_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5), 1) AS p50_cents,
        |  round(quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.9), 1) AS p90_cents,
        |  round(quantile_cont(l_quantity, 0.25), 1) AS q1_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q37_setops" ->
      """WITH lo AS (SELECT o_custkey AS k FROM orders WHERE o_totalprice < 50000),
        |     hi AS (SELECT o_custkey AS k FROM orders WHERE o_totalprice >= 100000)
        |SELECT * FROM (
        |  SELECT 'union' AS src, k FROM (SELECT DISTINCT k FROM (SELECT k FROM lo UNION SELECT k FROM hi))
        |  UNION ALL
        |  SELECT 'intersect' AS src, k FROM (SELECT k FROM lo INTERSECT SELECT k FROM hi)
        |  UNION ALL
        |  SELECT 'except' AS src, k FROM (SELECT k FROM lo EXCEPT SELECT k FROM hi))
        |ORDER BY src, k""".stripMargin,
    "q38_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q41_cube" ->
      """SELECT r_name, n_name, count(*) AS n_cust
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY CUBE (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q42_string_agg" ->
      """SELECT s_nationkey,
        |  string_agg(s_name, '|' ORDER BY s_name) AS suppliers
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q43_correlated_subquery" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        |FROM orders o
        |WHERE o_totalprice > 1.8 * (
        |  SELECT avg(o_totalprice) FROM orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q44_range_window" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(round(sum(o_totalprice) OVER (
        |    PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
        |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND INTERVAL 30 DAYS FOLLOWING
        |  ) * 100) AS BIGINT) AS window_cents
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q40_unaccent" ->
      """SELECT p_partkey,
        |  translate(p_name, 'aeo', 'áéō') AS accented,
        |  strip_accents(translate(p_name, 'aeo', 'áéō')) AS plain
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q79_normalize" ->
      ("""SELECT p_partkey,
        |  length(p_name || ' cafe""" + "́" + """') AS len_raw,
        |  nfc_normalize(p_name || ' cafe""" + "́" + """') AS nfc,
        |  length(nfc_normalize(p_name || ' cafe""" + "́" + """')) AS len_nfc
        |FROM part ORDER BY p_partkey""").stripMargin,
    "q126_grouping_sets" ->
      """SELECT r_name, n_name,
        |  CAST(grouping(r_name) AS INT) AS g_r,
        |  CAST(grouping(n_name) AS INT) AS g_n,
        |  count(*) AS n_cust
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name), (r_name, n_name), ())
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q127_lateral_topk" ->
      """SELECT c_custkey, o_orderkey, price_cents
        |FROM customer c,
        |LATERAL (
        |  SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        |  FROM orders o WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c_custkey, price_cents DESC, o_orderkey""".stripMargin,
    "q128_window_suite" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  first_value(l_quantity) OVER w_full AS first_qty,
        |  nth_value(l_quantity, 2) OVER w_full AS second_qty,
        |  percent_rank() OVER w_ord AS pr,
        |  cume_dist() OVER w_ord AS cd
        |FROM lineitem
        |WINDOW
        |  w_full AS (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
        |  w_ord AS (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "q122_integrity_audit" ->
      """SELECT * FROM (VALUES
        |  ('orders_customer_fk', (SELECT count(*) FROM orders o
        |     WHERE o.o_custkey IS NOT NULL AND NOT EXISTS
        |       (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))),
        |  ('lineitem_orders_fk', (SELECT count(*) FROM lineitem l
        |     WHERE l.l_orderkey IS NOT NULL AND NOT EXISTS
        |       (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))),
        |  ('lineitem_part_fk', (SELECT count(*) FROM lineitem l
        |     WHERE l.l_partkey IS NOT NULL AND NOT EXISTS
        |       (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))),
        |  ('customer_nation_fk', (SELECT count(*) FROM customer c
        |     WHERE c.c_nationkey IS NOT NULL AND NOT EXISTS
        |       (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))),
        |  ('orders_pk_unique', (SELECT count(*) FROM
        |     (SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1))),
        |  ('lineitem_pk_unique', (SELECT count(*) FROM
        |     (SELECT l_orderkey, l_linenumber FROM lineitem
        |      GROUP BY 1, 2 HAVING count(*) > 1))),
        |  ('customer_name_not_null',
        |    (SELECT count(*) FROM customer WHERE c_name IS NULL)))
        |  AS v(check_name, n_violations)
        |ORDER BY check_name""".stripMargin,
    "q78_profile" ->
      """SELECT col_name, n, n_null, n_distinct, min, max FROM (
        |  SELECT 'p_partkey' AS col_name, count(*) AS n,
        |    count(*) - count(p_partkey) AS n_null,
        |    count(DISTINCT p_partkey) AS n_distinct,
        |    CAST(min(p_partkey) AS VARCHAR) AS min,
        |    CAST(max(p_partkey) AS VARCHAR) AS max
        |  FROM part
        |  UNION ALL
        |  SELECT 'p_brand', count(*), count(*) - count(p_brand),
        |    count(DISTINCT p_brand),
        |    CAST(min(p_brand) AS VARCHAR), CAST(max(p_brand) AS VARCHAR)
        |  FROM part
        |  UNION ALL
        |  SELECT 'p_type', count(*), count(*) - count(p_type),
        |    count(DISTINCT p_type),
        |    CAST(min(p_type) AS VARCHAR), CAST(max(p_type) AS VARCHAR)
        |  FROM part)
        |ORDER BY col_name""".stripMargin,
    // the same four magic-mask Morton spreading steps as Layout.spread16,
    // spelled as chained CTEs over BIGINT bit ops
    "q72_zorder" ->
      """WITH c AS (
        |  SELECT doc_id, CAST(doc_id % 97 AS BIGINT) AS x,
        |         CAST((doc_id * 7) % 89 AS BIGINT) AS y
        |  FROM documents),
        |s1 AS (SELECT doc_id, x, y,
        |  ((x | (x << 8)) & 16711935) AS xa, ((y | (y << 8)) & 16711935) AS ya FROM c),
        |s2 AS (SELECT doc_id, x, y,
        |  ((xa | (xa << 4)) & 252645135) AS xb, ((ya | (ya << 4)) & 252645135) AS yb FROM s1),
        |s3 AS (SELECT doc_id, x, y,
        |  ((xb | (xb << 2)) & 858993459) AS xc, ((yb | (yb << 2)) & 858993459) AS yc FROM s2),
        |s4 AS (SELECT doc_id, x, y,
        |  ((xc | (xc << 1)) & 1431655765) AS xd, ((yc | (yc << 1)) & 1431655765) AS yd FROM s3)
        |SELECT doc_id, x, y, (xd | (yd << 1)) AS z FROM s4
        |ORDER BY z, doc_id""".stripMargin,
    "q82_zorder3" ->
      s"""WITH c AS (
         |  SELECT doc_id, CAST(doc_id % 97 AS BIGINT) AS x,
         |         CAST((doc_id * 7) % 89 AS BIGINT) AS y,
         |         CAST((doc_id * 13) % 83 AS BIGINT) AS t3
         |  FROM documents)
         |SELECT doc_id, x, y, t3,
         |  (${sqlSpread3("x", 0, 8)}) |
         |  (${sqlSpread3("y", 1, 8)}) |
         |  (${sqlSpread3("t3", 2, 8)}) AS z
         |FROM c ORDER BY z, doc_id""".stripMargin,

    // percentile_disc closed form: smallest v whose cumulative count
    // reaches rank ceil(p·n/100) = (n·p+99)//100 — INTEGER rank math
    // on both sides (float division's representation error can cross
    // an integer boundary at exactly the ranks that matter)
    "q142_exact_quantiles" ->
      """WITH c AS (SELECT l_returnflag AS g,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
        |  FROM lineitem),
        |h AS (SELECT g, v, count(*) AS c FROM c GROUP BY 1, 2),
        |cum AS (SELECT g, v,
        |    sum(c) OVER (PARTITION BY g ORDER BY v) AS cum,
        |    sum(c) OVER (PARTITION BY g) AS n
        |  FROM h)
        |SELECT g AS l_returnflag, CAST(max(n) AS BIGINT) AS n,
        |  min(CASE WHEN cum >= (n * 25 + 99) // 100 THEN v END) AS p25,
        |  min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN v END) AS p50,
        |  min(CASE WHEN cum >= (n * 75 + 99) // 100 THEN v END) AS p75,
        |  min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN v END) AS p90,
        |  min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN v END) AS p99
        |FROM cum GROUP BY g ORDER BY l_returnflag""".stripMargin,

    // the sketch oracle recomputes bucket = (corrected-ilog2 octave,
    // 16 linear sub-buckets) natively — the float-log2 boundary
    // correction (compare against pow(2, b)) is the same closed form
    // the Spark side runs, so engines cannot disagree at octave edges
    "q145_sketch_quantiles" ->
      """WITH c AS (SELECT l_returnflag AS g,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
        |  FROM lineitem),
        |e0 AS (SELECT g, v, CAST(floor(log2(v)) AS BIGINT) AS b0 FROM c),
        |e1 AS (SELECT g, v,
        |    CASE WHEN pow(2, b0 + 1) <= v THEN b0 + 1
        |         WHEN pow(2, b0) > v THEN b0 - 1
        |         ELSE b0 END AS e
        |  FROM e0),
        |bk AS (SELECT g, e,
        |    (v - (1::BIGINT << CAST(e AS INT))) * 16
        |      // (1::BIGINT << CAST(e AS INT)) AS sub
        |  FROM e1),
        |h AS (SELECT g, e, sub, count(*) AS c FROM bk GROUP BY 1, 2, 3),
        |lob AS (SELECT g, e, sub, c,
        |    (1::BIGINT << CAST(e AS INT))
        |      + sub * (1::BIGINT << CAST(e AS INT)) // 16 AS lo
        |  FROM h),
        |cum AS (SELECT g, lo,
        |    sum(c) OVER (PARTITION BY g ORDER BY e, sub) AS cum,
        |    sum(c) OVER (PARTITION BY g) AS n
        |  FROM lob),
        |sk AS (SELECT g, CAST(max(n) AS BIGINT) AS n,
        |    CAST(min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN lo END) AS BIGINT) AS est_p50,
        |    CAST(min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN lo END) AS BIGINT) AS est_p90,
        |    CAST(min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN lo END) AS BIGINT) AS est_p99
        |  FROM cum GROUP BY g),
        |vh AS (SELECT g, v, count(*) AS c FROM c GROUP BY 1, 2),
        |vcum AS (SELECT g, v,
        |    sum(c) OVER (PARTITION BY g ORDER BY v) AS cum,
        |    sum(c) OVER (PARTITION BY g) AS n
        |  FROM vh),
        |ex AS (SELECT g,
        |    min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN v END) AS p50,
        |    min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN v END) AS p90,
        |    min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN v END) AS p99
        |  FROM vcum GROUP BY g)
        |SELECT g AS l_returnflag, n,
        |  est_p50, p50, abs(est_p50 - p50) * 1000000 // p50 AS err50_micro,
        |  est_p90, p90, abs(est_p90 - p90) * 1000000 // p90 AS err90_micro,
        |  est_p99, p99, abs(est_p99 - p99) * 1000000 // p99 AS err99_micro
        |FROM sk JOIN ex USING (g) ORDER BY l_returnflag""".stripMargin,

    // percentile_cont closed form ×100: v at 0-based rank r ⟺ the
    // smallest v with cum ≥ r+1; f = 0 leaves the (null) upper probe
    // coalesced to the lower
    "q149_cont_quantiles" ->
      """WITH c AS (SELECT l_returnflag AS g,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
        |  FROM lineitem),
        |h AS (SELECT g, v, count(*) AS c FROM c GROUP BY 1, 2),
        |cum AS (SELECT g, v,
        |    sum(c) OVER (PARTITION BY g ORDER BY v) AS cum,
        |    sum(c) OVER (PARTITION BY g) AS n
        |  FROM h),
        |a AS (SELECT g, CAST(max(n) AS BIGINT) AS n,
        |    min(CASE WHEN cum >= (n - 1) * 25 // 100 + 1 THEN v END) AS lo25,
        |    min(CASE WHEN cum >= (n - 1) * 25 // 100 + 2 THEN v END) AS hi25,
        |    min(CASE WHEN cum >= (n - 1) * 50 // 100 + 1 THEN v END) AS lo50,
        |    min(CASE WHEN cum >= (n - 1) * 50 // 100 + 2 THEN v END) AS hi50,
        |    min(CASE WHEN cum >= (n - 1) * 90 // 100 + 1 THEN v END) AS lo90,
        |    min(CASE WHEN cum >= (n - 1) * 90 // 100 + 2 THEN v END) AS hi90
        |  FROM cum GROUP BY g)
        |SELECT g AS l_returnflag, n,
        |  lo25 * (100 - (n - 1) * 25 % 100)
        |    + coalesce(hi25, lo25) * ((n - 1) * 25 % 100) AS p25_x100,
        |  lo50 * (100 - (n - 1) * 50 % 100)
        |    + coalesce(hi50, lo50) * ((n - 1) * 50 % 100) AS p50_x100,
        |  lo90 * (100 - (n - 1) * 90 % 100)
        |    + coalesce(hi90, lo90) * ((n - 1) * 90 % 100) AS p90_x100
        |FROM a ORDER BY l_returnflag""".stripMargin,

    // the q72 Morton chain feeds native ntile(64) file assignment —
    // the ntileExact equivalence (q121) carries over; zone-map overlap
    // spelled with the same CASE both sides
    "q158_zorder_pruning" -> {
      def layout(src: String, m: String, label: String) =
        s"""SELECT '$label' AS layout,
           |  CAST(count(*) AS BIGINT) AS n_files,
           |  CAST(sum(CASE WHEN maxx >= 10 AND minx <= 30
           |                 AND maxy >= 20 AND miny <= 40
           |            THEN 1 ELSE 0 END) AS BIGINT) AS files_touched,
           |  CAST(sum(matched) AS BIGINT) AS rows_matched,
           |  CAST(sum(CASE WHEN maxx >= 10 AND minx <= 30
           |                 AND maxy >= 20 AND miny <= 40
           |            THEN n ELSE 0 END) AS BIGINT) AS rows_scanned
           |FROM (
           |  SELECT f, min(x) AS minx, max(x) AS maxx,
           |    min(y) AS miny, max(y) AS maxy, count(*) AS n,
           |    sum(CASE WHEN x BETWEEN 10 AND 30 AND y BETWEEN 20 AND 40
           |        THEN 1 ELSE 0 END) AS matched
           |  FROM (SELECT x, y, ntile(64) OVER (ORDER BY $m, doc_id) AS f
           |        FROM $src)
           |  GROUP BY f)""".stripMargin
      s"""WITH c AS (
         |  SELECT doc_id, CAST(doc_id % 97 AS BIGINT) AS x,
         |         CAST((doc_id * 7) % 89 AS BIGINT) AS y
         |  FROM documents),
         |s1 AS (SELECT doc_id, x, y,
         |  ((x | (x << 8)) & 16711935) AS xa, ((y | (y << 8)) & 16711935) AS ya FROM c),
         |s2 AS (SELECT doc_id, x, y,
         |  ((xa | (xa << 4)) & 252645135) AS xb, ((ya | (ya << 4)) & 252645135) AS yb FROM s1),
         |s3 AS (SELECT doc_id, x, y,
         |  ((xb | (xb << 2)) & 858993459) AS xc, ((yb | (yb << 2)) & 858993459) AS yc FROM s2),
         |s4 AS (SELECT doc_id, x, y,
         |  ((xc | (xc << 1)) & 1431655765) AS xd, ((yc | (yc << 1)) & 1431655765) AS yd FROM s3),
         |zf AS (SELECT doc_id, x, y, (xd | (yd << 1)) AS z FROM s4)
         |SELECT * FROM (
         |  ${layout("zf", "z", "zorder")}
         |  UNION ALL
         |  ${layout("zf", "doc_id", "linear")})
         |ORDER BY layout""".stripMargin
    },

    "q193_fd_discovery" -> {
      def fd(a: String, b: String) =
        s"""SELECT '$a' AS lhs, '$b' AS rhs,
           |  CAST(count(DISTINCT $a) AS BIGINT) AS n_lhs,
           |  CAST(count(*) AS BIGINT) AS n_pairs,
           |  CAST(count(*) - count(DISTINCT $a) AS BIGINT) AS violations,
           |  count(*) = count(DISTINCT $a) AS holds
           |FROM (SELECT DISTINCT $a, $b FROM j)""".stripMargin
      s"""WITH j AS (SELECT * FROM customer
         |  JOIN nation ON c_nationkey = n_nationkey)
         |SELECT * FROM (
         |${Seq(("c_custkey", "c_name"), ("c_nationkey", "n_name"),
             ("n_name", "n_regionkey"), ("n_regionkey", "n_name"),
             ("c_mktsegment", "c_nationkey"))
             .map { case (a, b) => fd(a, b) }
             .mkString("(", ")\nUNION ALL\n(", ")")})
         |ORDER BY lhs, rhs""".stripMargin
    },

    "q194_fk_discovery" -> {
      def ind(cn: String, ct: String, cc: String,
          pn: String, pt: String, pc: String) =
        s"""SELECT '$cn.$cc' AS child, '$pn.$pc' AS parent,
           |  (SELECT CAST(count(DISTINCT $cc) AS BIGINT) FROM $ct
           |     WHERE $cc IS NOT NULL) AS n_child,
           |  (SELECT CAST(count(*) AS BIGINT) FROM
           |     (SELECT DISTINCT $cc AS v FROM $ct WHERE $cc IS NOT NULL)
           |     WHERE v IN (SELECT $pc FROM $pt WHERE $pc IS NOT NULL))
           |    AS n_contained""".stripMargin
      val rows = Seq(
        ("lineitem", "lineitem", "l_orderkey", "orders", "orders", "o_orderkey"),
        ("orders", "orders", "o_custkey", "customer", "customer", "c_custkey"),
        ("lineitem", "lineitem", "l_suppkey", "supplier", "supplier", "s_suppkey"),
        ("orders", "orders", "o_orderkey", "lineitem", "lineitem", "l_orderkey"),
        ("customer", "customer", "c_custkey", "orders", "orders", "o_custkey"))
        .map { case (cn, ct, cc, pn, pt, pc) => ind(cn, ct, cc, pn, pt, pc) }
        .mkString("(", ")\nUNION ALL\n(", ")")
      s"""SELECT child, parent, n_child, n_contained,
         |  CASE WHEN n_child = 0 THEN 1000000
         |    ELSE CAST(n_contained * 1000000 // n_child AS BIGINT)
         |    END AS containment_micro,
         |  n_contained = n_child AS holds
         |FROM ($rows)
         |ORDER BY child, parent""".stripMargin
    },

    "q176_benford" ->
      """WITH d AS (
        |  SELECT substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |      AS VARCHAR), 1, 1)::INT AS digit
        |  FROM orders),
        |g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs
        |  FROM d WHERE digit >= 1 GROUP BY 1),
        |t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM g)
        |SELECT digit, n_obs,
        |  CAST(n_obs * 1000000 // n AS BIGINT) AS obs_micro,
        |  CAST(floor(ln(1 + 1.0 / digit) / ln(10) * 1000000 + 0.5) AS BIGINT)
        |    AS exp_micro,
        |  CAST(abs(n_obs * 1000000 // n
        |    - CAST(floor(ln(1 + 1.0 / digit) / ln(10) * 1000000 + 0.5)
        |        AS BIGINT)) AS BIGINT) AS dev_micro
        |FROM g CROSS JOIN t ORDER BY digit""".stripMargin,

    // brute-force dominance: a part survives iff nothing is
    // cheaper-or-equal AND larger-or-equal with one strict
    "q177_skyline" ->
      """WITH p AS (SELECT p_partkey,
        |    CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents,
        |    p_size
        |  FROM part)
        |SELECT p_partkey, price_cents, p_size FROM p a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM p b
        |  WHERE b.price_cents <= a.price_cents AND b.p_size >= a.p_size
        |    AND (b.price_cents < a.price_cents OR b.p_size > a.p_size))
        |ORDER BY p_partkey""".stripMargin,

    "q159_unpivot" ->
"""WITH b AS (SELECT p_partkey,
        |    CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS retail_cents,
        |    CAST(p_size AS BIGINT) AS sz,
        |    CAST(length(p_name) AS BIGINT) AS name_len
        |  FROM part)
        |SELECT p_partkey, metric, val FROM (
        |  SELECT p_partkey, 'retail_cents' AS metric, retail_cents AS val FROM b
        |  UNION ALL SELECT p_partkey, 'size', sz FROM b
        |  UNION ALL SELECT p_partkey, 'name_len', name_len FROM b)
        |ORDER BY p_partkey, metric""".stripMargin,

    "q167_weighted_quantiles" ->
      """WITH c AS (SELECT l_returnflag AS g,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v,
        |    CAST(l_quantity AS BIGINT) AS w
        |  FROM lineitem),
        |h AS (SELECT g, v, sum(w) AS c FROM c GROUP BY 1, 2),
        |cum AS (SELECT g, v,
        |    sum(c) OVER (PARTITION BY g ORDER BY v) AS cum,
        |    sum(c) OVER (PARTITION BY g) AS n
        |  FROM h)
        |SELECT g AS l_returnflag, CAST(max(n) AS BIGINT) AS total_weight,
        |  min(CASE WHEN cum >= (n * 25 + 99) // 100 THEN v END) AS p25,
        |  min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN v END) AS p50,
        |  min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN v END) AS p90
        |FROM cum GROUP BY g ORDER BY l_returnflag""".stripMargin,

    // hugeint moments mirror the Spark DECIMAL(38,0); the correlation
    // closed form runs on once-cast doubles of identical exact integers
    "q162_corr_matrix" -> {
      val names = Seq("qty", "cents", "disc", "tax")
      val pairs = for (i <- names.indices; j <- i + 1 until names.size)
        yield (names(i), names(j))
      def corrExpr(a: String, b: String) =
        s"""CASE
           |  WHEN (n * q_$a - s_$a * s_$a) = 0 OR (n * q_$b - s_$b * s_$b) = 0
           |  THEN CAST(NULL AS BIGINT)
           |  ELSE CAST(floor(
           |    CAST(n * x_${a}_$b - s_$a * s_$b AS DOUBLE)
           |    / sqrt(CAST(n * q_$a - s_$a * s_$a AS DOUBLE)
           |           * CAST(n * q_$b - s_$b * s_$b AS DOUBLE))
           |    * 1000000 + 0.5) AS BIGINT)
           |END""".stripMargin
      val momentSelects =
        names.map(n => s"sum(CAST($n AS HUGEINT)) AS s_$n") ++
        names.map(n => s"sum(CAST($n AS HUGEINT) * $n) AS q_$n") ++
        pairs.map { case (a, b) => s"sum(CAST($a AS HUGEINT) * $b) AS x_${a}_$b" }
      val pairSelects = pairs.map { case (a, b) =>
        s"SELECT '$a' AS var_a, '$b' AS var_b, n, ${corrExpr(a, b)} AS corr_micro FROM m"
      }
      s"""WITH b AS (SELECT CAST(l_quantity AS BIGINT) AS qty,
         |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
         |    CAST(floor(l_discount * 1000000 + 0.5) AS BIGINT) AS disc,
         |    CAST(floor(l_tax * 1000000 + 0.5) AS BIGINT) AS tax
         |  FROM lineitem),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |  ${momentSelects.mkString(",\n  ")}
         |  FROM b)
         |SELECT var_a, var_b, n, corr_micro FROM (
         |  ${pairSelects.mkString("\n  UNION ALL\n  ")})
         |ORDER BY var_a, var_b""".stripMargin
    },

    "q160_mode" ->
      """WITH h AS (SELECT l_returnflag AS g,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (SELECT g, v, c,
        |    row_number() OVER (PARTITION BY g ORDER BY c DESC, v) AS rnk,
        |    CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS nd
        |  FROM h)
        |SELECT g AS l_returnflag, v AS mode_cents, c AS mode_count,
        |  nd AS n_distinct
        |FROM r WHERE rnk = 1 ORDER BY l_returnflag""".stripMargin
  )
}
