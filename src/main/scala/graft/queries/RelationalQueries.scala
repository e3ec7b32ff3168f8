package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational coverage queries (SURVEY.md §2.B): scans, projection/filter,
  * joins (incl. semi/anti), aggregation (incl. rollup/cube), windows, set
  * ops, scalar functions, sorts/top-k, quantiles.
  *
  * Conventions for the differential oracle (driver hash-compares against
  * DuckDB, sorting columns by name):
  *   - every computed column is aliased identically here and in the SQL;
  *   - every query ends with a deterministic ORDER BY over key columns;
  *   - floating-point aggregates are round()ed;
  *   - integer-typed aggregates are kept BIGINT on both sides (DuckDB
  *     sum(int) is HUGEINT → cast in the oracle SQL).
  *
  * Scale notes are per-query; the global stance: group-bys are partial-agg
  * friendly (low-cardinality keys), joins broadcast the dimension side,
  * filters/projections sit directly on the parquet scan so pushdown and
  * column pruning apply.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** q46's raw per-group sketch estimates (HLL user count at rsd 0.01,
    * percentile_approx median at accuracy 1000) — the engine-specific
    * half. The registered q46 layers the cross-engine decision columns
    * on top; ApproxSketchSpec bounds these raw values directly against
    * the exact aggregates.
    */
  private[graft] def approxSketchEstimates(s: SparkSession,
                                           dir: String): DataFrame =
    t(s, dir, "events").groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
        expr("percentile_approx(value, 0.5, 1000)").as("p50_approx"),
        count(lit(1)).as("n"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- Aggregation ---------------------------------------------------
    // TPC-H Q1 shape: low-cardinality groupBy → map-side partial agg does
    // almost all the work; shuffle carries ~6 rows per partition at any SF.
    "q1_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // -- Projection + filter (pushdown check) --------------------------
    "q2_filter_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_quantity") > 45 && col("l_discount") < 0.02)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          round(col("l_extendedprice"), 2).as("price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // -- Join: fact ⋈ dims, dims broadcast ------------------------------
    // customer/nation/region are tiny at every SF → broadcast them; the
    // only shuffle is the groupBy, keyed on n_name (25 values).
    "q3_join_agg" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          round(sum(col("c_acctbal")), 2).as("total_bal"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // -- Join: semi / anti ----------------------------------------------
    "q4_semi_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem").filter(col("l_quantity") > 49)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),
    "q5_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_no_urgent"))
        .orderBy(col("c_mktsegment"))
    }),

    // -- Window functions ------------------------------------------------
    // Top-3 orders per customer segment by price: partition by segment →
    // 5 partitions is too few to parallelize at 100 TB, but each group's
    // sort is a local partial top-k under rank pushdown (WindowGroupLimit
    // in Spark 3.5+/4.x pushes k=3 into the sort).
    "q6_window_topk" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val joined = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      joined
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("c_mktsegment"), col("rk"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"))
        .orderBy(col("c_mktsegment"), col("rk"))
    }),
    "q7_window_running" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = t(s, dir, "orders").filter(col("o_orderkey") <= 1000)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      o.select(
          col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
            .as("running_total"),
          lag(col("o_orderkey"), 1).over(w).as("prev_orderkey"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // -- Set operations ---------------------------------------------------
    "q8_set_ops" -> ((s, dir) => {
      val big = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
        .select(col("o_custkey"))
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      big.intersect(urgent)
        .union(t(s, dir, "orders").filter(col("o_totalprice") > 550000)
          .select(col("o_custkey")))
        .except(t(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey")))
        .distinct()
        .orderBy(col("o_custkey"))
    }),

    // -- Rollup / cube ------------------------------------------------------
    "q9_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // -- Scalar functions: string/date/math --------------------------------
    "q10_scalar_fns" -> ((s, dir) => {
      t(s, dir, "part").filter(col("p_partkey") <= 500)
        .select(
          col("p_partkey"),
          upper(substring(col("p_name"), 1, 8)).as("name_prefix"),
          length(col("p_name")).as("name_len"),
          regexp_replace(col("p_type"), "[aeiou]", "").as("type_novowel"),
          round(pow(col("p_size").cast("double"), 1.5), 4).as("size_pow"),
          (floor(col("p_retailprice")).cast("bigint") % 10).as("price_mod"))
        .orderBy(col("p_partkey"))
    }),
    "q11_date_fns" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") <= 2000)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          datediff(lit("1998-12-31").cast("date"), col("o_orderdate").cast("date"))
            .cast("bigint").as("days_to_eoy"))
        .orderBy(col("o_orderkey"))
    }),

    // -- Semi-structured: JSON in events.props -----------------------------
    "q12_json_events" -> ((s, dir) => {
      val e = t(s, dir, "events")
      e.select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("bigint").as("k"))
        .groupBy(col("event_type"), (col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"), col("k_bucket").asc_nulls_first)
    }),

    // -- Sorts / limits / top-k --------------------------------------------
    "q13_topk_global" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
    }),

    // -- Quantiles -----------------------------------------------------------
    // Exact percentile keeps the oracle comparable (DuckDB quantile_cont);
    // at 100 TB swap to approx_percentile (t-digest) — see q15.
    "q14_quantiles" -> ((s, dir) => {
      // Two-phase selection quantiles (see AggOps.exactQuantilesBySelection):
      // lineitem has only 3 l_returnflag groups, so the sort-window variant
      // would funnel a third of the table through ONE task — fatal at 100 TB.
      // Selection keeps per-task work to a bucket (#groups × numBuckets
      // parallelism) while staying exact; 0.0/1.0 probs double as min/max.
      graft.ext.AggOps.exactQuantilesBySelection(
          t(s, dir, "lineitem").select(col("l_returnflag"), col("l_extendedprice")),
          Seq("l_returnflag"), "l_extendedprice",
          Seq("p50" -> 0.5, "p90" -> 0.9, "mn" -> 0.0, "mx" -> 1.0))
        .select(col("l_returnflag"),
          round(col("p50"), 2).as("p50"), round(col("p90"), 2).as("p90"),
          round(col("mn"), 2).as("mn"), round(col("mx"), 2).as("mx"))
        .orderBy(col("l_returnflag"))
    }),

    // -- Multi-join: TPC-H Q5 shape ------------------------------------------
    // lineitem⋈orders shuffles on orderkey once; every dimension broadcasts.
    "q15_local_supplier_volume" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem"); val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey") &&
          c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("n_name"))
    }),

    // -- Grouped distinct counting -------------------------------------------
    "q16_distinct_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"))
        .orderBy(col("l_returnflag"))
    }),

    // -- CASE / conditional aggregation ----------------------------------------
    "q17_case_agg" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L))
            .as("n_urgent"),
          sum(when(col("o_totalprice") > 200000, col("o_totalprice"))
            .otherwise(0.0)).cast("double").as("big_total_raw"))
        .withColumn("big_total", round(col("big_total_raw"), 2))
        .drop("big_total_raw")
        .orderBy(col("o_orderstatus"))
    }),

    // -- Array / higher-order functions -----------------------------------------
    "q18_array_fns" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
        .select(col("doc_id"),
          size(col("toks")).as("n_tokens"),
          size(array_distinct(col("toks"))).as("n_distinct"))
        .orderBy(col("doc_id"))
    }),

    // -- Time-windowed event aggregation (batch analog of streaming window) ----
    "q19_event_windows" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
        .select(col("w.start").as("w_start"), col("event_type"), col("n"),
          col("total"))
        .orderBy(col("w_start"), col("event_type"))
    }),

    // -- Correlated-subquery shape (decorrelated as join) -----------------------
    // "parts priced above their brand average": window avg avoids the
    // self-join; one shuffle on p_brand.
    "q20_above_brand_avg" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("p_brand"))
      // Output sums/counts, not rounded averages: a rounded quotient can sit
      // exactly on a .005 boundary and flip between engines on the last bit.
      t(s, dir, "part")
        .withColumn("brand_avg", avg(col("p_retailprice")).over(w))
        .withColumn("brand_sum", sum(col("p_retailprice")).over(w))
        .withColumn("n_in_brand", count(lit(1)).over(w))
        .filter(col("p_retailprice") > col("brand_avg") * 1.05)
        .select(col("p_partkey"), col("p_brand"),
          round(col("p_retailprice"), 2).as("price"),
          round(col("brand_sum"), 2).as("brand_sum"),
          col("n_in_brand"))
        .orderBy(col("p_partkey"))
    }),

    // -- Full outer join -----------------------------------------------
    // Both sides pre-aggregate to ≤|custkey| rows BEFORE the join, and both
    // shuffles hash on o_custkey, so the join itself adds no exchange
    // (Catalyst reuses the childrens' partitioning).
    "q40_full_outer" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val a = o.filter(year(col("o_orderdate")) === 1995)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n95"))
      val b = o.filter(year(col("o_orderdate")) === 1996)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n96"))
      a.join(b, Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          coalesce(col("n95"), lit(0L)).as("n95"),
          coalesce(col("n96"), lit(0L)).as("n96"))
        .orderBy(col("o_custkey"))
    }),

    // -- Pivot ----------------------------------------------------------
    // Explicit value list keeps pivot a single pass (no distinct-values
    // pre-query) and the output schema static — required at scale.
    "q41_pivot" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy(col("o_orderpriority"))),

    // -- Grouping sets + grouping() markers ------------------------------
    "q42_grouping_sets" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping(col("o_orderstatus")).cast("int").as("g_status"),
          grouping(col("o_orderpriority")).cast("int").as("g_prio"),
          count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)),

    // -- from_json into a typed struct (vs q12's get_json_object) --------
    "q43_from_json" -> ((s, dir) =>
      t(s, dir, "events")
        .withColumn("p", from_json(col("props"), lit("k INT")))
        .filter(col("p.k") >= 95)
        .select(col("event_id"), col("event_type"), col("p.k").as("k"))
        .orderBy(col("event_id"))),

    // -- Multiset set ops (EXCEPT ALL / INTERSECT ALL) -------------------
    "q44_multiset_ops" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val a = o.filter(col("o_totalprice") > 150000).select(col("o_custkey"))
      val b = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      val ex = a.exceptAll(b)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_except"))
      val in = a.intersectAll(b)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_intersect"))
      ex.join(in, Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          coalesce(col("n_except"), lit(0L)).as("n_except"),
          coalesce(col("n_intersect"), lit(0L)).as("n_intersect"))
        .orderBy(col("o_custkey"))
    }),

    // -- RANGE window frame over time (vs q7's ROWS frame) ---------------
    // RANGE includes date peers on both engines, so ties in o_orderdate
    // don't make the frame sum order-dependent.
    "q45_range_frame" -> ((s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") <= 2000)
        .select(col("o_custkey"), col("o_orderkey"),
          expr("""round(sum(o_totalprice) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate
            RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW), 2)""")
            .as("sum_7d"))
        .orderBy(col("o_custkey"), col("o_orderkey"))),

    // -- Approximate sketches (HLL + quantile) ---------------------------
    // Sketch ESTIMATES differ per engine by design, so the registered
    // result is the engine-independent DECISION layer: each group's HLL
    // user count and approximate median are compared in-plan against the
    // exact values (q61's own machinery) and the error-bound verdicts are
    // what cross the engine boundary — every verdict must be `true`, and
    // the DuckDB oracle says exactly that from the exact side alone. The
    // raw estimates stay bounded in ApproxSketchSpec. These are THE
    // 100 TB aggregation path: both sketches are fixed-size mergeable
    // partials, so the shuffle carries bytes-per-group, not
    // values-per-group (HLL rsd pinned at 0.01 so the 5% decision bound
    // is a 5-sigma margin, deterministic for a given dataset).
    "q46_approx_sketch" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val approx = approxSketchEstimates(s, dir)
        .select(col("event_type"), col("approx_users").as("__au"),
          col("p50_approx").as("__ap"), col("n"))
      val exact = e.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("__eu"))
      val med = graft.ext.AggOps.exactQuantilesBySelection(
          e.select(col("event_type"), col("value")),
          Seq("event_type"), "value", Seq("p50" -> 0.5))
        .select(col("event_type").as("__et"), col("p50").as("__ep"))
      approx.join(exact, Seq("event_type"))
        .join(broadcast(med), col("event_type") <=> col("__et"), "left")
        .select(col("event_type"),
          (abs(col("__au") - col("__eu")) <= col("__eu") * 0.05)
            .as("users_within_5pct"),
          // an all-NULL value group has no exact quantile row AND a null
          // sketch median — that agreement is a pass, not a null verdict
          coalesce(
            abs(col("__ap") - col("__ep")) <=
              greatest(abs(col("__ep")) * 0.05, lit(0.05)),
            col("__ap").isNull && col("__ep").isNull).as("p50_within_5pct"),
          col("n"))
        .orderBy(col("event_type"))
    }),

    // Exact companion to q46: the same aggregates computed exactly, so the
    // sketch-free half of the operator carries a full DuckDB oracle (q46
    // itself stays rows-only — sketch internals differ per engine by
    // design). Exact median reuses q14's selection-based quantile: no
    // per-group sort funnel, candidate buckets bound per-task work.
    "q61_sketch_exact" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val base = e.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n"))
      val med = graft.ext.AggOps.exactQuantilesBySelection(
          e.select(col("event_type"), col("value")),
          Seq("event_type"), "value", Seq("p50" -> 0.5))
        .select(col("event_type").as("__et"), round(col("p50"), 2).as("p50"))
      // LEFT join, null-safe on the group key: a group whose values are
      // all NULL gets no quantile row (quantile_cont semantics), but the
      // oracle's single GROUP BY still emits it with p50 NULL — an inner
      // join would silently drop the whole group; <=> keeps a NULL
      // event_type group matched with its own quantile row
      base.join(broadcast(med), col("event_type") <=> col("__et"), "left")
        .select(col("event_type"), col("n_users"), col("p50"), col("n"))
        .orderBy(col("event_type"))
    }),

    // -- Scalar subquery (uncorrelated) ----------------------------------
    // The 1-row aggregate broadcasts; the big side never shuffles.
    "q47_scalar_subquery" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val avgPrice = o.agg(avg(col("o_totalprice")).as("avg_price"))
      o.crossJoin(broadcast(avgPrice))
        .filter(col("o_totalprice") > col("avg_price") * 1.8)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
        .orderBy(col("o_orderkey"))
    }),

    // -- Correlated LATERAL subquery with LIMIT (top-k per outer row) ----
    // Through spark.sql — the same path model files execute on. Catalyst
    // decorrelates the lateral into a window-style per-group limit rather
    // than running |customer| subqueries.
    "q48_lateral_topk" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""SELECT c.c_custkey, o.o_orderkey, o.price
        FROM customer c, LATERAL (
          SELECT o_orderkey, round(o_totalprice, 2) AS price
          FROM orders WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        WHERE c.c_custkey <= 200
        ORDER BY c.c_custkey, price DESC, o.o_orderkey""")
    }),

    // -- Map functions: literal map build + lookup + keys ----------------
    // The oracle re-expresses the lookup as CASE — same result, proving
    // the map path produces cross-checkable values.
    "q50_map_fns" -> ((s, dir) => {
      val statusMap = map(
        lit("F"), lit("finished"), lit("O"), lit("open"),
        lit("P"), lit("pending"))
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          element_at(statusMap, col("o_orderstatus")).as("status_label"),
          size(map_keys(statusMap)).as("n_labels"))
        .groupBy(col("status_label"), col("n_labels"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("status_label"))
    }),

    // -- Recursive CTE (Spark 4 WITH RECURSIVE) --------------------------
    // Dimension generated by recursion, fact left-joined so empty months
    // still appear.
    "q49_recursive_cte" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""WITH RECURSIVE m(mo) AS (
          SELECT 1 UNION ALL SELECT mo + 1 FROM m WHERE mo < 12)
        SELECT m.mo, count(o_orderkey) AS n,
          round(coalesce(sum(o_totalprice), 0), 2) AS total
        FROM m LEFT JOIN orders
          ON month(o_orderdate) = m.mo AND year(o_orderdate) = 1995
        GROUP BY m.mo ORDER BY m.mo""")
    })
  )

  /** DuckDB oracle SQL — column names and ordering must match the Spark side
    * exactly (driver sorts columns by name before hashing).
    */
  val oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  round(l_extendedprice, 2) AS price
        |FROM lineitem
        |WHERE l_quantity > 45 AND l_discount < 0.02
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q3_join_agg" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        |  round(sum(c_acctbal), 2) AS total_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q4_semi_join" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 49)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q5_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_no_urgent
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q6_window_topk" ->
      """SELECT c_mktsegment, rk, o_orderkey, price FROM (
        |  SELECT c_mktsegment,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk,
        |    o_orderkey, round(o_totalprice, 2) AS price
        |  FROM orders JOIN customer ON o_custkey = c_custkey) t
        |WHERE rk <= 3
        |ORDER BY c_mktsegment, rk""".stripMargin,
    "q7_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |    AS running_total,
        |  lag(o_orderkey, 1) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS prev_orderkey
        |FROM orders WHERE o_orderkey <= 1000
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q8_set_ops" ->
      """SELECT DISTINCT o_custkey FROM (
        |  (SELECT o_custkey FROM orders WHERE o_totalprice > 400000
        |   INTERSECT
        |   SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |  UNION ALL
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 550000
        |) u
        |WHERE o_custkey NOT IN
        |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_custkey""".stripMargin,
    "q9_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 2) AS qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q10_scalar_fns" ->
      """SELECT p_partkey,
        |  upper(substring(p_name, 1, 8)) AS name_prefix,
        |  length(p_name) AS name_len,
        |  regexp_replace(p_type, '[aeiou]', '', 'g') AS type_novowel,
        |  round(pow(CAST(p_size AS DOUBLE), 1.5), 4) AS size_pow,
        |  CAST(floor(p_retailprice) AS BIGINT) % 10 AS price_mod
        |FROM part WHERE p_partkey <= 500
        |ORDER BY p_partkey""".stripMargin,
    "q11_date_fns" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  CAST(month(o_orderdate) AS INTEGER) AS mo,
        |  CAST(day(o_orderdate) AS INTEGER) AS dom,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')
        |       AS BIGINT) AS days_to_eoy
        |FROM orders WHERE o_orderkey <= 2000
        |ORDER BY o_orderkey""".stripMargin,
    "q12_json_events" ->
      """SELECT event_type,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
        |  count(*) AS n
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY event_type, k_bucket NULLS FIRST""".stripMargin,
    "q13_topk_global" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 25""".stripMargin,
    "q61_sketch_exact" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS n_users,
        |  round(quantile_cont(value, 0.5), 2) AS p50,
        |  count(*) AS n
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // q46: the registered result is the DECISION layer — the sketch
    // estimates (engine-specific by design) are compared against the
    // exact values inside the Spark plan, and only the error-bound
    // verdicts cross the engine boundary. The exact side can state those
    // verdicts a priori: every group must pass.
    "q46_approx_sketch" ->
      """SELECT event_type,
        |  true AS users_within_5pct,
        |  true AS p50_within_5pct,
        |  count(*) AS n
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q14_quantiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 2) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.9), 2) AS p90,
        |  round(min(l_extendedprice), 2) AS mn,
        |  round(max(l_extendedprice), 2) AS mx
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q15_local_supplier_volume" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "q16_distinct_agg" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_suppkey) AS n_supp,
        |  count(DISTINCT l_partkey) AS n_part
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q17_case_agg" ->
      """SELECT o_orderstatus,
        |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_urgent,
        |  round(sum(CASE WHEN o_totalprice > 200000 THEN o_totalprice
        |                 ELSE 0.0 END), 2) AS big_total
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "q18_array_fns" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(text, '\s+')) AS INTEGER)
        |    AS n_tokens,
        |  CAST(len(list_distinct(regexp_split_to_array(text, '\s+')))
        |    AS INTEGER) AS n_distinct
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q19_event_windows" ->
      """SELECT time_bucket(INTERVAL '1 day', ts) AS w_start, event_type,
        |  count(*) AS n, round(sum(value), 2) AS total
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY w_start, event_type""".stripMargin,
    "q20_above_brand_avg" ->
      """SELECT p_partkey, p_brand, round(p_retailprice, 2) AS price,
        |  round(brand_sum, 2) AS brand_sum, n_in_brand
        |FROM (SELECT p_partkey, p_brand, p_retailprice,
        |        avg(p_retailprice) OVER (PARTITION BY p_brand) AS brand_avg,
        |        sum(p_retailprice) OVER (PARTITION BY p_brand) AS brand_sum,
        |        count(*) OVER (PARTITION BY p_brand) AS n_in_brand
        |      FROM part) t
        |WHERE p_retailprice > brand_avg * 1.05
        |ORDER BY p_partkey""".stripMargin,
    "q40_full_outer" ->
      """SELECT o_custkey, coalesce(a.n95, 0) AS n95, coalesce(b.n96, 0) AS n96
        |FROM (SELECT o_custkey, count(*) AS n95 FROM orders
        |      WHERE year(o_orderdate) = 1995 GROUP BY 1) a
        |FULL OUTER JOIN
        |     (SELECT o_custkey, count(*) AS n96 FROM orders
        |      WHERE year(o_orderdate) = 1996 GROUP BY 1) b
        |USING (o_custkey)
        |ORDER BY o_custkey""".stripMargin,
    "q41_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q42_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
        |  CAST(grouping(o_orderpriority) AS INTEGER) AS g_prio,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q43_from_json" ->
      """SELECT event_id, event_type,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) >= 95
        |ORDER BY event_id""".stripMargin,
    "q44_multiset_ops" ->
      """WITH a AS (SELECT o_custkey FROM orders WHERE o_totalprice > 150000),
        |b AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
        |ex AS (SELECT o_custkey, count(*) AS n_except
        |       FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY 1),
        |i AS (SELECT o_custkey, count(*) AS n_intersect
        |      FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY 1)
        |SELECT o_custkey, coalesce(ex.n_except, 0) AS n_except,
        |  coalesce(i.n_intersect, 0) AS n_intersect
        |FROM ex FULL OUTER JOIN i USING (o_custkey)
        |ORDER BY o_custkey""".stripMargin,
    "q45_range_frame" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW), 2)
        |    AS sum_7d
        |FROM orders WHERE o_orderkey <= 2000
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q47_scalar_subquery" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price
        |FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 1.8
        |ORDER BY o_orderkey""".stripMargin,
    "q48_lateral_topk" ->
      """SELECT c.c_custkey, o.o_orderkey, o.price
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, round(o_totalprice, 2) AS price
        |  FROM orders WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |WHERE c.c_custkey <= 200
        |ORDER BY c.c_custkey, price DESC, o.o_orderkey""".stripMargin,
    "q50_map_fns" ->
      """SELECT CASE o_orderstatus WHEN 'F' THEN 'finished'
        |  WHEN 'O' THEN 'open' WHEN 'P' THEN 'pending' END AS status_label,
        |  3 AS n_labels, count(*) AS n
        |FROM orders
        |GROUP BY 1, 2
        |ORDER BY status_label""".stripMargin,
    "q49_recursive_cte" ->
      """WITH RECURSIVE m(mo) AS (
        |  SELECT 1 UNION ALL SELECT mo + 1 FROM m WHERE mo < 12)
        |SELECT m.mo, count(o_orderkey) AS n,
        |  round(coalesce(sum(o_totalprice), 0), 2) AS total
        |FROM m LEFT JOIN orders
        |  ON month(o_orderdate) = m.mo AND year(o_orderdate) = 1995
        |GROUP BY m.mo ORDER BY m.mo""".stripMargin
  )
}
