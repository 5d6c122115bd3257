package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Q
import graft.sources.Tables

/** General relational surface (SURVEY.md §2.13): scans, projections, filters,
  * joins (incl. semi/anti/full/as-of), aggregations (incl. distinct,
  * rollup/cube/grouping sets), window functions, sorts/top-k, set ops, and the
  * scalar function families — all Spark built-ins so Catalyst handles
  * pushdown, pruning, join strategy and whole-stage codegen.
  *
  * Scale notes (100 TB posture): dimension tables (`region`, `nation`,
  * `supplier`, `part`, `customer`) are explicitly `broadcast()` so fact-table
  * joins never shuffle the big side; aggregates are partial (map-side
  * combine) by construction; every filter/projection is declarative so it
  * reaches the parquet scan (`PushedFilters`/`ReadSchema`).
  *
  * Every query carries a DuckDB oracle. Double-valued aggregates are rounded
  * in BOTH engines (summation order differs across engines; rounding absorbs
  * the last-ulp divergence). Integer-valued functions are cast to BIGINT on
  * whichever side is narrower so schemas hash identically.
  */
object Relational {

  private def ts(lit0: String): Column = lit(lit0).cast("timestamp")

  // ---------------------------------------------------------------- q01
  /** TPC-H Q1-style pricing summary: grouped aggregation with derived
    * expressions (ref analogue: grouped sums, SURVEY §2.8 ops 36-38). */
  private val q01 = Q(
    "q01_pricing_summary",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          // money columns are exact 2-decimals, so the 4- and 6-decimal
          // product sums are computed as EXACT integer sums of scaled
          // values (order-independent in every engine; a double sum at
          // ~1e9 magnitude has its ulp in the 6th decimal, which flips
          // round(_,6) across engines) and divided back at the end
          (sum((round(col("l_extendedprice") * 100).cast("long"))
            * (lit(100L) - round(col("l_discount") * 100).cast("long"))) / 1e4)
            .as("sum_disc_price"),
          (sum((round(col("l_extendedprice") * 100).cast("long"))
            * (lit(100L) - round(col("l_discount") * 100).cast("long"))
            * (lit(100L) + round(col("l_tax") * 100).cast("long"))) / 1e6)
            .as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
      round(sum(l_quantity),2) AS sum_qty,
      round(sum(l_extendedprice),2) AS sum_base_price,
      sum(CAST(round(l_extendedprice*100) AS BIGINT)
        * (100 - CAST(round(l_discount*100) AS BIGINT))) / 1e4 AS sum_disc_price,
      sum(CAST(round(l_extendedprice*100) AS BIGINT)
        * (100 - CAST(round(l_discount*100) AS BIGINT))
        * (100 + CAST(round(l_tax*100) AS BIGINT))) / 1e6 AS sum_charge,
      round(avg(l_quantity),4) AS avg_qty,
      round(avg(l_extendedprice),4) AS avg_price,
      round(avg(l_discount),6) AS avg_disc,
      count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus"""))

  // ---------------------------------------------------------------- q02
  /** Projection + conjunctive filter; exercises parquet predicate pushdown
    * and column pruning (only 5 of 11 lineitem columns read). */
  private val q02 = Q(
    "q02_filter_project",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate").between(ts("1997-01-01 00:00:00"), ts("1997-12-31 00:00:00"))
          && col("l_quantity") > 30)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_extendedprice"))
    },
    Some("""SELECT l_orderkey, l_partkey, l_suppkey, l_quantity, l_extendedprice
      FROM lineitem
      WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
        AND l_quantity > 30"""))

  // ---------------------------------------------------------------- q03
  /** TPC-H Q3-style: 3-way join (fact x fact x broadcast dim) + grouped agg. */
  private val q03 = Q(
    "q03_shipping_priority",
    (s, dir) => {
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir).filter(col("o_orderdate") < ts("1999-01-01 00:00:00"))
      val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > ts("1997-06-30 00:00:00"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
    },
    Some("""SELECT l_orderkey, o_orderdate, o_orderpriority,
      round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1997-06-30 00:00:00'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority"""))

  // ---------------------------------------------------------------- q04
  /** Left-semi join (EXISTS): TPC-H Q4-style order-priority count. */
  private val q04 = Q(
    "q04_order_priority_exists",
    (s, dir) => {
      val big = Tables.lineitem(s, dir).filter(col("l_quantity") > 45).select(col("l_orderkey"))
      Tables.orders(s, dir)
        .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    },
    Some("""SELECT o_orderpriority, count(*) AS order_count
      FROM orders WHERE EXISTS (
        SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      GROUP BY o_orderpriority"""))

  // ---------------------------------------------------------------- q05
  /** Left-anti join (NOT EXISTS): customers with no 1995 orders. */
  private val q05 = Q(
    "q05_customers_no_orders",
    (s, dir) => {
      val o95 = Tables.orders(s, dir)
        .filter(col("o_orderdate") < ts("1996-01-01 00:00:00"))
        .select(col("o_custkey"))
      Tables.customer(s, dir)
        .join(o95, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    },
    Some("""SELECT c_custkey, c_name, c_nationkey FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')"""))

  // ---------------------------------------------------------------- q06
  /** TPC-H Q5-style multi-way star join through broadcast dims. */
  private val q06 = Q(
    "q06_region_revenue",
    (s, dir) => {
      val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      val n = Tables.nation(s, dir)
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00")
          && col("o_orderdate") < ts("2000-01-01 00:00:00"))
      val l = Tables.lineitem(s, dir)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
          count(lit(1)).as("n_items"))
    },
    Some("""SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),4) AS revenue,
      count(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
      GROUP BY n_name"""))

  // ---------------------------------------------------------------- q07
  /** TPC-H Q6-style single-pass filtered global aggregate. */
  private val q07 = Q(
    "q07_forecast_revenue",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= ts("1997-01-01 00:00:00")
          && col("l_shipdate") < ts("1998-01-01 00:00:00")
          && col("l_discount").between(0.03, 0.07)
          && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 4).as("revenue"),
          count(lit(1)).as("n_rows"))
    },
    Some("""SELECT round(sum(l_extendedprice*l_discount),4) AS revenue, count(*) AS n_rows
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24"""))

  // ---------------------------------------------------------------- q08
  /** Ranking window: per-customer top-3 orders (row_number, deterministic
    * tiebreak). Per-group top-k without a global sort. */
  private val q08 = Q(
    "q08_top_orders_per_cust",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
        row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t WHERE rn <= 3"""))

  // ---------------------------------------------------------------- q09
  /** Analytic window frame: per-customer running spend (rowsBetween). */
  private val q09 = Q(
    "q09_running_total",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, dir)
        .withColumn("running_spend", round(sum(col("o_totalprice")).over(w), 2))
        .select(col("o_custkey"), col("o_orderkey"), col("running_spend"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_spend
      FROM orders"""))

  // ---------------------------------------------------------------- q10
  /** lag/lead analytics over the events table. */
  private val q10 = Q(
    "q10_event_deltas",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .withColumn("delta", round(col("value") - col("prev_value"), 6))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("prev_value"), col("next_type"), col("delta"))
    },
    Some("""SELECT event_id, user_id, event_type,
      lag(value, 1) OVER w AS prev_value,
      lead(event_type, 1) OVER w AS next_type,
      round(value - lag(value, 1) OVER w, 6) AS delta
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""))

  // ---------------------------------------------------------------- q11
  /** ROLLUP hierarchy aggregation. */
  private val q11 = Q(
    "q11_rollup",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n_rows"))
    },
    Some("""SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
      count(*) AS n_rows FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"""))

  // ---------------------------------------------------------------- q12
  /** CUBE aggregation. */
  private val q12 = Q(
    "q12_cube",
    (s, dir) => {
      Tables.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("sum_price"))
    },
    Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
      round(sum(o_totalprice),2) AS sum_price
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)"""))

  // ---------------------------------------------------------------- q13
  /** Explicit GROUPING SETS (via SQL — same text runs on the oracle). */
  private val q13 = Q(
    "q13_grouping_sets",
    (s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
      s.sql("""SELECT l_returnflag, l_linestatus, round(sum(l_extendedprice),2) AS sum_price
        FROM lineitem GROUP BY GROUPING SETS ((l_returnflag),(l_linestatus),())""")
    },
    Some("""SELECT l_returnflag, l_linestatus, round(sum(l_extendedprice),2) AS sum_price
      FROM lineitem GROUP BY GROUPING SETS ((l_returnflag),(l_linestatus),())"""))

  // ---------------------------------------------------------------- q14-16
  /** Set operations (UNION/INTERSECT/EXCEPT, distinct semantics). */
  private def custNations(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
  private def suppNations(s: SparkSession, dir: String): DataFrame =
    Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey"))

  private val q14 = Q(
    "q14_union_nations",
    (s, dir) => custNations(s, dir).union(suppNations(s, dir)).distinct(),
    Some("""SELECT c_nationkey AS nationkey FROM customer
      UNION SELECT s_nationkey FROM supplier"""))

  private val q15 = Q(
    "q15_intersect_nations",
    (s, dir) => custNations(s, dir).intersect(suppNations(s, dir)),
    Some("""SELECT c_nationkey AS nationkey FROM customer
      INTERSECT SELECT s_nationkey FROM supplier"""))

  private val q16 = Q(
    "q16_except_nations",
    (s, dir) => custNations(s, dir).except(suppNations(s, dir)),
    Some("""SELECT c_nationkey AS nationkey FROM customer
      EXCEPT SELECT s_nationkey FROM supplier"""))

  // ---------------------------------------------------------------- q17
  /** count(DISTINCT) — expand-based distinct aggregation. */
  private val q17 = Q(
    "q17_distinct_agg",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("nd_parts"),
          countDistinct(col("l_suppkey")).as("nd_supps"),
          count(lit(1)).as("n"))
    },
    Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_parts,
      count(DISTINCT l_suppkey) AS nd_supps, count(*) AS n
      FROM lineitem GROUP BY l_returnflag"""))

  // ---------------------------------------------------------------- q18
  /** Full-outer join of a dimension against a pre-aggregated fact. */
  private val q18 = Q(
    "q18_nation_customer_balance",
    (s, dir) => {
      val perNation = Tables.customer(s, dir)
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 2).as("sum_bal"))
      Tables.nation(s, dir)
        .join(perNation, col("n_nationkey") === col("c_nationkey"), "full_outer")
        .select(col("n_nationkey"), col("n_name"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("sum_bal"), lit(0.0)).as("sum_bal"))
    },
    Some("""SELECT n_nationkey, n_name, coalesce(n_cust, 0) AS n_cust,
      coalesce(sum_bal, 0.0) AS sum_bal
      FROM nation FULL OUTER JOIN (
        SELECT c_nationkey, count(*) AS n_cust, round(sum(c_acctbal),2) AS sum_bal
        FROM customer GROUP BY c_nationkey) c ON n_nationkey = c_nationkey"""))

  // ---------------------------------------------------------------- q19
  /** Date/time functions: year/month buckets + datediff-derived measure. */
  private val q19 = Q(
    "q19_monthly_orders",
    (s, dir) => {
      Tables.orders(s, dir)
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"),
          month(col("o_orderdate")).cast("long").as("o_month"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("sum_price"),
          round(avg(col("o_totalprice")), 4).as("avg_price"))
    },
    Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      CAST(month(o_orderdate) AS BIGINT) AS o_month,
      count(*) AS n_orders, round(sum(o_totalprice),2) AS sum_price,
      round(avg(o_totalprice),4) AS avg_price
      FROM orders GROUP BY 1, 2"""))

  // ---------------------------------------------------------------- q20
  /** datediff between join sides (ship delay per priority). */
  private val q20 = Q(
    "q20_ship_delay",
    (s, dir) => {
      Tables.lineitem(s, dir).join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .withColumn("delay_days", datediff(col("l_shipdate"), col("o_orderdate")).cast("long"))
        .groupBy(col("o_orderpriority"))
        .agg(round(avg(col("delay_days")), 4).as("avg_delay"),
          max(col("delay_days")).as("max_delay"),
          min(col("delay_days")).as("min_delay"))
    },
    Some("""SELECT o_orderpriority,
      round(avg(date_diff('day', o_orderdate, l_shipdate)),4) AS avg_delay,
      max(date_diff('day', o_orderdate, l_shipdate)) AS max_delay,
      min(date_diff('day', o_orderdate, l_shipdate)) AS min_delay
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority"""))

  // ---------------------------------------------------------------- q21
  /** String function family: upper/substring/length/concat/replace/split/LIKE. */
  private val q21 = Q(
    "q21_string_funcs",
    (s, dir) => {
      Tables.part(s, dir)
        .filter(col("p_name").like("%a%"))
        .select(col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          substring(col("p_name"), 1, 8).as("name_pfx"),
          length(col("p_name")).cast("long").as("name_len"),
          concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_type"), " ", "_").as("type_u"),
          split(col("p_name"), " ").getItem(0).as("first_word"))
    },
    Some("""SELECT p_partkey, upper(p_brand) AS brand_u,
      substring(p_name, 1, 8) AS name_pfx,
      CAST(length(p_name) AS BIGINT) AS name_len,
      concat(p_brand, '#', p_type) AS brand_type,
      replace(p_type, ' ', '_') AS type_u,
      string_split(p_name, ' ')[1] AS first_word
      FROM part WHERE p_name LIKE '%a%'"""))

  // ---------------------------------------------------------------- q22
  /** Math function family (sqrt/ln/pow/abs/mod/floor). */
  private val q22 = Q(
    "q22_math_funcs",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_linenumber") === 1)
        .select(col("l_orderkey"),
          round(sqrt(col("l_extendedprice")), 6).as("sqrt_price"),
          round(log(col("l_extendedprice")), 6).as("ln_price"),
          round(pow(col("l_discount") + 1, 2), 6).as("pow_disc"),
          round(abs(col("l_discount") - 0.05), 6).as("abs_disc"),
          (col("l_orderkey") % 7).as("mod7"),
          floor(col("l_quantity") / 7).cast("long").as("qty_div7"))
    },
    Some("""SELECT l_orderkey, round(sqrt(l_extendedprice),6) AS sqrt_price,
      round(ln(l_extendedprice),6) AS ln_price,
      round(pow(l_discount + 1, 2),6) AS pow_disc,
      round(abs(l_discount - 0.05),6) AS abs_disc,
      l_orderkey % 7 AS mod7,
      CAST(floor(l_quantity / 7) AS BIGINT) AS qty_div7
      FROM lineitem WHERE l_linenumber = 1"""))

  // ---------------------------------------------------------------- q23
  /** JSON extraction from the events `props` column. */
  private val q23 = Q(
    "q23_json_extract",
    (s, dir) => {
      Tables.events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), max(col("k")).as("max_k"), min(col("k")).as("min_k"))
    },
    Some("""SELECT k % 10 AS k_bucket, count(*) AS n, max(k) AS max_k, min(k) AS min_k
      FROM (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events) t
      GROUP BY 1"""))

  // ---------------------------------------------------------------- q24
  /** As-of join: latest order at-or-before each event's timestamp for the
    * same user — composed as equi-join + inequality + window dedup (the
    * Spark-idiomatic as-of pattern; SURVEY §2.13). */
  private val q24 = Q(
    "q24_asof_join",
    (s, dir) => {
      val e = Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts"))
      val o = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      // per-event argmax as a map-side max(struct) — an event with a
      // long-lived user can have thousands of earlier orders, and a
      // row_number window would sort-shuffle all of them per event; the
      // struct max folds partials inside the join's own exchange
      // (lexicographic (date desc, key desc) take-1 == max(struct))
      e.join(o, col("o_custkey") === col("user_id") && col("o_orderdate") <= col("ts"))
        .groupBy(col("event_id"), col("user_id"))
        .agg(max(struct(col("o_orderdate"), col("o_orderkey"), col("o_totalprice")))
          .as("best"))
        .select(col("event_id"), col("user_id"),
          col("best.o_orderkey").as("o_orderkey"),
          col("best.o_totalprice").as("o_totalprice"))
    },
    Some("""SELECT event_id, user_id, o_orderkey, o_totalprice FROM (
      SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
        row_number() OVER (PARTITION BY e.event_id
          ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e JOIN orders o
        ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) t
      WHERE rn = 1"""))

  // ---------------------------------------------------------------- q25
  /** Global top-k with deterministic tiebreak (TakeOrderedAndProject —
    * no full sort, no single-node shuffle of the whole table). */
  private val q25 = Q(
    "q25_topk_orders",
    (s, dir) => {
      Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"""))

  // ---------------------------------------------------------------- q26
  /** CASE WHEN + conditional aggregation (pivot-style counts). */
  private val q26 = Q(
    "q26_case_when",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("l_quantity") > 25, 1).otherwise(0)).as("n_big"),
          sum(when(col("l_quantity") <= 25, 1).otherwise(0)).as("n_small"),
          // money column: EXACT scaled-integer sum (the q01 technique) —
          // a double sum at ~1e8 magnitude is summation-order-dependent
          // at the 2nd decimal across engines
          (sum(when(col("l_discount") > 0.05,
            round(col("l_extendedprice") * 100).cast("long")).otherwise(0L)) / 100.0)
            .as("disc_price"))
    },
    // the two counter sums are CAST to BIGINT: DuckDB's sum(INTEGER) is
    // HUGEINT, which pandas materializes as float64 (9926.0) while Spark
    // emits int64 (9926) — values equal, hash different (VERDICT r2 #1)
    Some("""SELECT l_returnflag,
      CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
      CAST(sum(CASE WHEN l_quantity <= 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_small,
      sum(CASE WHEN l_discount > 0.05
            THEN CAST(round(l_extendedprice * 100) AS BIGINT) ELSE 0 END) / 100.0
        AS disc_price
      FROM lineitem GROUP BY l_returnflag"""))

  // ---------------------------------------------------------------- q27
  /** Correlated scalar-subquery pattern: orders above their customer's
    * average order value (expressed join-style for Spark). */
  private val q27 = Q(
    "q27_above_avg_orders",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val avgPerCust = o.groupBy(col("o_custkey").as("ac_custkey"))
        .agg(avg(col("o_totalprice")).as("cust_avg"))
      o.join(avgPerCust, col("o_custkey") === col("ac_custkey"))
        .filter(col("o_totalprice") > col("cust_avg"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          round(col("cust_avg"), 6).as("cust_avg"))
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice, round(cust_avg,6) AS cust_avg
      FROM orders JOIN (
        SELECT o_custkey AS ac_custkey, avg(o_totalprice) AS cust_avg
        FROM orders GROUP BY o_custkey) a ON o_custkey = ac_custkey
      WHERE o_totalprice > cust_avg"""))

  // ---------------------------------------------------------------- q28
  /** ntile + dense_rank ranking family over a join.
    *
    * Scale note: the empty-partition window (one global ordering) IS the
    * query's semantics — a total ranking of suppliers, a DIMENSION table
    * (TPC-H supplier is 10K rows/SF vs lineitem's 6M; at 100 TB it's the
    * side you broadcast). A single-consumer global sort of a dimension
    * table is fine; this pattern must not be copied to fact tables —
    * fact-scale rankings use the q83-style bucket decomposition. */
  private val q28 = Q(
    "q28_rank_family",
    (s, dir) => {
      val w = Window.orderBy(col("s_acctbal").desc, col("s_suppkey"))
      Tables.supplier(s, dir)
        .withColumn("bal_rank", dense_rank().over(w).cast("long"))
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
          col("bal_rank"), col("quartile"))
    },
    Some("""SELECT s_suppkey, s_name, s_acctbal,
      dense_rank() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS bal_rank,
      ntile(4) OVER (ORDER BY s_acctbal DESC, s_suppkey) AS quartile
      FROM supplier"""))

  // ---------------------------------------------------------------- q29
  /** HLL sketch (approx_count_distinct) next to the exact count. The raw
    * sketch estimate is engine-specific, so the gate checks the exact
    * columns plus the HLL error-bound CONTRACT as booleans (the oracle
    * asserts TRUE — a sketch drifting past 5% relative error fails the
    * hash). Raw estimates are additionally asserted in OperatorsSpec. */
  private val q29 = Q(
    "q29_approx_distinct",
    (s, dir) => {
      val withinPct = (approx: Column, exact: Column) =>
        (abs(approx.cast("double") - exact.cast("double")) / exact.cast("double")) <= 0.05
      Tables.lineitem(s, dir).agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_orderkey")).as("exact_orders"),
        // rsd=0.01 (a 2^14-register HLL) so the 5% contract has real
        // margin at every sf the gate runs
        withinPct(approx_count_distinct(col("l_partkey"), 0.01),
          countDistinct(col("l_partkey"))).as("parts_within_5pct"),
        withinPct(approx_count_distinct(col("l_orderkey"), 0.01),
          countDistinct(col("l_orderkey"))).as("orders_within_5pct"))
    },
    Some("""SELECT count(DISTINCT l_partkey) AS exact_parts,
      count(DISTINCT l_orderkey) AS exact_orders,
      TRUE AS parts_within_5pct, TRUE AS orders_within_5pct
      FROM lineitem"""))

  // ---------------------------------------------------------------- q30
  /** Range (theta) join against an inline bucket table — broadcast
    * nested-loop on a 3-row side, so the fact table streams once. */
  private val q30 = Q(
    "q30_range_join",
    (s, dir) => {
      import s.implicits._
      val ranges = Seq((0, 10, "small"), (10, 25, "mid"), (25, 60, "big"))
        .toDF("lo", "hi", "bucket")
      Tables.lineitem(s, dir)
        .join(broadcast(ranges),
          col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("sum_price"))
    },
    Some("""SELECT bucket, count(*) AS n, round(sum(l_extendedprice),2) AS sum_price
      FROM lineitem JOIN (VALUES (0, 10, 'small'), (10, 25, 'mid'), (25, 60, 'big'))
        AS r(lo, hi, bucket)
      ON l_quantity >= lo AND l_quantity < hi
      GROUP BY bucket"""))

  // ---------------------------------------------------------------- q31
  /** Pivot (conditional aggregation) with an explicit value list. */
  private val q31 = Q(
    "q31_pivot_counts",
    (s, dir) => {
      Tables.documents(s, dir)
        .groupBy(col("lang"))
        .pivot("source", Seq("src0", "src1", "src2"))
        .agg(count(lit(1)))
        .na.fill(0L)
    },
    Some("""SELECT lang,
      count(*) FILTER (WHERE source = 'src0') AS src0,
      count(*) FILTER (WHERE source = 'src1') AS src1,
      count(*) FILTER (WHERE source = 'src2') AS src2
      FROM documents GROUP BY lang"""))

  // ---------------------------------------------------------------- q32/q33
  /** Multiset set operations: UNION ALL and EXCEPT ALL. */
  private val q32 = Q(
    "q32_union_all",
    (s, dir) => {
      custNations(s, dir).union(suppNations(s, dir))
        .groupBy(col("nationkey")).agg(count(lit(1)).as("n"))
    },
    Some("""SELECT nationkey, count(*) AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL SELECT s_nationkey FROM supplier) t GROUP BY nationkey"""))

  private val q33 = Q(
    "q33_except_all",
    (s, dir) => custNations(s, dir).exceptAll(suppNations(s, dir))
      .groupBy(col("nationkey")).agg(count(lit(1)).as("n")),
    Some("""SELECT nationkey, count(*) AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT ALL SELECT s_nationkey FROM supplier) t GROUP BY nationkey"""))

  // ---------------------------------------------------------------- q34
  /** Analytic frame family: first/last over full frames, percent_rank,
    * cume_dist, and a numeric RANGE frame. */
  private val q34 = Q(
    "q34_analytic_frames",
    (s, dir) => {
      val wSeq = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wFull = wSeq.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wPrice = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"))
      val wRange = wPrice.rangeBetween(-1000, 0)
      Tables.orders(s, dir).select(
        col("o_custkey"), col("o_orderkey"),
        first(col("o_totalprice")).over(wSeq).as("first_price"),
        last(col("o_totalprice")).over(wFull).as("last_price"),
        percent_rank().over(wPrice).as("pct_rank"),
        cume_dist().over(wPrice).as("cume"),
        count(lit(1)).over(wRange).as("n_within_1000"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      first_value(o_totalprice) OVER wseq AS first_price,
      last_value(o_totalprice) OVER
        (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
      percent_rank() OVER wprice AS pct_rank,
      cume_dist() OVER wprice AS cume,
      count(*) OVER
        (PARTITION BY o_custkey ORDER BY o_totalprice
         RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_within_1000
      FROM orders
      WINDOW wseq AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             wprice AS (PARTITION BY o_custkey ORDER BY o_totalprice)"""))

  // ---------------------------------------------------------------- q35
  /** Schema-full JSON parsing (from_json into a struct, vs q23's
    * path-extraction) — same oracle semantics. */
  private val q35 = Q(
    "q35_from_json",
    (s, dir) => {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(StructField("k", LongType)))
      Tables.events(s, dir)
        .select(col("event_id"), from_json(col("props"), schema).as("p"))
        .select(col("event_id"), col("p.k").as("k"))
        .filter(col("k") >= 90)
    },
    Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 90"""))

  // ---------------------------------------------------------------- q36
  /** Map functions: build per-user event-type count maps
    * (map_from_entries + element_at); the oracle checks the extracted
    * values. */
  private val q36 = Q(
    "q36_map_funcs",
    (s, dir) => {
      val counts = Tables.events(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      counts.groupBy(col("user_id"))
        .agg(map_from_entries(collect_list(struct(col("event_type"), col("cnt")))).as("m"))
        .select(col("user_id"),
          coalesce(element_at(col("m"), "click"), lit(0L)).as("n_click"),
          coalesce(element_at(col("m"), "purchase"), lit(0L)).as("n_purchase"),
          size(col("m")).cast("long").as("n_types"))
    },
    Some("""SELECT user_id,
      count(*) FILTER (WHERE event_type = 'click') AS n_click,
      count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
      count(DISTINCT event_type) AS n_types
      FROM events GROUP BY user_id"""))

  // ---------------------------------------------------------------- q37
  /** Date arithmetic family: date casts, day offsets, last_day. */
  private val q37 = Q(
    "q37_date_arith",
    (s, dir) => {
      Tables.orders(s, dir)
        .filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"),
          col("o_orderdate").cast("date").as("d"),
          date_add(col("o_orderdate").cast("date"), 30).as("d_plus30"),
          last_day(col("o_orderdate")).as("month_end"),
          dayofmonth(col("o_orderdate")).cast("long").as("day_of_month"),
          quarter(col("o_orderdate")).cast("long").as("qtr"))
    },
    Some("""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d,
      CAST(o_orderdate AS DATE) + 30 AS d_plus30,
      last_day(CAST(o_orderdate AS DATE)) AS month_end,
      CAST(day(o_orderdate) AS BIGINT) AS day_of_month,
      CAST(quarter(o_orderdate) AS BIGINT) AS qtr
      FROM orders WHERE o_orderkey % 10 = 0"""))

  // ---------------------------------------------------------------- q38
  /** Deterministic ~10% sampling via content hashing (md5 of the row key):
    * the reproducible-sampling pattern for data pipelines — the same rows
    * are selected on every engine and every run, so the gate hash-checks
    * the full dataflow ('1a' hex = 26/256 = 10.2%). Seeded Bernoulli
    * `.sample()` is engine-RNG-specific; its fraction contract is asserted
    * in OperatorsSpec. */
  private val q38 = Q(
    "q38_sample",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .filter(substring(md5(concat_ws("-",
          col("l_orderkey"), col("l_linenumber"))), 1, 2) < "1a")
        .agg(count(lit(1)).as("n_sampled"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
    },
    Some("""SELECT count(*) AS n_sampled, round(sum(l_quantity),2) AS sum_qty
      FROM lineitem
      WHERE substring(md5(concat_ws('-', l_orderkey, l_linenumber)), 1, 2) < '1a'"""))

  // ---------------------------------------------------------------- q39
  /** Salted skew join (hot-key mitigation): must return exactly the plain
    * join's result — the oracle IS the plain join. */
  private val q39 = Q(
    "q39_salted_join",
    (s, dir) => {
      val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_quantity"))
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority"))
      Skew.saltedJoin(li, o, col("l_orderkey"), col("o_orderkey"), nSalts = 4)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
    },
    Some("""SELECT o_orderpriority, count(*) AS n, round(sum(l_quantity),2) AS sum_qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority"""))

  // ---------------------------------------------------------------- q40
  /** Exact percentiles (sort-based, linear interpolation — same definition
    * as PERCENTILE_CONT). Interpolation runs on identical sorted doubles in
    * both engines, so values are rounded only lightly. */
  private val q40 = Q(
    "q40_percentiles",
    (s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
          round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"),
          count(lit(1)).as("n"))
    },
    Some("""SELECT o_orderpriority,
      round(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 4) AS p50,
      round(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice), 4) AS p90,
      round(percentile_cont(0.99) WITHIN GROUP (ORDER BY o_totalprice), 4) AS p99,
      count(*) AS n
      FROM orders GROUP BY o_orderpriority"""))

  // ---------------------------------------------------------------- q41
  /** Statistical aggregate family: stddev/variance/correlation/covariance. */
  private val q41 = Q(
    "q41_stats_agg",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_quantity")), 6).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("covar_qty_disc"))
    },
    Some("""SELECT l_returnflag,
      round(stddev_samp(l_quantity), 6) AS sd_qty,
      round(var_samp(l_quantity), 6) AS var_qty,
      round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
      round(covar_samp(l_quantity, l_discount), 6) AS covar_qty_disc
      FROM lineitem GROUP BY l_returnflag"""))

  // ---------------------------------------------------------------- q42
  /** Generator / table function: posexplode with ordinality. */
  private val q42 = Q(
    "q42_posexplode",
    (s, dir) => {
      Tables.documents(s, dir)
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"), col("col").as("token"))
    },
    Some("""SELECT doc_id,
      CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT) AS pos,
      unnest(string_split(text, ' ')) AS token
      FROM documents WHERE doc_id < 50"""))

  // ---------------------------------------------------------------- q43
  /** Regex extraction with a guaranteed-match pattern. */
  private val q43 = Q(
    "q43_regex_extract",
    (s, dir) => {
      Tables.part(s, dir).select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        regexp_extract(col("p_brand"), "(\\d+)", 1).cast("long").as("brand_num"),
        col("p_name").rlike("bolt|widget").cast("boolean").as("is_hardware"))
    },
    Some("""SELECT p_partkey,
      regexp_extract(p_name, '^(\w+)', 1) AS first_word,
      CAST(regexp_extract(p_brand, '(\d+)', 1) AS BIGINT) AS brand_num,
      regexp_matches(p_name, 'bolt|widget') AS is_hardware
      FROM part"""))

  // ---------------------------------------------------------------- q44
  /** HAVING (post-aggregation predicate). */
  private val q44 = Q(
    "q44_having",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .filter(col("n") >= 30 && col("sum_qty") > 500)
    },
    Some("""SELECT l_partkey, count(*) AS n, round(sum(l_quantity),2) AS sum_qty
      FROM lineitem GROUP BY l_partkey
      HAVING count(*) >= 30 AND round(sum(l_quantity),2) > 500"""))

  // ---------------------------------------------------------------- q45
  /** As-of join, aggregation form — the 100 TB-safe variant of q24. The
    * equi-join still enumerates (event, earlier-order) pairs, but they
    * PIPELINE into a map-side partial `max_by` aggregation: no window sort
    * over the expanded set, no shuffle of expanded rows, so a user with a
    * million-order history costs streaming time, not memory (q24's window
    * dedup shuffles the full expansion first). Tie-break (o_orderdate,
    * o_orderkey) is unique, so max_by is deterministic and matches q24's
    * row_number ordering exactly. */
  private val q45 = Q(
    "q45_asof_maxby",
    (s, dir) => {
      val e = Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts"))
      val o = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      e.join(o, col("o_custkey") === col("user_id") && col("o_orderdate") <= col("ts"))
        .groupBy(col("event_id"), col("user_id"))
        .agg(max_by(
          struct(col("o_orderkey"), col("o_totalprice")),
          struct(col("o_orderdate"), col("o_orderkey"))).as("best"))
        .select(col("event_id"), col("user_id"),
          col("best.o_orderkey").as("o_orderkey"),
          col("best.o_totalprice").as("o_totalprice"))
    },
    Some("""SELECT event_id, user_id, o_orderkey, o_totalprice FROM (
      SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
        row_number() OVER (PARTITION BY e.event_id
          ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e JOIN orders o
        ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) t
      WHERE rn = 1"""))

  // ---------------------------------------------------------------- q50
  /** CDC/upsert COMPACTION — latest record wins per key, the maintenance
    * pass every append-only ingest needs (dedupe re-deliveries, keep the
    * newest state per entity). Same scale shape as q45: a map-side partial
    * `max(struct)` aggregation — the shuffle carries one candidate row per
    * (key, partition), never the full history, and there is no window sort.
    * Tie-break (ts, event_id) is unique so the survivor is deterministic. */
  private val q50 = Q(
    "q50_cdc_compact",
    (s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("last"),
          count(lit(1)).as("n_versions"))
        .select(col("user_id"), col("event_type"),
          unix_timestamp(col("last.ts")).as("last_ts"),
          col("last.event_id").as("last_event_id"),
          round(col("last.value"), 4).as("last_value"),
          col("n_versions"))
    },
    Some("""WITH r AS (
        SELECT user_id, event_type, ts, event_id, value,
          row_number() OVER (PARTITION BY user_id, event_type
            ORDER BY ts DESC, event_id DESC) AS rk,
          count(*) OVER (PARTITION BY user_id, event_type) AS n_versions
        FROM events)
      SELECT user_id, event_type,
        CAST(floor(epoch(ts)) AS BIGINT) AS last_ts,
        event_id AS last_event_id,
        round(value, 4) AS last_value,
        n_versions
      FROM r WHERE rk = 1"""))

  // ---------------------------------------------------------------- q52
  /** CONVERSION FUNNEL — the ordered-sequence analytics query every event
    * pipeline runs: users who did view → click (after their first view) →
    * purchase (after that click), with per-step first-qualifying
    * timestamps. Each step is a join on user_id plus a strict time
    * predicate and a map-side-combined min-agg; no window over the event
    * stream, no per-user sort — at 100 TB the plan is three hash
    * aggregations and two user-keyed joins (the step frames shrink
    * monotonically, and AQE can broadcast the later, smaller sides).
    * Output: one row of funnel counts + a conversion rate. */
  private val q52 = Q(
    "q52_funnel",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val c = ev.filter(col("event_type") === "click").alias("e")
        .join(v.alias("v"), col("e.user_id") === col("v.user_id")
          && col("e.ts") > col("v.t1"))
        .groupBy(col("e.user_id")).agg(min(col("e.ts")).as("t2"))
      val p = ev.filter(col("event_type") === "purchase").alias("e")
        .join(c.alias("c"), col("e.user_id") === col("c.user_id")
          && col("e.ts") > col("c.t2"))
        .groupBy(col("e.user_id")).agg(min(col("e.ts")).as("t3"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_funnel")))
        .withColumn("conversion",
          round(col("n_funnel").cast("double") / col("n_view"), 6))
    },
    Some("""WITH v AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id),
      c AS (
        SELECT e.user_id, min(e.ts) AS t2 FROM events e
        JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
        WHERE e.event_type = 'click' GROUP BY e.user_id),
      p AS (
        SELECT e.user_id, min(e.ts) AS t3 FROM events e
        JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
        WHERE e.event_type = 'purchase' GROUP BY e.user_id)
      SELECT (SELECT count(*) FROM v) AS n_view,
        (SELECT count(*) FROM c) AS n_view_click,
        (SELECT count(*) FROM p) AS n_funnel,
        round(CAST((SELECT count(*) FROM p) AS DOUBLE) /
          (SELECT count(*) FROM v), 6) AS conversion"""))

  // ---------------------------------------------------------------- q58
  /** Z-ORDER LAYOUT CLUSTERING (Morton 1966; the multi-dimensional
    * data-layout pass behind Delta Lake's OPTIMIZE ZORDER BY and
    * Iceberg's sort-order rewrite; public) — interleave the bits of two
    * filter dimensions into one Morton code so that sorting/bucketing by
    * ONE key co-locates rows that are close in BOTH dimensions. At
    * 100 TB the production form is `repartitionByRange(morton)` + a
    * parquet write whose per-file min/max stats then prune scans
    * filtered on EITHER dimension; the gate query materializes exactly
    * those per-bucket bounds, and their tightness IS the operator's
    * contract: with 64 buckets (top 6 morton bits = top 3 bits of each
    * dim) every bucket spans < 2¹³ of each 16-bit dimension —
    * spec-asserted, ~8× narrower per dimension than a single-dimension
    * sort could guarantee for its secondary key.
    *
    * The interleave is the classic magic-mask bit spread (4 shift-mask
    * steps per dimension, branch-free, codegen-friendly — no UDF, no
    * loop); everything downstream is one grouped aggregation. */
  private def spread16(c: Column): Column = {
    val v0 = c.bitwiseAND(lit(0xFFFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
  }

  private val q58 = Q(
    "q58_zorder_layout",
    (s, dir) => {
      // dimension stats first (what a layout optimizer snapshots), then an
      // integer-exact normalization of each key onto [0, 65535] — `div` is
      // integer division in both engines, so no float rounding anywhere
      val li = Tables.lineitem(s, dir).select(
        col("l_partkey").cast("long").as("pk"),
        col("l_suppkey").cast("long").as("sk"))
      val bounds = li.agg(max(col("pk")).as("pkmax"), max(col("sk")).as("skmax"))
      li.crossJoin(broadcast(bounds))
        .select(
          expr("(pk * 65535) div pkmax").as("x"),
          expr("(sk * 65535) div skmax").as("y"))
        .select(col("x"), col("y"),
          spread16(col("x")).bitwiseOR(shiftleft(spread16(col("y")), 1)).as("morton"))
        .groupBy(shiftright(col("morton"), 26).as("zbucket"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"))
    },
    Some("""WITH bounds AS (
        SELECT max(CAST(l_partkey AS BIGINT)) AS pkmax,
          max(CAST(l_suppkey AS BIGINT)) AS skmax
        FROM lineitem),
      src AS (
        SELECT (CAST(l_partkey AS BIGINT) * 65535) // pkmax AS x,
          (CAST(l_suppkey AS BIGINT) * 65535) // skmax AS y
        FROM lineitem CROSS JOIN bounds),
      s1 AS (SELECT x, y,
        (x | (x << 8)) & 16711935 AS x1, (y | (y << 8)) & 16711935 AS y1 FROM src),
      s2 AS (SELECT x, y,
        (x1 | (x1 << 4)) & 252645135 AS x2, (y1 | (y1 << 4)) & 252645135 AS y2 FROM s1),
      s3 AS (SELECT x, y,
        (x2 | (x2 << 2)) & 858993459 AS x3, (y2 | (y2 << 2)) & 858993459 AS y3 FROM s2),
      s4 AS (SELECT x, y,
        (x3 | (x3 << 1)) & 1431655765 AS x4, (y3 | (y3 << 1)) & 1431655765 AS y4 FROM s3),
      m AS (SELECT x, y, x4 | (y4 << 1) AS morton FROM s4)
      SELECT morton >> 26 AS zbucket, CAST(count(*) AS BIGINT) AS n_rows,
        min(x) AS min_x, max(x) AS max_x,
        min(y) AS min_y, max(y) AS max_y
      FROM m GROUP BY zbucket"""))

  // ---------------------------------------------------------------- q59
  /** SCD TYPE-2 DIMENSION BUILD (Kimball's slowly-changing-dimension
    * pattern; public) — q50 keeps only the LATEST state per key; the
    * type-2 build keeps the whole history as half-open validity intervals
    * [valid_from, valid_to) with the live row marked current — the shape
    * every warehouse joins facts against "as of" a date. One `lead()`
    * window per key closes each interval with the next change's
    * timestamp.
    *
    * Scale shape: the window is partitioned by the DIMENSION KEY — the
    * sort is per-key history (bounded: an entity's change count, not the
    * table), never a global order. This is the one place a window beats
    * the q45/q50 map-side `max_by` shape: SCD2 needs EVERY consecutive
    * pair, so per-key ordering is inherent to the semantics, and the
    * partition key keeps it shuffle-bounded at 100 TB. */
  private val q59 = Q(
    "q59_scd2_history",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir).filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("value"), col("ts"),
          lead(col("ts"), 1).over(w).as("ts_next"))
        .select(col("user_id"), col("event_id"),
          round(col("value"), 4).as("value"),
          unix_timestamp(col("ts")).as("valid_from"),
          unix_timestamp(col("ts_next")).as("valid_to"),
          col("ts_next").isNull.as("is_current"))
    },
    Some("""WITH h AS (
        SELECT user_id, event_id, value, ts,
          lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ts_next
        FROM events WHERE event_type = 'purchase')
      SELECT user_id, event_id, round(value, 4) AS value,
        CAST(floor(epoch(ts)) AS BIGINT) AS valid_from,
        CAST(floor(epoch(ts_next)) AS BIGINT) AS valid_to,
        ts_next IS NULL AS is_current
      FROM h"""))

  // ---------------------------------------------------------------- q60
  /** BLOCKED FUZZY MATCH (entity resolution / record linkage — the
    * Fellegi-Sunter blocking+compare shape every large-scale ER system
    * uses; public) — a "dirty" side with one character deleted per title
    * is linked back to the clean side. The scale contract is the BLOCKING
    * key: candidate generation is an EQUI-join on a stable prefix (never
    * an all-pairs edit-distance cross join, which is O(N²) and cannot run
    * at 100 TB); `levenshtein` verifies only within blocks, and the
    * per-dirty-row winner is a map-side partial `min(struct(dist, id))` —
    * no window sort. The deletion position is always past the block
    * prefix, so blocking recall is structural (the true source always
    * co-blocks); a production blocker adds a second key (e.g. soundex) for
    * typos inside the prefix — the d05 two-table OR-redundancy pattern.
    * Hot prefixes are bounded by the title vocabulary here; the
    * [[graft.operators.Dedup]] hot-bucket cap applies unchanged if a
    * real corpus floods one block. */
  private val q60 = Q(
    "q60_fuzzy_match",
    (s, dir) => {
      val titles = Tables.documents(s, dir).select(col("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 6)).as("title"))
      // delete ONE char at deterministic position p = 5 + doc_id % 7 —
      // always past the 4-char blocking prefix
      val dirty = titles.select(
        (col("doc_id") + 5000000L).as("dirty_id"),
        expr("""concat(substring(title, 1, 4 + cast(doc_id % 7 as int)),
                       substring(title, 6 + cast(doc_id % 7 as int), 100000))""")
          .as("dtitle"))
      // bounded-band edit distance: levenshtein(l, r, threshold) stops the
      // DP once the distance provably exceeds 2 and returns -1 — O(k·n)
      // per pair instead of O(n·m) (guide step: cheaper expressions in the
      // hot path). Exact for every surviving row: a pair at dist <= 2 gets
      // its true distance, and the -1 rows are exactly the dist > 2 rows
      // the unbounded form filtered out.
      val cand = dirty.join(titles,
          substring(col("dtitle"), 1, 4) === substring(col("title"), 1, 4))
        .select(col("dirty_id"), col("doc_id"),
          levenshtein(col("dtitle"), col("title"), 2).cast("long").as("dist"))
        .filter(col("dist") >= 0)
      cand.groupBy(col("dirty_id"))
        .agg(min(struct(col("dist"), col("doc_id"))).as("m"))
        .select(col("dirty_id"), col("m.doc_id").as("matched_id"),
          col("m.dist").as("dist"))
    },
    Some("""WITH titles AS (
        SELECT doc_id, array_to_string(string_split(text, ' ')[1:6], ' ') AS title
        FROM documents),
      dirty AS (
        SELECT doc_id + 5000000 AS dirty_id,
          substring(title, 1, 4 + CAST(doc_id % 7 AS INT)) ||
          substring(title, 6 + CAST(doc_id % 7 AS INT), 100000) AS dtitle
        FROM titles),
      cand AS (
        SELECT d.dirty_id, t.doc_id,
          CAST(levenshtein(d.dtitle, t.title) AS BIGINT) AS dist
        FROM dirty d JOIN titles t
          ON substring(d.dtitle, 1, 4) = substring(t.title, 1, 4)
        WHERE levenshtein(d.dtitle, t.title) <= 2)
      SELECT dirty_id, doc_id AS matched_id, dist FROM (
        SELECT *, row_number() OVER (
          PARTITION BY dirty_id ORDER BY dist, doc_id) AS rn FROM cand)
      WHERE rn = 1"""))

  // ---------------------------------------------------------------- q61
  /** INTERVAL CONCURRENCY (temporal overlap counting — the
    * how-many-in-flight-at-once question behind resource peaks, genomics
    * coverage depth, and concurrent-session counts; public) — each
    * lineitem carries a BOUNDED transit window [ship, ship + dur] (dur =
    * quantity-derived, <= 15 days) and the query computes the number of
    * in-transit shipments for every day. Strategy: EXPLODE the interval to
    * day grain and count — the scale-correct form precisely BECAUSE the
    * span is bounded (rows out <= 16 × input, partial aggregation absorbs
    * them map-side; the alternative sweep-line +1/-1 prefix sum needs a
    * global time order and is the t10 machinery when spans are unbounded).
    * Day arithmetic is pure integers (days since epoch-anchor) — no
    * date/interval dialect anywhere near the gate. */
  private val q61 = Q(
    "q61_interval_concurrency",
    (s, dir) => {
      Tables.lineitem(s, dir).select(
          datediff(to_date(col("l_shipdate")), lit("1995-01-01").cast("date"))
            .cast("long").as("d0"),
          (col("l_quantity").cast("long") % 14 + 1).as("dur"))
        .select(explode(expr("sequence(d0, d0 + dur)")).as("day_no"))
        .groupBy(col("day_no"))
        .agg(count(lit(1)).as("n_active"))
    },
    Some("""WITH iv AS (
        SELECT date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) AS d0,
          CAST(l_quantity AS BIGINT) % 14 + 1 AS dur
        FROM lineitem),
      days AS (SELECT unnest(range(d0, d0 + dur + 1)) AS day_no FROM iv)
      SELECT CAST(day_no AS BIGINT) AS day_no,
        CAST(count(*) AS BIGINT) AS n_active
      FROM days GROUP BY day_no"""))

  // ---------------------------------------------------------------- q62
  /** WEIGHTED SYSTEMATIC SAMPLE (probability-proportional-to-size
    * sampling with a fixed stride — the survey-statistics PPS design and
    * the resampling step of particle filters; public) — walk the
    * key-ordered population accumulating integer weights and emit every
    * row whose weight interval crosses a multiple of `step = total/n`.
    * Pure integer arithmetic end to end (weights are cents, selection is
    * floor-division crossing), so the sample is exact across engines — no
    * float RNG anywhere.
    *
    * Scale shape: the cumulative weight is [[TextAnalysis.packSequences]]'s
    * DISTRIBUTED prefix sum (range exchange + driver-summed partition
    * offsets + one narrow sweep — t10's machinery, reused verbatim), never
    * a single-partition window; the only driver values are the grand total
    * (one scalar) and the #partitions offset table. A row heavier than
    * `step` is emitted once (certainty inclusion) — the standard PPS
    * treatment of outsize units. */
  private val q62 = Q(
    "q62_systematic_sample",
    (s, dir) => {
      val nSamples = 200L
      val w = Tables.orders(s, dir).select(
        col("o_orderkey").as("doc_id"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("n_tokens"))
      val total = w.agg(sum(col("n_tokens"))).head().getLong(0)
      val step = total / nSamples
      TextAnalysis.packSequences(w, step)
        .filter(col("seq_offset") + col("n_tokens") >= step)
        .select(col("doc_id").as("o_orderkey"),
          col("n_tokens").as("w_cents"),
          expr(s"seq_id + (seq_offset + n_tokens) div $step").as("sample_no"))
    },
    Some("""WITH w AS (
        SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS w_cents
        FROM orders),
      c AS (
        SELECT o_orderkey, w_cents,
          CAST(sum(w_cents) OVER (ORDER BY o_orderkey ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_end,
          CAST((SELECT sum(w_cents) FROM w) AS BIGINT) // 200 AS step
        FROM w)
      SELECT o_orderkey, w_cents, cum_end // step AS sample_no
      FROM c WHERE (cum_end - w_cents) // step < cum_end // step"""))

  // ---------------------------------------------------------------- q63
  /** PAGERANK (Page/Brin '99; the canonical iterated-join graph workload —
    * web-corpus curation ranks crawl URLs exactly this way; public) over
    * the bipartite customer-supplier purchase graph, made undirected so
    * every node has out-degree >= 1 (no dangling-mass sink). Five damped
    * iterations in EXACT integer micros: contrib = rank div deg, rank' =
    * 150000 + 17*Σcontrib div 20 (= 0.85 damping as the reduced fraction
    * 17/20 — small multiplier keeps ~2^59 of BIGINT headroom at
    * billion-node mass, where a 850000× multiplier would overflow).
    *
    * Scale shape: each iteration is ONE equi-join of the (u,v,deg)
    * adjacency against the node-sized rank table plus one grouped sum —
    * the shuffle key is the node id both times, ranks never leave the
    * cluster, and `localCheckpoint` per iteration truncates the iterative
    * lineage (the d09/CC lesson). Output is the deterministic top-25
    * (rank desc, node asc) via TakeOrderedAndProject. */
  /** The damped integer-micro PageRank core shared by q63 and
    * [[graft.tools.PageRankRehearsal]]: undirected-ize the edge list,
    * bake out-degree into the adjacency, then `iters` rounds of ONE
    * node-keyed equi-join + one grouped sum each, lineage truncated per
    * round. Input (u, v) directed pairs; output (node, rank). */
  private[graft] def pageRank(e0: DataFrame, iters: Int,
      plansOut: scala.collection.mutable.Buffer[String] = null,
      marksOut: scala.collection.mutable.Buffer[Double] = null): DataFrame = {
    val tStart = System.nanoTime()
    def mark(): Unit =
      if (marksOut != null) marksOut += (System.nanoTime() - tStart) / 1e9
    val edges = e0.unionByName(e0.select(col("v").as("u"), col("u").as("v")))
    val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val adj = deg.join(edges, "u").localCheckpoint(true)
    mark()
    // seed ranks from the CHECKPOINTED adjacency, not from deg: deg's plan
    // re-scans the base edge derivation, so iteration 1 paid one extra
    // full corpus pass (nodes-with-an-out-edge is the same set either way
    // — deg is a groupBy of edges, every u in it appears in adj)
    var ranks = adj.select(col("u").as("node")).distinct()
      .withColumn("rank", lit(1000000L))
    for (_ <- 1 to iters) {
      // SHUFFLE_HASH on the node-sized rank side: the default SMJ re-SORTED
      // the edge-sized cached adj on u EVERY iteration (guide §3.1 — pick
      // the strategy deliberately; the cached adj is already hash(u)-
      // partitioned, so the only per-iteration exchanges are the tiny rank
      // frame and the grouped sum). Build side = ranks (one row per node,
      // post-shuffle slices of it per task), never the edge table.
      val next = adj.join(ranks.hint("SHUFFLE_HASH"), col("u") === col("node"))
        .select(col("v"), expr("rank div deg").as("contrib"))
        .groupBy(col("v")).agg(sum(col("contrib")).as("in_mass"))
        .select(col("v").as("node"),
          expr("150000 + 17 * in_mass div 20").as("rank"))
      if (plansOut != null)
        plansOut += next.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      ranks = next.localCheckpoint(true)
      mark()
    }
    adj.unpersist(false)
    ranks
  }

  private val q63 = Q(
    "q63_pagerank",
    (s, dir) => {
      val e0 = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("u"), (col("l_suppkey") * 2 + 1).as("v"))
        .distinct()
      pageRank(e0, 5).orderBy(col("rank").desc, col("node")).limit(25)
        .localCheckpoint(true)
    },
    Some {
      val iters = (1 to 5).map { i =>
        s"""r$i AS (
          SELECT v AS node, 150000 + 17 * sum(rank // deg) // 20 AS rank
          FROM adj JOIN r${i - 1} ON adj.u = r${i - 1}.node GROUP BY v)"""
      }.mkString(",\n        ")
      s"""WITH e0 AS (
        SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      edges AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
      deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY u),
      adj AS (SELECT e.u, e.v, d.deg FROM edges e JOIN deg d ON e.u = d.u),
      r0 AS (SELECT u AS node, CAST(1000000 AS BIGINT) AS rank FROM deg),
      $iters
      SELECT node, CAST(rank AS BIGINT) AS rank FROM r5
      ORDER BY rank DESC, node LIMIT 25"""
    })

  // ---------------------------------------------------------------- q65
  /** MERGE / UPSERT (the ANSI MERGE INTO / Delta-Lake CDC-apply
    * semantics — apply a change batch of inserts, updates and deletes to
    * a snapshot in one pass; public). The change batch is derived
    * deterministically from the snapshot itself (key%7: 0 → update
    * +1000.00, 1 → delete, 2 → insert under a shifted key), and the merge
    * is the canonical FULL OUTER join on the key with a CASE resolution —
    * matched+update takes the new value, matched+delete drops, unmatched
    * change inserts, untouched snapshot rows pass through tagged 'K'.
    *
    * Scale shape: one key-shuffle full-outer join (a full outer cannot
    * broadcast — when the change batch is small and delete-free, the q50
    * max_by compaction is the cheaper upsert-only form; a lakehouse MERGE
    * additionally prunes to touched partitions, the s15/s16 staged-
    * rewrite pattern this engine applies on the ANN index). Money stays
    * in integer cents throughout. */
  private val q65 = Q(
    "q65_merge_upsert",
    (s, dir) => {
      val snap = Tables.orders(s, dir).select(col("o_orderkey").as("k"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
      val changes = snap.filter(col("k") % 7 <= 2).select(
        when(col("k") % 7 === 2, col("k") + 10000000L).otherwise(col("k")).as("ck"),
        when(col("k") % 7 === 0, col("cents") + 100000L)
          .when(col("k") % 7 === 2, lit(12345L)).otherwise(lit(0L)).as("new_cents"),
        when(col("k") % 7 === 0, lit("U"))
          .when(col("k") % 7 === 1, lit("D")).otherwise(lit("I")).as("op"))
      snap.join(changes, col("k") === col("ck"), "full_outer")
        .filter(col("op").isNull || col("op") =!= "D")
        .select(coalesce(col("k"), col("ck")).as("o_orderkey"),
          when(col("op") === "U" || col("op") === "I", col("new_cents"))
            .otherwise(col("cents")).as("cents"),
          coalesce(col("op"), lit("K")).as("op"))
    },
    Some("""WITH snap AS (
        SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
      changes AS (
        SELECT CASE WHEN k % 7 = 2 THEN k + 10000000 ELSE k END AS ck,
          CASE WHEN k % 7 = 0 THEN cents + 100000
            WHEN k % 7 = 2 THEN 12345 ELSE 0 END AS new_cents,
          CASE WHEN k % 7 = 0 THEN 'U' WHEN k % 7 = 1 THEN 'D' ELSE 'I' END AS op
        FROM snap WHERE k % 7 <= 2)
      SELECT coalesce(k, ck) AS o_orderkey,
        CASE WHEN op IN ('U', 'I') THEN new_cents ELSE cents END AS cents,
        coalesce(op, 'K') AS op
      FROM snap FULL OUTER JOIN changes ON k = ck
      WHERE op IS NULL OR op <> 'D'"""))

  // ---------------------------------------------------------------- q66
  /** UNPIVOT / MELT (wide → long, the inverse of q31's pivot; ANSI
    * UNPIVOT / pandas melt; public) — three order-money measures unpivot
    * into (measure, value) rows. Spark's `stack()` generator is the
    * codegen'd row-local form (3 rows out per row in, no shuffle until
    * the summarizing groupBy); the wide-table alternative — one query per
    * measure unioned — scans the table once per measure. Values are
    * integer cents before any aggregation (the money contract). */
  private val q66 = Q(
    "q66_unpivot_measures",
    (s, dir) => {
      Tables.lineitem(s, dir).select(
          col("l_returnflag"),
          expr("cast(round(l_extendedprice * 100) as bigint)").as("extended_cents"),
          expr("cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)")
            .as("disc_cents"),
          expr("cast(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) as bigint)")
            .as("charge_cents"))
        .select(col("l_returnflag"), expr(
          """stack(3, 'extended', extended_cents,
                      'discounted', disc_cents,
                      'charged', charge_cents) AS (measure, cents)"""))
        .groupBy(col("l_returnflag"), col("measure"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("total_cents"))
    },
    Some("""WITH wide AS (
        SELECT l_returnflag,
          CAST(round(l_extendedprice * 100) AS BIGINT) AS extended_cents,
          CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS disc_cents,
          CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT) AS charge_cents
        FROM lineitem),
      long AS (
        SELECT l_returnflag, 'extended' AS measure, extended_cents AS cents FROM wide
        UNION ALL
        SELECT l_returnflag, 'discounted', disc_cents FROM wide
        UNION ALL
        SELECT l_returnflag, 'charged', charge_cents FROM wide)
      SELECT l_returnflag, measure, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(cents) AS BIGINT) AS total_cents
      FROM long GROUP BY 1, 2"""))

  // ---------------------------------------------------------------- q67
  /** BATCH SESSIONIZATION (gap-based session assignment — the classic
    * web-analytics transform; st03/st08 are its streaming
    * `session_window` twin; public): a new session starts wherever the
    * gap to the user's previous event exceeds 30 minutes, computed as a
    * per-user `lag` + running sum of session-start flags. Per-session
    * rollup gives start/end/count.
    *
    * Scale shape: BOTH windows partition by user_id — each sort is one
    * user's history (bounded), never a global order; the rollup reuses
    * the same user-keyed shuffle. Epoch-second integers end to end. */
  private val q67 = Q(
    "q67_sessionize",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byTime = Window.partitionBy(col("user_id"))
        .orderBy(col("sec"), col("event_id"))
      val prev = lag(col("sec"), 1).over(byTime)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("sec"))
        .withColumn("new_session",
          when(prev.isNull || col("sec") - prev > 1800L, 1L).otherwise(0L))
        .withColumn("session_no", sum(col("new_session")).over(
          byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_no"))
        .agg(count(lit(1)).as("n_events"),
          min(col("sec")).as("start_sec"), max(col("sec")).as("end_sec"))
    },
    Some("""WITH e AS (
        SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
        FROM events),
      flagged AS (
        SELECT user_id, event_id, sec,
          CASE WHEN lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) IS NULL
              OR sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) > 1800
            THEN 1 ELSE 0 END AS new_session
        FROM e),
      numbered AS (
        SELECT user_id, sec,
          CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY sec, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
        FROM flagged)
      SELECT user_id, session_no, CAST(count(*) AS BIGINT) AS n_events,
        min(sec) AS start_sec, max(sec) AS end_sec
      FROM numbered GROUP BY 1, 2"""))

  // ---------------------------------------------------------------- q69
  /** TRIANGLE COUNTING with degree-ordered orientation (Schank & Wagner
    * '05 forward algorithm / Suri & Vassilvitskii '11 MapReduce form;
    * public) — the third member of the graph family after q63 PageRank
    * and the d09/d14 connected components: triangles drive clustering
    * coefficients, community quality, and spam/bot subgraph detection.
    *
    * The naive plan joins the edge list to itself twice — on a power-law
    * graph the hub's degree d contributes d² wedges and the join
    * explodes. Orientation fixes it: direct every edge from the
    * (degree, id)-SMALLER endpoint to the larger, so each node's
    * OUT-degree is bounded by O(√E) regardless of its true degree, every
    * triangle has exactly one node with two out-edges (counted once, no
    * /6 dedup), and the wedge join's output is Σ outdeg² = O(E^1.5)
    * worst-case instead of Σ deg². All three steps are equi-joins +
    * grouped counts — no windows, no driver state beyond the node-count
    * scalar used to size the ring.
    *
    * Graph: a deterministic construction over the documents ids — a
    * double ring (i→i+1, i→i+2: plants exactly V triangles) plus one
    * md5-hash chord per node (irregular degrees, incidental triangles) —
    * derived identically in both engines, so global counts AND the
    * top-10 local triangle counts (folded through the q54 bounded heap,
    * never a window) sit under the hash gate. */
  private val q69 = Q(
    "q69_triangle_count",
    (s, dir) => {
      val ids = Tables.documents(s, dir).select(col("doc_id").as("i"))
      val v = ids.agg(max(col("i"))).head().getLong(0) + 1L
      val e0 = ids.select(col("i"), pmod(col("i") + 1L, lit(v)).as("j"))
        .unionByName(ids.select(col("i"), pmod(col("i") + 2L, lit(v)).as("j")))
        .unionByName(ids.select(col("i"),
          pmod(graft.functions.CrossEngine.md5Hash60(col("i")), lit(v)).as("j")))
      val edges = e0.select(least(col("i"), col("j")).as("a"),
          greatest(col("i"), col("j")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
        .localCheckpoint(true)
      val deg = edges.select(col("a").as("n")).unionByName(edges.select(col("b").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("deg"))
      // orient each edge from the (deg, id)-smaller endpoint to the larger
      val oriented = edges
        .join(deg.select(col("n").as("a"), col("deg").as("da")), Seq("a"))
        .join(deg.select(col("n").as("b"), col("deg").as("db")), Seq("b"))
        .select(
          when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
            struct(col("a").as("src"), col("b").as("dst")))
            .otherwise(struct(col("b").as("src"), col("a").as("dst"))).as("e"))
        .select(col("e.src"), col("e.dst"))
        .localCheckpoint(true)
      val wedges = oriented.alias("x").join(oriented.alias("y"),
          col("x.src") === col("y.src") && col("x.dst") < col("y.dst"))
        .select(col("x.src").as("u"),
          least(col("x.dst"), col("y.dst")).as("p"),
          greatest(col("x.dst"), col("y.dst")).as("q"))
      val tris = wedges.join(edges,
          col("p") === col("a") && col("q") === col("b"))
        .select(col("u"), col("p"), col("q"))
        .localCheckpoint(true)
      val nTris = tris.count()
      val local = tris.select(col("u").as("node"))
        .unionByName(tris.select(col("p").as("node")))
        .unionByName(tris.select(col("q").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("t_cnt"))
      local
        .agg(graft.functions.TopK.topKPairs(col("t_cnt"), col("node"), 10).as("top"))
        .select(posexplode(col("top")).as(Seq("pos", "p")))
        .select((col("pos") + 1).cast("long").as("rnk"),
          col("p.payload").as("node"), col("p.sort_key").as("t_cnt"))
        .crossJoin(edges.agg(count(lit(1)).as("n_edges")))
        .withColumn("n_triangles", lit(nTris))
    },
    Some("""WITH ids AS (SELECT doc_id AS i FROM documents),
      vmax AS (SELECT max(i) + 1 AS v FROM ids),
      e0 AS (
        SELECT i, (i + 1) % (SELECT v FROM vmax) AS j FROM ids
        UNION ALL
        SELECT i, (i + 2) % (SELECT v FROM vmax) FROM ids
        UNION ALL
        SELECT i, CAST(concat('0x', substring(md5(CAST(i AS VARCHAR)), 1, 15)) AS BIGINT)
          % (SELECT v FROM vmax) FROM ids),
      edges AS MATERIALIZED (
        SELECT DISTINCT least(i, j) AS a, greatest(i, j) AS b
        FROM e0 WHERE i <> j),
      deg AS (
        SELECT n, CAST(count(*) AS BIGINT) AS deg FROM (
          SELECT a AS n FROM edges UNION ALL SELECT b FROM edges) t GROUP BY n),
      oriented AS MATERIALIZED (
        SELECT CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN e.a ELSE e.b END AS src,
          CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN e.b ELSE e.a END AS dst
        FROM edges e JOIN deg da ON da.n = e.a JOIN deg db ON db.n = e.b),
      tris AS MATERIALIZED (
        SELECT x.src AS u, least(x.dst, y.dst) AS p, greatest(x.dst, y.dst) AS q
        FROM oriented x JOIN oriented y
          ON x.src = y.src AND x.dst < y.dst
        JOIN edges ON least(x.dst, y.dst) = a AND greatest(x.dst, y.dst) = b),
      localc AS (
        SELECT node, CAST(count(*) AS BIGINT) AS t_cnt FROM (
          SELECT u AS node FROM tris
          UNION ALL SELECT p FROM tris
          UNION ALL SELECT q FROM tris) t GROUP BY node)
      SELECT CAST(rn AS BIGINT) AS rnk, node, t_cnt,
        (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
        (SELECT CAST(count(*) AS BIGINT) FROM tris) AS n_triangles
      FROM (
        SELECT node, t_cnt,
          row_number() OVER (ORDER BY t_cnt DESC, node DESC) AS rn
        FROM localc) t WHERE rn <= 10"""))

  // ---------------------------------------------------------------- q70
  /** LABEL-PROPAGATION COMMUNITY DETECTION (Raghavan et al. '07, the
    * synchronous deterministic variant; public — VERDICT r10 next-7),
    * rounding out the graph family: unlike connected components (d09),
    * LPA partitions by EDGE DENSITY — a node adopts the most FREQUENT
    * label among its neighbors (ties to the smallest label), so a sparse
    * bridge between two dense groups is outvoted and the groups stay
    * separate, where the d09 closure would merge them into one component.
    *
    * Graph: a deterministic construction over the documents ids — 8-node
    * CLIQUES (community c = id div 8) chained by single bridge edges
    * (c's last node ↔ c+1's first), derived identically in both engines.
    * The bridges make the whole graph ONE connected component, so the
    * gate genuinely separates LPA from CC: four synchronous rounds must
    * converge every clique to its min id while every bridge label is
    * outvoted (clique-mates vote m−2 ≥ 2 strong vs the bridge's 1).
    *
    * Scale shape: each round is ONE node-keyed equi-join of the adjacency
    * against the label table, a grouped (node, label) count, and a
    * per-node top-1 via the q54 bounded heap — no windows; lineage
    * truncated per round (the q63/d09 localCheckpoint lesson). A
    * neighborless node keeps its label through the left join, so the
    * round is total on any corpus. The oracle mirrors round-for-round;
    * its row_number forms are the per-node argmax DuckDB-side only. */
  /** The q70 LPA round loop, factored for the scale rehearsal
    * ([[graft.tools.LpaRehearsal]]): `und` is the UNDIRECTED (u, v) edge
    * frame, labels start as node ids, each of `rounds` synchronous rounds
    * is one node-keyed equi-join + a grouped (node, label) count + a
    * per-node top-1 through the bounded heap, lineage truncated. */
  private[graft] def labelPropagation(und: DataFrame, nodes: DataFrame,
      rounds: Int): DataFrame = {
    var labels = nodes.select(col("i").as("node"), col("i").as("label"))
    for (_ <- 1 to rounds) {
      // neighbor-label histogram -> per-node mode (count desc, label asc)
      // through the bounded heap: payload -label makes the heap's
      // descending payload tiebreak equal the smallest-label rule
      val mode = und.join(labels, col("v") === col("node"))
        .groupBy(col("u"), col("label")).agg(count(lit(1)).as("c"))
        .groupBy(col("u"))
        .agg(graft.functions.TopK.topKPairs(col("c"), -col("label"), 1).as("top"))
        .select(col("u").as("node"), (-col("top")(0)("payload")).as("new_label"))
      labels = labels.join(mode, Seq("node"), "left")
        .select(col("node"), coalesce(col("new_label"), col("label")).as("label"))
        .localCheckpoint(true)
    }
    labels
  }

  private val q70 = Q(
    "q70_label_propagation",
    (s, dir) => {
      val ids = Tables.documents(s, dir).select(col("doc_id").as("i"))
        .localCheckpoint(true)
      val cliquePairs = ids.alias("x").join(ids.alias("y"),
          expr("x.i div 8") === expr("y.i div 8") && col("x.i") < col("y.i"))
        .select(col("x.i").as("a"), col("y.i").as("b"))
      val bridges = ids.alias("x").join(ids.alias("y"),
          col("y.i") === col("x.i") + 1)
        .filter(col("x.i") % 8 === 7)
        .select(col("x.i").as("a"), col("y.i").as("b"))
      val edges = cliquePairs.unionByName(bridges)
      val und = edges.select(col("a").as("u"), col("b").as("v"))
        .unionByName(edges.select(col("b").as("u"), col("a").as("v")))
        .localCheckpoint(true)
      labelPropagation(und, ids, rounds = 4)
    },
    Some {
      val rounds = (1 to 4).map { i =>
        s"""m$i AS (
          SELECT u AS node, label AS new_label FROM (
            SELECT e.u, r.label, count(*) AS c,
              row_number() OVER (PARTITION BY e.u
                ORDER BY count(*) DESC, r.label) AS rn
            FROM und e JOIN r${i - 1} r ON e.v = r.node
            GROUP BY e.u, r.label) t WHERE rn = 1),
        r$i AS MATERIALIZED (
          SELECT p.node, coalesce(m.new_label, p.label) AS label
          FROM r${i - 1} p LEFT JOIN m$i m ON p.node = m.node)"""
      }.mkString(",\n        ")
      s"""WITH ids AS (SELECT doc_id AS i FROM documents),
      cliq AS (
        SELECT x.i AS a, y.i AS b FROM ids x JOIN ids y
        ON x.i // 8 = y.i // 8 AND x.i < y.i),
      bri AS (
        SELECT x.i AS a, y.i AS b FROM ids x JOIN ids y
        ON y.i = x.i + 1 WHERE x.i % 8 = 7),
      edges AS (SELECT a, b FROM cliq UNION ALL SELECT a, b FROM bri),
      und AS MATERIALIZED (
        SELECT a AS u, b AS v FROM edges
        UNION ALL SELECT b AS u, a AS v FROM edges),
      r0 AS (SELECT i AS node, i AS label FROM ids),
      $rounds
      SELECT node, label FROM r4"""
    })

  // ---------------------------------------------------------------- q71
  /** DETERMINISTIC PER-GROUP UNIFORM SAMPLE (the inspection-panel op
    * every curation pipeline runs — "show me k example docs per source/
    * cluster/shard" — and the per-stratum exemplar draw of an eval
    * harness): the KMV insight applied to sampling ROWS instead of
    * counting distinct — the k smallest values of a uniform hash over
    * the row key ARE a uniform k-sample of the group, and hash-order
    * statistics make the draw deterministic, repeatable across runs, and
    * MERGEABLE (bottom-k sets merge associatively). Rides the audited
    * TopKPairs heap ascending on md5-derived hashes, so the exchange
    * carries k-pair buffers per (partition, group), never group members —
    * the q54 scale shape with sampling semantics — and the md5 derivation
    * keeps the whole draw DuckDB-reproducible (the d06 pattern), so the
    * sampled ids themselves sit under the hash gate, not just counts. */
  private val q71 = Q(
    "q71_grouped_sample",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("source"), col("doc_id"), length(col("text")).cast("long").as("n_chars"))
      // >> 8: the rank key rides the heap as a double (OrderedBits), and a
      // 60-bit hash cast to double rounds at 2^53 — 52 bits stay exact;
      // the id tiebreak covers the (negligible) shifted-hash ties on both
      // engines identically
      val h = shiftright(graft.functions.CrossEngine.md5Hash60(col("doc_id")), 8)
      graft.operators.Similarity.topKByScore(
          docs.withColumn("h", h), "source", "doc_id",
          col("h").cast("double"), k = 3, ascending = true)
        .select(col("source"), col("doc_id"), col("rn").as("draw"))
        .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
        .select(col("source"), col("draw"), col("doc_id"), col("n_chars"))
    },
    Some("""SELECT source, CAST(rn AS BIGINT) AS draw, doc_id,
        CAST(length(text) AS BIGINT) AS n_chars
      FROM (
        SELECT source, doc_id, text,
          row_number() OVER (PARTITION BY source
            ORDER BY CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) // 256,
              doc_id) AS rn
        FROM documents) t
      WHERE rn <= 3"""))

  // ---------------------------------------------------------------- q72
  /** MULTI-SOURCE BFS HOP DISTANCE (bounded-radius breadth-first search —
    * the frontier-relaxation member of the graph family, next to connected
    * components (d09), PageRank (q63), triangles (q69) and label
    * propagation (q70); the "distance to nearest seed" primitive behind
    * influence radii, landmark labeling and graph-distance features).
    *
    * Semantics: r rounds of SYNCHRONOUS min-distance relaxation from a
    * seed set. BFS layering makes bounded rounds exact: a finite value
    * propagates exactly one hop per round starting from the seeds' 0, so
    * after r rounds a node is finite iff its true hop distance is <= r,
    * and then the value EQUALS the true distance — once finite, never
    * improved (`coalesce(dist, candidate)` is the whole merge rule). The
    * unreached frontier reports -1, so the gate exercises both classes.
    *
    * Graph: deterministic over the documents ids in both engines — chain
    * edges i <-> i+1 plus express edges i <-> i+16; seeds are the nodes
    * with id % 97 == 0. Offsets from the nearest seed decompose into
    * 16-hops + 1-hops, so true distances range 0..~12 and the 6-round
    * horizon genuinely splits reached from unreached.
    *
    * Scale shape: each round is ONE node-keyed equi-join of the adjacency
    * against the CURRENT frontier's finite rows (the `dist IS NOT NULL`
    * filter shrinks the join input to reached nodes), a grouped min, and
    * a left-join merge — no windows, no driver collect; lineage truncated
    * per round (the q63/q70 localCheckpoint lesson). On a 1000-executor
    * cluster both sides hash-partition on the node key and the per-round
    * shuffle carries one (node, dist) pair per reached node. */
  private[graft] def bfsHops(und: DataFrame, nodes: DataFrame,
      isSeed: Column, rounds: Int): DataFrame = {
    var d = nodes.select(col("i").as("node"),
      when(isSeed, lit(0L)).as("dist"))
    for (_ <- 1 to rounds) {
      val cand = und.join(d, col("v") === col("node"))
        .filter(col("dist").isNotNull)
        .groupBy(col("u")).agg(min(col("dist") + 1).as("cand"))
      d = d.join(cand, col("node") === col("u"), "left")
        .select(col("node"), coalesce(col("dist"), col("cand")).as("dist"))
        .localCheckpoint(true)
    }
    d
  }

  private val q72 = Q(
    "q72_bfs_hops",
    (s, dir) => {
      val ids = Tables.documents(s, dir).select(col("doc_id").as("i"))
        .localCheckpoint(true)
      val chain = ids.alias("x").join(ids.alias("y"),
          col("y.i") === col("x.i") + 1)
        .select(col("x.i").as("a"), col("y.i").as("b"))
      val express = ids.alias("x").join(ids.alias("y"),
          col("y.i") === col("x.i") + 16)
        .select(col("x.i").as("a"), col("y.i").as("b"))
      val edges = chain.unionByName(express)
      val und = edges.select(col("a").as("u"), col("b").as("v"))
        .unionByName(edges.select(col("b").as("u"), col("a").as("v")))
        .localCheckpoint(true)
      bfsHops(und, ids, col("i") % 97 === 0, rounds = 6)
        .select(col("node"), coalesce(col("dist"), lit(-1L)).as("dist"))
    },
    Some {
      val rounds = (1 to 6).map { i =>
        s"""c$i AS (
          SELECT e.u AS cnode, min(r.dist + 1) AS cand
          FROM und e JOIN r${i - 1} r ON e.v = r.node
          WHERE r.dist IS NOT NULL GROUP BY e.u),
        r$i AS MATERIALIZED (
          SELECT p.node, coalesce(p.dist, c.cand) AS dist
          FROM r${i - 1} p LEFT JOIN c$i c ON p.node = c.cnode)"""
      }.mkString(",\n        ")
      s"""WITH ids AS (SELECT doc_id AS i FROM documents),
      chain AS (
        SELECT x.i AS a, y.i AS b FROM ids x JOIN ids y ON y.i = x.i + 1),
      express AS (
        SELECT x.i AS a, y.i AS b FROM ids x JOIN ids y ON y.i = x.i + 16),
      edges AS (SELECT a, b FROM chain UNION ALL SELECT a, b FROM express),
      und AS MATERIALIZED (
        SELECT a AS u, b AS v FROM edges
        UNION ALL SELECT b AS u, a AS v FROM edges),
      r0 AS (SELECT i AS node,
        CASE WHEN i % 97 = 0 THEN CAST(0 AS BIGINT) END AS dist FROM ids),
      $rounds
      SELECT node, coalesce(dist, -1) AS dist FROM r6"""
    })

  // ---------------------------------------------------------------- q73
  /** SQL-TEXT API PARITY: ONE SQL string — the dialect-portable ANSI
    * subset (joins, grouped aggregation, window ranking, CASTs) — runs
    * VERBATIM through `spark.sql(...)` against registered temp views AND
    * as the DuckDB oracle. The engine's SQL surface is not a translation
    * layer: the same text plans on both engines and must hash-match. Temp
    * views are registered, analyzed eagerly by `sql()` (the resolved plan
    * holds the file relations), then dropped — nothing leaks into the
    * shared session. Money rides as CAST(ROUND(x*100) AS BIGINT) cents
    * and the HUGEINT sum is cast back (the q26 lesson); row_number is
    * cast to BIGINT on both sides. */
  private val q73Sql =
    """SELECT r_name, c_name, revenue_cents, CAST(rn AS BIGINT) AS rnk FROM (
      SELECT r_name, c_name, revenue_cents,
        ROW_NUMBER() OVER (PARTITION BY r_name
          ORDER BY revenue_cents DESC, c_name) AS rn
      FROM (
        SELECT r.r_name AS r_name, c.c_name AS c_name,
          CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
            AS revenue_cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, c.c_name) g) t
    WHERE rn <= 3"""

  private val q73 = Q(
    "q73_sql_parity",
    (s, dir) => {
      Seq("lineitem", "orders", "customer", "nation", "region")
        .foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      val out = s.sql(q73Sql)
      Seq("lineitem", "orders", "customer", "nation", "region")
        .foreach(s.catalog.dropTempView(_))
      out
    },
    Some(q73Sql))

  // ---------------------------------------------------------------- q74
  /** NATIVE FUNCTIONS FROM SQL TEXT: the [[graft.GraftExtensions]]
    * registration under the driver's gate — `top_k_pairs` called from a
    * `spark.sql(...)` string plans the same Partial-mode bounded-heap
    * TypedImperativeAggregate the audited DataFrame lanes use (k-pair
    * buffers on the exchange, no WindowExec), while the DuckDB oracle
    * keeps the window formulation the q54/q71 contract pins. The payload
    * negation gives the smallest-id tiebreak; sort_key doubles as the
    * emitted length so the VALUE rides the gate too, not just the rank. */
  private val q74 = Q(
    "q74_sql_native_topk",
    (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("graft_q74_docs")
      val out = s.sql(
        """SELECT source, -p.payload AS doc_id, p.sort_key AS n_chars,
          CAST(pos + 1 AS BIGINT) AS rnk
        FROM (
          SELECT source,
            top_k_pairs(CAST(length(text) AS BIGINT), -doc_id, 3) AS tp
          FROM graft_q74_docs GROUP BY source) g
        LATERAL VIEW posexplode(tp) v AS pos, p""")
      s.catalog.dropTempView("graft_q74_docs")
      out
    },
    Some("""SELECT source, doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        CAST(rn AS BIGINT) AS rnk
      FROM (
        SELECT source, doc_id, text,
          row_number() OVER (PARTITION BY source
            ORDER BY length(text) DESC, doc_id) AS rn
        FROM documents) t WHERE rn <= 3"""))

  // ---------------------------------------------------------------- q75
  /** WEIGHTED SAMPLE WITHOUT REPLACEMENT (Efraimidis & Spirakis '06 — the
    * one-pass A-ES scheme; the draw a mixture builder needs when "k docs
    * per source" must land proportional to a weight — token budget,
    * quality score — instead of uniformly, q71's uniform twin): each row
    * gets key u^(1/w) for uniform u and weight w; the k LARGEST keys per
    * group are exactly a weighted sample without replacement. The rank
    * key used is ln(u)/w — monotone in u^(1/w) and immune to the
    * pow-underflow u^(1/w) hits at large w.
    *
    * Determinism for the gate: u = ((md5(doc_id) >> 8) + 1) / 2^52 — a
    * 52-bit integer over a power-of-two denominator, so u is EXACT in
    * both engines (the q71 hash-order-statistics trick extended from
    * uniform to weighted). The rank key is a raw double (ln's last ulp
    * may differ across libms), but the key is never EMITTED — only ranks
    * and ids — and a rank flip needs two keys within ~1 ulp over a 0.7
    * range, measure-zero on real weights; exact key ties (duplicate
    * docs) break by id identically in both engines.
    *
    * Scale shape: rides the audited TopKPairs heap — the exchange
    * carries k-pair buffers per (partition, source), never group members,
    * and bottom-k key sets merge associatively, so the same draw runs as
    * a streaming/mergeable sketch. Weight = length(text): the
    * "sample proportional to token budget" mixture draw. */
  private val q75 = Q(
    "q75_weighted_sample",
    (s, dir) => {
      val docs = Tables.documents(s, dir).select(col("source"), col("doc_id"),
        length(col("text")).cast("long").as("w_chars"))
      val h52 = shiftright(graft.functions.CrossEngine.md5Hash60(col("doc_id")), 8)
      val u = (h52 + 1).cast("double") / lit(4503599627370496.0) // /2^52: exact
      val key = log(u) / col("w_chars").cast("double")
      graft.operators.Similarity.topKByScore(
          docs.withColumn("k", key), "source", "doc_id",
          col("k"), k = 3, ascending = false)
        .select(col("source"), col("rn").as("draw"), col("doc_id"))
        .join(docs.select(col("doc_id"), col("w_chars")), Seq("doc_id"))
        .select(col("source"), col("draw"), col("doc_id"), col("w_chars"))
    },
    Some("""SELECT source, CAST(rn AS BIGINT) AS draw, doc_id,
        CAST(length(text) AS BIGINT) AS w_chars
      FROM (
        SELECT source, doc_id, text,
          row_number() OVER (PARTITION BY source ORDER BY
            ln((CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                // 256 + 1) / 4503599627370496.0)
            / CAST(length(text) AS DOUBLE) DESC, doc_id) AS rn
        FROM documents) t
      WHERE rn <= 3"""))

  // ---------------------------------------------------------------- q76
  /** TIME-GRID RESAMPLE + FORWARD FILL (the "daily close" op every
    * event-stream feature pipeline runs: observations land at irregular
    * timestamps, models want one row per (entity, period) carrying the
    * last observed value): a generated daily grid per user, the day's
    * LAST event value by (ts, event_id) argmax — one partial
    * max(struct()) aggregate, no window over events — then forward fill
    * along the 30-slot grid via last-ignore-nulls. Days before a user's
    * first observation keep the -1 sentinel with observed_ever=false
    * (a NULL would also work, but a sentinel keeps the gate's hash
    * canonicalization trivial).
    *
    * Scale shape: the argmax aggregation is the only pass over the event
    * corpus (map-side combined, keyed by (user, day)); the grid join and
    * the fill window touch only entities x periods rows — bounded by the
    * feature table's own size, the q67 per-entity-window precedent (30
    * rows per partition here, never data-sized). A deterministic 1-in-10
    * user slice bounds the gate output. */
  /** q76's grid + forward-fill stage over a `daily(user_id, day, close_v)`
    * frame — factored so st34's streaming drain runs the IDENTICAL fill
    * (and shares q76's oracle text verbatim). */
  private[graft] def gridFfill(s: SparkSession, daily: DataFrame): DataFrame = {
      val users = daily.select(col("user_id")).distinct()
      val grid = users.crossJoin(
        s.range(0, 30).toDF("d").select(
          date_add(lit(java.sql.Date.valueOf("2024-01-01")), col("d").cast("int"))
            .as("day")))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"), col("close_v"))
        .withColumn("filled_v",
          coalesce(last(col("close_v"), ignoreNulls = true).over(w), lit(-1.0)))
        .select(col("user_id"), col("day"),
          col("filled_v").as("close_value"),
          col("close_v").isNull.as("gap_filled"),
          (col("filled_v") =!= -1.0).as("observed_ever"))
  }

  /** The q76/st34 shared oracle text. */
  private[graft] val resampleOracleSql: String = """WITH ev AS (
        SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id, value
        FROM events WHERE user_id % 10 = 3),
      daily AS (
        SELECT user_id, day, value AS close_v FROM (
          SELECT user_id, day, value,
            row_number() OVER (PARTITION BY user_id, day
              ORDER BY ts DESC, event_id DESC) AS rn
          FROM ev) t WHERE rn = 1),
      grid AS (
        SELECT u.user_id, CAST(DATE '2024-01-01' + d * INTERVAL 1 DAY AS DATE) AS day
        FROM (SELECT DISTINCT user_id FROM daily) u
        CROSS JOIN (SELECT unnest(range(0, 30)) AS d) ds),
      joined AS (
        SELECT g.user_id, g.day, d.close_v,
          coalesce(last_value(d.close_v IGNORE NULLS) OVER (
            PARTITION BY g.user_id ORDER BY g.day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1.0) AS filled_v
        FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day)
      SELECT user_id, day, filled_v AS close_value,
        (close_v IS NULL) AS gap_filled,
        (filled_v <> -1.0) AS observed_ever
      FROM joined"""

  private val q76 = Q(
    "q76_resample_ffill",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("user_id") % 10 === 3)
        .select(col("user_id"), to_date(col("ts")).as("day"),
          struct(col("ts"), col("event_id"), col("value")).as("o"))
      val daily = ev.groupBy(col("user_id"), col("day"))
        .agg(max(col("o")).as("last_o"))
        .select(col("user_id"), col("day"), col("last_o.value").as("close_v"))
      gridFfill(s, daily)
    },
    Some(resampleOracleSql))

  // ---------------------------------------------------------------- q77
  /** RETENTION COHORT MATRIX — the classic product-analytics rollup every
    * events warehouse serves: users cohorted by the ISO week of their
    * first signup, activity bucketed by truncated week, and the matrix
    * cell (cohort, week_offset) counts the distinct cohort members active
    * that week, as a fraction of cohort size. Week offsets are exact
    * Monday-to-Monday day differences divided by 7 (both engines truncate
    * weeks to Monday), so the bucketing is integer-exact cross-engine.
    *
    * Scale shape: one grouped min per user for the signup date, one
    * DISTINCT (user, week) pass over the stream (map-side combined), one
    * user-keyed equi-join (AQE can broadcast the signup side when small),
    * then a grouped distinct-count per matrix cell and a broadcast join
    * of cohort sizes. No window over the event stream, no per-user sort. */
  private val q77 = Q(
    "q77_retention_cohorts",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"))
      val signup = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("s_date"))
        .select(col("user_id"),
          date_trunc("week", col("s_date")).cast("date").as("cohort"))
      val act = ev
        .select(col("user_id"),
          date_trunc("week", to_date(col("ts"))).cast("date").as("w"))
        .distinct()
      val cells = act.join(signup, Seq("user_id"))
        .filter(col("w") >= col("cohort"))
        .groupBy(col("cohort"),
          (datediff(col("w"), col("cohort")) / 7).cast("long").as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
      val sizes = signup.groupBy(col("cohort"))
        .agg(countDistinct(col("user_id")).as("n_cohort"))
      cells.join(broadcast(sizes), Seq("cohort"))
        .select(col("cohort"), col("week_offset"), col("n_cohort"),
          col("n_active"),
          round(col("n_active").cast("double") / col("n_cohort"), 6)
            .as("retention"))
    },
    Some("""WITH signup AS (
        SELECT user_id, date_trunc('week', min(CAST(ts AS DATE))) AS cohort
        FROM events WHERE event_type = 'signup' GROUP BY user_id),
      act AS (
        SELECT DISTINCT user_id, date_trunc('week', CAST(ts AS DATE)) AS w
        FROM events),
      cells AS (
        SELECT s.cohort,
          CAST(date_diff('day', s.cohort, a.w) / 7 AS BIGINT) AS week_offset,
          count(DISTINCT a.user_id) AS n_active
        FROM act a JOIN signup s ON a.user_id = s.user_id
        WHERE a.w >= s.cohort
        GROUP BY 1, 2),
      sizes AS (
        SELECT cohort, count(DISTINCT user_id) AS n_cohort FROM signup
        GROUP BY cohort)
      SELECT c.cohort, c.week_offset, s.n_cohort, c.n_active,
        round(CAST(c.n_active AS DOUBLE) / s.n_cohort, 6) AS retention
      FROM cells c JOIN sizes s ON c.cohort = s.cohort"""))

  // ---------------------------------------------------------------- q78
  /** LAST-TOUCH ATTRIBUTION — the marketing-analytics as-of composition:
    * every purchase attributes to the LATEST preceding view/click by the
    * same user within a 7-day lookback, falling back to 'direct' when no
    * touch qualifies. Same 100 TB shape as q45: the (purchase, earlier
    * touch) equi-join pipelines into a map-side partial `max_by` — no
    * window sort over the expansion, a heavy user costs streaming time —
    * then per-channel counts and shares are one grouped agg over the
    * purchase-bounded result. Tie-break (ts, event_id) is unique, so the
    * attributed touch is deterministic and matches the oracle's
    * row_number ordering exactly. */
  private val q78 = Q(
    "q78_last_touch_attribution",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      val touches = ev.filter(col("event_type").isin("view", "click"))
        .select(col("event_id").as("t_id"), col("user_id"),
          col("event_type").as("channel"), col("ts").as("t_ts"))
      val attributed = purchases
        .join(touches, Seq("user_id"))
        .filter(col("t_ts") <= col("p_ts") &&
          col("t_ts") >= col("p_ts") - expr("INTERVAL 7 DAYS"))
        .groupBy(col("p_id"))
        .agg(max_by(struct(col("t_id"), col("channel")),
          struct(col("t_ts"), col("t_id"))).as("best"))
        .select(col("p_id"), col("best.channel").as("channel"))
      val byChannel = purchases.join(attributed, Seq("p_id"), "left")
        .select(col("p_id"), coalesce(col("channel"), lit("direct")).as("channel"))
        .groupBy(col("channel")).agg(count(lit(1)).as("n_purchases"))
      val total = purchases.count()
      byChannel.select(col("channel"), col("n_purchases"),
        round(col("n_purchases").cast("double") / lit(total), 6).as("share"))
    },
    Some("""WITH p AS (
        SELECT event_id AS p_id, user_id, ts AS p_ts FROM events
        WHERE event_type = 'purchase'),
      t AS (
        SELECT event_id AS t_id, user_id, event_type AS channel, ts AS t_ts
        FROM events WHERE event_type IN ('view', 'click')),
      attributed AS (
        SELECT p_id, channel FROM (
          SELECT p.p_id, t.channel,
            row_number() OVER (PARTITION BY p.p_id
              ORDER BY t.t_ts DESC, t.t_id DESC) AS rn
          FROM p JOIN t ON t.user_id = p.user_id
            AND t.t_ts <= p.p_ts AND t.t_ts >= p.p_ts - INTERVAL 7 DAY) x
        WHERE rn = 1),
      tagged AS (
        SELECT p.p_id, coalesce(a.channel, 'direct') AS channel
        FROM p LEFT JOIN attributed a ON a.p_id = p.p_id),
      tot AS (SELECT count(*) AS n FROM p)
      SELECT channel, count(*) AS n_purchases,
        round(CAST(count(*) AS DOUBLE) / tot.n, 6) AS share
      FROM tagged CROSS JOIN tot
      GROUP BY channel, tot.n"""))

  // ---------------------------------------------------------------- q79
  /** ORDERED FUNNEL ANALYSIS — the third leg of the product-analytics
    * triad (q77 retention, q78 attribution): users progress view → click
    * → purchase, where each step must occur STRICTLY AFTER the user's
    * first completion of the previous step AND within a 72-hour step
    * window (the conversion-window form every funnel product defaults
    * to; unbounded windows on a long-history corpus converge to 1.0 and
    * measure nothing — measured rates here: 1500 → 1087 → 809 users at
    * sf0.1). Determinism: "first completion" is the min of the
    * (ts, event_id) tuple — a unique total order, so same-timestamp
    * events can't flip a user's funnel between engines.
    *
    * Scale shape: each step is one filter + one user-keyed equi-join to
    * the previous step's (user, first-completion) frame + a map-side
    * partial min(struct) — no window over the event stream, a heavy
    * user costs streaming time, and the step frames are |users|-sized,
    * shrinking monotonically down the funnel. */
  private val q79 = Q(
    "q79_funnel_analysis",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      def firstOf(typ: String, after: DataFrame): DataFrame = {
        val base = ev.filter(col("event_type") === typ)
        val gated =
          if (after == null) base
          else base.join(after, Seq("user_id"))
            .filter(struct(col("ts"), col("event_id")) > col("k") &&
              col("ts") <= col("k.ts") + expr("INTERVAL 72 HOURS"))
        gated.groupBy(col("user_id"))
          .agg(min(struct(col("ts"), col("event_id"))).as("k"))
      }
      val s1 = firstOf("view", null).localCheckpoint(true)
      val s2 = firstOf("click", s1).localCheckpoint(true)
      val s3 = firstOf("purchase", s2).localCheckpoint(true)
      val (n1, n2, n3) = (s1.count(), s2.count(), s3.count())
      def rate(a: Long, b: Long): Double =
        if (b == 0) 0.0 else math.rint(a.toDouble / b * 1e6) / 1e6
      Seq(
        ("view", 1L, n1, 1.0, 1.0),
        ("click", 2L, n2, rate(n2, n1), rate(n2, n1)),
        ("purchase", 3L, n3, rate(n3, n2), rate(n3, n1)))
        .toDF("step", "step_order", "n_users", "conv_from_prev",
          "conv_from_top")
    },
    Some("""WITH s1 AS (
        SELECT user_id, ts AS t, event_id AS i FROM (
          SELECT user_id, ts, event_id,
            row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events WHERE event_type = 'view') x WHERE rn = 1),
      s2 AS (
        SELECT user_id, t, i FROM (
          SELECT e.user_id, e.ts AS t, e.event_id AS i,
            row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
          FROM events e JOIN s1 ON s1.user_id = e.user_id
          WHERE e.event_type = 'click' AND (e.ts, e.event_id) > (s1.t, s1.i)
            AND e.ts <= s1.t + INTERVAL 72 HOUR) x
        WHERE rn = 1),
      s3 AS (
        SELECT user_id, t, i FROM (
          SELECT e.user_id, e.ts AS t, e.event_id AS i,
            row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
          FROM events e JOIN s2 ON s2.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND (e.ts, e.event_id) > (s2.t, s2.i)
            AND e.ts <= s2.t + INTERVAL 72 HOUR) x
        WHERE rn = 1),
      n AS (SELECT (SELECT count(*) FROM s1) AS n1,
                   (SELECT count(*) FROM s2) AS n2,
                   (SELECT count(*) FROM s3) AS n3)
      SELECT 'view' AS step, CAST(1 AS BIGINT) AS step_order,
        CAST(n1 AS BIGINT) AS n_users, CAST(1.0 AS DOUBLE) AS conv_from_prev,
        CAST(1.0 AS DOUBLE) AS conv_from_top FROM n
      UNION ALL
      SELECT 'click', 2, n2,
        round(CAST(n2 AS DOUBLE) / n1, 6), round(CAST(n2 AS DOUBLE) / n1, 6)
      FROM n
      UNION ALL
      SELECT 'purchase', 3, n3,
        round(CAST(n3 AS DOUBLE) / n2, 6), round(CAST(n3 AS DOUBLE) / n1, 6)
      FROM n"""))

  // ---------------------------------------------------------------- q80
  /** SCD TYPE-2 DIMENSION MAINTENANCE + POINT-IN-TIME FACT JOIN (Kimball's
    * slowly-changing-dimension type 2 — the warehouse-standard history
    * table): each user's 'view' events carry a derived plan tier
    * (floor(value·10) mod 3); the dimension keeps ONE VERSION ROW PER
    * CHANGE under the strict (ts, event_id) order — [valid_from,
    * valid_to) half-open validity, open-ended current row — and purchase
    * facts join the version valid at their timestamp (the classic as-of
    * dimension lookup). Purchases before a user's first version (or for
    * users with no versions) land in tier −1, so the fact side partitions
    * exactly.
    *
    * Invariants pinned Spark-side and mirrored as oracle constants:
    * exactly one open (current) version per versioned user, and the
    * point-in-time join matches each purchase AT MOST once (the
    * half-open intervals tile time by construction — lead() makes each
    * valid_to the next valid_from).
    *
    * Scale shape: change detection + interval assembly are per-user
    * windows (one co-partitioned shuffle on user_id, state bounded by a
    * user's own change count); the point-in-time join is a user_id
    * equi-join + interval residual — never a time-range cross join. At
    * 100 TB both sides hash-partition on user_id and the dimension side
    * is the small one (versions ≪ facts). */
  private val q80 = Q(
    "q80_scd2_dimension",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val wOrd = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val changes = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"),
          (floor(col("value") * 10).cast("long") % 3).as("tier"))
        .withColumn("prev", lag(col("tier"), 1).over(wOrd))
        .filter(col("prev").isNull || col("tier") =!= col("prev"))
      val dim = changes.select(col("user_id"), col("tier"), col("event_id"),
          col("ts").as("valid_from"))
        .withColumn("valid_to",
          lead(col("valid_from"), 1).over(Window.partitionBy(col("user_id"))
            .orderBy(col("valid_from"), col("event_id"))))
      val facts = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("fid"),
          col("ts").as("fts"),
          round(col("value") * 100).cast("long").as("cents"))
      val matched = facts
        .join(dim.select(col("user_id"), col("tier"), col("valid_from"),
          col("valid_to")), Seq("user_id"))
        .filter(col("fts") >= col("valid_from") &&
          (col("valid_to").isNull || col("fts") < col("valid_to")))
        .select(col("fid"), col("cents"), col("tier"))
      val attributed = matched.unionByName(
        facts.join(matched.select(col("fid")), Seq("fid"), "left_anti")
          .select(col("fid"), col("cents"), lit(-1L).as("tier")))
      val oneCurrent = dim
        .groupBy(col("user_id"))
        .agg(sum(when(col("valid_to").isNull, 1L).otherwise(0L)).as("nc"))
        .agg(min(col("nc")), max(col("nc"))).head()
      val onePerUser = oneCurrent.getLong(0) == 1L && oneCurrent.getLong(1) == 1L
      val pitUnique = matched.groupBy(col("fid"))
        .agg(count(lit(1)).as("n")).agg(max(col("n"))).head().getLong(0) <= 1L
      val dimStats = dim.groupBy(col("tier")).agg(
        count(lit(1)).as("n_versions"),
        sum(when(col("valid_to").isNull, 1L).otherwise(0L)).as("n_current"))
      val factStats = attributed.groupBy(col("tier")).agg(
        count(lit(1)).as("n_purchases"), sum(col("cents")).as("cents_sum"))
      dimStats.join(factStats, Seq("tier"), "full_outer")
        .select(col("tier"),
          coalesce(col("n_versions"), lit(0L)).as("n_versions"),
          coalesce(col("n_current"), lit(0L)).as("n_current"),
          coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
          coalesce(col("cents_sum"), lit(0L)).as("cents_sum"),
          lit(onePerUser).as("one_current_per_user"),
          lit(pitUnique).as("point_in_time_unique"))
    },
    Some("""WITH v AS (
        SELECT user_id, ts, event_id,
          CAST(floor(value * 10) AS BIGINT) % 3 AS tier
        FROM events WHERE event_type = 'view'),
      ch AS (SELECT user_id, ts, event_id, tier FROM (
          SELECT user_id, ts, event_id, tier,
            lag(tier) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM v) x
        WHERE prev IS NULL OR tier <> prev),
      dim AS (SELECT user_id, tier, ts AS valid_from,
          lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        FROM ch),
      f AS (SELECT user_id, event_id AS fid, ts AS fts,
          CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'),
      m AS (SELECT f.fid, f.cents, d.tier FROM f
        JOIN dim d ON d.user_id = f.user_id
          AND f.fts >= d.valid_from
          AND (d.valid_to IS NULL OR f.fts < d.valid_to)),
      att AS (SELECT fid, cents, tier FROM m
        UNION ALL
        SELECT fid, cents, CAST(-1 AS BIGINT) FROM f
        WHERE fid NOT IN (SELECT fid FROM m)),
      ds AS (SELECT tier, count(*) AS n_versions,
          sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS n_current
        FROM dim GROUP BY tier),
      fs AS (SELECT tier, count(*) AS n_purchases, sum(cents) AS cents_sum
        FROM att GROUP BY tier)
      SELECT coalesce(ds.tier, fs.tier) AS tier,
        CAST(coalesce(ds.n_versions, 0) AS BIGINT) AS n_versions,
        CAST(coalesce(ds.n_current, 0) AS BIGINT) AS n_current,
        CAST(coalesce(fs.n_purchases, 0) AS BIGINT) AS n_purchases,
        CAST(coalesce(fs.cents_sum, 0) AS BIGINT) AS cents_sum,
        true AS one_current_per_user, true AS point_in_time_unique
      FROM ds FULL OUTER JOIN fs ON ds.tier = fs.tier"""))

  // ---------------------------------------------------------------- q83
  /** DETERMINISTIC EPOCH SHUFFLE + MICRO-BATCH ASSIGNMENT (the training
    * loop's data-order op: each epoch wants a fresh seeded GLOBAL
    * permutation of the corpus, reproducible across restarts, and the
    * permuted order packed into fixed-size micro-batches). A naive
    * global `row_number() OVER (ORDER BY hash)` sorts the corpus in one
    * task; the scale shape here exploits that a hash key's TOP bits ARE
    * its sort prefix: bucket = the key's high 8 bits gives 256
    * ORDER-CONTIGUOUS, hash-balanced buckets, so the global position is
    * (driver prefix-sum of 256 bucket counts) + (rank WITHIN the
    * bucket) — the within-bucket windows run partition-parallel over
    * ~N/256 rows each and the only driver state is 256 longs. Same
    * decomposition at 100 TB with 2^k buckets sized to executor memory.
    *
    * batch_id = position div 64; the gate emits per-batch accounting
    * (size, position range, doc-id checksum) — bounded output, while the
    * spec additionally pins the position set is EXACTLY 0..N-1 (a true
    * permutation) and that a different epoch seed produces a different
    * order. Everything derives from the md5 uniform, oracle-mirrored
    * against DuckDB's global window rank. */
  private val q83 = Q(
    "q83_epoch_shuffle",
    (s, dir) => epochShuffleBatches(s, dir, "epoch1"),
    Some(epochShuffleOracle("epoch1")))

  /** Seeded global permutation without a global sort. `bucketBits` sets
    * the decomposition width: 2^bucketBits order-contiguous hash buckets
    * (the key's TOP bits are its sort prefix), each ranked by a window
    * PARTITIONED on the bucket — so the within-bucket sorts stay
    * partition-parallel (spec-asserted: every WindowExec in the plan has
    * a partitionSpec) and the only driver state is 2^bucketBits longs.
    * At 100 TB pick bucketBits so N / 2^bucketBits rows fit an executor
    * (e.g. 12-16); the gate runs the default 8. */
  private[graft] def epochShuffleBatches(s: SparkSession, dir: String,
      seed: String, bucketBits: Int = 8): DataFrame =
    epochShuffleBatchesOn(Tables.documents(s, dir).select(col("doc_id")),
      seed, bucketBits)

  /** The permutation itself: (doc_id, pos) with pos the doc's seeded
    * global rank — the reusable core q83 aggregates into batches and the
    * p09 shard exporter consumes directly. */
  private[graft] def epochShufflePositions(docs: DataFrame,
      seed: String, bucketBits: Int = 8): DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    require(bucketBits >= 1 && bucketBits <= 30,
      s"bucketBits must be in [1, 30], got $bucketBits")
    val keyed = docs
      .select(col("doc_id"),
        graft.functions.CrossEngine.md5Hash60(
          concat(lit(seed + ":"), col("doc_id").cast("string"))).as("k"))
      .withColumn("bucket", shiftright(col("k"), 60 - bucketBits))
    val offsets = keyed.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toList
      .scanLeft((0L, 0L)) { case ((_, acc), (b, n)) => (b, acc + n) }
      .sliding(2).collect { case List((_, off), (b, _)) => (b, off) }.toSeq
    val offDf = broadcast(offsets.toDF("bucket", "off"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("k"), col("doc_id"))
    keyed
      .withColumn("rk", row_number().over(w).cast("long"))
      .join(offDf, Seq("bucket"))
      .select(col("doc_id"), (col("off") + col("rk") - 1).as("pos"))
  }

  private[graft] def epochShuffleBatchesOn(docs: DataFrame,
      seed: String, bucketBits: Int = 8): DataFrame =
    epochShufflePositions(docs, seed, bucketBits)
      .withColumn("batch_id", expr("pos div 64"))
      .groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n_docs"), min(col("pos")).as("first_pos"),
        max(col("pos")).as("last_pos"), sum(col("doc_id")).as("docid_sum"))

  private[graft] def epochShuffleOracle(seed: String): String =
    s"""WITH ranked AS (
        SELECT doc_id, row_number() OVER (ORDER BY
          CAST(concat('0x', substring(md5(concat('$seed:',
            CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT), doc_id) - 1
          AS pos
        FROM documents)
      SELECT pos // 64 AS batch_id, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(min(pos) AS BIGINT) AS first_pos,
        CAST(max(pos) AS BIGINT) AS last_pos,
        CAST(sum(doc_id) AS BIGINT) AS docid_sum
      FROM ranked GROUP BY 1"""

  // ------------------------------------------------------------ q85-q89
  /** SQL-TEXT DIALECT SURFACE (VERDICT r17 #5): one dialect-portable ANSI
    * string per major engine family, run VERBATIM through `spark.sql(...)`
    * AND as the DuckDB oracle (the q73 contract, widened). Each proves a
    * family's semantics compose in plain SQL text — a user can run the
    * same string on the engine and on any ANSI warehouse:
    *
    *  - q85: the d01 exact-dedup canonical-keeper verdict (min-id keeper
    *    per content hash, every doc labeled);
    *  - q86: the q49/KMV sketch lane's NDV estimate — k-th smallest of a
    *    uniform content hash, (k-1)/u_k — with the 52-bit hex fraction
    *    built from PORTABLE primitives (position/substring/power over an
    *    exact power-of-two denominator, so u is bit-identical);
    *  - q87: the w-lane's AS-OF join as the ANSI union+RANGE-window
    *    pattern (latest view at-or-before each click per user; RANGE,
    *    not ROWS, so order-by ties resolve identically in both engines);
    *  - q88: the t02-family quality filter on pure-ANSI counters
    *    (space-count words, replace-difference stopword hits, mean-word-
    *    length bounds by integer cross-multiplication — no dialect split
    *    functions, no inexact ratios);
    *  - q89: the d28 leakage-safe split + d16 decontamination check —
    *    hash-split into train/test, then count test docs whose exact
    *    content appears in train (anti-leak audit), one string.
    *
    * Scale shape: q85/q89 are hash-grouped joins (shuffle on the content
    * hash), q86 is a distinct + a 32-row top (the KMV bound), q87 one
    * window over the tagged union partitioned by user, q88 a pure map —
    * all partition-parallel, nothing driver-sized. */
  private def sqlTextQ(name: String, views: Seq[String], sql: String): Q = Q(
    name,
    (s, dir) => {
      views.foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      val out = s.sql(sql)
      views.foreach(s.catalog.dropTempView(_))
      out
    },
    Some(sql))

  private val q85 = sqlTextQ("q85_sql_dedup_verdict", Seq("documents"),
    """SELECT d.doc_id, d.doc_id = k.keeper AS is_canonical,
      k.keeper AS canonical_id, k.n_copies
    FROM documents d
    JOIN (SELECT md5(text) AS h, min(doc_id) AS keeper,
            CAST(count(*) AS BIGINT) AS n_copies
          FROM documents GROUP BY md5(text)) k
      ON md5(d.text) = k.h""")

  private val q86 = sqlTextQ("q86_sql_kmv_ndv", Seq("documents"),
    """WITH hs AS (SELECT DISTINCT md5(text) AS h FROM documents),
      ranked AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hs),
      kth AS (SELECT h FROM ranked WHERE rn = 32),
      digits AS (SELECT i FROM (VALUES (1),(2),(3),(4),(5),(6),(7),(8),
        (9),(10),(11),(12),(13)) AS t(i)),
      frac AS (SELECT SUM((POSITION(SUBSTRING(k.h, d.i, 1)
          IN '0123456789abcdef') - 1) * POWER(16.0, 13 - d.i))
          / POWER(16.0, 13) AS u
        FROM kth k CROSS JOIN digits d),
      ex AS (SELECT CAST(count(*) AS BIGINT) AS ndv FROM hs)
    SELECT ex.ndv AS exact_ndv,
      CAST(FLOOR(31.0 / f.u) AS BIGINT) AS kmv_estimate,
      ROUND(ABS(CAST(ex.ndv AS DOUBLE) - 31.0 / f.u)
        / CAST(ex.ndv AS DOUBLE), 3) AS rel_err
    FROM ex CROSS JOIN frac f""")

  private val q87 = sqlTextQ("q87_sql_asof_join", Seq("events"),
    """WITH tagged AS (
      SELECT user_id, ts, CAST(0 AS BIGINT) AS is_q, ts AS v_ts
      FROM events WHERE event_type = 'view'
      UNION ALL
      SELECT user_id, ts, CAST(1 AS BIGINT) AS is_q,
        CAST(NULL AS TIMESTAMP) AS v_ts
      FROM events WHERE event_type = 'click'),
     w AS (
      SELECT user_id, ts, is_q,
        max(v_ts) OVER (PARTITION BY user_id ORDER BY ts
          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_view_ts
      FROM tagged)
    SELECT user_id, ts AS click_ts, asof_view_ts
    FROM w WHERE is_q = 1""")

  private val q88 = sqlTextQ("q88_sql_quality_filter", Seq("documents"),
    """SELECT doc_id,
      CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
        AS n_words,
      CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_letter_chars,
      CAST((length(text) - length(replace(text, 'the', ''))) / 3 AS BIGINT)
        AS n_the,
      (length(text) - length(replace(text, ' ', '')) + 1 >= 10
        AND length(text) - length(replace(text, ' ', '')) + 1 <= 1000
        AND length(replace(text, ' ', ''))
          >= (length(text) - length(replace(text, ' ', '')) + 1) * 3
        AND length(replace(text, ' ', ''))
          <= (length(text) - length(replace(text, ' ', '')) + 1) * 10
        AND (length(text) - length(replace(text, 'the', ''))) / 3 * 50
          >= length(text) - length(replace(text, ' ', '')) + 1)
        AS quality_pass
    FROM documents""")

  private val q89 = sqlTextQ("q89_sql_leakage_check", Seq("documents"),
    """WITH split AS (
      SELECT doc_id, text,
        CASE WHEN SUBSTRING(md5(CONCAT('split:',
            CAST(doc_id AS VARCHAR(20)))), 1, 1) < 'd'
          THEN 'train' ELSE 'test' END AS part
      FROM documents),
     tr AS (SELECT DISTINCT md5(text) AS h FROM split WHERE part = 'train')
    SELECT s.part, CAST(count(*) AS BIGINT) AS n_docs,
      CAST(SUM(CASE WHEN l.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_leaked
    FROM split s LEFT JOIN tr l ON md5(s.text) = l.h AND s.part = 'test'
    GROUP BY s.part""")

  val all: Seq[Q] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20,
    q21, q22, q23, q24, q25, q26, q27, q28, q29, q30,
    q31, q32, q33, q34, q35, q36, q37, q38, q39, q40,
    q41, q42, q43, q44, q45, q50, q52, q58, q59, q60,
    q61, q62, q63, q65, q66, q67, q69, q70, q71, q72,
    q73, q74, q75, q76, q77, q78, q79, q80, q83,
    q85, q86, q87, q88, q89)
}
