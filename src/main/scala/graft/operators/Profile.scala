package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q
import graft.sources.Tables

/** Data-profiling operator — the ANALYZE-style quality pass a pipeline runs
  * before trusting a new drop of data: per-column row/null/distinct counts
  * and min/max, emitted in long format (one row per column).
  *
  * Scale shape: one NARROW scan per column (parquet column pruning makes
  * each scan a single column's IO) with a single count-distinct per
  * branch. The tempting alternative — every column's stats in ONE wide
  * aggregation — plans multiple count-distincts as an Expand that
  * multiplies every row by the number of profiled columns and
  * sort-aggregates the blow-up (measured 5–8 s vs <1 s at sf0.1 for four
  * columns). Min/max are emitted as strings so one schema covers every
  * column type; profiled columns here avoid floating point (dtype
  * formatting is engine-specific, everything else is exact). */
object Profile {

  private val p01 = Q(
    "p01_table_profile",
    (s, dir) => {
      val cols = Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate")
      val li = Tables.lineitem(s, dir)
      cols.map { c =>
          li.select(col(c))
            .agg(count(lit(1)).as("n_rows"),
              sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
              countDistinct(col(c)).as("n_distinct"),
              min(col(c)).cast("string").as("min_value"),
              max(col(c)).cast("string").as("max_value"))
            .select(lit(c).as("column_name"), col("n_rows"), col("n_nulls"),
              col("n_distinct"), col("min_value"), col("max_value"))
        }.reduce(_.unionByName(_))
    },
    Some {
      val per = Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate").map(c =>
        s"""SELECT '$c' AS column_name, count(*) AS n_rows,
           CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           count(DISTINCT $c) AS n_distinct,
           CAST(min($c) AS VARCHAR) AS min_value,
           CAST(max($c) AS VARCHAR) AS max_value
         FROM lineitem""").mkString("\nUNION ALL\n")
      per
    })

  // ---------------------------------------------------------------- p02
  /** DISTRIBUTION-DRIFT DETECTION via the Population Stability Index
    * (the standard model-monitoring statistic in credit scoring and ML
    * ops; public) — the data-quality pass that catches "this month's data
    * doesn't look like last month's" BEFORE a model trains on it:
    * PSI = Σ_bins (p_i − q_i)·log(p_i/q_i) between a baseline period and
    * a comparison period. Here: 1995 vs 1996 order totals, 10 equal-width
    * bins over the GLOBAL price range (bin edges from data bounds, the
    * q58 pattern), add-½ smoothing so empty bins stay finite. Convention:
    * log10 (any fixed base scales PSI; documented here, micro-rounded per
    * bin so the sum is exact long arithmetic — the t15/t21 pattern).
    *
    * Scale shape: bin edges are one global agg (broadcast scalar); the
    * two period histograms are ONE conditional-count pass over the
    * pushed-down year filter (the t23 lesson — never two scans for two
    * slices of one table); everything downstream operates on ≤ 10 rows. */
  private val p02 = Q(
    "p02_drift_psi",
    (s, dir) => {
      val o = Tables.orders(s, dir)
        .select(round(col("o_totalprice") * 100).cast("long").as("c"),
          year(col("o_orderdate")).as("yr"))
      val bounds = o.agg(min(col("c")).as("cmin"), max(col("c")).as("cmax"))
      val binned = o.filter(col("yr").isin(1995, 1996))
        .crossJoin(broadcast(bounds))
        .select(least(lit(9L), expr("(c - cmin) * 10 div (cmax - cmin + 1)")).as("bin"),
          col("yr"))
        .groupBy(col("bin"))
        .agg(sum(when(col("yr") === 1995, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("yr") === 1996, 1L).otherwise(0L)).as("n_b"))
      val tot = binned.agg(sum(col("n_a")).as("na_tot"), sum(col("n_b")).as("nb_tot"))
      binned.crossJoin(broadcast(tot))
        .select(col("bin"), col("n_a"), col("n_b"),
          round(round(((col("n_a") + 0.5) / (col("na_tot") + 5.0) -
            (col("n_b") + 0.5) / (col("nb_tot") + 5.0)) *
            log10(((col("n_a") + 0.5) * (col("nb_tot") + 5.0)) /
              ((col("n_b") + 0.5) * (col("na_tot") + 5.0))) * 1e6)
            .cast("long") / 1e6, 6).as("psi_term"))
    },
    Some("""WITH o AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c,
          year(o_orderdate) AS yr
        FROM orders),
      bounds AS (SELECT min(c) AS cmin, max(c) AS cmax FROM o),
      binned AS (
        SELECT least(9, (c - cmin) * 10 // (cmax - cmin + 1)) AS bin,
          sum(CASE WHEN yr = 1995 THEN 1 ELSE 0 END) AS n_a,
          sum(CASE WHEN yr = 1996 THEN 1 ELSE 0 END) AS n_b
        FROM o CROSS JOIN bounds WHERE yr IN (1995, 1996)
        GROUP BY 1),
      tot AS (SELECT sum(n_a) AS na_tot, sum(n_b) AS nb_tot FROM binned)
      SELECT bin, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        round(CAST(round(((n_a + 0.5) / (na_tot + 5.0) -
          (n_b + 0.5) / (nb_tot + 5.0)) *
          log10(((n_a + 0.5) * (nb_tot + 5.0)) /
            ((n_b + 0.5) * (na_tot + 5.0))) * 1e6) AS BIGINT) / 1e6, 6) AS psi_term
      FROM binned CROSS JOIN tot"""))

  // ---------------------------------------------------------------- p03
  /** DATA-QUALITY ASSERTION SUITE (the dbt-test / Great-Expectations /
    * Deequ contract pattern; public) — the named checks a pipeline gates a
    * new data drop on, each emitting (check, n_bad, pass). Two check
    * shapes, each in its scale-correct plan: (a) WITHIN-TABLE predicates
    * fold into ONE conditional-count scan per table (the t23 lesson —
    * never two scans for two predicates on one table; the violation
    * counts are map-side-combined sums of CASE expressions); (b)
    * REFERENTIAL-INTEGRITY checks are left-anti joins on the key — the
    * shuffle is key-only, and on a star schema the dimension side
    * broadcasts. The suite result is a fixed-size frame (one row per
    * check) regardless of data volume. */
  private val p03 = Q(
    "p03_quality_checks",
    (s, dir) => {
      def check(name: String, nBad: org.apache.spark.sql.Column) = struct(
        lit(name).as("check"), nBad.cast("long").as("n_bad"))
      // one conditional-count pass per table
      val ordersChecks = Tables.orders(s, dir).agg(
        check("orders_orderkey_unique",
          count(lit(1)) - countDistinct(col("o_orderkey"))).as("c1"),
        check("orders_totalprice_positive",
          sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L))).as("c2"),
        check("orders_orderdate_bounds",
          sum(when(col("o_orderdate").cast("date") < lit("1990-01-01").cast("date") ||
            col("o_orderdate").cast("date") >= lit("2030-01-01").cast("date"), 1L)
            .otherwise(0L))).as("c3"))
        .select(explode(array(col("c1"), col("c2"), col("c3"))).as("c"))
      val lineitemChecks = Tables.lineitem(s, dir).agg(
        check("lineitem_quantity_range",
          sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
            .otherwise(0L))).as("c1"),
        check("lineitem_discount_range",
          sum(when(col("l_discount") < 0 || col("l_discount") > 0.5, 1L)
            .otherwise(0L))).as("c2"))
        .select(explode(array(col("c1"), col("c2"))).as("c"))
      val custChecks = Tables.customer(s, dir).agg(
        check("customer_name_format",
          sum(when(!col("c_name").rlike("^Customer#[0-9]+$"), 1L)
            .otherwise(0L))).as("c1"))
        .select(col("c1").as("c"))
      // referential integrity: anti-join on the key (dimension broadcasts)
      val fkOrders = Tables.orders(s, dir).join(
          broadcast(Tables.customer(s, dir)),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(check("orders_custkey_fk", count(lit(1))).as("c"))
        .select(col("c"))
      val fkLineitem = Tables.lineitem(s, dir).join(
          Tables.orders(s, dir).select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(check("lineitem_orderkey_fk", count(lit(1))).as("c"))
        .select(col("c"))
      ordersChecks.unionByName(lineitemChecks).unionByName(custChecks)
        .unionByName(fkOrders).unionByName(fkLineitem)
        .select(col("c.check").as("check"), col("c.n_bad").as("n_bad"),
          (col("c.n_bad") === 0L).as("pass"))
    },
    Some("""WITH o AS (
        SELECT 'orders_orderkey_unique' AS "check",
            CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_bad
          FROM orders
        UNION ALL
        SELECT 'orders_totalprice_positive',
            CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
          FROM orders
        UNION ALL
        SELECT 'orders_orderdate_bounds',
            CAST(sum(CASE WHEN CAST(o_orderdate AS DATE) < DATE '1990-01-01'
              OR CAST(o_orderdate AS DATE) >= DATE '2030-01-01'
              THEN 1 ELSE 0 END) AS BIGINT)
          FROM orders
        UNION ALL
        SELECT 'lineitem_quantity_range',
            CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT)
          FROM lineitem
        UNION ALL
        SELECT 'lineitem_discount_range',
            CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.5 THEN 1 ELSE 0 END) AS BIGINT)
          FROM lineitem
        UNION ALL
        SELECT 'customer_name_format',
            CAST(sum(CASE WHEN NOT regexp_matches(c_name, '^Customer#[0-9]+$')
              THEN 1 ELSE 0 END) AS BIGINT)
          FROM customer
        UNION ALL
        SELECT 'orders_custkey_fk',
            CAST(count(*) AS BIGINT)
          FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        UNION ALL
        SELECT 'lineitem_orderkey_fk',
            CAST(count(*) AS BIGINT)
          FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
      SELECT "check", n_bad, n_bad = 0 AS pass FROM o"""))

  // ---------------------------------------------------------------- p06
  /** CONSTRAINT-ENFORCED WRITE WITH QUARANTINE (the Delta Live Tables
    * "expectations" / writer-side CHECK mechanic): a landing write
    * declares row contracts — NOT NULL, a CHECK range, referential
    * membership, a value domain — and instead of failing the job or
    * silently landing garbage, rows violating ANY contract divert to a
    * QUARANTINE table carrying the full list of violated constraints
    * (triage needs every reason, not the first), while clean rows land.
    * The fixture plants four disjoint-mod corruption classes on the
    * orders feed (a null, a sign flip, a dangling FK, an off-domain
    * status), so each constraint demonstrably fires, overlaps produce
    * multi-reason rows, and DuckDB recomputes the same verdicts from the
    * same plant formulas. The clean side REALLY lands (parquet write +
    * read-back); its row count and cents sum ride on every quarantine
    * row as cross-engine-recomputed columns, so short- or over-landing
    * is a hash mismatch, not a constant-true.
    *
    * Scale shape: verdicts are row-local expressions except the FK probe
    * — a broadcast left join against the (dimension-sized) key set, the
    * q56 semijoin posture; one scan feeds both sinks via the reasons
    * predicate; no row is read twice. */
  private val p06 = Q(
    "p06_constraint_quarantine",
    (s, dir) => {
      import org.apache.spark.sql.functions.broadcast
      val base = Tables.orders(s, dir).select(col("o_orderkey").as("k"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"),
        col("o_custkey").as("ck"), col("o_orderstatus").as("st"))
      val corrupted = base.select(col("k"),
        when(col("k") % 97 === 5, lit(null))
          .when(col("k") % 89 === 7, -col("cents"))
          .otherwise(col("cents")).as("cents"),
        when(col("k") % 83 === 11, col("ck") + 10000000L)
          .otherwise(col("ck")).as("ck"),
        when(col("k") % 79 === 13, lit("X")).otherwise(col("st")).as("st"))
      val fkKeys = broadcast(Tables.customer(s, dir)
        .select(col("c_custkey").as("ck")).distinct()
        .withColumn("fk_ok", lit(true)))
      val flagged = corrupted.join(fkKeys, Seq("ck"), "left")
        .withColumn("reasons", concat_ws(",",
          when(col("cents").isNull, "not_null_cents"),
          when(col("cents") <= 0L, "check_cents_positive"),
          when(col("fk_ok").isNull, "fk_customer"),
          when(!col("st").isin("O", "F", "P"), "check_status_domain")))
      val work = java.nio.file.Files.createTempDirectory("graft_p06_")
      try {
        val cleanDir = work.resolve("clean").toString
        flagged.filter(col("reasons") === "")
          .select(col("k"), col("cents"), col("ck"), col("st"))
          .write.mode("overwrite").parquet(cleanDir)
        // coalesce: an all-quarantined batch sums to NULL — degrade to a
        // red gate value (0 clean rows / 0 cents), not a driver NPE
        val landed = s.read.parquet(cleanDir)
          .agg(count(lit(1)), coalesce(sum(col("cents")), lit(0L)),
            coalesce(max(when(col("cents") <= 0L
              || col("cents").isNull, 1L).otherwise(0L)), lit(0L))).head()
        val (nClean, cleanSum, anyBad) =
          (landed.getLong(0), landed.getLong(1), landed.getLong(2))
        val out = flagged.filter(col("reasons") =!= "")
          .select(col("k"), col("reasons"),
            lit(nClean).as("clean_rows"), lit(cleanSum).as("clean_cents_sum"),
            lit(anyBad == 0L).as("clean_landed_constraint_free"))
        graft.functions.CrossEngine.materializeLocal(s, out)
      } finally {
        graft.functions.CrossEngine.deleteRecursive(work)
      }
    },
    Some("""WITH base AS (
        SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
          o_custkey AS ck, o_orderstatus AS st
        FROM orders),
      corr AS (
        SELECT k,
          CASE WHEN k % 97 = 5 THEN NULL
               WHEN k % 89 = 7 THEN -cents ELSE cents END AS cents,
          CASE WHEN k % 83 = 11 THEN ck + 10000000 ELSE ck END AS ck,
          CASE WHEN k % 79 = 13 THEN 'X' ELSE st END AS st
        FROM base),
      flagged AS (
        SELECT k, cents, concat_ws(',',
          CASE WHEN cents IS NULL THEN 'not_null_cents' END,
          CASE WHEN cents <= 0 THEN 'check_cents_positive' END,
          CASE WHEN ck NOT IN (SELECT c_custkey FROM customer) THEN 'fk_customer' END,
          CASE WHEN st NOT IN ('O', 'F', 'P') THEN 'check_status_domain' END) AS reasons
        FROM corr),
      cleanagg AS (
        SELECT count(*) AS n, sum(cents) AS s FROM flagged WHERE reasons = '')
      SELECT f.k, f.reasons, CAST(c.n AS BIGINT) AS clean_rows,
        CAST(c.s AS BIGINT) AS clean_cents_sum,
        true AS clean_landed_constraint_free
      FROM flagged f, cleanagg c WHERE f.reasons <> ''"""))

  // ---------------------------------------------------------------- p07
  /** CROSS-TABLE RECONCILIATION AUDIT (the referential-integrity +
    * aggregate-consistency sweep a warehouse runs before trusting a batch:
    * p03 checks rows against their own table's rules, p07 checks tables
    * against EACH OTHER): three orphan checks (fact rows whose foreign key
    * resolves nowhere — each one left-anti join keyed on the dimension's
    * key, dimension side broadcast) and one aggregate reconciliation
    * (order header total vs the order's lineitem gross to the cent).
    *
    * The verdict on this fixture is honestly SPLIT: the key graph is
    * intact (zero orphans on all three edges) while the header totals
    * reconcile NOWHERE (violation rate exactly 1.0) — the driver's
    * generator draws o_totalprice independently of the lineitems, and the
    * audit's job is to SAY so; the oracle recomputes the same counts, so
    * a broken anti-join or a wrong tolerance reds on values. Scale shape:
    * each check is one scan + broadcast anti-join or one map-side-combined
    * grouped sum; violation counts, never violating rows, cross the
    * exchange. */
  private val p07 = Q(
    "p07_reconciliation",
    (s, dir) => {
      def orphanCheck(name: String, fact: DataFrame, fk: String,
          dim: DataFrame, pk: String, nFact: Long): DataFrame = {
        val orphans = fact.join(broadcast(dim.select(col(pk))),
          fact(fk) === dim(pk), "left_anti").count()
        s.range(1).select(lit(name).as("check_name"),
          lit(nFact).as("n_rows_checked"), lit(orphans).as("n_violations"),
          lit(math.round(orphans.toDouble / nFact * 1e6)).as("violation_rate_micro"))
      }
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables(s, dir, "nation")
      val gross = li.groupBy(col("l_orderkey")).agg(
        sum(expr("cast(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) as bigint)"))
          .as("gross_cents"))
      val hdr = o.select(col("o_orderkey"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("hdr_cents"))
      val rec = hdr.join(gross, col("o_orderkey") === col("l_orderkey"))
      val nOrders = rec.count()
      val bad = rec.filter(abs(col("hdr_cents") - col("gross_cents")) > 1L).count()
      orphanCheck("lineitem_has_order", li, "l_orderkey", o, "o_orderkey", li.count())
        .unionByName(orphanCheck("order_has_customer", o, "o_custkey", c,
          "c_custkey", o.count()))
        .unionByName(orphanCheck("customer_has_nation", c, "c_nationkey", n,
          "n_nationkey", c.count()))
        .unionByName(s.range(1).select(
          lit("header_total_reconciles").as("check_name"),
          lit(nOrders).as("n_rows_checked"), lit(bad).as("n_violations"),
          lit(math.round(bad.toDouble / nOrders * 1e6)).as("violation_rate_micro")))
    },
    Some("""WITH l_orph AS (
        SELECT count(*) AS n, count(*) FILTER (o.o_orderkey IS NULL) AS v
        FROM lineitem li LEFT JOIN orders o ON li.l_orderkey = o.o_orderkey),
      o_orph AS (
        SELECT count(*) AS n, count(*) FILTER (c.c_custkey IS NULL) AS v
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey),
      c_orph AS (
        SELECT count(*) AS n, count(*) FILTER (nn.n_nationkey IS NULL) AS v
        FROM customer c LEFT JOIN nation nn ON c.c_nationkey = nn.n_nationkey),
      rec AS (
        SELECT count(*) AS n,
          count(*) FILTER (abs(hdr_cents - gross_cents) > 1) AS v
        FROM (
          SELECT o.o_orderkey,
            CAST(round(o.o_totalprice * 100) AS BIGINT) AS hdr_cents,
            sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * (1 + l.l_tax) * 100) AS BIGINT))
              AS gross_cents
          FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
          GROUP BY o.o_orderkey, o.o_totalprice) t)
      SELECT 'lineitem_has_order' AS check_name, CAST(n AS BIGINT) AS n_rows_checked,
        CAST(v AS BIGINT) AS n_violations,
        CAST(round(CAST(v AS DOUBLE) / n * 1e6) AS BIGINT) AS violation_rate_micro
      FROM l_orph
      UNION ALL SELECT 'order_has_customer', CAST(n AS BIGINT), CAST(v AS BIGINT),
        CAST(round(CAST(v AS DOUBLE) / n * 1e6) AS BIGINT) FROM o_orph
      UNION ALL SELECT 'customer_has_nation', CAST(n AS BIGINT), CAST(v AS BIGINT),
        CAST(round(CAST(v AS DOUBLE) / n * 1e6) AS BIGINT) FROM c_orph
      UNION ALL SELECT 'header_total_reconciles', CAST(n AS BIGINT), CAST(v AS BIGINT),
        CAST(round(CAST(v AS DOUBLE) / n * 1e6) AS BIGINT) FROM rec"""))

  // ---------------------------------------------------------------- p08
  /** K-ANONYMITY + L-DIVERSITY RELEASE GATE (Sweeney '02; Machanavajjhala
    * '07 — the publish-side counterpart of t09's PII detection: before a
    * grouped extract of training data leaves the pipeline, every
    * quasi-identifier group must contain at least k members, and the
    * sensitive attribute within each group must take at least l distinct
    * values — k alone leaves a group re-identifiable by HOMOGENEITY when
    * everyone in it shares the sensitive value, which is exactly what
    * l-diversity closes). Groups failing either bar are SUPPRESSED (the
    * standard suppression-based anonymization); the release carries the
    * surviving groups plus the suppression accounting so the caller can
    * see what the gate withheld.
    *
    * Fixture: customers grouped by the (nation, market-segment)
    * quasi-identifier pair, sensitive attribute = the account-balance
    * sign (negative balances are the minority class, so the l = 2 bar
    * really fires on homogeneous groups at small SF). Everything is
    * exact integer arithmetic — group sizes, distinct-sensitive counts,
    * suppression totals, the released fraction in micro-units — fully
    * DuckDB-mirrored.
    *
    * Scale shape: one map-side-combined grouped agg over the QI pair
    * (count + a bounded distinct over a 2-value sensitive class), one
    * broadcast-sized totals join; nothing row-sized leaves the
    * executors. */
  private val p08 = Q(
    "p08_k_anonymity",
    (s, dir) => {
      val k = 5L
      val l = 2L
      val groups = Tables.customer(s, dir)
        .select(col("c_nationkey"), col("c_mktsegment"),
          when(col("c_acctbal") < 0, lit("neg")).otherwise(lit("nonneg"))
            .as("sens"))
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("group_size"),
          countDistinct(col("sens")).as("distinct_sensitive"))
        .withColumn("released",
          col("group_size") >= k && col("distinct_sensitive") >= l)
      val totals = groups.agg(
        sum(when(!col("released"), col("group_size")).otherwise(0L))
          .as("suppressed_rows"),
        sum(when(!col("released"), 1L).otherwise(0L)).as("suppressed_groups"),
        sum(col("group_size")).as("total_rows"))
      groups.filter(col("released"))
        .select(col("c_nationkey"), col("c_mktsegment"),
          col("group_size"), col("distinct_sensitive"))
        .crossJoin(broadcast(totals))
        .withColumn("released_fraction_micro",
          expr("(total_rows - suppressed_rows) * 1000000 div total_rows"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("group_size"),
          col("distinct_sensitive"), col("suppressed_groups"),
          col("suppressed_rows"), col("released_fraction_micro"))
    },
    Some("""WITH g AS (
        SELECT c_nationkey, c_mktsegment,
          CAST(count(*) AS BIGINT) AS group_size,
          CAST(count(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
            ELSE 'nonneg' END) AS BIGINT) AS distinct_sensitive
        FROM customer GROUP BY c_nationkey, c_mktsegment),
      t AS (
        SELECT
          CAST(sum(CASE WHEN group_size >= 5 AND distinct_sensitive >= 2
            THEN 0 ELSE group_size END) AS BIGINT) AS suppressed_rows,
          CAST(sum(CASE WHEN group_size >= 5 AND distinct_sensitive >= 2
            THEN 0 ELSE 1 END) AS BIGINT) AS suppressed_groups,
          CAST(sum(group_size) AS BIGINT) AS total_rows
        FROM g)
      SELECT c_nationkey, c_mktsegment, group_size, distinct_sensitive,
        t.suppressed_groups, t.suppressed_rows,
        (t.total_rows - t.suppressed_rows) * 1000000 // t.total_rows
          AS released_fraction_micro
      FROM g CROSS JOIN t
      WHERE group_size >= 5 AND distinct_sensitive >= 2"""))

  val all: Seq[Q] = Seq(p01, p02, p03, p06, p07, p08)
}
