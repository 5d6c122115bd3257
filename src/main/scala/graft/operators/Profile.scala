package graft.operators

import org.apache.spark.sql.functions._

import graft.Q
import graft.sources.Tables

/** Data-profiling operator — the ANALYZE-style quality pass a pipeline runs
  * before trusting a new drop of data: per-column row/null/distinct counts
  * and min/max, emitted in long format (one row per column).
  *
  * Scale shape: ONE aggregation pass computes every column's stats
  * simultaneously (a single partial-agg + one exchange of a single row),
  * then the wide row unpivots via `stack` — profiling never rescans the
  * table per column. Min/max are emitted as strings so one schema covers
  * every column type; profiled columns here avoid floating point (dtype
  * formatting is engine-specific, everything else is exact). */
object Profile {

  private val p01 = Q(
    "p01_table_profile",
    (s, dir) => {
      val cols = Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate")
      val li = Tables.lineitem(s, dir)
      val aggs = cols.flatMap { c =>
        Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
          countDistinct(col(c)).as(s"${c}__ndv"),
          min(col(c)).cast("string").as(s"${c}__min"),
          max(col(c)).cast("string").as(s"${c}__max"))
      }
      val wide = li.agg(count(lit(1)).as("n_rows"), aggs: _*)
      val stackExpr = cols.map(c =>
        s"'$c', ${c}__nulls, ${c}__ndv, ${c}__min, ${c}__max").mkString(", ")
      wide.select(col("n_rows"), expr(
        s"stack(${cols.length}, $stackExpr) AS (column_name, n_nulls, n_distinct, min_value, max_value)"))
        .select(col("column_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_value"), col("max_value"))
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

  val all: Seq[Q] = Seq(p01)
}
