package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries and oracles are aggregated from the operator modules via
  * [[Registry]]; each module owns its `Seq[Q]` (name, Spark impl, optional
  * DuckDB oracle SQL).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the full Harmony pipeline (L2 normalize -> seeded k-means|| init
    * -> maximum-diversity clustering -> MoE ridge correction) on the
    * embeddings table with `label` as the batch covariate. */
  def entry(spark: SparkSession): DataFrame =
    Registry.all.find(_.name == "h01_harmony_correct").get
      .fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 / §2.13. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (driver
    * records a weaker rows-only check for those). */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
