package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: dump formatted plans for representative queries and grep the
  * properties the 100 TB posture depends on: parquet PushedFilters, pruned
  * ReadSchema, BroadcastHashJoin on dimension joins, WholeStageCodegen spans.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val targets = Seq(
      "q01_pricing_summary", "q02_filter_project", "q03_shipping_priority",
      "q06_region_revenue", "q08_top_orders_per_cust", "q24_asof_join",
      "q25_topk_orders", "q30_range_join", "d01_exact_dedup", "s01_knn_bruteforce",
      "q45_asof_maxby", "s04_knn_lsh_oracle", "t08_repetition", "t09_pii_redact",
      "q46_kmv_ndv", "q47_kmv_grouped", "q48_kmv_merge",
      "q49_sample_quantiles", "q50_cdc_compact",
      "t10_pack_sequences", "t11_chunk_windows", "m04_media_resize",
      "s06_ann_pq_oracle", "s08_ann_pq_trained", "s10_ann_ivfpq",
      "p01_table_profile", "t12_filter_verdict",
      // s13/d14/t16/w05 are excluded on purpose: their entry bodies return
      // driver-materialized or checkpointed frames, so the printed plan is
      // a LocalTableScan that audits nothing while paying the full pipeline
      "q51_heavy_hitters", "q52_funnel")
    targets.foreach { name =>
      println(s"\n================ $name ================")
      val plan = graft.SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      println(plan)
    }
    spark.stop()
  }
}
