package graft

import org.apache.spark.sql.SparkSession

/** The engine's session entry point: one place that encodes the
  * configuration contract every graft query assumes.
  *
  * - `spark.sql.legacy.parquet.nanosAsLong=true` — the corpus's `events`
  *   table stores TIMESTAMP(NANOS), which Spark only reads as a long under
  *   this flag ([[graft.sources.Tables.normalizeNanos]] converts it back);
  *   without it every events query fails with PARQUET_TYPE_ILLEGAL.
  * - AQE on — runtime re-planning + skew-join splitting.
  * - `spark.sql.shuffle.partitions` sized to the executor core count, not
  *   the 200 default (right for local / small clusters; at 1000 executors
  *   set it near total-cores or rely on AQE coalescing).
  * - UTC session timezone — oracle comparisons are timezone-free.
  *
  * `configure` applies the contract to any user-supplied builder (cluster
  * deployments); `local(cores)` is the one-liner used by the driver mains.
  */
object GraftSession {

  def configure(builder: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    builder
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def local(cores: Int, uiEnabled: Boolean = false): SparkSession = {
    val s = configure(SparkSession.builder(), cores)
      .master(s"local[$cores]")
      .config("spark.ui.enabled", uiEnabled.toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
