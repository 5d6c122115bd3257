package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated star schema
  * (`/root/repo/TESTDATA.md`). Loading stays lazy/declarative so Catalyst
  * pushes filters and column pruning into the parquet scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    normalizeNanos(df)
  }

  /** Timestamp-LAYOUT normalizer for `events.ts` — the driver has shipped
    * the column in two physical layouts across testdata generations, and
    * every engine path (batch windows, watermarked streams, oracles) needs
    * one canonical `TimestampType`:
    *
    *  - TIMESTAMP(NANOS): Spark only reads it as LongType under
    *    `spark.sql.legacy.parquet.nanosAsLong` (set in [[graft.GraftSession]]);
    *    converted back to a microsecond timestamp (the corpus carries no
    *    sub-microsecond components).
    *  - `timestamp[us]` with no timezone: Spark reads TIMESTAMP_NTZ, which
    *    `withWatermark` REJECTS at analysis (`EVENT_TIME_IS_NOT_ON_TIMESTAMP_
    *    TYPE`) even though batch windows tolerate it. Cast to TimestampType —
    *    the session timezone is pinned to UTC (GraftSession contract), so the
    *    wall-clock values are preserved bit-for-bit.
    */
  def normalizeNanos(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    if (!df.columns.contains("ts")) df
    else df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(CAST(ts / 1000 AS LONG))"))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
