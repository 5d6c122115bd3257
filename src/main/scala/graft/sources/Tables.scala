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

  /** The driver's `events` parquet stores TIMESTAMP(NANOS), which Spark only
    * reads as LongType under `spark.sql.legacy.parquet.nanosAsLong` (set in
    * our session builders). Convert any such column back to a (microsecond)
    * timestamp — the test data carries no sub-microsecond components.
    */
  def normalizeNanos(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.LongType
    // the only nanos column in the corpus is events.ts
    if (df.columns.contains("ts") && df.schema("ts").dataType == LongType)
      df.withColumn("ts", expr("timestamp_micros(CAST(ts / 1000 AS LONG))"))
    else df
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
