package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MatrixMarket coordinate-format ingestion (SURVEY op 9 — the reference's
  * 10X `readMM` path, /root/reference/vignettes/Seurat.Rmd:63-74) as a
  * distributed text scan -> COO DataFrame. The gene/barcode TSVs become
  * dimension tables joined by 1-based position.
  *
  * Scale: `spark.read.text` splits the file across executors; the header is
  * dropped by filtering comment lines and the single dims row (detected by
  * parsing), so no driver-side file pass is needed.
  */
object MatrixMarket {

  /** COO frame (row_id, col_id, value) from a %%MatrixMarket coordinate
    * file. 1-based indices preserved as in the format. */
  def readCoo(spark: SparkSession, path: String): DataFrame = {
    // dims header (rows cols nnz) read once on the driver (first non-comment
    // line); the distributed scan then drops rows matching that signature —
    // a real COO entry can't collide with it since nnz >= any row index
    val header = spark.read.text(path)
      .filter(!col("value").startsWith("%") && length(trim(col("value"))) > 0)
      .head().getString(0).trim.split("\\s+")
    val (hr, hc, hn) = (header(0).toLong, header(1).toLong, header(2).toDouble)
    spark.read.text(path)
      .filter(!col("value").startsWith("%") && length(trim(col("value"))) > 0)
      .select(split(trim(col("value")), "\\s+").as("f"))
      .filter(size(col("f")) >= 3)
      .select(
        col("f").getItem(0).cast("long").as("row_id"),
        col("f").getItem(1).cast("long").as("col_id"),
        col("f").getItem(2).cast("double").as("value"))
      .filter(!(col("row_id") === hr && col("col_id") === hc && col("value") === hn))
  }

  /** Dimension table from a one-entry-per-line TSV (barcodes / gene names):
    * (id = 1-based line position, name). */
  def readNames(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path).rdd.zipWithIndex()
      .map { case (name, i) => (i + 1, name) }
      .toDF("id", "name")
  }
}
