package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Single-cell preprocessing operators — the Seurat-vignette dependency
  * chain that feeds `RunHarmony` in the reference's own documentation
  * (normalize → select features → scale → PCA → harmony), re-expressed as
  * Spark dataflow over a sparse COO frame `(cell_id, gene_idx, count)`:
  * the gene×cell matrix is never densified; N cells is the parallel axis
  * and all aggregations are map-side combined.
  *
  * `scaleGene` mirrors the reference's `scaleData` semantics
  * (/root/reference/src/utils.cpp:112-155): per-gene standardization over
  * ALL cells (implicit zeros included, sample sd) with ±10 clipping.
  */
object SingleCell {

  /** CP10K log-normalization: log1p(count / cellTotal * 1e4). One grouped
    * aggregation for totals (map-side combine), one broadcast-joinable
    * small side when cells ≪ counts. */
  def logNormalize(coo: DataFrame): DataFrame = {
    val totals = coo.groupBy(col("cell_id")).agg(sum(col("count")).as("cell_total"))
    coo.join(totals, "cell_id")
      .withColumn("lognorm", log1p(col("count") / col("cell_total") * 1e4))
      .select(col("cell_id"), col("gene_idx"), col("lognorm"))
  }

  /** Deterministic feature selection: top-n genes by total count, dense
    * rank 0..n-1 (ties broken by gene_idx — stable across engines). The
    * result is n rows: always broadcastable. */
  def topGenes(coo: DataFrame, n: Int): DataFrame = {
    val spark = coo.sparkSession
    import spark.implicits._
    val ranked = coo.groupBy(col("gene_idx")).agg(sum(col("count")).as("total"))
      .orderBy(col("total").desc, col("gene_idx"))
      .limit(n)
      .collect() // n rows, driver-bounded by construction
      .zipWithIndex
      .map { case (r, rank) => (r.getAs[Int]("gene_idx"), rank) }
    spark.createDataset(ranked.toSeq).toDF("gene_idx", "feat_idx")
  }

  /** Per-gene standardization over ALL nCells (implicit zeros included,
    * sample sd) with ±10 clip. Returns the scaled SPARSE entries plus the
    * per-feature baseline (the scaled value of an implicit zero), so the
    * dense vector assembly can fill defaults without densifying here. */
  def scaleGenes(lognorm: DataFrame, features: DataFrame, nCells: Long)
      : (DataFrame, Array[Double]) = {
    val joined = lognorm.join(broadcast(features), "gene_idx")
    val stats = joined.groupBy(col("feat_idx"))
      .agg(sum(col("lognorm")).as("s"), sum(col("lognorm") * col("lognorm")).as("ss"))
      .collect()
      .map { r =>
        val s = r.getAs[Double]("s")
        val ss = r.getAs[Double]("ss")
        val mean = s / nCells
        val variance = math.max((ss - nCells * mean * mean) / (nCells - 1.0), 1e-12)
        (r.getAs[Int]("feat_idx"), mean, math.sqrt(variance))
      }
    val nFeat = stats.map(_._1).max + 1
    val mu = new Array[Double](nFeat)
    val sd = new Array[Double](nFeat)
    stats.foreach { case (f, m, s) => mu(f) = m; sd(f) = s }
    val baseline = Array.tabulate(nFeat)(f =>
      math.max(-10.0, math.min(10.0, (0.0 - mu(f)) / sd(f))))
    val spark = lognorm.sparkSession
    import spark.implicits._
    val statsDf = spark.createDataset(stats.toIndexedSeq).toDF("feat_idx", "mu", "sd")
    val scaled = joined.join(broadcast(statsDf), "feat_idx")
      .select(col("cell_id"), col("feat_idx"),
        greatest(lit(-10.0), least(lit(10.0),
          (col("lognorm") - col("mu")) / col("sd"))).as("scaled"))
    (scaled, baseline)
  }

  /** Dense per-cell vector assembly: group the scaled sparse entries per
    * cell, fill missing features with the (broadcast) implicit-zero
    * baseline. Output rows are (cell_id, features float[nFeat]). */
  def cellVectors(scaled: DataFrame, baseline: Array[Double]): DataFrame = {
    val spark = scaled.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(baseline.map(_.toFloat))
    scaled.select(col("cell_id").cast("long"), col("feat_idx"), col("scaled"))
      .as[(Long, Int, Double)]
      .groupByKey(_._1)
      .mapGroups { (cell, it) =>
        val v = bc.value.clone()
        it.foreach { case (_, f, s) => v(f) = s.toFloat }
        (cell, v)
      }
      .toDF("cell_id", "features")
  }

  /** Seurat `ProjectDim` analogue — the reference adapter's optional
    * post-correction feature-loading projection
    * (/root/reference/R/RunHarmony.R:113-119): project gene loadings onto
    * a (corrected) cell embedding, `L(g, j) = Σ_c expr(g, c) · emb(c, j)`.
    *
    * `expr` is the sparse COO frame (cell_id, gene_idx, <valueCol>); the
    * gene×cell matrix is never densified. Join on cell_id, explode the
    * d-wide embedding once per nonzero, and the (gene, dim) partial sums
    * fold map-side before the single shuffle; output is gene-bounded (one
    * d-wide row per gene). */
  def projectDim(expr: DataFrame, embedding: DataFrame,
      valueCol: String = "value"): DataFrame = {
    expr.join(embedding, "cell_id")
      .select(col("gene_idx"), col(valueCol).as("v"), posexplode(col("features")))
      .select(col("gene_idx"), col("pos"), (col("col") * col("v")).as("c"))
      .groupBy(col("gene_idx"), col("pos"))
      .agg(sum(col("c")).as("s"))
      .groupBy(col("gene_idx"))
      .agg(loadingAgg.as("loading"))
  }
  // assemble the per-gene array in dim order (d <= ~64 entries per gene)
  private val loadingAgg =
    expr("transform(array_sort(collect_list(struct(pos, s))), x -> x.s)")

  /** PCA embedding via MLlib (distributed Gram accumulation): dense cell
    * vectors → k principal components per cell. */
  def pcaEmbed(cells: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.ml.feature.PCA
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val input = cells.select(col("cell_id"),
      array_to_vector(col("features").cast("array<double>")).as("v"))
    val model = new PCA().setK(k).setInputCol("v").setOutputCol("pc").fit(input)
    model.transform(input)
      .select(col("cell_id"),
        vector_to_array(col("pc")).cast("array<float>").as("features"))
  }
}
