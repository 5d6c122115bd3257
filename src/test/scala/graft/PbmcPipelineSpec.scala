package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.harmony._
import graft.operators.SingleCell
import graft.sources.RData

/** End-to-end Seurat-vignette-style pipeline on the reference's REAL pbmc
  * data (Kang et al. 2017 control/stimulated samples,
  * /root/reference/data/pbmc_stim.RData, documented in
  * /root/reference/R/data.R:16-31): raw gene counts → CP10K log-normalize
  * → top-gene selection → per-gene scale+clip → PCA(20) → Harmony by
  * condition — the complete workflow a reference user runs, every stage a
  * Spark dataflow.
  */
class PbmcPipelineSpec extends SparkSpec {

  private lazy val coo: DataFrame = {
    val objs = RData.readFile("/root/reference/data/pbmc_stim.RData")
    val sp = spark
    import sp.implicits._
    // cells get globally unique ids: ctrl 0..999, stim 1000..1999
    val frames = Seq("pbmc.ctrl" -> 0, "pbmc.stim" -> 1000).map { case (name, off) =>
      val (_, nCols, _, _, trip) = RData.dgcToTriplets(objs(name))
      assert(nCols == 1000)
      trip.map { case (g, c, v) => ((c + off).toLong, g, v) }
        .toDF("cell_id", "gene_idx", "count")
    }
    frames.reduce(_ union _).cache()
  }

  private def dataset = when(col("cell_id") < 1000, "ctrl").otherwise("stim")

  test("pbmc fixtures parse: 9,015 genes x 1,000 cells per condition") {
    val objs = RData.readFile("/root/reference/data/pbmc_stim.RData")
    assert(objs.keySet === Set("pbmc.ctrl", "pbmc.stim"))
    val (nGenes, nCells, genes, cells, trip) = RData.dgcToTriplets(objs("pbmc.ctrl"))
    assert(nGenes === 9015 && nCells === 1000)
    assert(genes.length === 9015 && cells.length === 1000)
    assert(trip.nonEmpty && trip.forall { case (g, c, v) =>
      g >= 0 && g < nGenes && c >= 0 && c < nCells && v > 0 })
  }

  test("vignette pipeline: normalize -> scale -> PCA -> harmony removes the condition effect") {
    val nCells = coo.select(col("cell_id")).distinct().count()
    assert(nCells === 2000)

    val lognorm = SingleCell.logNormalize(coo)
    val feats = SingleCell.topGenes(coo, 500)
    val (scaled, baseline) = SingleCell.scaleGenes(lognorm, feats, nCells)
    // scaleData contract: clipped to ±10 (utils.cpp:112-155)
    assert(scaled.filter(col("scaled") > 10.0 || col("scaled") < -10.0).count() === 0)

    val vectors = SingleCell.cellVectors(scaled, baseline).cache()
    assert(vectors.count() === 2000)
    assert(vectors.head().getAs[scala.collection.Seq[Float]]("features").length === 500)

    val embedded = SingleCell.pcaEmbed(vectors, 20).cache()
    assert(embedded.head().getAs[scala.collection.Seq[Float]]("features").length === 20)

    // ProjectDim analogue on the real data: one d-wide loading row per
    // selected gene, all finite (RunHarmony.R:113-119)
    val loadings = SingleCell.projectDim(
      scaled.select(col("cell_id"), col("feat_idx").as("gene_idx"), col("scaled")),
      embedded, valueCol = "scaled").collect()
    assert(loadings.length === 500)
    loadings.foreach { r =>
      val l = r.getAs[scala.collection.Seq[Double]]("loading")
      assert(l.length === 20 && l.forall(v => !v.isNaN && !v.isInfinite))
    }

    val withBatch = embedded.withColumn("dataset", dataset)
    def chi2(theta: Double): Double =
      Harmony.fit(withBatch, Seq("dataset"),
        HarmonyOptions(nclust = Some(10), theta = Seq(theta),
          maxIterHarmony = 2, maxIterCluster = 2, earlyStop = false))
        .state.chiSquared
    val lo = chi2(0.0)
    val hi = chi2(2.0)
    info(f"pbmc chi2(theta=0)=$lo%.1f chi2(theta=2)=$hi%.1f")
    assert(hi < lo, s"diversity penalty must reduce condition/cluster dependence: $hi !< $lo")

    // the corrected output is finite and complete
    val res = Harmony.fit(withBatch, Seq("dataset"), HarmonyOptions(
      nclust = Some(10), maxIterHarmony = 2, maxIterCluster = 2, earlyStop = false))
    val rows = res.corrected.collect()
    assert(rows.length === 2000)
    rows.foreach { r =>
      val f = r.getAs[scala.collection.Seq[Float]](1)
      assert(f.length === 20 && f.forall(v => !v.isNaN && !v.isInfinite))
    }
  }
}
