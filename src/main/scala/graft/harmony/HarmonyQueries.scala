package graft.harmony

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.sources.Tables

/** Driver-gate entries for the Harmony algorithm itself, run on the
  * `embeddings` test table (vec_id, embedding: array<float>, label) with
  * `label` as the batch covariate. The iterative algorithm is stochastic
  * (seeded k-means||) and not ANSI-SQL-expressible, so the full runs are
  * rows-only checks — the invariant suite in src/test mirrors the
  * reference's own invariant-based tests (SURVEY.md §5). Small derived
  * operators (normalization, batch priors) do get DuckDB oracles.
  */
object HarmonyQueries {

  private def embCells(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).select(
      col("vec_id").as("cell_id"),
      col("embedding").as("features"),
      col("label").cast("string").as("batch"))

  /** Options sized for the correctness harness (full defaults would run 10
    * rounds x 4 sweeps x 20 blocks on every verify invocation). */
  private def harnessOpts(nclust: Int, theta: Double) = HarmonyOptions(
    nclust = Some(nclust),
    theta = Seq(theta),
    maxIterHarmony = 2,
    maxIterCluster = 2,
    blockSize = 0.2,
    earlyStop = false)

  /** Full pipeline: normalize -> kmeans init -> diversity clustering ->
    * MoE ridge correction. Output: corrected embedding per cell. */
  private val h01 = Q(
    "h01_harmony_correct",
    (s, dir) => {
      val res = Harmony.run(embCells(s, dir), Seq("batch"), harnessOpts(20, 2.0))
      res.select(col("cell_id"), col("features"))
    },
    None)

  /** L2 (cosine) normalization, SURVEY op 26 — oracle-checked scalars. */
  private val h02 = Q(
    "h02_l2_normalize",
    (s, dir) => {
      val l2 = sqrt(aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double")))
      Tables.embeddings(s, dir).select(
        col("vec_id"),
        round(l2, 6).as("l2_norm"),
        round(element_at(col("embedding"), 1).cast("double") / l2, 6).as("first_normalized"))
    },
    Some("""SELECT vec_id,
      round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
      round(CAST(embedding[1] AS DOUBLE) /
        sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS first_normalized
      FROM embeddings"""))

  /** Batch sizes N_b and priors Pr_b (SURVEY ops 16-17). */
  private val h03 = Q(
    "h03_batch_priors",
    (s, dir) => {
      val counts = Tables.embeddings(s, dir)
        .groupBy(col("label")).agg(count(lit(1)).as("n_b"))
      counts.select(col("label"), col("n_b"),
        round(col("n_b").cast("double") / sum(col("n_b")).over(), 6).as("pr_b"))
    },
    Some("""SELECT label, count(*) AS n_b,
      round(CAST(count(*) AS DOUBLE) / sum(count(*)) OVER (), 6) AS pr_b
      FROM embeddings GROUP BY label"""))

  /** Seeded k-means|| init + hard assignment (SURVEY ops 32-33):
    * deterministic under the fixed seed but not SQL-expressible. */
  private val h04 = Q(
    "h04_kmeans_assign",
    (s, dir) => {
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val df = Tables.embeddings(s, dir).select(
        col("vec_id"),
        array_to_vector(col("embedding").cast("array<double>")).as("features"))
      val model = new KMeans().setK(10).setMaxIter(10).setSeed(42L).fit(df)
      model.transform(df).select(col("vec_id"), col("prediction").cast("long").as("cluster"))
    },
    None)

  /** The reference's central semantic property (test_integration.R:29-41):
    * higher diversity penalty theta must lower chi^2(O, E) — batch/cluster
    * dependence shrinks. Emitted as a 1-row query so the driver sees the
    * invariant hold on real runs. */
  private val h05 = Q(
    "h05_theta_diversity",
    (s, dir) => {
      val cells = embCells(s, dir)
      // single-round Sweep-mode fits: the chi2 ordering shows after one
      // penalized clustering round, no need for the full budget here
      def o(theta: Double) = HarmonyOptions(nclust = Some(8), theta = Seq(theta),
        maxIterHarmony = 1, maxIterCluster = 2, earlyStop = false,
        blockMode = BlockMode.Sweep)
      val lo = Harmony.fit(cells, Seq("batch"), o(0.0)).state.chiSquared
      val hi = Harmony.fit(cells, Seq("batch"), o(3.0)).state.chiSquared
      import s.implicits._
      Seq((lo, hi, lo - hi)).toDF("chi2_theta0", "chi2_theta3", "chi2_drop")
    },
    None)

  /** Per-component standard deviation — the Seurat adapter's stdev output
    * (SURVEY op 2, /root/reference/R/RunHarmony.R:106-111). */
  private val h06 = Q(
    "h06_component_stddev",
    (s, dir) => {
      Tables.embeddings(s, dir).agg(
        round(stddev_samp(element_at(col("embedding"), 1)), 6).as("sd1"),
        round(stddev_samp(element_at(col("embedding"), 2)), 6).as("sd2"),
        round(stddev_samp(element_at(col("embedding"), 3)), 6).as("sd3"),
        round(stddev_samp(element_at(col("embedding"), 4)), 6).as("sd4"))
    },
    Some("""SELECT round(stddev_samp(embedding[1]), 6) AS sd1,
      round(stddev_samp(embedding[2]), 6) AS sd2,
      round(stddev_samp(embedding[3]), 6) AS sd3,
      round(stddev_samp(embedding[4]), 6) AS sd4
      FROM embeddings"""))

  /** Head-to-head with the reference's quickstart (9,478 cells x 20 PCs in
    * ~4 s, BASELINE.md): REFERENCE-DEFAULT budgets on the whole embeddings
    * table (10 rounds x 4 sweeps x 20 blocks, early stopping on, K =
    * min(N/30, 100), 64 dims). Runs in the driver-local kernel — the
    * size-based strategy the engine picks below localThreshold. */
  private val h07 = Q(
    "h07_harmony_default",
    (s, dir) => {
      Harmony.run(embCells(s, dir), Seq("batch"), HarmonyOptions())
        .select(col("cell_id"), col("features"))
    },
    None)

  val all: Seq[Q] = Seq(h01, h02, h03, h04, h05, h06, h07)
}
