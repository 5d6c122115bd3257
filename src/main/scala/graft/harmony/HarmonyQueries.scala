package graft.harmony

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.sources.Tables

/** Driver-gate entries for the Harmony algorithm itself, run on the
  * `embeddings` test table (vec_id, embedding: array<float>, label) with
  * `label` as the batch covariate. The iterative algorithm is stochastic
  * (seeded k-means||) and not ANSI-SQL-expressible, so every full fit runs
  * under the gate as INVARIANTS (the d11 constant-true-oracle pattern,
  * VERDICT r5 #2): shape constants + `n_cells` the DuckDB oracle recomputes
  * for real, plus column-stochastic/finiteness booleans. The raw embedding
  * values stay pinned by the sbt invariant suite, mirroring the reference's
  * own invariant-based tests (SURVEY.md §5). Small derived operators
  * (normalization, batch priors) get direct DuckDB oracles.
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

  /** Gate-visible invariant payload of a full fit (VERDICT r5 #2 — the
    * d11/h10 constant-true-oracle pattern, replacing the former rows-only
    * dump of 500 stochastic per-cell scalars): DuckDB recomputes `n_cells`
    * and the K/B shape constants for real; the booleans pin
    * column-stochastic R (every cell's soft assignments sum to 1) and a
    * finite corrected embedding. Both reductions are distributed map +
    * scalar agg over the cells Dataset — nothing N-sized reaches the
    * driver — so a regression in the fit itself now turns the DRIVER red,
    * not just sbt (the raw vectors stay pinned by HarmonySpec). */
  private def fitInvariants(res: HarmonyResult): DataFrame = {
    val sp = res.cells.sparkSession
    import sp.implicits._
    val stats = res.cells.map { c =>
      var s = 0.0
      var i = 0
      while (i < c.r.length) { s += c.r(i); i += 1 }
      (math.abs(s - 1.0),
        if (c.zCorr.exists(v => v.isNaN || v.isInfinite)) 1L else 0L)
    }.toDF("r_dev", "bad")
      .agg(count(lit(1)), max(col("r_dev")), sum(col("bad")))
      .head()
    Seq((stats.getLong(0), res.state.K.toLong, res.state.B.toLong,
        stats.getDouble(1) < 1e-3, stats.getLong(2) == 0L))
      .toDF("n_cells", "k_clusters", "b_levels",
        "r_column_stochastic", "corrected_finite")
  }

  /** Full pipeline: normalize -> kmeans init -> diversity clustering ->
    * MoE ridge correction, under the hash gate as invariants (K is the
    * harness's fixed 20; B = distinct labels, recomputed by DuckDB). */
  private val h01 = Q(
    "h01_harmony_correct",
    (s, dir) => fitInvariants(
      Harmony.fit(embCells(s, dir), Seq("batch"), harnessOpts(20, 2.0))),
    Some("""SELECT (SELECT count(*) FROM embeddings) AS n_cells,
      CAST(20 AS BIGINT) AS k_clusters,
      (SELECT count(DISTINCT label) FROM embeddings) AS b_levels,
      true AS r_column_stochastic, true AS corrected_finite"""))

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

  /** Hard cluster assignment (SURVEY ops 32-34): deterministic seeding
    * (centers = the 10 lowest vec_ids' embeddings — the "pick initial
    * centers, assign all points" first Lloyd half-step) so the argmin is
    * ANSI-expressible and the full assignment dataflow runs under the
    * DuckDB oracle (the d06-d08 pattern). Distances are rounded to 6dp
    * before the argmin so 1-ulp summation differences can't flip it; ties
    * break on the lower centroid id in both engines (struct min). The
    * MLlib seeded k-means|| path stays covered by HarmonySpec. */
  private val h04 = Q(
    "h04_kmeans_assign",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val centers = broadcast(
        emb.orderBy(col("vec_id")).limit(10)
          .select(col("vec_id").as("cid"), col("embedding").as("center")))
      val dist2 = aggregate(
        zip_with(col("embedding"), col("center"),
          (x, c) => (x.cast("double") - c.cast("double")) * (x.cast("double") - c.cast("double"))),
        lit(0.0), (acc, d) => acc + d)
      emb.crossJoin(centers)
        .select(col("vec_id"), col("cid"), round(dist2, 6).as("d2"))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("d2"), col("cid"))).as("best"))
        .select(col("vec_id"),
          col("best.cid").as("cluster"),
          col("best.d2").as("dist2"))
    },
    Some("""SELECT vec_id, best.cid AS cluster, best.d2 AS dist2 FROM (
      SELECT e.vec_id,
        min(struct_pack(d2 := round(list_sum(list_transform(
              list_zip(e.embedding, c.center),
              p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                 * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), 6),
            cid := c.cid)) AS best
      FROM embeddings e CROSS JOIN (
        SELECT vec_id AS cid, embedding AS center FROM embeddings
        ORDER BY vec_id LIMIT 10) c
      GROUP BY e.vec_id) t"""))

  /** The reference's central semantic property (test_integration.R:29-41):
    * higher diversity penalty theta must lower chi^2(O, E) — batch/cluster
    * dependence shrinks. Reduced to scale-invariant booleans behind a
    * constant-true oracle (the d11 pattern, VERDICT r4 #2) so the real fits
    * run under the driver's HASH gate, not just rows>0: any chi2 ordering
    * regression or non-finite fit flips a boolean and the driver goes red.
    * The raw chi2 magnitudes stay pinned by HarmonySpec's θ-monotone tests. */
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
      Seq((lo - hi > 0.0,
          !lo.isNaN && !lo.isInfinite && !hi.isNaN && !hi.isInfinite,
          lo >= 0.0 && hi >= 0.0))
        .toDF("chi2_drop_positive", "chi2_finite", "chi2_nonnegative")
    },
    Some("""SELECT true AS chi2_drop_positive, true AS chi2_finite,
      true AS chi2_nonnegative"""))

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
    (s, dir) => fitInvariants(
      Harmony.fit(embCells(s, dir), Seq("batch"), HarmonyOptions())),
    // default K = min(round(N/30), 100) (Harmony.scala nclust heuristic);
    // floor(x + 0.5) is exactly Scala's math.round for positive x
    Some("""SELECT (SELECT count(*) FROM embeddings) AS n_cells,
      (SELECT least(CAST(floor(count(*) / 30.0 + 0.5) AS BIGINT), 100)
         FROM embeddings) AS k_clusters,
      (SELECT count(DISTINCT label) FROM embeddings) AS b_levels,
      true AS r_column_stochastic, true AS corrected_finite"""))

  /** Two-covariate integration (test_two_variable.R:13-55 analogue): a
    * second covariate derived from the id joins `batch`; B = total levels
    * across BOTH covariates flows through θ-expansion, the penalty, and the
    * MoE design — and the oracle recomputes exactly that B (labels +
    * distinct id-mod-3 plates), so a level-counting regression goes red. */
  private val h08 = Q(
    "h08_two_covariates",
    (s, dir) => {
      val cells = embCells(s, dir)
        .withColumn("plate", concat(lit("p"), pmod(col("cell_id"), lit(3))))
      fitInvariants(
        Harmony.fit(cells, Seq("batch", "plate"), harnessOpts(10, 1.0)))
    },
    Some("""SELECT (SELECT count(*) FROM embeddings) AS n_cells,
      CAST(10 AS BIGINT) AS k_clusters,
      (SELECT count(DISTINCT label) FROM embeddings)
        + (SELECT count(DISTINCT vec_id % 3) FROM embeddings) AS b_levels,
      true AS r_column_stochastic, true AS corrected_finite"""))

  /** The DISTRIBUTED Sequential block-online path itself under the gate
    * (VERDICT r2 stretch #8): a bounded fit on cells derived from lineitem
    * — the one test table that scales with sf; a deterministic 1-in-8 slice
    * caps the size (7.5k cells at sf0.01, 75k at sf0.1) — with
    * localThreshold = 0 so the distributed atoms/PartitionPruningRDD sweep
    * machinery runs, not the local kernel. The fit itself is not
    * SQL-expressible, but the payload is: deterministic counters the oracle
    * recomputes plus invariant booleans behind constant-true columns (the
    * d11 pattern), so the full distributed Sequential path sits under the
    * driver's hash gate; the booleans are additionally asserted in
    * OperatorsSpec. */
  private val h09 = Q(
    "h09_sequential_invariants",
    (s, dir) => {
      import s.implicits._
      val cells = Tables.lineitem(s, dir)
        .filter(col("l_orderkey") % 8 === 0)
        .select(
          (col("l_orderkey") * 8 + col("l_linenumber")).cast("long").as("cell_id"),
          array(
            (col("l_quantity") / 10.0).cast("float"),
            (col("l_extendedprice") / 1e5).cast("float"),
            (col("l_discount") * 10.0).cast("float"),
            (col("l_tax") * 10.0).cast("float"),
            (pmod(col("l_partkey"), lit(97)) / 97.0).cast("float"),
            (pmod(col("l_suppkey"), lit(89)) / 89.0).cast("float")).as("features"),
          col("l_returnflag").as("batch"))
      val res = Harmony.fit(cells, Seq("batch"), HarmonyOptions(
        nclust = Some(8), theta = Seq(1.0), maxIterHarmony = 1,
        maxIterCluster = 2, blockSize = 0.25, earlyStop = false,
        blockMode = BlockMode.Sequential, localThreshold = 0L))
      val obj = res.state.objectiveKmeans
      val n = res.corrected.count()
      val badVec = res.cells.filter((c: CellState) =>
        c.zCorr.exists(v => v.isNaN || v.isInfinite)).count()
      val chi2 = res.state.chiSquared
      // n_cells and rounds are DuckDB-computable (the slice predicate and
      // the fixed maxIterHarmony=1/earlyStop=false budget), so they sit in
      // the oracle as real values (VERDICT r4 #2); objective count is
      // convergence-timing-dependent, so it gates as a >=2 boolean
      // (initial objective + at least one cluster iteration).
      Seq((n, res.rounds.toLong, obj.length >= 2L,
        obj.last <= obj.head, badVec == 0L,
        !chi2.isNaN && !chi2.isInfinite))
        .toDF("n_cells", "rounds", "objectives_recorded",
          "objective_nonincreasing", "corrected_finite", "chi2_finite")
    },
    Some("""SELECT (SELECT count(*) FROM lineitem WHERE l_orderkey % 8 = 0) AS n_cells,
      CAST(1 AS BIGINT) AS rounds, true AS objectives_recorded,
      true AS objective_nonincreasing, true AS corrected_finite,
      true AS chi2_finite"""))

  /** h10: the reference's PURPOSE under the hash gate — batch-effect
    * correction must SHRINK the embedding's inter-batch mean gap (summed
    * over components: max-minus-min of per-batch means) while preserving
    * cell count and finiteness. The HarmonySpec planted-offset test pins
    * this on a synthetic fixture; this entry pins it on the gate's own
    * table behind a constant-true oracle (d11 pattern), so a correction
    * that silently stops correcting turns the driver red. Gap computation
    * is distributed (posexplode → per-(batch, component) means → component
    * range → sum); nothing N-sized reaches the driver. */
  private val h10 = Q(
    "h10_correction_invariants",
    (s, dir) => {
      import s.implicits._
      val cells = embCells(s, dir)
      def gap(df: DataFrame): Double =
        df.select(col("batch"), posexplode(col("features")))
          .groupBy(col("batch"), col("pos"))
          .agg(avg(col("col")).as("m"))
          .groupBy(col("pos")).agg((max(col("m")) - min(col("m"))).as("g"))
          .agg(sum(col("g"))).head().getDouble(0)
      val before = gap(cells)
      val corrected = Harmony.run(cells, Seq("batch"), harnessOpts(20, 2.0))
      val after = gap(corrected
        .join(cells.select(col("cell_id"), col("batch")), Seq("cell_id")))
      Seq((after < before,
          !after.isNaN && !after.isInfinite && after >= 0.0,
          corrected.count() == cells.count()))
        .toDF("gap_shrinks", "gap_finite", "cells_preserved")
    },
    Some("""SELECT true AS gap_shrinks, true AS gap_finite,
      true AS cells_preserved"""))

  // ---------------------------------------------------------------- h11
  /** iLISI INTEGRATION-QUALITY EVAL — the headline metric of the harmony
    * PAPER itself (Korsunsky et al. 2019 report integration LISI —
    * inverse Simpson's index over each cell's neighborhood batch
    * composition; public): well-integrated data has every cell's k-NN
    * drawn from all batches (LISI → #batches), uncorrected batch effects
    * drive it toward 1. The engine's eval-harness family applied to its
    * own core: s21 measures the ANN lane, d21 the dedup lane, t27 the
    * tokenizer — h11 measures the integration itself, asserting the
    * corrected embedding MIXES BETTER than the raw one on the same
    * planted-batch fixture h10 uses (simplified iLISI: uniform k-NN
    * weights instead of the paper's perplexity kernel — the ordering
    * claim is kernel-independent).
    *
    * Scale shape: LISI is evaluated on a deterministic hash-bottom
    * PROBE SAMPLE (the s-lane sampling primitive) — neighbors are
    * searched over ALL cells but only |probes|×N distances are computed,
    * the production form of a post-integration QC pass; per-probe state
    * is a k-row neighborhood, reduced map-side through the engine's one
    * audited kNN shape ([[graft.operators.Similarity.knnJoin]]: bounded
    * k-pair heaps on the exchange, no WindowExec — the HarmonySpec
    * plan-asserts it). The improvement gate carries a margin (VERDICT r9
    * ADVICE): on this fixture the measured gap is large (see
    * [[LisiMargin]]), so `after > before + margin` is a stable boolean,
    * not a knife-edge strict inequality. */

  /** h11's improvement margin. Measured gap on the gate fixtures
    * (tools/LisiRehearsal fixture mode, round 10): sf0.001 before=6.30
    * after=6.80 gap=0.49; sf0.01 before=6.42 after=6.88 gap=0.46. 0.1
    * asserts a real integration effect while sitting ~4.6x under the
    * smallest measured gap — a stable gate, not a knife edge. */
  private val LisiMargin = 0.1

  private val h11 = Q(
    "h11_lisi_eval",
    (s, dir) => {
      import s.implicits._
      val cells = embCells(s, dir)
      val corrected = Harmony.run(cells, Seq("batch"), harnessOpts(20, 2.0))
        .join(cells.select(col("cell_id"), col("batch")), Seq("cell_id"))
      val nBatches = cells.select(col("batch")).distinct().count().toDouble
      val kNn = 15
      def meanLisi(df: DataFrame): Double = {
        val probes = df
          .select(col("cell_id").as("pid"), col("features").as("pf"),
            graft.functions.CrossEngine.md5Hash60(col("cell_id")).as("h"))
          .orderBy(col("h")).limit(200).drop("h")
        // codegen'd fused scalar loop (same double math + index order as
        // the zip_with/aggregate HOF form, which allocates a zipped array
        // per scored pair — 200M transient arrays at 1M cells)
        val d2 = graft.functions.VectorExpressions.l2DistSq(col("features"), col("pf"))
        // bounded-heap kNN: the exchange carries 15-pair buffers per
        // (partition, probe); the 3k-row neighbor list then broadcasts
        // back onto the corpus to pick up each neighbor's batch label
        val nn = graft.operators.Similarity.knnJoin(
          df.select(col("cell_id"), col("features")), probes, d2, kNn,
          probeIdCol = "pid", idCol = "cell_id", ascending = true)
          .select(col("pid"), col("cell_id"))
        df.select(col("cell_id"), col("batch"))
          .join(broadcast(nn), Seq("cell_id"))
          .groupBy(col("pid"), col("batch")).agg(count(lit(1)).as("nb"))
          .groupBy(col("pid"))
          .agg((lit(1.0) / sum(pow(col("nb").cast("double") / kNn, 2.0))).as("lisi"))
          .agg(avg(col("lisi"))).head().getDouble(0)
      }
      val before = meanLisi(cells)
      val after = meanLisi(corrected)
      Seq((after > before + LisiMargin,
          before >= 1.0 && after <= nBatches + 1e-9,
          !before.isNaN && !after.isNaN,
          corrected.count() == cells.count()))
        .toDF("mixing_improves", "lisi_in_range", "lisi_finite", "cells_preserved")
        .crossJoin(cells.agg(count(lit(1)).as("n_cells")))
    },
    Some("""SELECT true AS mixing_improves, true AS lisi_in_range,
      true AS lisi_finite, true AS cells_preserved,
      CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n_cells"""))

  // ---------------------------------------------------------------- h12
  /** kBET-STYLE BATCH-MIXING ACCEPTANCE TEST (Büttner, Miao, Wolf, Teichmann
    * & Theis 2019, "A test metric for assessing single-cell RNA-seq batch
    * effects", Nature Methods; public) — the OTHER integration QC the
    * Harmony paper itself reports alongside LISI: for each probe cell,
    * Pearson-χ² test the k-NN neighborhood's batch composition against the
    * global batch proportions; the metric is the REJECTION RATE at the 95%
    * χ² critical value (df = B−1). Well-integrated data accepts (local
    * composition ≈ global); batch effects reject. h12 asserts the
    * corrected embedding's rejection rate drops vs the raw one on the same
    * fixture h11 uses — LISI and kBET agree on the ordering, which is the
    * cross-metric consistency a real QC report relies on.
    *
    * χ² per probe uses the zero-count-safe identity
    * Σ_b (n_b − k·p_b)²/(k·p_b) = Σ_{observed b} n_b²/(k·p_b) − k, so the
    * per-probe aggregation never needs rows for absent batches.
    *
    * Scale shape: identical to h11 — hash-bottom probe panel, neighbors
    * via the audited bounded-heap kNN over all cells, global proportions
    * as a broadcast B-row table, one grouped agg per probe. */
  private val h12 = Q(
    "h12_kbet_eval",
    (s, dir) => {
      import s.implicits._
      // planted per-batch offset (the LisiRehearsal scale-corpus pattern):
      // the fixture's organic batch signal is mild (raw kBET rejection
      // ~0.05, so a drop assertion would hinge on 1-2 probes of 200); the
      // offset drives raw rejection near 1.0 and makes "correction drops
      // rejection" a wide, stable gate instead of a knife edge
      val cells = plantedCells(s, dir)
      val corrected = Harmony.run(cells, Seq("batch"), harnessOpts(20, 2.0))
        .join(cells.select(col("cell_id"), col("batch")), Seq("cell_id"))
      val kNn = 15
      // 95% χ² critical values, df 1..12 (standard table)
      val chi2Crit95 = Array(3.841, 5.991, 7.815, 9.488, 11.070, 12.592,
        14.067, 15.507, 16.919, 18.307, 19.675, 21.026)
      val props = cells.groupBy(col("batch"))
        .agg(count(lit(1)).as("nb_tot"))
      val nB = props.count().toInt
      require(nB >= 2 && nB <= chi2Crit95.length + 1,
        s"kBET critical-value table covers 2..${chi2Crit95.length + 1} batches; got $nB")
      val crit = chi2Crit95(math.max(nB - 2, 0))
      def rejectionRate(df: DataFrame): Double = {
        val probes = df
          .select(col("cell_id").as("pid"), col("features").as("pf"),
            graft.functions.CrossEngine.md5Hash60(col("cell_id")).as("h"))
          .orderBy(col("h")).limit(200).drop("h")
        val d2 = graft.functions.VectorExpressions.l2DistSq(col("features"), col("pf"))
        val nn = graft.operators.Similarity.knnJoin(
          df.select(col("cell_id"), col("features")), probes, d2, kNn,
          probeIdCol = "pid", idCol = "cell_id", ascending = true)
          .select(col("pid"), col("cell_id"))
        val nTot = df.count().toDouble
        df.select(col("cell_id"), col("batch"))
          .join(broadcast(nn), Seq("cell_id"))
          .groupBy(col("pid"), col("batch")).agg(count(lit(1)).as("nb"))
          .join(broadcast(props), Seq("batch"))
          .groupBy(col("pid"))
          .agg((sum(col("nb") * col("nb") /
            (lit(kNn) * (col("nb_tot") / lit(nTot)))) - lit(kNn.toDouble))
            .as("chi2"))
          .agg(avg(when(col("chi2") > crit, 1.0).otherwise(0.0)))
          .head().getDouble(0)
      }
      val rawRate = rejectionRate(cells)
      val corrRate = rejectionRate(corrected)
      // margins (measured on the planted gate fixtures, r13): raw
      // rejection is 1.00 at every sf; corrected is 0.295 (sf0.001),
      // 0.765 (sf0.01), 0.10 (sf0.1) — the smallest drop is 0.235, so
      // the 0.05 margin sits ~4.7x under it (the LisiMargin pattern)
      Seq((rawRate >= 0.9,
          corrRate < rawRate - 0.05,
          rawRate >= 0.0 && rawRate <= 1.0 && corrRate >= 0.0 && corrRate <= 1.0,
          nB.toLong))
        .toDF("planted_effect_detected", "rejection_drops", "rates_in_range",
          "n_batches")
        .crossJoin(cells.agg(least(count(lit(1)), lit(200L)).as("n_probes")))
    },
    Some("""SELECT true AS planted_effect_detected, true AS rejection_drops,
      true AS rates_in_range,
      (SELECT CAST(count(DISTINCT label) AS BIGINT) FROM embeddings) AS n_batches,
      (SELECT CAST(least(count(*), 200) AS BIGINT) FROM embeddings) AS n_probes"""))

  /** Simplified-silhouette batch score over (batch, features) — shared by
    * h13 (fit QC) and h14 (frozen-serve QC). See h13's Scaladoc for the
    * metric and its scale shape. */
  private def batchAsw(df: DataFrame): Double = {
    val f = df.select(col("batch"),
      col("features").cast("array<double>").as("f"))
    // B×d centroid table via one grouped agg; tiny, collected
    val cent = f
      .select(col("batch"), posexplode(col("f")).as(Seq("j", "v")))
      .groupBy(col("batch"), col("j")).agg(avg(col("v")).as("c"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (bl, rs) =>
        bl -> rs.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }
    val levels = cent.keys.toSeq.sorted
    val withD = levels.zipWithIndex.foldLeft(f) { case (d, (bl, i)) =>
      d.withColumn(s"d_$i",
        sqrt(graft.functions.VectorExpressions.l2DistSq(col("f"),
          typedLit(cent(bl)))))
    }
    val a = coalesce(levels.zipWithIndex.map { case (bl, i) =>
      when(col("batch") === bl, col(s"d_$i"))
    }: _*)
    val others = levels.zipWithIndex.map { case (bl, i) =>
      when(col("batch") =!= bl, col(s"d_$i")).otherwise(lit(Double.MaxValue))
    }
    val b = if (others.size == 1) others.head else least(others: _*)
    withD
      .select((lit(1.0) - abs((b - a) / greatest(a, b, lit(1e-300))))
        .as("sil"))
      .agg(avg(col("sil"))).head().getDouble(0)
  }

  /** Fit-once/serve-many across the frozen-model entries (h14, h15, st39
    * — the GraphIndexCache discipline): ONE planted-fixture reference fit
    * per sf dir, shared by every entry that serves under it. This is the
    * production shape (a standing atlas model serves many requests), and
    * buildCount is spec-pinned so a regression back to fit-per-entry
    * turns a test red, not just the bench. */
  private[graft] object FrozenFitCache {
    val buildCount = new java.util.concurrent.atomic.AtomicLong(0L)
    private val cache =
      scala.collection.concurrent.TrieMap.empty[String, HarmonyResult]
    def model(s: SparkSession, dir: String): HarmonyResult =
      cache.getOrElseUpdate(dir, {
        buildCount.incrementAndGet()
        val train = plantedCells(s, dir).filter(col("cell_id") % 2 === 0)
        // localThreshold = 0 (the h09 precedent): the frozen surface under
        // test is the DISTRIBUTED correction map's
        Harmony.fit(train, Seq("batch"),
          HarmonyOptions(nclust = Some(20), theta = Seq(2.0),
            maxIterHarmony = 2, maxIterCluster = 2, blockSize = 0.2,
            earlyStop = false, localThreshold = 0L))
      })
  }

  /** The h12/h13/h14/st39 planted-offset fixture: a per-batch offset on
    * the embedding so the batch signal is wide enough for stable gates. */
  private[graft] def plantedCells(s: SparkSession, dir: String): DataFrame = {
    val base = embCells(s, dir)
    val dim = base.select(size(col("features"))).head().getInt(0)
    base.select(col("cell_id"), col("batch"),
      expr(s"""transform(sequence(0, ${dim - 1}), j ->
        CAST(element_at(features, j + 1)
          + CAST(batch AS DOUBLE) * (0.5 + 0.2 * cos(j * 1.7)) AS DOUBLE))""")
        .as("features"))
  }

  // ---------------------------------------------------------------- h13
  /** AVERAGE-SILHOUETTE-WIDTH BATCH SCORE (the third standard integration
    * QC next to h11's LISI and h12's kBET — the scIB benchmark's
    * "ASW_batch", Luecken et al. 2022 Nature Methods, public): silhouette
    * computed with the BATCH as the cluster label; a well-integrated
    * embedding has batches indistinguishable, |s(i)| ≈ 0, and the batch
    * score mean(1 − |s(i)|) ≈ 1, while a batch-separated embedding scores
    * near 0. Uses the SIMPLIFIED silhouette (Hruschka et al. 2004,
    * centroid distances instead of all-pairs mean distances) — the only
    * silhouette that survives 100 TB: a(i)/b(i) against B centroids is an
    * O(N·B·d) map after one grouped centroid aggregation, vs the O(N²)
    * pairwise form; no kNN, no shuffle beyond the B×d centroid agg.
    *
    * Same planted-offset fixture as h12 (the organic batch signal is too
    * mild for a wide gate): raw score 0.233-0.236 across the three SFs,
    * the harmony correction lifts it to 0.889-0.925 (measured r14) — the
    * 0.6 / +0.08 gate margins sit ~3x over raw and ~8x under the smallest
    * measured gap. Cross-metric consistency: LISI rises, kBET rejection
    * drops, ASW-batch rises — all three orderings agree on the same
    * fixture. */
  private val h13 = Q(
    "h13_asw_eval",
    (s, dir) => {
      import s.implicits._
      val cells = plantedCells(s, dir)
      val corrected = Harmony.run(cells, Seq("batch"), harnessOpts(20, 2.0))
        .join(cells.select(col("cell_id"), col("batch")), Seq("cell_id"))
      val rawScore = batchAsw(cells)
      val corrScore = batchAsw(corrected)
      Seq((rawScore < 0.6,
          corrScore > rawScore + 0.08,
          rawScore >= 0.0 && rawScore <= 1.0 + 1e-9 &&
            corrScore >= 0.0 && corrScore <= 1.0 + 1e-9,
          corrected.count() == cells.count()))
        .toDF("planted_separation_detected", "mixing_improves",
          "scores_in_range", "cells_preserved")
        .crossJoin(cells.agg(count(lit(1)).as("n_cells")))
        .crossJoin(cells.select(col("batch")).distinct()
          .agg(count(lit(1)).as("n_batches")))
    },
    Some("""SELECT true AS planted_separation_detected,
      true AS mixing_improves, true AS scores_in_range,
      true AS cells_preserved,
      CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n_cells,
      CAST((SELECT count(DISTINCT label) FROM embeddings) AS BIGINT)
        AS n_batches"""))

  // ---------------------------------------------------------------- h14
  /** FROZEN-MODEL CORRECTION SERVE (the Symphony-style reference-atlas
    * mapping, Kang et al. 2021 — public): the engine's
    * train-once/serve-many lifecycle applied to the FLAGSHIP algorithm
    * itself, completing the symmetry the IVFPQ (s13/s14) and graph
    * (s31/GraphIndexCache) lanes set — fit on the even half of the
    * planted fixture, then map the HELD-OUT odd half through the frozen
    * model (centroids, σ, θ, E, O, W; no refit, ONE stateless map, model
    * broadcast a few MB). Three contracts under the gate:
    *
    *   1. EXACT APPLY — re-applying the frozen W to the fit's own
    *      (zOrig, batch, r) reproduces the fit's corrected output
    *      BIT-FOR-BIT, counted elementwise over every float (serve and
    *      fit share [[Harmony.applyCorrection]], so this pins that the
    *      frozen surface IS the fit's map, not a near-copy);
    *   2. HELD-OUT MIXING — the served half's batch-ASW rises vs its own
    *      raw embedding (measured r14: raw 0.231-0.236, served
    *      0.795-0.904 across the SFs — serving through a model fitted on
    *      the OTHER half integrates cells the fit never saw);
    *   3. serve-time R is column-stochastic and the output finite. */
  private val h14 = Q(
    "h14_correction_serve",
    (s, dir) => {
      import s.implicits._
      val cells = plantedCells(s, dir)
      val held = cells.filter(col("cell_id") % 2 === 1)
      // the shared frozen reference fit (train half, distributed path —
      // the exact-apply contract is against the map a real cluster runs)
      val model = FrozenFitCache.model(s, dir)
      val st = model.state
      val (wF, kK, bB, dD) = (st.lastW, st.K, st.B, st.d)
      val mismatches = model.cells.map { c =>
        val re = Harmony.applyCorrection(c.zOrig, c.batch, c.r, wF, kK, bB, dD)
        var bad = 0L
        var j = 0
        while (j < re.length) { if (re(j) != c.zCorr(j)) bad += 1; j += 1 }
        bad
      }.reduce(_ + _)
      val served = Harmony.serve(model, held, Seq("batch"))
        .join(held.select(col("cell_id"), col("batch")), Seq("cell_id"))
      val rawScore = batchAsw(held)
      val servedScore = batchAsw(served)
      val stats = served.select(
          abs(expr("aggregate(r, CAST(0.0 AS DOUBLE), (a, x) -> a + x)")
            - lit(1.0)).as("rdev"),
          expr("exists(features, v -> isnan(v) OR abs(v) > 1e30)").as("badf"))
        .agg(max(col("rdev")), sum(when(col("badf"), 1L).otherwise(0L)),
          count(lit(1))).head()
      Seq((mismatches == 0L,
          servedScore > rawScore + 0.08,
          stats.getDouble(0) < 1e-3,
          stats.getLong(1) == 0L,
          stats.getLong(2) == held.count()))
        .toDF("exact_apply_matches", "heldout_mixing_improves",
          "r_column_stochastic", "served_finite", "cells_preserved")
        .crossJoin(held.agg(count(lit(1)).as("n_held")))
    },
    Some("""SELECT true AS exact_apply_matches,
      true AS heldout_mixing_improves, true AS r_column_stochastic,
      true AS served_finite, true AS cells_preserved,
      CAST((SELECT count(*) FROM embeddings WHERE vec_id % 2 = 1) AS BIGINT)
        AS n_held"""))

  // ---------------------------------------------------------------- h15
  /** MODEL PERSIST + SERVE-FROM-FILES — the missing third leg of the
    * flagship lifecycle (fit: h01-h10; serve: h14/st39; persist: here),
    * the t33/t34/s31 persist discipline applied to the harmony model:
    * fit → [[Harmony.saveModel]] (one single-row parquet holding Y, σ, θ,
    * E, O, W, λ and the level dictionary — kilobytes) → fresh
    * [[Harmony.loadModel]] → [[Harmony.serveModel]]. Contracts: every
    * persisted field round-trips EXACTLY (doubles in parquet are exact),
    * serving the held-out half from the RELOADED model is bit-identical
    * to serving from the in-memory fit, and the artifact is a single
    * data file (the broadcast-sized layout a serving fleet wants). */
  private val h15 = Q(
    "h15_model_persist",
    (s, dir) => {
      import s.implicits._
      val root = java.nio.file.Files.createTempDirectory("graft_h15_")
      try {
        val cells = plantedCells(s, dir)
        val held = cells.filter(col("cell_id") % 2 === 1)
        val model = FrozenFitCache.model(s, dir)
        Harmony.saveModel(model, s"$root/model")
        val loaded = Harmony.loadModel(s, s"$root/model")
        val st0 = model.state
        val fieldsRoundtrip =
          loaded.d == st0.d && loaded.K == st0.K && loaded.B == st0.B &&
          loaded.N == st0.N &&
          loaded.yRowMajor.sameElements(st0.yRowMajor) &&
          loaded.E.sameElements(st0.E) && loaded.O.sameElements(st0.O) &&
          loaded.prB.sameElements(st0.prB) && loaded.nB.sameElements(st0.nB) &&
          loaded.sigma.sameElements(st0.sigma) &&
          loaded.theta.sameElements(st0.theta) &&
          loaded.lastLambda.sameElements(st0.lastLambda) &&
          loaded.lastW.sameElements(st0.lastW) &&
          loaded.covariateOf.sameElements(st0.covariateOf) &&
          loaded.levelLabels.sameElements(st0.levelLabels)
        val fromMem = Harmony.serve(model, held, Seq("batch"))
          .select(col("cell_id"), col("features").as("mf"), col("r").as("mr"))
        val fromDisk = Harmony.serveModel(loaded, held, Seq("batch"))
          .select(col("cell_id"), col("features").as("kf"), col("r").as("kr"))
        val cmp = fromMem.join(fromDisk, Seq("cell_id"), "full_outer")
          .select(when(col("mf").isNull || col("kf").isNull, 1L)
            .when(col("mf") === col("kf") && col("mr") === col("kr"), 0L)
            .otherwise(1L).as("mismatch"))
          .agg(sum(col("mismatch")), count(lit(1))).head()
        val nFiles = Option(new java.io.File(s"$root/model").listFiles())
          .getOrElse(Array.empty)
          .count(_.getName.endsWith(".parquet")).toLong
        Seq((fieldsRoundtrip, cmp.getLong(0) == 0L,
            cmp.getLong(1) == held.count(), nFiles == 1L))
          .toDF("fields_roundtrip_exact", "disk_serve_equals_memory_serve",
            "cells_preserved", "single_model_file")
          .crossJoin(held.agg(count(lit(1)).as("n_served")))
      } finally {
        graft.functions.CrossEngine.deleteRecursive(root)
      }
    },
    Some("""SELECT true AS fields_roundtrip_exact,
      true AS disk_serve_equals_memory_serve, true AS cells_preserved,
      true AS single_model_file,
      CAST((SELECT count(*) FROM embeddings WHERE vec_id % 2 = 1) AS BIGINT)
        AS n_served"""))

  // ---------------------------------------------------------------- h16
  /** UNSEEN-LEVEL SERVING POLICY (VERDICT r14 #4): streams meet new
    * labels first, and h14/st39's serve path used to throw mid-map on the
    * first level the frozen fit never saw — at 100 TB that costs the
    * whole serving job to one novel batch id. [[Harmony.serveModel]] now
    * declares the policy (`serveUnseen = fail | skip | interceptOnly`)
    * and this gate pins all three on a fixture where cells ≡ 1 (mod 10)
    * of the held-out half arrive with a novel batch label:
    *
    *   - `fail` still fails fast (the h14/h15-pinned default, unchanged);
    *   - `skip` serves EXACTLY the frozen map on the seen rows —
    *     bit-compared against serving the seen rows alone — and
    *     [[Harmony.serveQuarantined]] reports exactly the novel rows,
    *     each with the offending `batch=zz_novel` key;
    *   - `interceptOnly` keeps the seen rows bit-identical AND passes the
    *     novel rows through with untouched features (their one covariate
    *     is unseen, so only the never-subtracted intercept applies) and a
    *     plain-softmax column-stochastic R.
    *
    * All facts recomputed booleans (the h14 pattern); the held/novel
    * counts are the DuckDB-mirrored values. */
  private val h16 = Q(
    "h16_serve_unseen_policy",
    (s, dir) => {
      import s.implicits._
      val cells = plantedCells(s, dir)
      val held = cells.filter(col("cell_id") % 2 === 1)
      val novelPred = col("cell_id") % 10 === 1
      val novel = held.withColumn("batch",
        when(novelPred, lit("zz_novel")).otherwise(col("batch")))
        .localCheckpoint(true)
      val model = FrozenFitCache.model(s, dir)
      val st = model.state
      // the declared baseline: the frozen map on the seen rows alone
      val base = Harmony.serveModel(st, novel.filter(!novelPred), Seq("batch"))
        .select(col("cell_id"), col("features").as("bf"), col("r").as("br"))
      val failsFast =
        try { Harmony.serveModel(st, novel, Seq("batch")).count(); false }
        catch { case e: Throwable =>
          Option(e.getMessage).exists(_.contains("unseen covariate level")) ||
            Option(e.getCause).flatMap(c => Option(c.getMessage))
              .exists(_.contains("unseen covariate level"))
        }
      val skip = Harmony
        .serveModel(st, novel, Seq("batch"), serveUnseen = "skip")
        .select(col("cell_id"), col("features").as("sf"), col("r").as("sr"))
      val skipCmp = base.join(skip, Seq("cell_id"), "full_outer")
        .select(when(col("bf").isNull || col("sf").isNull, 1L)
          .when(col("bf") === col("sf") && col("br") === col("sr"), 0L)
          .otherwise(1L).as("mm"))
        .agg(sum(col("mm")).as("mm"), count(lit(1)).as("n")).head()
      val nNovel = novel.filter(novelPred).count()
      val nSeen = novel.filter(!novelPred).count()
      val quarantine = Harmony.serveQuarantined(st, novel, Seq("batch"))
        .localCheckpoint(true)
      val quarantineOk =
        quarantine.count() == nNovel &&
        quarantine.filter(col("unseen_levels") ===
          array(lit("batch=zz_novel"))).count() == nNovel &&
        quarantine.join(novel.filter(novelPred).select(col("cell_id")),
          Seq("cell_id"), "left_anti").count() == 0
      val io = Harmony
        .serveModel(st, novel, Seq("batch"), serveUnseen = "interceptOnly")
        .select(col("cell_id"), col("features").as("xf"), col("r").as("xr"))
        .localCheckpoint(true)
      val ioSeenCmp = base
        .join(io.join(novel.filter(novelPred).select(col("cell_id")),
          Seq("cell_id"), "left_anti"), Seq("cell_id"), "full_outer")
        .select(when(col("bf").isNull || col("xf").isNull, 1L)
          .when(col("bf") === col("xf") && col("br") === col("xr"), 0L)
          .otherwise(1L).as("mm"))
        .agg(sum(col("mm"))).head().getLong(0)
      val ioNovelCmp = io
        .join(novel.filter(novelPred)
          .select(col("cell_id"), col("features").cast("array<float>")
            .as("zin")), Seq("cell_id"))
        .filter(col("xf") =!= col("zin")).count()
      val rStoch = io.select(
          abs(expr("aggregate(xr, CAST(0.0 AS DOUBLE), (a, x) -> a + x)")
            - lit(1.0)).as("rdev"))
        .agg(max(col("rdev"))).head().getDouble(0) < 1e-3
      Seq((failsFast,
          skipCmp.getLong(0) == 0L && skipCmp.getLong(1) == nSeen,
          quarantineOk,
          ioSeenCmp == 0L,
          io.count() == nSeen + nNovel && ioNovelCmp == 0L,
          rStoch))
        .toDF("fail_fails_fast", "skip_serves_seen_exactly",
          "quarantine_reported_exactly", "intercept_only_seen_exact",
          "intercept_only_novel_passthrough", "r_column_stochastic")
        .crossJoin(Seq((nSeen, nNovel)).toDF("n_seen", "n_quarantined"))
    },
    Some("""SELECT true AS fail_fails_fast, true AS skip_serves_seen_exactly,
      true AS quarantine_reported_exactly, true AS intercept_only_seen_exact,
      true AS intercept_only_novel_passthrough, true AS r_column_stochastic,
      CAST((SELECT count(*) FROM embeddings
        WHERE vec_id % 2 = 1 AND vec_id % 10 <> 1) AS BIGINT) AS n_seen,
      CAST((SELECT count(*) FROM embeddings
        WHERE vec_id % 10 = 1) AS BIGINT) AS n_quarantined"""))

  // ---------------------------------------------------------------- h17
  /** SERVE-TIME DRIFT MONITOR (the MLOps leg of the serving lifecycle:
    * h14/h15/st39 prove the frozen map is exact, h16 handles unseen
    * LABELS — this watches the unseen DATA: a reference atlas keeps
    * serving long after the fit, and embedding drift (new chemistry, a
    * pipeline change upstream) silently degrades correction quality
    * before anyone looks. The standard production monitor compares the
    * serve-time ASSIGNMENT distribution against the fit's own: the
    * frozen model carries its training cluster masses (row sums of O),
    * each served batch's soft-assignment masses come free from the R
    * the serve already computes (one K-row aggregation over the served
    * output — no extra pass), and the drift score is the total-variation
    * distance between the two K-simplices.
    *
    * Gate: the held-out half (same distribution as training) scores
    * BELOW the alarm threshold, while the same cells with NEGATED
    * embeddings (the classic silent upstream failure: PCA component
    * signs are arbitrary and flip across library versions) score far
    * ABOVE it — and the monitor is monotone (drifted
    * TV > clean TV). Thresholds carry measured margins across the
    * driver's SFs. Booleans recomputed, counts mirrored (the h14
    * pattern). */
  /** (clean TV, drifted TV) of the h17 monitor — factored so the spec
    * can report the measured values (which depend on the fit and are
    * therefore not oracle-mirrorable; the GATE carries the threshold
    * booleans). */
  private[graft] def serveDriftTvs(s: SparkSession, dir: String): (Double, Double) = {
    val cells = plantedCells(s, dir)
    val held = cells.filter(col("cell_id") % 2 === 1)
    val model = FrozenFitCache.model(s, dir)
    val st = model.state
    val piFit: Array[Double] = {
      val mass = Array.tabulate(st.K)(k =>
        (0 until st.B).map(b => st.O(k * st.B + b)).sum)
      val tot = mass.sum
      mass.map(_ / tot)
    }
    def servedTv(df: DataFrame): Double = {
      val n = df.count().toDouble
      val sums = Harmony.serveModel(st, df, Seq("batch"))
        .select(posexplode(col("r")).as(Seq("k", "rk")))
        .groupBy(col("k")).agg(sum(col("rk").cast("double")).as("m"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      (0 until st.K).map(k =>
        math.abs(sums.getOrElse(k, 0.0) / n - piFit(k))).sum / 2
    }
    (servedTv(held),
      servedTv(held.withColumn("features",
        expr("transform(features, v -> -v)"))))
  }

  private val h17 = Q(
    "h17_serve_drift_monitor",
    (s, dir) => {
      import s.implicits._
      val (tvClean, tvDrift) = serveDriftTvs(s, dir)
      val held = plantedCells(s, dir).filter(col("cell_id") % 2 === 1)
      Seq((tvClean < 0.15, tvDrift > 0.30, tvDrift > tvClean))
        .toDF("clean_below_alarm", "drifted_above_alarm", "monitor_monotone")
        .crossJoin(held.agg(count(lit(1)).as("n_monitored")))
    },
    Some("""SELECT true AS clean_below_alarm, true AS drifted_above_alarm,
      true AS monitor_monotone,
      CAST((SELECT count(*) FROM embeddings WHERE vec_id % 2 = 1) AS BIGINT)
        AS n_monitored"""))

  // ---------------------------------------------------------------- h18
  /** The h18 fixture: the planted cells with a second, id-derived SITE
    * covariate (site = cell_id mod 3) so drift attribution has two
    * covariates to tell apart. */
  private[graft] def plantedCellsTwoCov(s: SparkSession, dir: String): DataFrame =
    plantedCells(s, dir)
      .withColumn("site", pmod(col("cell_id"), lit(3L)).cast("string"))

  /** Train-once cache for the two-covariate model (the FrozenFitCache
    * discipline). The composition monitor consumes only the fit
    * PROLOGUE's state (level dictionaries + Pr_b), so the fit runs zero
    * harmony rounds — cheapest honest source of the model's priors. */
  private[graft] object TwoCovFitCache {
    val buildCount = new java.util.concurrent.atomic.AtomicLong(0L)
    private val cache =
      scala.collection.concurrent.TrieMap.empty[String, HarmonyResult]
    def model(s: SparkSession, dir: String): HarmonyResult =
      cache.getOrElseUpdate(dir, {
        buildCount.incrementAndGet()
        val train = plantedCellsTwoCov(s, dir).filter(col("cell_id") % 2 === 0)
        Harmony.fit(train, Seq("batch", "site"),
          HarmonyOptions(nclust = Some(5), theta = Seq(2.0),
            maxIterHarmony = 0, maxIterCluster = 1, blockSize = 0.2,
            earlyStop = false, localThreshold = 0L))
      })
  }

  /** Per-covariate total-variation distance between a served batch's
    * level COMPOSITION and the fit's stored priors Pr_b (the h17 monitor
    * attributed: h17 says "the served distribution drifted", this says
    * WHICH covariate's mix moved). Levels the fit never saw count their
    * full served mass (they have prior 0). One grouped count per
    * covariate — composition drift costs a K-level aggregate, never a
    * serve. */
  private[graft] def covariateCompositionTvs(st: HarmonyState, df: DataFrame,
      covariates: Seq[String]): Map[String, Double] = {
    val n = df.count().toDouble
    covariates.zipWithIndex.map { case (c, ci) =>
      val fitPr = st.levelLabels.indices
        .filter(l => st.covariateOf(l) == ci)
        .map(l => st.levelLabels(l) -> st.prB(l)).toMap
      val served = df
        .groupBy(col(c).cast("string").as("v"))
        .agg(count(lit(1)).as("cnt"))
        .collect().map(r => s"$c=${r.getString(0)}" -> r.getLong(1) / n)
        .toMap
      val keys = fitPr.keySet ++ served.keySet
      c -> keys.toSeq.map(k =>
        math.abs(fitPr.getOrElse(k, 0.0) - served.getOrElse(k, 0.0))).sum / 2
    }.toMap
  }

  /** (clean TVs, drifted TVs) per covariate of the h18 monitor — factored
    * so the spec reports the measured margins (fit-dependent, so the GATE
    * carries threshold booleans; the h17 pattern). The drift fixture
    * skews ONE covariate: serving only site != 2 shifts the site mix to
    * {1/2, 1/2, 0} while leaving the batch mix (id-independent)
    * essentially untouched. */
  private[graft] def serveDriftAttribution(s: SparkSession,
      dir: String): (Map[String, Double], Map[String, Double]) = {
    val st = TwoCovFitCache.model(s, dir).state
    val held = plantedCellsTwoCov(s, dir).filter(col("cell_id") % 2 === 1)
      .localCheckpoint(true)
    val covs = Seq("batch", "site")
    (covariateCompositionTvs(st, held, covs),
      covariateCompositionTvs(st, held.filter(col("site") =!= "2"), covs))
  }

  private val h18 = Q(
    "h18_serve_drift_attribution",
    (s, dir) => {
      import s.implicits._
      val (clean, drift) = serveDriftAttribution(s, dir)
      // alarm 0.20: measured margins across the driver's SFs — clean and
      // drifted-batch TVs 0.055..0.115 (the 10-level batch mix carries
      // ~0.1 sampling noise at 250-cell halves), planted site drift is
      // arithmetic 1/3; both sides clear the line by >= 1.67x
      val alarm = 0.20
      val fired = drift.filter(_._2 > alarm).keySet
      val nBatchLevels = Tables.embeddings(s, dir)
        .select(col("label")).distinct().count()
      Seq(
        ("batch", nBatchLevels, clean("batch") < alarm,
          drift("batch") < alarm, false),
        ("site", 3L, clean("site") < alarm,
          drift("site") > alarm, true))
        .toDF("covariate", "n_levels", "clean_quiet", "drift_as_expected",
          "drift_planted")
        .withColumn("attribution_exact", lit(fired == Set("site")))
        .withColumn("monitor_monotone",
          lit(drift("site") > clean("site")))
    },
    Some("""SELECT 'batch' AS covariate,
        CAST((SELECT count(DISTINCT label) FROM embeddings) AS BIGINT)
          AS n_levels,
        true AS clean_quiet, true AS drift_as_expected,
        false AS drift_planted, true AS attribution_exact,
        true AS monitor_monotone
      UNION ALL
      SELECT 'site', CAST(3 AS BIGINT), true, true, true, true, true"""))

  val all: Seq[Q] = Seq(h01, h02, h03, h04, h05, h06, h07, h08, h09, h10, h11,
    h12, h13, h14, h15, h16, h17, h18)
}
