package graft.harmony

import org.apache.spark.Partitioner
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.rdd.{PartitionPruningRDD, RDD}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{array, coalesce, col, concat, expr, lit, size, when}
import org.apache.spark.storage.StorageLevel

import scala.collection.mutable.ArrayBuffer

/** Per-cell distributed state. One row per cell — N is the parallel axis,
  * d (10-64 embedding dims) stays in-row (SURVEY.md §1.4).
  *
  * @param cellId stable identifier
  * @param batch  one global covariate-level index per covariate (the sparse
  *               one-hot design Φ is never materialized; levels live as
  *               indices and Φ appears only implicitly in aggregations)
  * @param zOrig  raw embedding (float storage, like the reference's
  *               single-precision default /root/reference/src/types.h:5-9)
  * @param zCorr  corrected embedding (reset from zOrig each correction round,
  *               /root/reference/src/harmony.cpp:347)
  * @param r      soft cluster assignment, length K, column-stochastic
  */
final case class CellState(
    cellId: Long,
    batch: Array[Int],
    zOrig: Array[Float],
    zCorr: Array[Float],
    r: Array[Float])

/** Driver-side small model state (broadcast each pass; K*B and K*(B+1)*d
  * floats — a few MB at most, the same small-state/big-data asymmetry the
  * reference exploits).
  */
final class HarmonyState(
    val d: Int,
    val K: Int,
    val B: Int,
    val N: Long,
    val covariateOf: Array[Int],          // level -> covariate index
    val levelLabels: Array[String],       // level -> "covariate=value"
    var yRowMajor: Array[Double],         // K x d, L2-normalized rows
    var E: Array[Double],                 // K x B row-major (expected counts)
    var O: Array[Double],                 // K x B row-major (observed counts)
    val prB: Array[Double],               // batch priors N_b / N
    val nB: Array[Double],                // batch sizes
    val sigma: Array[Double],             // length K
    val theta: Array[Double],             // per-level, tau-discounted
    val objectiveKmeans: ArrayBuffer[Double] = ArrayBuffer.empty,
    val objectiveHarmony: ArrayBuffer[Double] = ArrayBuffer.empty,
    val kmeansRounds: ArrayBuffer[Int] = ArrayBuffer.empty) {

  /** Set once the Sequential path has hash-co-partitioned the cells into
    * its partition-atom layout (one shuffle per fit; see sequentialRound).
    * RDD maps preserve partition contents, so the layout survives
    * softmax/correction passes between rounds. */
  var blockPartitioned: Boolean = false

  /** Salt group the current atom layout was hashed under (resaltEvery > 0
    * redraws the cell->atom hash on group boundaries; -1 = not yet built). */
  var atomSaltGroup: Long = -1L

  /** Unpersist thunks for the storage generation backing the current cells
    * RDD. A new generation is installed (and the superseded one freed) only
    * AFTER the new one is materialized, so downstream reads never recompute.
    * With HarmonyOptions.checkpointDir set, checkpointed generations also
    * live as durable files, so unpersisting (or losing) a cache replays
    * from disk instead of failing — see the mid-fit unpersist test in
    * HarmonySpec. */
  private val liveStorage = ArrayBuffer[() => Unit]()
  def swapStorage(newHandles: Seq[() => Unit]): Unit = {
    liveStorage.foreach(f => f())
    liveStorage.clear()
    liveStorage ++= newHandles
  }

  /** Spark job group this fit's jobs run under (op 44's cancellation
    * surface): `sc.cancelJobGroup(state.jobGroup)` from any thread kills
    * the in-flight jobs and aborts the fit. */
  var jobGroup: String = ""

  /** Wall-clock seconds per phase (op 55's timer analogue; RAII timers in
    * the reference, /root/reference/src/timer.h:1-32). Summed across
    * rounds; printed by graft.tools.DebugHarmony. */
  val phaseSeconds: scala.collection.mutable.LinkedHashMap[String, Double] =
    scala.collection.mutable.LinkedHashMap.empty

  /** Rows visited by sweep aggregation passes (a LongAccumulator — live
    * executor-side observability, visible in the Spark UI/metrics). */
  var rowsVisited: Option[org.apache.spark.util.LongAccumulator] = None

  /** Effective ridge penalties from the LATEST MoE correction, K×(B+1)
    * row-major (slot 0 = intercept, always 0; pruned levels 0). Filled by
    * Kernels.solveW on every correction pass; empty before the first. */
  var lastLambda: Array[Double] = Array.empty

  /** MoE coefficients W from the LATEST correction pass, K×(B+1)×d
    * row-major (row 0 of each cluster = the unpenalized intercept, NOT
    * subtracted by the correction map; pruned level rows are zero). This
    * is the frozen-model serve surface ([[Harmony.serve]]): together with
    * (Y, σ, θ, E, O) it maps NEW cells into the integrated space without
    * refitting — the Symphony-style reference mapping (Kang et al. 2021).
    * Same driver footprint as the per-pass broadcast the fit already
    * pays; empty before the first correction. */
  var lastW: Array[Double] = Array.empty

  def chiSquared: Double = {
    var s = 0.0
    var i = 0
    while (i < E.length) {
      if (E(i) > 0) { val diff = O(i) - E(i); s += diff * diff / E(i) }
      i += 1
    }
    s
  }
}

final case class HarmonyResult(
    corrected: DataFrame,
    cells: Dataset[CellState],
    state: HarmonyState,
    rounds: Int) {

  /** Soft cluster assignments (cell_id, r) — `getR` parity
    * (/root/reference/src/harmony.cpp:640-669, SURVEY op 10). */
  def assignments: DataFrame = {
    val sp = cells.sparkSession
    import sp.implicits._
    cells.map(c => (c.cellId, c.r)).toDF("cell_id", "r")
  }

  /** Objective history as (step, round, objective) — the data behind the
    * reference's convergence plot (R/utils.R:50-81, SURVEY op 54). */
  def objectiveHistory: DataFrame = {
    val sp = cells.sparkSession
    import sp.implicits._
    // cumulative sweep counts: step 0 is init; steps (bounds(r-1), bounds(r)]
    // belong to round r
    val bounds = state.kmeansRounds.scanLeft(0)(_ + _)
    def roundOf(step: Int): Int =
      if (step == 0) 0
      else {
        val i = bounds.indexWhere(_ >= step)
        if (i < 0) state.kmeansRounds.length else i
      }
    state.objectiveKmeans.zipWithIndex
      .map { case (obj, step) => (step.toLong, roundOf(step).toLong, obj) }
      .toSeq.toDF("step", "round", "objective")
  }

  /** Cluster centroids Y as K rows of d — `getCentroids` parity. */
  def centroids: Array[Array[Double]] =
    Array.tabulate(state.K)(k =>
      Array.tabulate(state.d)(j => state.yRowMajor(k * state.d + j)))

  /** Effective ridge penalties λ(k, slot) the final MoE correction applied,
    * K rows of (B+1) — `getLambda` parity (/root/reference/src/
    * harmony.cpp:640-669; auto mode α·E(k,b) per utils.cpp:159-163). Slot 0
    * is the unpenalized intercept (0); pruned levels are 0 (excluded from
    * their cluster's solve). Fixed-λ fits repeat the user λ in every kept
    * slot; auto fits expose the per-cluster α·E(k,b) values the solver
    * actually used (recorded by Kernels.solveW at the Gram-diagonal add, so
    * this surface cannot drift from the solve). Empty if no correction ran
    * (maxIterHarmony = 0). */
  def lambdas: Array[Array[Double]] =
    if (state.lastLambda.isEmpty) Array.empty
    else Array.tabulate(state.K)(k =>
      Array.tabulate(state.B + 1)(p => state.lastLambda(k * (state.B + 1) + p)))
}

/** Spark-native Harmony: maximum-diversity soft k-means + mixture-of-experts
  * ridge correction (capabilities of immunogenomics/harmony v2.0.4,
  * re-designed as distributed dataflow — see SURVEY.md §2.8-§2.10).
  *
  * Execution shape per round (scale posture for 1000-executor clusters):
  *   - E-step / block updates: map over cells with broadcast (Y, E, O, σ, θ)
  *     + `treeAggregate` producing K- and K×B-sized partial sums (map-side
  *     combine; nothing N-sized ever reaches the driver).
  *   - M-step: ONE fused `treeAggregate` emitting all K Gram matrices
  *     ((B+1)²) and moments ((B+1)×d) at once (SURVEY ops 46-47), then K
  *     small Breeze solves on the driver, then one correction map.
  *   - Lineage is truncated with localCheckpoint every `checkpointEvery`
  *     rounds so 10 rounds x 4 sweeps don't stack 80 plan layers.
  */
object Harmony {

  /** Per-partition sweep partials ((mass, O, Σ r·dist, Σ σ r log r) keyed by
    * partition id), accumulated INSIDE the penalized-update pass so one job
    * materializes the updated cells AND yields the aggregates — no second
    * iteration, no recomputed distances. Updates land in the materializing
    * action's result stage (exactly-once per successful task) and the value
    * is read immediately after that action, so later cache-recompute
    * re-additions can never be observed. */
  private final class SweepPartials(K: Int, B: Int)
      extends org.apache.spark.util.AccumulatorV2[
        (Int, Array[Double], Array[Double], Double, Double),
        Map[Int, (Array[Double], Array[Double], Double, Double)]] {
    private val acc =
      scala.collection.mutable.HashMap
        .empty[Int, (Array[Double], Array[Double], Double, Double)]
    override def isZero: Boolean = acc.isEmpty
    override def copy(): SweepPartials = {
      val c = new SweepPartials(K, B)
      acc.foreach { case (pid, (m, o, t1, t2)) =>
        c.acc(pid) = (m.clone(), o.clone(), t1, t2)
      }
      c
    }
    override def reset(): Unit = acc.clear()
    override def add(v: (Int, Array[Double], Array[Double], Double, Double)): Unit =
      acc.get(v._1) match {
        case None => acc(v._1) = (v._2, v._3, v._4, v._5)
        case Some((m, o, t1, t2)) =>
          var j = 0
          while (j < m.length) { m(j) += v._2(j); j += 1 }
          j = 0
          while (j < o.length) { o(j) += v._3(j); j += 1 }
          acc(v._1) = (m, o, t1 + v._4, t2 + v._5)
      }
    override def merge(other: org.apache.spark.util.AccumulatorV2[
        (Int, Array[Double], Array[Double], Double, Double),
        Map[Int, (Array[Double], Array[Double], Double, Double)]]): Unit =
      other.value.foreach { case (pid, (m, o, t1, t2)) => add((pid, m, o, t1, t2)) }
    override def value: Map[Int, (Array[Double], Array[Double], Double, Double)] =
      acc.toMap
  }

  /** Op 44: the reference's Progress::check_abort analogue — polled at
    * round/sweep/block boundaries; cancels the fit's job group (killing any
    * in-flight Spark jobs) and aborts. */
  private def pollAbort(sc: org.apache.spark.SparkContext, st: HarmonyState,
      opts: HarmonyOptions, where: String): Unit =
    if (opts.checkAbort.exists(f => f())) {
      sc.cancelJobGroup(st.jobGroup)
      throw new HarmonyAbortedException(s"harmony fit aborted at $where")
    }

  // ------------------------------------------------------------------ hash
  /** splitmix64 — deterministic block membership under a per-sweep salt;
    * replaces the reference's uniform random permutation
    * (/root/reference/src/harmony.cpp:269-291) with the same distributional
    * contract (each block ≈ blockSize of cells, reshuffled every sweep).
    */
  def blockOf(cellId: Long, salt: Long, nBlocks: Int): Int = {
    var z = cellId ^ (salt * 0x9E3779B97F4A7C15L)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (((z % nBlocks) + nBlocks) % nBlocks).toInt
  }

  // ------------------------------------------------------------------ API
  /** Corrected embeddings for `df` (schema: idCol, featuresCol:
    * array<float|double>, covariate columns). Returns (idCol, featuresCol).
    */
  def run(
      df: DataFrame,
      covariates: Seq[String],
      opts: HarmonyOptions = HarmonyOptions(),
      idCol: String = "cell_id",
      featuresCol: String = "features"): DataFrame =
    fit(df, covariates, opts, idCol, featuresCol).corrected

  /** Typed variant (SURVEY §7.1): any case-class Dataset whose fields
    * include the id, features and covariate columns. */
  def fitTyped[T](
      ds: Dataset[T],
      covariates: Seq[String],
      opts: HarmonyOptions = HarmonyOptions(),
      idCol: String = "cell_id",
      featuresCol: String = "features"): HarmonyResult =
    fit(ds.toDF(), covariates, opts, idCol, featuresCol)

  /** Parquet in / parquet out adapter — the Seurat/SCE adapter pattern
    * (SURVEY ops 2-3): writes `outPath/corrected` (idCol, featuresCol) and
    * `outPath/stdev` (component, stdev), the per-component standard
    * deviations the reference feeds CreateDimReducObject
    * (/root/reference/R/RunHarmony.R:106-111).
    *
    * @param projectDimFrom optional path of a sparse COO expression parquet
    *        (cell_id, gene_idx, value). When set, the adapter also runs the
    *        reference's `project.dim` step (RunHarmony.R:113-119) — gene
    *        loadings projected onto the CORRECTED embedding — and writes
    *        `outPath/loadings` (gene_idx, loading array<double>). */
  def runParquet(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      covariates: Seq[String],
      opts: HarmonyOptions = HarmonyOptions(),
      idCol: String = "cell_id",
      featuresCol: String = "features",
      projectDimFrom: Option[String] = None): Unit = {
    import org.apache.spark.sql.functions.{col, element_at, stddev_samp, lit}
    val res = fit(spark.read.parquet(inPath), covariates, opts, idCol, featuresCol)
    res.corrected.write.mode("overwrite").parquet(s"$outPath/corrected")
    projectDimFrom.foreach { cooPath =>
      graft.operators.SingleCell.projectDim(
          spark.read.parquet(cooPath),
          res.corrected.select(col(idCol).as("cell_id"),
            col(featuresCol).as("features")))
        .write.mode("overwrite").parquet(s"$outPath/loadings")
    }
    val d = res.state.d
    val sdCols = (0 until d).map(j =>
      stddev_samp(element_at(col(featuresCol), j + 1)).as(s"sd$j"))
    val row = res.corrected.agg(sdCols.head, sdCols.tail: _*).head()
    import spark.implicits._
    (0 until d).map(j => (j, row.getDouble(j)))
      .toDF("component", "stdev")
      .write.mode("overwrite").parquet(s"$outPath/stdev")
  }

  /** The correction map's inner apply — z − Σ_k r_k · W_k[1+level] rows
    * (intercept row 0 untouched, op 51) — shared by the fit's own
    * correction map, [[serve]], and the h14 exact-apply contract so the
    * three can never drift: identical loop order means bit-identical
    * floats. */
  private[graft] def applyCorrection(
      z: Array[Float],
      batch: Array[Int],
      r: Array[Float],
      w: Array[Double],
      K: Int,
      B: Int,
      d: Int): Array[Float] = {
    val p = B + 1
    val out = new Array[Double](d)
    var j = 0
    while (j < d) { out(j) = z(j).toDouble; j += 1 }
    var kk = 0
    while (kk < K) {
      val rk = r(kk).toDouble
      if (rk != 0.0) {
        var ci = 0
        while (ci < batch.length) {
          // batch(ci) < 0 = serveModel's unseen-level sentinel: the model
          // has no W row for the level, so only the (never-subtracted)
          // intercept applies — the covariate's correction is skipped
          if (batch(ci) >= 0) {
            val off = kk * p * d + (1 + batch(ci)) * d
            j = 0
            while (j < d) { out(j) -= rk * w(off + j); j += 1 }
          }
          ci += 1
        }
      }
      kk += 1
    }
    val zf = new Array[Float](d)
    j = 0
    while (j < d) { zf(j) = out(j).toFloat; j += 1 }
    zf
  }

  /** FROZEN-MODEL CORRECTION SERVE — map cells through an ALREADY-FITTED
    * model without refitting (the Symphony-style reference-atlas mapping,
    * Kang et al. 2021, Nature Communications — public; the engine's
    * train-once/serve-many contract applied to the flagship algorithm,
    * the same lifecycle shape the IVFPQ and graph-index lanes prove):
    * each cell is soft-assigned against the FROZEN centroids with the
    * fit's penalized E-step (σ, θ, E, O all frozen — the batch-diversity
    * penalty steers serve-time assignment exactly as it steered the last
    * fit sweep), then corrected by the FROZEN MoE coefficients via
    * [[applyCorrection]] — bit-for-bit the fit's own correction map.
    *
    * Covariate values resolve against the fit's level dictionary
    * (state.levelLabels). `serveUnseen` makes the unseen-level POLICY
    * explicit (VERDICT r14 #4 — a serving stream meets new labels first,
    * and one novel batch id must not cost the whole job to an executor
    * exception; the reference defines no unseen-level semantics to
    * borrow, so the policy is declared, not inherited):
    *
    *   - `fail` (default): throw on the first unseen level — the
    *     fail-fast batch default, bit-identical to the pre-policy
    *     behavior (h14/h15 pin it);
    *   - `skip`: rows with ANY unseen level are quarantined (dropped
    *     from the output); [[serveQuarantined]] reports exactly those
    *     rows with the offending `cov=value` keys, so a caller can route
    *     them to a refit queue;
    *   - `interceptOnly`: an unseen covariate contributes NOTHING — no
    *     diversity-penalty term in the serve-time E-step and no W-row
    *     subtraction in the correction (only the never-subtracted
    *     intercept applies). Seen covariates of the same row still
    *     correct normally; a row whose every covariate is unseen passes
    *     through with plain-softmax R and untouched features.
    *
    * Scale shape: ONE stateless map over the input — the model broadcast
    * is K·(B+1)·d doubles (a few MB), no shuffle, no driver state — so
    * the serve path runs identically inside a streaming micro-batch
    * (st39). Returns (idCol, featuresCol = corrected, r). */
  def serve(
      result: HarmonyResult,
      df: DataFrame,
      covariates: Seq[String],
      idCol: String = "cell_id",
      featuresCol: String = "features",
      serveUnseen: String = "fail"): DataFrame =
    serveModel(result.state, df, covariates, idCol, featuresCol, serveUnseen)

  /** [[serve]] from a bare model state — the form [[loadModel]] feeds, so
    * a serving process needs only the persisted model, never the fit. */
  def serveModel(
      st: HarmonyState,
      df: DataFrame,
      covariates: Seq[String],
      idCol: String = "cell_id",
      featuresCol: String = "features",
      serveUnseen: String = "fail"): DataFrame = {
    require(st.lastW.nonEmpty,
      "model has no correction pass to serve (maxIterHarmony = 0)")
    require(covariates.nonEmpty, "at least one covariate is required")
    require(Set("fail", "skip", "interceptOnly").contains(serveUnseen),
      s"serveUnseen must be fail|skip|interceptOnly, got: $serveUnseen")
    val spark = df.sparkSession
    val missing = covariates.filterNot(df.columns.contains)
    require(missing.isEmpty, s"covariates not in dataframe: ${missing.mkString(",")}")
    val typed = df.select(
      (Seq(col(idCol).cast("long").as("cell_id"),
        col(featuresCol).cast("array<float>").as("features")) ++
        covariates.map(c => col(c).cast("string").as(c))): _*)
    val levelOf: Map[String, Int] = st.levelLabels.zipWithIndex.toMap
    val bc = spark.sparkContext.broadcast(
      (st.yRowMajor, st.sigma, st.theta, st.E, st.O, st.lastW,
        st.K, st.B, st.d, levelOf))
    val covs = covariates.toIndexedSeq
    val policy = serveUnseen
    import spark.implicits._
    val out = typed.rdd.flatMap { row =>
      val (y, sigma, theta, e, o, w, k0, b0, d0, lvl) = bc.value
      val zs = row.getSeq[Float](1)
      val z = new Array[Float](zs.length)
      var i = 0
      while (i < z.length) { z(i) = zs(i); i += 1 }
      val batch = new Array[Int](covs.length)
      var anyUnseen = false
      var ci = 0
      while (ci < covs.length) {
        val key = s"${covs(ci)}=${row.getString(2 + ci)}"
        batch(ci) = lvl.getOrElse(key, {
          if (policy == "fail")
            throw new IllegalArgumentException(
              s"unseen covariate level: $key (serveUnseen=fail; pass " +
                "serveUnseen=skip|interceptOnly to quarantine instead)")
          anyUnseen = true
          -1 // the kernels' unseen sentinel (penalizedR/applyCorrection)
        })
        ci += 1
      }
      if (anyUnseen && policy == "skip") None
      else {
        val dist = LinAlg.cosDistances(y, k0, d0, LinAlg.l2Normalize(z))
        val rf = Kernels.penalizedR(dist, batch, sigma, theta, e, o, k0, b0)
        Some((row.getLong(0), applyCorrection(z, batch, rf, w, k0, b0, d0), rf))
      }
    }
    spark.createDataset(out).toDF(idCol, featuresCol, "r")
  }

  /** The rows a `serveUnseen = skip` serve quarantines, REPORTED — each
    * with the exact `cov=value` keys the model has no level for. All
    * relational (one filter over the input, the level dictionaries as
    * broadcast in-list literals — level counts are model-sized, never
    * corpus-sized), so it composes with any serving plan and runs under
    * whole-stage codegen. Returns (cell_id, unseen_levels). */
  def serveQuarantined(
      st: HarmonyState,
      df: DataFrame,
      covariates: Seq[String],
      idCol: String = "cell_id"): DataFrame = {
    require(covariates.nonEmpty, "at least one covariate is required")
    val unseenCols = covariates.map { c =>
      val seen = st.levelLabels.collect {
        case l if l.startsWith(c + "=") => l.substring(c.length + 1)
      }.toSeq
      // NULL must be looked up exactly as serveModel keys it — a null
      // value becomes the string key "cov=null" — while a bare isin over
      // a NULL column yields NULL, silently mis-reporting the row as
      // seen (undercounting what a skip-policy serve actually dropped)
      val v = coalesce(col(c).cast("string"), lit("null"))
      when(!v.isin(seen: _*), concat(lit(c + "="), v))
    }
    df.select(col(idCol).cast("long").as("cell_id"),
        array(unseenCols: _*).as("__u"))
      .select(col("cell_id"),
        expr("filter(__u, x -> x IS NOT NULL)").as("unseen_levels"))
      .filter(size(col("unseen_levels")) > 0)
  }

  /** PERSIST the frozen model — everything [[serveModel]] needs, as ONE
    * single-row parquet (the t33/t34/s31 persist discipline applied to
    * the flagship: train once, write the model, serve from files). The
    * arrays are K·(B+1)·d doubles at most — kilobytes to a few MB — so a
    * single row is the honest layout; a serving fleet broadcasts it. */
  def saveModel(result: HarmonyResult, path: String): Unit = {
    val st = result.state
    require(st.lastW.nonEmpty,
      "model has no correction pass to persist (maxIterHarmony = 0)")
    val spark = result.corrected.sparkSession
    import spark.implicits._
    Seq((st.d, st.K, st.B, st.N, st.covariateOf.toSeq, st.levelLabels.toSeq,
        st.yRowMajor.toSeq, st.E.toSeq, st.O.toSeq, st.prB.toSeq,
        st.nB.toSeq, st.sigma.toSeq, st.theta.toSeq, st.lastLambda.toSeq,
        st.lastW.toSeq))
      .toDF("d", "k", "b", "n", "covariate_of", "level_labels", "y", "e",
        "o", "pr_b", "n_b", "sigma", "theta", "last_lambda", "w")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Reload a [[saveModel]] artifact into a serve-ready state. The
    * round-trip is exact: every field is doubles/longs/strings in
    * parquet, so [[serveModel]] from the loaded state is bit-identical
    * to serving from the in-memory fit (pinned by h15). */
  def loadModel(spark: SparkSession, path: String): HarmonyState = {
    val r = spark.read.parquet(path).head()
    def da(name: String): Array[Double] =
      r.getSeq[Double](r.fieldIndex(name)).toArray
    val st = new HarmonyState(
      d = r.getAs[Int]("d"),
      K = r.getAs[Int]("k"),
      B = r.getAs[Int]("b"),
      N = r.getAs[Long]("n"),
      covariateOf = r.getSeq[Int](r.fieldIndex("covariate_of")).toArray,
      levelLabels = r.getSeq[String](r.fieldIndex("level_labels")).toArray,
      yRowMajor = da("y"),
      E = da("e"),
      O = da("o"),
      prB = da("pr_b"),
      nB = da("n_b"),
      sigma = da("sigma"),
      theta = da("theta"))
    st.lastLambda = da("last_lambda")
    st.lastW = da("w")
    st
  }

  def fit(
      df: DataFrame,
      covariates: Seq[String],
      opts: HarmonyOptions = HarmonyOptions(),
      idCol: String = "cell_id",
      featuresCol: String = "features"): HarmonyResult = {

    val spark = df.sparkSession
    import spark.implicits._

    require(covariates.nonEmpty, "at least one covariate is required")
    val missing = covariates.filterNot(df.columns.contains)
    require(missing.isEmpty, s"covariates not in dataframe: ${missing.mkString(",")}")
    require(df.columns.contains(idCol) && df.columns.contains(featuresCol),
      s"need $idCol and $featuresCol columns")

    // ---- covariate dictionaries (op 15/18: as.factor analogue) ----------
    val typed = df.select(
      (Seq(col(idCol).cast("long").as("cell_id"),
        col(featuresCol).cast("array<float>").as("features")) ++
        covariates.map(c => col(c).cast("string").as(c))): _*)

    val dicts: Seq[Array[String]] = covariates.map { c =>
      typed.select(col(c)).distinct().as[String].collect().sorted
    }
    val bVec = dicts.map(_.length).toArray
    val B = bVec.sum
    val offsets = bVec.scanLeft(0)(_ + _)
    val levelIndex: Seq[Map[String, Int]] = dicts.zipWithIndex.map { case (vals, ci) =>
      vals.zipWithIndex.map { case (v, i) => v -> (offsets(ci) + i) }.toMap
    }
    val covariateOf = Array.tabulate(B) { b => offsets.lastIndexWhere(_ <= b, offsets.length - 2) }
    val levelLabels = Array.tabulate(B) { b =>
      val c = covariateOf(b); s"${covariates(c)}=${dicts(c)(b - offsets(c))}"
    }

    val bcLevelIndex = spark.sparkContext.broadcast(levelIndex)
    val nCov = covariates.length

    // Lineage truncation after every pass: the block-online sweeps would
    // otherwise nest each sweep's union-of-blocks plan inside the next
    // (exponential logical-plan growth — SURVEY §7.4 hard part 5).
    // checkpointDir unset (default): localCheckpoint — executor-local cache
    // only, fastest, dies with a lost node. checkpointDir set: reliable
    // checkpoint() — persist + a durable file copy, so recomputation after
    // executor loss / cache eviction replays from files (the 100 TB
    // cluster-resilience contract; see README and HarmonySpec).
    opts.checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    val reliableCkpt = opts.checkpointDir.isDefined
    def ckptRdd(r: RDD[CellState]): RDD[CellState] =
      if (reliableCkpt) {
        r.persist(StorageLevel.MEMORY_AND_DISK)
        r.checkpoint() // written by a second job off the fresh cache
        r
      } else r.localCheckpoint()

    val dims = opts.dimsUse.map(_.toArray)
    val parsed: Dataset[CellState] = typed.map { row =>
      val id = row.getLong(0)
      val raw = row.getSeq[Float](1).toArray
      val feats = dims match {
        case Some(idx) => idx.map(raw(_))
        case None => raw
      }
      val li = bcLevelIndex.value
      val batch = Array.tabulate(nCov)(c => li(c)(row.getString(2 + c)))
      CellState(id, batch, feats, feats, Array.emptyFloatArray)
    }
    val cells: Dataset[CellState] =
      if (reliableCkpt) parsed.checkpoint(eager = true)
      else parsed.localCheckpoint(true)

    val N = cells.count()
    require(N >= 6, s"refusing to run on N=$N < 6 cells " +
      "(matches /root/reference/src/harmony.cpp:83-86)")
    if (N < 40) println(s"[harmony] warning: N=$N < 40 cells; using block size 0.2")
    val blockSize = if (N < 40) 0.2 else opts.blockSize

    val d = cells.head().zOrig.length
    val K = opts.nclust.getOrElse(math.min(math.round(N / 30.0).toInt, 100)).max(1)

    // ---- batch sizes / priors (ops 16-17) -------------------------------
    val nB = new Array[Double](B)
    covariates.indices.foreach { ci =>
      typed.groupBy(col(covariates(ci))).count().collect().foreach { r =>
        nB(levelIndex(ci)(r.getString(0))) = r.getLong(1).toDouble
      }
    }
    val prB = nB.map(_ / N)

    // ---- theta expansion + tau discounting (op 22) ----------------------
    val thetaPerCov: Seq[Double] =
      if (opts.theta.length == 1) Seq.fill(nCov)(opts.theta.head)
      else { require(opts.theta.length == nCov, "theta length must match covariates"); opts.theta }
    val theta = Array.tabulate(B) { b =>
      val t = thetaPerCov(covariateOf(b))
      if (opts.tau > 0) t * (1.0 - math.exp(-math.pow(nB(b) / (K * opts.tau), 2))) else t
    }

    val sigma = opts.sigmaPerCluster match {
      case Some(sv) =>
        require(sv.length == K, s"sigmaPerCluster length ${sv.length} != K=$K")
        sv.toArray
      case None => Array.fill(K)(opts.sigma)
    }

    // ---- lambda vector (ops 24-25) --------------------------------------
    val lambdaPerLevel: Option[Array[Double]] = opts.lambda.map { ls =>
      val perCov = if (ls.length == 1) Seq.fill(nCov)(ls.head)
      else { require(ls.length == nCov, "lambda length must match covariates"); ls }
      Array.tabulate(B)(b => perCov(covariateOf(b)))
    }

    // ---- k-means init (ops 32-33) ---------------------------------------
    // K=1 (plain-ridge degenerate case, ui.R:34-35): normalized global mean.
    // op 55 timers: per-phase wall clock, always recorded (summed across
    // rounds into state.phaseSeconds after the state exists), printed live
    // under GRAFT_DEBUG_SWEEP
    val phaseAcc = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def dbg[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      phaseAcc.updateWith(label) { v => Some(v.getOrElse(0.0) + dt) }
      if (sys.env.contains("GRAFT_DEBUG_SWEEP"))
        println(f"[fit-dbg] $label%-22s $dt%6.2f s")
      r
    }

    // Driver-sized N: local seeded k-means++ + Lloyd (the reference's own
    // init shape, no MLlib distributed-pass latency). Large N: MLlib
    // k-means|| — the distributed analogue of k-means++.
    val kmeansLocalThreshold = 50000L
    val centers: Array[Array[Double]] = dbg("kmeans init")(
      if (K == 1) {
        val sums = cells.rdd.treeAggregate(new Array[Double](d))(
          { (acc, c) =>
            val z = LinAlg.l2Normalize(c.zCorr)
            var j = 0; while (j < d) { acc(j) += z(j); j += 1 }; acc },
          { (a, b) => var j = 0; while (j < d) { a(j) += b(j); j += 1 }; a })
        Array(sums)
      } else if (N <= kmeansLocalThreshold) {
        val pts = cells.collect().map(c => LinAlg.l2Normalize(c.zCorr).map(_.toDouble))
        LocalKMeans.fit(pts, K, opts.kmeansMaxIter, opts.seed)
      } else if (opts.kmeansSampleCap > 0) {
        // bounded-sample seeding: centroid INIT doesn't need every cell —
        // a uniform sample of kmeansSampleCap cells (one sample pass,
        // bounded driver memory) + the driver-local k-means++ gives
        // statistically equivalent centers without k-means||'s multiple
        // full-data passes (which cost more than the init is worth at 2M+)
        val frac = math.min(1.0, opts.kmeansSampleCap.toDouble / N)
        val pts = cells.rdd.sample(withReplacement = false, frac, opts.seed)
          .map(c => LinAlg.l2Normalize(c.zCorr).map(_.toDouble)).collect()
        LocalKMeans.fit(pts, K, opts.kmeansMaxIter, opts.seed)
      } else {
        val kmInput = cells.map(c => Tuple1(Vectors.dense(
          LinAlg.l2Normalize(c.zCorr).map(_.toDouble)))).toDF("features")
        new KMeans()
          .setK(K).setMaxIter(opts.kmeansMaxIter).setSeed(opts.seed)
          .setFeaturesCol("features").setInitMode("k-means||")
          .fit(kmInput)
          .clusterCenters.map(_.toArray)
      })
    val yRowMajor = new Array[Double](K * d)
    centers.zipWithIndex.foreach { case (arr, k) =>
      var ss = 0.0; arr.foreach(v => ss += v * v)
      val n = math.sqrt(ss)
      var j = 0
      while (j < d) { yRowMajor(k * d + j) = if (n == 0) 0 else arr(j) / n; j += 1 }
    }

    val state = new HarmonyState(d, K, B, N, covariateOf, levelLabels,
      yRowMajor, new Array[Double](K * B), new Array[Double](K * B),
      prB, nB, sigma, theta)
    state.phaseSeconds ++= phaseAcc // kmeans-init timing recorded pre-state

    // op 44 cancellation surface: every job this fit submits runs under a
    // unique job group; checkAbort is polled at round/sweep/block
    // boundaries (the reference's Progress::check_abort cadence) and
    // external callers may cancelJobGroup(state.jobGroup) from any thread
    val sc0 = spark.sparkContext
    state.jobGroup = s"harmony-${java.util.UUID.randomUUID().toString.take(8)}"
    sc0.setJobGroup(state.jobGroup,
      s"harmony fit N=$N K=$K B=$B", interruptOnCancel = true)
    state.rowsVisited = Some(sc0.longAccumulator("harmony.sweepRowsVisited"))
    try {

      // ---- small-N strategy: run the loop driver-local (same formulas, no
      // per-block job latency; see LocalKernel scaladoc) --------------------
      if (N <= opts.localThreshold) {
        val collected = cells.collect()
        cells.unpersist()
        val ids = collected.map(_.cellId)
        val batches = collected.map(_.batch)
        val zo = collected.map(_.zOrig)
        val (zc, rArr, localRounds) = dbg("local kernel")(
          LocalKernel.run(ids, batches, zo, state, lambdaPerLevel, opts, blockSize))
        state.phaseSeconds.clear()
        state.phaseSeconds ++= phaseAcc
        val outCells = Array.tabulate(collected.length) { i =>
          CellState(ids(i), batches(i), zo(i), zc(i), rArr(i).map(_.toFloat))
        }
        val ds = spark.createDataset(outCells.toSeq)
        val corrected = ds.map(c => (c.cellId, c.zCorr)).toDF(idCol, featuresCol)
        return HarmonyResult(corrected, ds, state, localRounds)
      }

      // ---- init E-step: plain softmax R, then E/O (harmony.cpp:131-156) ---
      // the hot loop runs on RDD[CellState] (plain JVM objects in the block
      // cache): no encoder decode/encode per pass
      var cur: RDD[CellState] = dbg("init softmax")(
        ckptRdd(plainSoftmax(cells.rdd, state)))
      dbg("init refreshEO")(refreshEO(cur, state)) // materializes the ckpt
      locally {
        val c0 = cur
        state.swapStorage(Seq(() => { c0.unpersist(false); () })) // frees nothing yet
        cells.unpersist() // parsed-input cache superseded by cur
      }
      state.objectiveKmeans += dbg("objective")(objective(cur, state))
      state.objectiveHarmony += state.objectiveKmeans.last

      // ---- round loop (R/utils.R:15-46) -----------------------------------
      var rounds = 0
      var converged = false
      while (rounds < opts.maxIterHarmony && !converged) {
        rounds += 1
        pollAbort(sc0, state, opts, s"round $rounds")

        // op 41: cold-restart E-step after a correction round (also the pass
        // that materializes the previous round's lazy correction map)
        if (rounds > 1) {
          val next = ckptRdd(plainSoftmax(cur, state))
          dbg("round softmax+EO")(refreshEO(next, state)) // materializes
          state.swapStorage(Seq(() => { next.unpersist(false); () }))
          cur = next
        }

        // clustering sweeps (ops 42-44); objectives are fused into the
        // sweeps' own passes. Sequential: the whole round is ONE barrier job
        // (windowed convergence replicated in-task); Sweep: one job per sweep
        if (opts.blockMode == BlockMode.Sequential) {
          val (nextCells, objs) = dbg("cluster round")(
            sequentialRound(cur, state, blockSize, opts, rounds))
          cur = nextCells
          state.objectiveKmeans ++= objs
          state.kmeansRounds += objs.length
        } else {
          var sweep = 0
          var clusterDone = false
          while (sweep < opts.maxIterCluster && !clusterDone) {
            pollAbort(sc0, state, opts, s"round $rounds sweep $sweep")
            val (nextCells, obj) = dbg("sweep")(sweepUpdate(cur, state, opts))
            cur = nextCells
            state.objectiveKmeans += obj
            if (sweep + 1 > opts.windowSize && windowConverged(state, opts)) clusterDone = true
            sweep += 1
          }
          state.kmeansRounds += sweep
        }
        state.objectiveHarmony += state.objectiveKmeans.last

        // M-step: mixture-of-experts ridge correction (ops 45-52)
        cur = dbg("moeCorrect")(moeCorrectRidge(cur, state, lambdaPerLevel, opts))

        // harmony-level convergence (op 40)
        if (opts.earlyStop && state.objectiveHarmony.length >= 2) {
          val o = state.objectiveHarmony(state.objectiveHarmony.length - 2)
          val n = state.objectiveHarmony.last
          if ((o - n) / math.abs(o) < opts.epsilonHarmony) converged = true
        }
      }

      // materialize the final corrected generation once so repeated reads of
      // the result don't replay the correction map (rounds == 0: cur is the
      // already-materialized init generation)
      val outDs: Dataset[CellState] =
        if (rounds == 0) spark.createDataset(cur)
        else dbg("final ckpt")({
          val f = ckptRdd(cur)
          f.count()
          state.swapStorage(Seq(() => { f.unpersist(false); () }))
          spark.createDataset(f)
        })
      state.phaseSeconds.clear()
      state.phaseSeconds ++= phaseAcc
      val corrected = outDs.map(c => (c.cellId, c.zCorr)).toDF(idCol, featuresCol)
      HarmonyResult(corrected, outDs, state, rounds)
    } finally {
      // op 44 hygiene: without this, the local-path return, a checkAbort
      // HarmonyAbortedException or any error exit would leave the fit's
      // job group set on the driver thread, making later unrelated jobs
      // collateral to a deferred cancelJobGroup(state.jobGroup)
      sc0.clearJobGroup()
    }
  }

  // ------------------------------------------------------------ kernels

  /** Plain (unpenalized) softmax over cosine distances — init + round
    * re-estimation (harmony.cpp:141-146, 214-228). Pure map, no shuffle.
    * The whole hot loop runs on RDD[CellState] (plain JVM objects in the
    * block cache): no encoder decode/encode per pass, and the Sequential
    * path's partition-atom layout survives between passes. */
  private def plainSoftmax(cells: RDD[CellState], st: HarmonyState): RDD[CellState] = {
    val bc = cells.sparkContext.broadcast((st.yRowMajor, st.sigma, st.K, st.d))
    cells.map { c =>
      val (y, sigma, k, d) = bc.value
      val z = LinAlg.l2Normalize(c.zCorr)
      val dist = LinAlg.cosDistances(y, k, d, z)
      val r = new Array[Double](k)
      var sum = 0.0
      var i = 0
      while (i < k) { r(i) = math.exp(-dist(i) / sigma(i)); sum += r(i); i += 1 }
      val rf = new Array[Float](k)
      i = 0
      while (i < k) { rf(i) = (r(i) / sum).toFloat; i += 1 }
      c.copy(r = rf)
    }
  }

  /** Aggregate (Σ_cells r, R·Φᵀ) — the K-vector of cluster masses and the
    * K×B observed co-occurrence (ops 36-37) via treeAggregate (map-side
    * combine; driver receives K*(B+1) doubles). */
  private def sumRORdd(rdd: RDD[CellState], K: Int, B: Int): (Array[Double], Array[Double]) = {
    val zero = (new Array[Double](K), new Array[Double](K * B))
    rdd.treeAggregate(zero)(
      seqOp = { case ((mass, o), c) =>
        var k = 0
        while (k < K) {
          val rk = c.r(k).toDouble
          mass(k) += rk
          var ci = 0
          while (ci < c.batch.length) { o(k * B + c.batch(ci)) += rk; ci += 1 }
          k += 1
        }
        (mass, o)
      },
      combOp = { case ((m1, o1), (m2, o2)) =>
        var i = 0
        while (i < m1.length) { m1(i) += m2(i); i += 1 }
        i = 0
        while (i < o1.length) { o1(i) += o2(i); i += 1 }
        (m1, o1)
      })
  }

  private def refreshEO(cells: RDD[CellState], st: HarmonyState): Unit = {
    val (mass, o) = sumRORdd(cells, st.K, st.B)
    var k = 0
    while (k < st.K) {
      var b = 0
      while (b < st.B) {
        st.E(k * st.B + b) = mass(k) * st.prB(b)
        st.O(k * st.B + b) = o(k * st.B + b)
        b += 1
      }
      k += 1
    }
  }

  /** One Sweep-mode clustering sweep (op 43, the single-pass relaxation
    * for very large N): every cell's R recomputed against one (E, O)
    * snapshot, E/O refreshed from the same pass, objective fused in.
    * Returns the updated cells and the sweep objective. */
  private def sweepUpdate(
      cells: RDD[CellState],
      st: HarmonyState,
      opts: HarmonyOptions): (RDD[CellState], Double) = {
    val sc = cells.sparkContext
    val K = st.K; val B = st.B; val d = st.d
    val bcFixed: Broadcast[(Array[Double], Array[Double], Array[Double])] =
      sc.broadcast((st.yRowMajor, st.sigma, st.theta))
    val e0 = st.E.clone()
    val o0 = st.O.clone()
    val accP = new SweepPartials(K, B)
    sc.register(accP)
    val rowsAcc = st.rowsVisited.orNull

    // fused pass: the penalized R update (harmony.cpp:307-313) AND its
    // aggregates in ONE iteration — the distances computed for the softmax
    // are reused for the objective's Σ r·dist term, and the per-partition
    // (mass, RΦᵀ, t1, t2) partials land in accP when each partition's
    // iterator drains (during cache materialization), so a single count()
    // job materializes the updated cells and the partials
    val updated = cells.mapPartitionsWithIndex { (pid, it) =>
      val (y, sigma, theta) = bcFixed.value
      val mass = new Array[Double](K)
      val oPart = new Array[Double](K * B)
      var t1 = 0.0
      var t2 = 0.0
      var nRows = 0L
      new Iterator[CellState] {
        private var flushed = false
        override def hasNext: Boolean = {
          val h = it.hasNext
          if (!h && !flushed) {
            flushed = true
            accP.add((pid, mass, oPart, t1, t2))
            if (rowsAcc != null) rowsAcc.add(nRows)
          }
          h
        }
        override def next(): CellState = {
          val c = it.next()
          nRows += 1
          val dist = LinAlg.cosDistances(y, K, d, LinAlg.l2Normalize(c.zCorr))
          val rf = Kernels.penalizedR(dist, c.batch, sigma, theta, e0, o0, K, B)
          // partials on the UPDATED r, at the float precision it is
          // stored with (identical to re-aggregating the stored rows)
          var k = 0
          while (k < K) {
            val rk = rf(k).toDouble
            mass(k) += rk
            t1 += rk * dist(k)
            if (rk > 0) t2 += sigma(k) * rk * math.log(rk)
            var ci = 0
            while (ci < c.batch.length) { oPart(k * B + c.batch(ci)) += rk; ci += 1 }
            k += 1
          }
          c.copy(r = rf)
        }
      }
    }.persist(StorageLevel.MEMORY_AND_DISK)
    updated.count() // ONE job: materializes cells + fills accP

    val mass = new Array[Double](K)
    val o = new Array[Double](K * B)
    var t1 = 0.0
    var t2 = 0.0
    accP.value.values.foreach { case (m0, o0p, pt1, pt2) =>
      var j = 0
      while (j < K) { mass(j) += m0(j); j += 1 }
      j = 0
      while (j < o.length) { o(j) += o0p(j); j += 1 }
      t1 += pt1
      t2 += pt2
    }
    var k = 0
    while (k < K) {
      var b = 0
      while (b < B) {
        st.E(k * B + b) = mass(k) * st.prB(b)
        st.O(k * B + b) = o(k * B + b)
        b += 1
      }
      k += 1
    }
    st.swapStorage(Seq(() => { updated.unpersist(false); () }))
    (updated, objectiveFromStats(st, t1, t2))
  }

  /** One FULL clustering round of the Sequential block-online update
    * (ops 42-44), driver-coordinated.
    *
    * The reference permutes cells into fresh random blocks every sweep
    * (/root/reference/src/harmony.cpp:269-291). Distributed analogue: ONE
    * random hash co-partition per fit turns the nBlocks*cores partitions
    * into exchangeable random atoms (each a uniform ~1/P sample of cells,
    * regardless of input order); each sweep then re-permutes only the
    * ATOM -> block assignment (a seeded driver-side permutation, free).
    *
    * Per sweep: the "remove block i" deltas are a free regroup of the
    * per-atom partials cache (a block's contribution can't change before
    * its own turn; the cache is built by one single-stage pass at round
    * start and refreshed by each block job); each block then runs ONE
    * fused job over only its own atoms (PartitionPruningRDD) that updates
    * R against the current broadcast (E, O), materializes the new rows,
    * and emits the add-back aggregates through an accumulator — the
    * reference's within-sweep sequential semantics at O(N) row-visits per
    * sweep with no per-sweep shuffle. The residual cost vs Sweep mode is
    * nBlocks job submissions (~25 ms each), which amortizes away as N
    * grows.
    *
    * Returns the updated cells and the per-sweep objectives (windowed
    * convergence, op 39, evaluated between sweeps). */
  private def sequentialRound(
      cells: RDD[CellState],
      st: HarmonyState,
      blockSize: Double,
      opts: HarmonyOptions,
      round: Int): (RDD[CellState], Seq[Double]) = {
    val sc = cells.sparkContext
    val K = st.K; val B = st.B; val d = st.d
    val nBlocks = math.max(1, math.ceil(1.0 / blockSize).toInt)
    // atoms per block: parallelism-wide by default, but capped so the
    // driver's per-atom partials cache (atomMass/atomO, K + K·B doubles
    // per atom) stays O(atomCap · K · B) no matter how wide the cluster
    // is (VERDICT r13 #3) — never below one atom per block
    val m = math.max(1,
      math.min(math.max(1, sc.defaultParallelism), opts.atomCap / nBlocks))
    val P = nBlocks * m

    // resaltEvery > 0: redraw the cell->atom hash every k rounds (fresh
    // uniform atoms, one extra shuffle per k rounds) — closer to the
    // reference's per-sweep cell permutation; 0 keeps atoms fixed per fit
    // (documented relaxation, HarmonyOptions.resaltEvery)
    val saltGroup: Long =
      if (opts.resaltEvery > 0) ((round - 1) / opts.resaltEvery).toLong else 0L
    val atomSalt: Long =
      if (saltGroup == 0L) 0x106689D45497239L
      else 0x106689D45497239L ^ (opts.seed + saltGroup * 0x9E3779B97F4A7C15L)

    val base: RDD[CellState] =
      if (st.blockPartitioned && st.atomSaltGroup == saltGroup &&
          cells.getNumPartitions == P) cells
      else {
        st.blockPartitioned = true
        st.atomSaltGroup = saltGroup
        val re = cells
          .map(c => (blockOf(c.cellId, atomSalt, P), c))
          .partitionBy(new Partitioner {
            override def numPartitions: Int = P
            override def getPartition(key: Any): Int = key.asInstanceOf[Int]
          })
          .map(_._2)
          .persist(StorageLevel.MEMORY_AND_DISK)
        re.count()
        // the co-partition is a full copy: free the superseded generation
        // NOW — never hold three data generations at once
        st.swapStorage(Seq(() => { re.unpersist(false); () }))
        re
      }

    val bcFixed: Broadcast[(Array[Double], Array[Double], Array[Double])] =
      sc.broadcast((st.yRowMajor, st.sigma, st.theta))
    val rowsAcc = st.rowsVisited.orNull

    // ---- per-atom partials cache: atom a's (Σr, RΦᵀ) under CURRENT r.
    // Built by ONE single-stage pass per round; refreshed in place by each
    // block job, so every sweep's subtraction deltas are a driver regroup.
    val atomMass = Array.fill(P)(new Array[Double](K))
    val atomO = Array.fill(P)(new Array[Double](K * B))
    base.mapPartitionsWithIndex { (pid, it) =>
      val mass = new Array[Double](K)
      val o = new Array[Double](K * B)
      var nRows = 0L
      it.foreach { c =>
        nRows += 1
        var k = 0
        while (k < K) {
          val rk = c.r(k).toDouble
          mass(k) += rk
          var ci = 0
          while (ci < c.batch.length) { o(k * B + c.batch(ci)) += rk; ci += 1 }
          k += 1
        }
      }
      if (rowsAcc != null) rowsAcc.add(nRows)
      Iterator((pid, (mass, o)))
    }.collect().foreach { case (pid, (mass, o)) =>
      atomMass(pid) = mass
      atomO(pid) = o
    }
    // atom ids are reset to partition ids each round; within the round the
    // per-sweep union renumbering is tracked via atomOf
    var atomOf: Array[Int] = Array.tabulate(P)(identity)

    val hist = ArrayBuffer(st.objectiveKmeans.toSeq: _*)
    val objs = ArrayBuffer.empty[Double]
    var cur = base
    var sweep = 0
    var done = false
    while (sweep < opts.maxIterCluster && !done) {
      val tSweep0 = System.nanoTime()
      pollAbort(sc, st, opts, s"round $round sweep $sweep")
      val salt = round.toLong * 1009L + sweep
      // fresh atom -> block permutation for this sweep's salt
      val perm = new scala.util.Random(salt).shuffle((0 until P).toVector)
      val blockOfPid: Int => Int = pid => perm(pid) / m
      val pidsOfBlock = Array.tabulate(nBlocks)(i =>
        (0 until P).filter(blockOfPid(_) == i).toArray)

      // subtraction deltas: regroup the atom cache (no Spark job)
      val outMass = Array.fill(nBlocks)(new Array[Double](K))
      val outO = Array.fill(nBlocks)(new Array[Double](K * B))
      var pid0 = 0
      while (pid0 < P) {
        val b = blockOfPid(pid0)
        val am = atomMass(atomOf(pid0))
        val ao = atomO(atomOf(pid0))
        var j = 0
        while (j < K) { outMass(b)(j) += am(j); j += 1 }
        j = 0
        while (j < ao.length) { outO(b)(j) += ao(j); j += 1 }
        pid0 += 1
      }

      val parts = new ArrayBuffer[RDD[CellState]]
      var t1 = 0.0
      var t2 = 0.0
      var i = 0
      while (i < nBlocks) {
        // remove block i (from the cache), recompute its R against the
        // current (E, O) snapshot, add the new contribution back — ONE
        // fused job over only block i's atoms
        axpyEO(st, outMass(i), outO(i), -1.0)
        val eSnap = st.E.clone()
        val oSnap = st.O.clone()
        val accP = new SweepPartials(K, B)
        sc.register(accP)
        val pruned = PartitionPruningRDD.create(cur, pid => blockOfPid(pid) == i)
        val updated = pruned.mapPartitionsWithIndex { (localPid, it) =>
          val (y, sigma, theta) = bcFixed.value
          val mass = new Array[Double](K)
          val oPart = new Array[Double](K * B)
          var pt1 = 0.0
          var pt2 = 0.0
          new Iterator[CellState] {
            private var flushed = false
            override def hasNext: Boolean = {
              val h = it.hasNext
              if (!h && !flushed) {
                flushed = true
                accP.add((localPid, mass, oPart, pt1, pt2))
              }
              h
            }
            override def next(): CellState = {
              val c = it.next()
              val dist = LinAlg.cosDistances(y, K, d, LinAlg.l2Normalize(c.zCorr))
              val rf = Kernels.penalizedR(dist, c.batch, sigma, theta, eSnap, oSnap, K, B)
              var k = 0
              while (k < K) {
                val rk = rf(k).toDouble
                mass(k) += rk
                pt1 += rk * dist(k)
                if (rk > 0) pt2 += sigma(k) * rk * math.log(rk)
                var ci = 0
                while (ci < c.batch.length) { oPart(k * B + c.batch(ci)) += rk; ci += 1 }
                k += 1
              }
              c.copy(r = rf)
            }
          }
        }.persist(StorageLevel.MEMORY_AND_DISK)
        updated.count() // ONE job: materializes + fills accP
        val mIn = new Array[Double](K)
        val oIn = new Array[Double](K * B)
        accP.value.foreach { case (localPid, (mass, o, pt1, pt2)) =>
          // PartitionPruningRDD renumbers partitions in parent order:
          // local index -> parent pid -> stable atom id; refresh the cache
          val a = atomOf(pidsOfBlock(i)(localPid))
          atomMass(a) = mass
          atomO(a) = o
          var j = 0
          while (j < K) { mIn(j) += mass(j); j += 1 }
          j = 0
          while (j < o.length) { oIn(j) += o(j); j += 1 }
          t1 += pt1
          t2 += pt2
        }
        axpyEO(st, mIn, oIn, +1.0)
        parts += updated
        i += 1
      }
      // flat union (P partitions again, in block order — a renumbering of
      // exchangeable atoms absorbed by the next sweep's permutation); the
      // parts ARE this generation's storage (no checkpoint copy)
      atomOf = pidsOfBlock.flatten.map(atomOf)
      cur = sc.union(parts.toSeq)
      st.swapStorage(parts.map(p => () => { p.unpersist(false); () }).toSeq)

      val obj = objectiveFromStats(st, t1, t2)
      hist += obj
      objs += obj
      if (sys.env.contains("GRAFT_DEBUG_SWEEP"))
        println(f"[sweep-dbg] sweep $sweep blocks ${(System.nanoTime() - tSweep0) / 1e9}%.2f s")
      sweep += 1
      // windowed convergence (op 39)
      if (sweep > opts.windowSize && hist.length >= 2 * opts.windowSize) {
        var oldSum = 0.0
        var newSum = 0.0
        var w = 0
        while (w < opts.windowSize) {
          oldSum += hist(hist.length - 2 - w)
          newSum += hist(hist.length - 1 - w)
          w += 1
        }
        if (math.abs(oldSum - newSum) / math.abs(oldSum) < opts.epsilonCluster) done = true
      }
    }
    (cur, objs.toSeq)
  }

  /** Objective from fused sweep stats: t1 = Σ r·dist and t2 = Σ σ r log r
    * come from the sweep's own aggregation passes; the diversity term is
    * computed here from the final E/O (Σ_{cells in b} r_k = O(k,b)). */
  private def objectiveFromStats(st: HarmonyState, t1: Double, t2: Double): Double = {
    var t3 = 0.0
    var k = 0
    while (k < st.K) {
      var b = 0
      while (b < st.B) {
        val idx = k * st.B + b
        t3 += st.sigma(k) * st.theta(b) *
          math.log((st.O(idx) + st.E(idx) + 1.0) / (2.0 * st.E(idx) + 1.0)) * st.O(idx)
        b += 1
      }
      k += 1
    }
    (t1 + t2 + t3) * 2000.0 / st.N
  }

  private def axpyEO(st: HarmonyState, mass: Array[Double], o: Array[Double], sign: Double): Unit = {
    var k = 0
    while (k < st.K) {
      var b = 0
      while (b < st.B) {
        val idx = k * st.B + b
        st.E(idx) += sign * mass(k) * st.prB(b)
        st.O(idx) += sign * o(idx)
        b += 1
      }
      k += 1
    }
  }

  /** Objective J = Σ R∘dist + Σ σ R log R + Σ σ R (θ log((O+E+1)/(2E+1)))Φ,
    * scaled by 2000/N (harmony.cpp:158-170). One aggregate pass — used at
    * init; sweeps fuse the objective into their own passes (updateR). */
  private def objective(cells: RDD[CellState], st: HarmonyState): Double = {
    val bc = cells.sparkContext.broadcast(
      (st.yRowMajor, st.sigma, st.theta, st.E.clone(), st.O.clone(), st.K, st.B, st.d))
    val terms = cells.treeAggregate(new Array[Double](3))(
      seqOp = { (acc, c) =>
        val (y, sigma, theta, e, o, k0, b0, d0) = bc.value
        val z = LinAlg.l2Normalize(c.zCorr)
        val dist = LinAlg.cosDistances(y, k0, d0, z)
        var k = 0
        while (k < k0) {
          val rk = c.r(k).toDouble
          acc(0) += rk * dist(k)
          if (rk > 0) acc(1) += sigma(k) * rk * math.log(rk)
          var ci = 0
          while (ci < c.batch.length) {
            val idx = k * b0 + c.batch(ci)
            acc(2) += sigma(k) * rk * theta(c.batch(ci)) *
              math.log((o(idx) + e(idx) + 1.0) / (2.0 * e(idx) + 1.0))
            ci += 1
          }
          k += 1
        }
        acc
      },
      combOp = { (a, b) => var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a })
    (terms(0) + terms(1) + terms(2)) * 2000.0 / st.N
  }

  private def windowConverged(st: HarmonyState, opts: HarmonyOptions): Boolean = {
    val h = st.objectiveKmeans
    val w = opts.windowSize
    if (h.length < 2 * w) return false
    var oldSum = 0.0; var newSum = 0.0
    var i = 0
    while (i < w) {
      oldSum += h(h.length - 2 - i)
      newSum += h(h.length - 1 - i)
      i += 1
    }
    math.abs(oldSum - newSum) / math.abs(oldSum) < opts.epsilonCluster
  }

  /** Mixture-of-experts ridge (ops 45-52): ONE fused treeAggregate emits all
    * K Gram matrices and weighted moments; the driver prunes batches, solves
    * K ridge systems (Breeze), refreshes centroids from the intercept betas,
    * and one map applies the correction from the broadcast W tensor. */
  private def moeCorrectRidge(
      cells: RDD[CellState],
      st: HarmonyState,
      lambdaPerLevel: Option[Array[Double]],
      opts: HarmonyOptions): RDD[CellState] = {
    val sc = cells.sparkContext
    val K = st.K; val B = st.B; val d = st.d
    val P = B + 1 // design width: intercept + all covariate levels

    // ---- per-cluster pruning masks from the driver-resident O ----------
    val keeps = Kernels.pruneMasks(st.O, st.nB, st.covariateOf,
      opts.batchPropCutoff, K, B)
    val bcKeeps = sc.broadcast(keeps)

    // ---- fused moment aggregation (ops 46-47) under the compacted design:
    // a cell contributes intercept + its KEPT levels for each cluster; a
    // cell with every level pruned drops out of that cluster's regression
    // (the reference's keep_cols subset, exact for any covariate count) ----
    val zeroGram = new Array[Double](K * P * P)
    val zeroMom = new Array[Double](K * P * d)
    val (gram, mom) = cells.treeAggregate((zeroGram, zeroMom))(
      seqOp = { case ((g, m), c) =>
        val keepMasks = bcKeeps.value
        val idxs = new Array[Int](c.batch.length + 1)
        var k = 0
        while (k < K) {
          val rk = c.r(k).toDouble
          if (rk != 0.0) {
            val keepK = keepMasks(k)
            var nIdx = 0
            var ci = 0
            var anyKept = false
            while (ci < c.batch.length) {
              if (keepK(c.batch(ci))) { anyKept = true; nIdx += 1; idxs(nIdx) = 1 + c.batch(ci) }
              ci += 1
            }
            if (anyKept) {
              idxs(0) = 0
              var a = 0
              while (a <= nIdx) {
                val ia = idxs(a)
                var b = 0
                while (b <= nIdx) { g(k * P * P + ia * P + idxs(b)) += rk; b += 1 }
                val mOff = k * P * d + ia * d
                var j = 0
                while (j < d) { m(mOff + j) += rk * c.zOrig(j); j += 1 }
                a += 1
              }
            }
          }
          k += 1
        }
        (g, m)
      },
      combOp = { case ((g1, m1), (g2, m2)) =>
        var i = 0
        while (i < g1.length) { g1(i) += g2(i); i += 1 }
        i = 0
        while (i < m1.length) { m1(i) += m2(i); i += 1 }
        (g1, m1)
      })

    // ---- ridge solves (driver; shared kernel) --------------------------
    st.lastLambda = new Array[Double](K * (B + 1))
    val w = Kernels.solveW(gram, mom, keeps, st.E, st.yRowMajor,
      K, B, d, lambdaPerLevel, opts.alpha, Some(st.lastLambda))
    st.lastW = w // frozen-model serve surface (Harmony.serve)

    // ---- correction map (op 51): Z_corr = Z_orig - Σ_k r_k Σ_c W_k[b_c] --
    // lazy map: materialized by the next round's softmax pass (or the final
    // checkpoint at fit end) — no per-round copy; storage generations are
    // managed by HarmonyState.swapStorage
    val bcW = sc.broadcast((w, K, B, d))
    cells.map { c =>
      val (wt, k0, b0, d0) = bcW.value
      c.copy(zCorr = applyCorrection(c.zOrig, c.batch, c.r, wt, k0, b0, d0))
    }
  }
}
