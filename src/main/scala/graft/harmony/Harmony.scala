package graft.harmony

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col
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
    * (/root/reference/R/RunHarmony.R:106-111). */
  def runParquet(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      covariates: Seq[String],
      opts: HarmonyOptions = HarmonyOptions(),
      idCol: String = "cell_id",
      featuresCol: String = "features"): Unit = {
    import org.apache.spark.sql.functions.{col, element_at, stddev_samp, lit}
    val res = fit(spark.read.parquet(inPath), covariates, opts, idCol, featuresCol)
    res.corrected.write.mode("overwrite").parquet(s"$outPath/corrected")
    val d = res.state.d
    val sdCols = (0 until d).map(j =>
      stddev_samp(element_at(col(featuresCol), j + 1)).as(s"sd$j"))
    val row = res.corrected.agg(sdCols.head, sdCols.tail: _*).head()
    import spark.implicits._
    (0 until d).map(j => (j, row.getDouble(j)))
      .toDF("component", "stdev")
      .write.mode("overwrite").parquet(s"$outPath/stdev")
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

    // localCheckpoint after every pass: the block-online sweeps would
    // otherwise nest each sweep's union-of-blocks plan inside the next
    // (exponential logical-plan growth — SURVEY §7.4 hard part 5). On a
    // multi-node cluster swap for reliable `checkpoint()` with a durable dir.
    val dims = opts.dimsUse.map(_.toArray)
    var cells: Dataset[CellState] = typed.map { row =>
      val id = row.getLong(0)
      val raw = row.getSeq[Float](1).toArray
      val feats = dims match {
        case Some(idx) => idx.map(raw(_))
        case None => raw
      }
      val li = bcLevelIndex.value
      val batch = Array.tabulate(nCov)(c => li(c)(row.getString(2 + c)))
      CellState(id, batch, feats, feats, Array.emptyFloatArray)
    }.localCheckpoint(true)

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
    // Driver-sized N: local seeded k-means++ + Lloyd (the reference's own
    // init shape, no MLlib distributed-pass latency). Large N: MLlib
    // k-means|| — the distributed analogue of k-means++.
    val kmeansLocalThreshold = 50000L
    val centers: Array[Array[Double]] =
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
      } else {
        val kmInput = cells.map(c => Tuple1(Vectors.dense(
          LinAlg.l2Normalize(c.zCorr).map(_.toDouble)))).toDF("features")
        new KMeans()
          .setK(K).setMaxIter(opts.kmeansMaxIter).setSeed(opts.seed)
          .setFeaturesCol("features").setInitMode("k-means||")
          .fit(kmInput)
          .clusterCenters.map(_.toArray)
      }
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

    // ---- small-N strategy: run the loop driver-local (same formulas, no
    // per-block job latency; see LocalKernel scaladoc) --------------------
    if (N <= opts.localThreshold) {
      val collected = cells.collect()
      cells.unpersist()
      val ids = collected.map(_.cellId)
      val batches = collected.map(_.batch)
      val zo = collected.map(_.zOrig)
      val (zc, rArr, localRounds) =
        LocalKernel.run(ids, batches, zo, state, lambdaPerLevel, opts, blockSize)
      val outCells = Array.tabulate(collected.length) { i =>
        CellState(ids(i), batches(i), zo(i), zc(i), rArr(i).map(_.toFloat))
      }
      val ds = spark.createDataset(outCells.toSeq)
      val corrected = ds.map(c => (c.cellId, c.zCorr)).toDF(idCol, featuresCol)
      return HarmonyResult(corrected, ds, state, localRounds)
    }

    // ---- init E-step: plain softmax R, then E/O (harmony.cpp:131-156) ---
    cells = plainSoftmax(cells, state).localCheckpoint(true)
    refreshEO(cells, state)
    state.objectiveKmeans += objective(cells, state)
    state.objectiveHarmony += state.objectiveKmeans.last

    // ---- round loop (R/utils.R:15-46) -----------------------------------
    var rounds = 0
    var converged = false
    while (rounds < opts.maxIterHarmony && !converged) {
      rounds += 1

      // op 41: cold-restart E-step after a correction round
      if (rounds > 1) {
        val next = plainSoftmax(cells, state).localCheckpoint(true)
        cells.unpersist()
        cells = next
        refreshEO(cells, state)
      }

      // clustering sweeps (op 43-44)
      var sweep = 0
      var clusterDone = false
      while (sweep < opts.maxIterCluster && !clusterDone) {
        cells = updateR(cells, state, blockSize, opts, salt = rounds * 1009L + sweep)
        state.objectiveKmeans += objective(cells, state)
        if (sweep + 1 > opts.windowSize && windowConverged(state, opts)) clusterDone = true
        sweep += 1
      }
      state.kmeansRounds += sweep
      state.objectiveHarmony += state.objectiveKmeans.last

      // M-step: mixture-of-experts ridge correction (ops 45-52)
      cells = moeCorrectRidge(cells, state, lambdaPerLevel, opts)

      // harmony-level convergence (op 40)
      if (opts.earlyStop && state.objectiveHarmony.length >= 2) {
        val o = state.objectiveHarmony(state.objectiveHarmony.length - 2)
        val n = state.objectiveHarmony.last
        if ((o - n) / math.abs(o) < opts.epsilonHarmony) converged = true
      }
    }

    val corrected = cells.map(c => (c.cellId, c.zCorr)).toDF(idCol, featuresCol)
    HarmonyResult(corrected, cells, state, rounds)
  }

  // ------------------------------------------------------------ kernels

  /** Plain (unpenalized) softmax over cosine distances — init + round
    * re-estimation (harmony.cpp:141-146, 214-228). Pure map, no shuffle. */
  private def plainSoftmax(cells: Dataset[CellState], st: HarmonyState): Dataset[CellState] = {
    val spark = cells.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast((st.yRowMajor, st.sigma, st.K, st.d))
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
  private def sumRO(ds: Dataset[CellState], K: Int, B: Int): (Array[Double], Array[Double]) = {
    val zero = (new Array[Double](K), new Array[Double](K * B))
    ds.rdd.treeAggregate(zero)(
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

  private def refreshEO(cells: Dataset[CellState], st: HarmonyState): Unit = {
    val (mass, o) = sumRO(cells, st.K, st.B)
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

  /** One clustering sweep of the block-online penalized R update (op 43).
    * BlockMode.Sequential preserves the reference's within-sweep sequential
    * E/O semantics: the driver iterates blocks, subtracting each block's
    * contribution, recomputing its R against the broadcast (E, O), and
    * adding it back — per block: one small aggregate + one map+aggregate.
    * BlockMode.Sweep is the single-pass relaxation (one map + one aggregate
    * per sweep) for very large N. */
  private def updateR(
      cells: Dataset[CellState],
      st: HarmonyState,
      blockSize: Double,
      opts: HarmonyOptions,
      salt: Long): Dataset[CellState] = {
    val spark = cells.sparkSession
    import spark.implicits._
    val K = st.K; val B = st.B; val d = st.d

    def penalizedMap(ds: Dataset[CellState]): Dataset[CellState] = {
      val bc = spark.sparkContext.broadcast(
        (st.yRowMajor, st.sigma, st.theta, st.E.clone(), st.O.clone(), K, B, d))
      ds.map { c =>
        val (y, sigma, theta, e, o, k0, b0, d0) = bc.value
        val z = LinAlg.l2Normalize(c.zCorr)
        val dist = LinAlg.cosDistances(y, k0, d0, z)
        val r = new Array[Double](k0)
        var sum = 0.0
        var k = 0
        while (k < k0) { r(k) = math.exp(-dist(k) / sigma(k)); sum += r(k); k += 1 }
        // first L1 normalization (harmony.cpp:310)
        k = 0
        while (k < k0) { r(k) /= sum; k += 1 }
        // diversity penalty: ((2E+1)/(O+E+1))^theta summed over the cell's
        // covariate levels (the `harmony_pow(...) * Phi` product,
        // harmony.cpp:311) then re-normalize
        sum = 0.0
        k = 0
        while (k < k0) {
          var pen = 0.0
          var ci = 0
          while (ci < c.batch.length) {
            val idx = k * b0 + c.batch(ci)
            pen += math.pow((2.0 * e(idx) + 1.0) / (o(idx) + e(idx) + 1.0), theta(c.batch(ci)))
            ci += 1
          }
          r(k) *= pen
          sum += r(k)
          k += 1
        }
        val rf = new Array[Float](k0)
        k = 0
        while (k < k0) { rf(k) = (r(k) / sum).toFloat; k += 1 }
        c.copy(r = rf)
      }
    }

    opts.blockMode match {
      case BlockMode.Sweep =>
        val next = penalizedMap(cells).localCheckpoint(true)
        cells.unpersist()
        refreshEO(next, st)
        next

      case BlockMode.Sequential =>
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.concurrent.ExecutionContext.Implicits.global

        val nBlocks = math.max(1, math.ceil(1.0 / blockSize).toInt)
        val blockDS = Array.tabulate(nBlocks)(i =>
          cells.filter(c => blockOf(c.cellId, salt, nBlocks) == i))
        val parts = new ArrayBuffer[Dataset[CellState]]

        // step 1 for block 0: remove its contribution from E and O
        val (m0, o0) = sumRO(blockDS(0), K, B)
        axpyEO(st, m0, o0, -1.0)

        var i = 0
        while (i < nBlocks) {
          // step 2: recompute block i's R against the updated (E, O) —
          // the broadcast snapshot is taken here, before the overlapped jobs
          val updated = penalizedMap(blockDS(i)).persist(StorageLevel.MEMORY_AND_DISK)
          // step 3 for block i (add back) and step 1 for block i+1
          // (subtract) touch DISJOINT rows and their E/O updates commute,
          // so the two aggregation jobs run concurrently — same sequential
          // semantics, half the per-sweep job latency
          val fIn = Future { sumRO(updated, K, B) }
          val fNextOut =
            if (i + 1 < nBlocks) Some(Future { sumRO(blockDS(i + 1), K, B) }) else None
          val (mIn, oIn) = Await.result(fIn, Duration.Inf)
          axpyEO(st, mIn, oIn, +1.0)
          fNextOut.foreach { f =>
            val (mOut, oOut) = Await.result(f, Duration.Inf)
            axpyEO(st, mOut, oOut, -1.0)
          }
          parts += updated
          i += 1
        }
        // flat union of the materialized blocks; localCheckpoint truncates
        // the plan so next sweep's block filters start from a LogicalRDD
        val next = parts.reduce(_ union _)
          .coalesce(cells.rdd.getNumPartitions)
          .localCheckpoint(true)
        parts.foreach(_.unpersist())
        cells.unpersist()
        next
    }
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
    * scaled by 2000/N (harmony.cpp:158-170). One aggregate pass. */
  private def objective(cells: Dataset[CellState], st: HarmonyState): Double = {
    val spark = cells.sparkSession
    val bc = spark.sparkContext.broadcast(
      (st.yRowMajor, st.sigma, st.theta, st.E.clone(), st.O.clone(), st.K, st.B, st.d))
    val terms = cells.rdd.treeAggregate(new Array[Double](3))(
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
      cells: Dataset[CellState],
      st: HarmonyState,
      lambdaPerLevel: Option[Array[Double]],
      opts: HarmonyOptions): Dataset[CellState] = {
    val spark = cells.sparkSession
    import spark.implicits._
    val K = st.K; val B = st.B; val d = st.d
    val P = B + 1 // design width: intercept + all covariate levels

    // ---- per-cluster pruning masks from the driver-resident O ----------
    val keeps = Kernels.pruneMasks(st.O, st.nB, st.covariateOf,
      opts.batchPropCutoff, K, B)
    val bcKeeps = spark.sparkContext.broadcast(keeps)

    // ---- fused moment aggregation (ops 46-47) under the compacted design:
    // a cell contributes intercept + its KEPT levels for each cluster; a
    // cell with every level pruned drops out of that cluster's regression
    // (the reference's keep_cols subset, exact for any covariate count) ----
    val zeroGram = new Array[Double](K * P * P)
    val zeroMom = new Array[Double](K * P * d)
    val (gram, mom) = cells.rdd.treeAggregate((zeroGram, zeroMom))(
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
    val w = Kernels.solveW(gram, mom, keeps, st.E, st.yRowMajor,
      K, B, d, lambdaPerLevel, opts.alpha)

    // ---- correction map (op 51): Z_corr = Z_orig - Σ_k r_k Σ_c W_k[b_c] --
    val bcW = spark.sparkContext.broadcast((w, K, B, d))
    val next = cells.map { c =>
      val (wt, k0, b0, d0) = bcW.value
      val p = b0 + 1
      val out = new Array[Double](d0)
      var j = 0
      while (j < d0) { out(j) = c.zOrig(j).toDouble; j += 1 }
      var kk = 0
      while (kk < k0) {
        val rk = c.r(kk).toDouble
        if (rk != 0.0) {
          var ci = 0
          while (ci < c.batch.length) {
            val off = kk * p * d0 + (1 + c.batch(ci)) * d0
            j = 0
            while (j < d0) { out(j) -= rk * wt(off + j); j += 1 }
            ci += 1
          }
        }
        kk += 1
      }
      val zf = new Array[Float](d0)
      j = 0
      while (j < d0) { zf(j) = out(j).toFloat; j += 1 }
      c.copy(zCorr = zf)
    }.localCheckpoint(true)
    cells.unpersist()
    next
  }
}
