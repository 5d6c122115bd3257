package graft.harmony

/** User-facing parameters, mirroring the reference's defaults
  * (`/root/reference/R/ui.R:91-141`, `/root/reference/R/harmony_option.R:33-63`).
  *
  * @param nclust          K; when None, `min(round(N/30), 100)` (ui.R:192-194)
  * @param theta           diversity penalty per covariate (scalar replicated
  *                        when fewer values than covariates; ui.R:253-258)
  * @param sigma           soft-kmeans temperature (scalar -> length-K vector)
  * @param lambda          ridge penalty per covariate; None = auto-estimation
  *                        `lambda_b = alpha * E(k,b)` (utils.cpp:159-163)
  * @param alpha           auto-lambda coefficient (harmony_option.R:35)
  * @param tau             expected-cells discounting of theta (ui.R:253-258)
  * @param blockSize       fraction of cells per online update block
  * @param maxIterHarmony  outer rounds (ui.R:99)
  * @param maxIterCluster  clustering sweeps per round (harmony_option.R:37)
  * @param epsilonCluster  windowed clustering convergence tol
  * @param epsilonHarmony  round-over-round convergence tol
  * @param earlyStop       when false, epsilonHarmony behaves as -Inf (ui.R:137-141)
  * @param batchPropCutoff per-cluster batch-pruning threshold (harmony_option.R:41)
  * @param windowSize      clustering convergence window (harmony.cpp:19)
  * @param kmeansMaxIter   Lloyd iterations for init (utils.cpp:53-64 runs 10)
  * @param seed            threads determinism through kmeans + block salting
  * @param blockMode       Sequential = reference block-online semantics
  *                        (driver iterates blocks, E/O sync between blocks);
  *                        Sweep = one parallel update per sweep (scale path,
  *                        the accuracy/speed dial SURVEY.md §7.4 describes)
  * @param checkpointEvery localCheckpoint the cell dataset every k rounds to
  *                        truncate lineage across the iterative loop
  * @param dimsUse         0-based embedding components to use (the reference's
  *                        `dims.use` projection, R/RunHarmony.R:77-87)
  * @param sigmaPerCluster per-cluster sigma vector (overrides the scalar;
  *                        "NEW: vector sigma", src/harmony.cpp:143)
  * @param localThreshold  N at or below which the iteration runs in the
  *                        driver-local kernel (same formulas, no per-block
  *                        job latency) — size-based strategy selection, like
  *                        broadcast-vs-shuffle joins. 0 forces distributed.
  * @param kmeansSampleCap above-localThreshold init fits seeded k-means++ on
  *                        a uniform sample of at most this many cells (one
  *                        sample pass + a driver-local fit) instead of
  *                        full-data MLlib k-means|| — statistically
  *                        equivalent seeding at a fraction of the passes.
  *                        0 = full-data MLlib k-means||.
  * @param checkAbort      polled between rounds, sweeps and sequential
  *                        blocks (the reference's Progress::check_abort,
  *                        /root/reference/src/harmony.cpp:233,355). Return
  *                        true to abort: in-flight Spark jobs in the fit's
  *                        job group are cancelled and the fit throws
  *                        HarmonyAbortedException. External cancellation:
  *                        `sc.cancelJobGroup(<state.jobGroup>)` from any
  *                        other thread.
  * @param checkpointDir   when set, lineage truncation uses RELIABLE
  *                        `checkpoint()` into this directory (HDFS/S3/NFS on
  *                        a real cluster) instead of `localCheckpoint`: each
  *                        materialized generation is also written to durable
  *                        storage, so losing an executor (or a cache
  *                        eviction) replays from files instead of killing a
  *                        10-round fit. None (default) keeps the fast
  *                        executor-local path — correct in local mode and on
  *                        clusters where re-running a failed fit is
  *                        acceptable.
  * @param resaltEvery     Sequential mode co-partitions cells once per fit
  *                        into P exchangeable random atoms and re-permutes
  *                        only the atom->block map per sweep; the reference
  *                        instead re-permutes CELLS every sweep
  *                        (harmony.cpp:269-291), so two cells hashed to the
  *                        same atom here stay block-mates for the whole fit
  *                        (a deliberate relaxation: atoms are ~N/P uniform
  *                        samples, so block statistics match). Set k > 0 to
  *                        redraw the cell->atom hash every k rounds (one
  *                        extra shuffle per k rounds), tightening toward the
  *                        reference's fresh-permutation randomization. 0
  *                        (default) = atoms fixed per fit.
  * @param atomCap         upper bound on the Sequential-mode atom count
  *                        (P = nBlocks × atomsPerBlock partitions). The
  *                        driver caches one (K + K·B)-double partial PER
  *                        ATOM, so uncapped P = nBlocks × defaultParallelism
  *                        makes driver memory grow with cluster width
  *                        (≈13 GB at 8,000 cores, K=100, B=50). The cap
  *                        keeps the cache O(atomCap · K · B) regardless of
  *                        parallelism; atoms are exchangeable uniform
  *                        samples, so block statistics are unchanged —
  *                        each atom just holds more cells. Never caps below
  *                        one atom per block.
  */
final case class HarmonyOptions(
    nclust: Option[Int] = None,
    theta: Seq[Double] = Seq(2.0),
    sigma: Double = 0.1,
    lambda: Option[Seq[Double]] = Some(Seq(1.0)),
    alpha: Double = 0.2,
    tau: Double = 0.0,
    blockSize: Double = 0.05,
    maxIterHarmony: Int = 10,
    maxIterCluster: Int = 4,
    epsilonCluster: Double = 1e-3,
    epsilonHarmony: Double = 1e-2,
    earlyStop: Boolean = true,
    batchPropCutoff: Double = 1e-5,
    windowSize: Int = 3,
    kmeansMaxIter: Int = 10,
    seed: Long = 42L,
    blockMode: BlockMode = BlockMode.Sequential,
    checkpointEvery: Int = 2,
    dimsUse: Option[Seq[Int]] = None,
    sigmaPerCluster: Option[Seq[Double]] = None,
    localThreshold: Long = 50000L,
    kmeansSampleCap: Long = 250000L,
    checkAbort: Option[() => Boolean] = None,
    checkpointDir: Option[String] = None,
    resaltEvery: Int = 0,
    atomCap: Int = 4096) {
  require(blockSize > 0 && blockSize <= 1, "blockSize must be in (0, 1]")
  require(resaltEvery >= 0, "resaltEvery must be >= 0")
  require(atomCap >= 1, "atomCap must be >= 1")
  require(sigma > 0, "sigma must be positive")
  require(lambda.forall(_.forall(_ > 0)), "lambda values must be positive")
  require(alpha > 0, "alpha must be positive")
  require(maxIterHarmony >= 0 && maxIterCluster >= 1, "iteration budgets")
}

object HarmonyOptions {

  /** Pre-v1 parameter names the reference's API dropped and now rejects
    * with migration guidance (`check_legacy_args`,
    * /root/reference/R/harmony_option.R:67-131). */
  private val legacyGuidance: Map[String, String] = {
    val viaOptions = (p: String) =>
      s"The parameter $p has been dropped from the RunHarmony API; " +
        s"set it via HarmonyOptions (harmony_options() in the reference)."
    Map(
      "do_pca" -> ("The parameters do_pca and npcs have been dropped from " +
        "the RunHarmony API; pass cell embeddings directly."),
      "npcs" -> ("The parameters do_pca and npcs have been dropped from " +
        "the RunHarmony API; pass cell embeddings directly."),
      "max.iter.harmony" -> ("The parameter max.iter.harmony is replaced " +
        "with maxIterHarmony (max_iter in the reference)."),
      "epsilon.harmony" -> ("The parameter epsilon.harmony has been " +
        "dropped from the RunHarmony API; use earlyStop to control early " +
        "stopping, or set epsilonHarmony via HarmonyOptions."),
      // NB: "tau" is NOT legacy here — fromMap IS the harmony_options()
      // layer the reference moved tau into, so it parses below
      "block.size" -> viaOptions("block.size"),
      "max.iter.cluster" -> viaOptions("max.iter.cluster"),
      "epsilon.cluster" -> viaOptions("epsilon.cluster"))
  }

  /** Config-map ingestion with the reference's argument validation (SURVEY
    * op 6): the Scala analogue of R's `...` kwargs arriving from a config
    * file / job submission layer. Legacy pre-v1 names fail with the
    * reference's migration guidance; unknown names fail with the
    * reference's "unhandled argument" error — never silently ignored. */
  def fromMap(args: Map[String, String]): HarmonyOptions =
    args.foldLeft(HarmonyOptions()) { case (o, (k, v)) =>
      legacyGuidance.get(k).foreach(msg =>
        throw new IllegalArgumentException(msg))
      k match {
        case "nclust"          => o.copy(nclust = Some(v.toInt))
        case "theta"           => o.copy(theta = v.split(",").toSeq.map(_.trim.toDouble))
        case "sigma"           => o.copy(sigma = v.toDouble)
        case "lambda"          => o.copy(lambda =
          if (v.equalsIgnoreCase("auto")) None
          else Some(v.split(",").toSeq.map(_.trim.toDouble)))
        case "alpha"           => o.copy(alpha = v.toDouble)
        case "tau"             => o.copy(tau = v.toDouble)
        case "blockSize"       => o.copy(blockSize = v.toDouble)
        case "maxIterHarmony"  => o.copy(maxIterHarmony = v.toInt)
        case "maxIterCluster"  => o.copy(maxIterCluster = v.toInt)
        case "epsilonCluster"  => o.copy(epsilonCluster = v.toDouble)
        case "epsilonHarmony"  => o.copy(epsilonHarmony = v.toDouble)
        case "earlyStop"       => o.copy(earlyStop = v.toBoolean)
        case "seed"            => o.copy(seed = v.toLong)
        case "localThreshold"  => o.copy(localThreshold = v.toLong)
        case "blockMode"       => o.copy(blockMode = v.toLowerCase match {
          case "sequential" => BlockMode.Sequential
          case "sweep"      => BlockMode.Sweep
          case other => throw new IllegalArgumentException(
            s"blockMode must be sequential or sweep, got $other")
        })
        case other => throw new IllegalArgumentException(
          s"Argument $other is unhandled. Please refer to the " +
            "documentation for the valid harmony options!")
      }
    }
}

sealed trait BlockMode
object BlockMode {
  case object Sequential extends BlockMode
  case object Sweep extends BlockMode
}

/** Thrown when a fit is aborted via HarmonyOptions.checkAbort (the
  * reference's user-interrupt path, src/harmony.cpp:233,355). */
final class HarmonyAbortedException(msg: String) extends RuntimeException(msg)
