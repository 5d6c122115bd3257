package graft.harmony

/** Driver-local execution of the Harmony iteration for small N — the same
  * strategy selection a query optimizer makes (broadcast vs shuffle): below
  * `HarmonyOptions.localThreshold` cells, distributing the loop costs more
  * in per-job latency than the arithmetic is worth, so the collected cells
  * run through identical formulas in plain arrays (double accumulation,
  * float storage on output; ridge solves via the shared [[Kernels]]).
  *
  * Semantics parity with the distributed path is pinned by
  * HarmonySpec "local path matches distributed path".
  */
private[harmony] object LocalKernel {

  /** Runs the full round loop. Mutates `st` (Y, E, O, objective histories)
    * exactly like the distributed path and returns (zCorr, r) per cell in
    * input order.
    */
  def run(
      ids: Array[Long],
      batches: Array[Array[Int]],
      zOrig: Array[Array[Float]],
      st: HarmonyState,
      lambdaPerLevel: Option[Array[Double]],
      opts: HarmonyOptions,
      blockSize: Double): (Array[Array[Float]], Array[Array[Double]], Int) = {

    val n = ids.length
    val K = st.K; val B = st.B; val d = st.d
    val zCorr: Array[Array[Float]] = zOrig.map(_.clone())
    val r: Array[Array[Double]] = Array.fill(n)(new Array[Double](K))
    val mass = new Array[Double](K) // rowSums(R); E(k,b) = mass(k) * prB(b)

    // dist_mat buffer, recomputed only when Y or Z_corr change (init + after
    // each correction round) and reused across all sweeps/blocks/objective
    // passes — the reference's same buffering (harmony.cpp:141,221)
    val distM: Array[Array[Double]] = Array.fill(n)(new Array[Double](K))
    def refreshDist(): Unit = {
      var i = 0
      while (i < n) {
        val z = LinAlg.l2Normalize(zCorr(i))
        val dd = LinAlg.cosDistances(st.yRowMajor, K, d, z)
        System.arraycopy(dd, 0, distM(i), 0, K)
        i += 1
      }
    }

    def refreshEO(): Unit = {
      java.util.Arrays.fill(st.O, 0.0)
      java.util.Arrays.fill(mass, 0.0)
      var i = 0
      while (i < n) {
        var k = 0
        while (k < K) {
          val rk = r(i)(k)
          mass(k) += rk
          var ci = 0
          while (ci < batches(i).length) { st.O(k * B + batches(i)(ci)) += rk; ci += 1 }
          k += 1
        }
        i += 1
      }
      var k = 0
      while (k < K) {
        var b = 0
        while (b < B) { st.E(k * B + b) = mass(k) * st.prB(b); b += 1 }
        k += 1
      }
    }

    def plainSoftmaxAll(): Unit = {
      var i = 0
      while (i < n) {
        val dist = distM(i)
        var sum = 0.0
        var k = 0
        while (k < K) { r(i)(k) = math.exp(-dist(k) / st.sigma(k)); sum += r(i)(k); k += 1 }
        k = 0
        while (k < K) { r(i)(k) /= sum; k += 1 }
        i += 1
      }
    }

    /** Penalized recompute of cell i's r against the CURRENT (mass, O) —
      * identical formula to the distributed penalizedMap. */
    def penalizedCell(i: Int): Unit = {
      val dist = distM(i)
      var sum = 0.0
      var k = 0
      while (k < K) { r(i)(k) = math.exp(-dist(k) / st.sigma(k)); sum += r(i)(k); k += 1 }
      k = 0
      while (k < K) { r(i)(k) /= sum; k += 1 } // first L1 norm (harmony.cpp:310)
      sum = 0.0
      k = 0
      while (k < K) {
        var pen = 0.0
        var ci = 0
        while (ci < batches(i).length) {
          val b = batches(i)(ci)
          val e = mass(k) * st.prB(b)
          val o = st.O(k * B + b)
          pen += math.pow((2.0 * e + 1.0) / (o + e + 1.0), st.theta(b))
          ci += 1
        }
        r(i)(k) *= pen
        sum += r(i)(k)
        k += 1
      }
      k = 0
      while (k < K) { r(i)(k) /= sum; k += 1 }
    }

    def objective(): Double = {
      var kmeansError = 0.0; var entropy = 0.0; var cross = 0.0
      var i = 0
      while (i < n) {
        val dist = distM(i)
        var k = 0
        while (k < K) {
          val rk = r(i)(k)
          kmeansError += rk * dist(k)
          if (rk > 0) entropy += st.sigma(k) * rk * math.log(rk)
          var ci = 0
          while (ci < batches(i).length) {
            val b = batches(i)(ci)
            val idx = k * B + b
            cross += st.sigma(k) * rk * st.theta(b) *
              math.log((st.O(idx) + st.E(idx) + 1.0) / (2.0 * st.E(idx) + 1.0))
            ci += 1
          }
          k += 1
        }
        i += 1
      }
      (kmeansError + entropy + cross) * 2000.0 / st.N
    }

    def windowConverged(): Boolean = {
      val h = st.objectiveKmeans
      val w = opts.windowSize
      if (h.length < 2 * w) return false
      var oldSum = 0.0; var newSum = 0.0
      var i = 0
      while (i < w) { oldSum += h(h.length - 2 - i); newSum += h(h.length - 1 - i); i += 1 }
      math.abs(oldSum - newSum) / math.abs(oldSum) < opts.epsilonCluster
    }

    def updateRSweep(salt: Long): Unit = {
      val nBlocks = math.max(1, math.ceil(1.0 / blockSize).toInt)
      var blk = 0
      while (blk < nBlocks) {
        var i = 0
        while (i < n) {
          if (Harmony.blockOf(ids(i), salt, nBlocks) == blk) {
            // step 1: remove the cell; step 2: recompute; step 3: add back.
            // (removing per-cell inside the block == removing the whole
            // block first: within a block, E/O are only read via the values
            // updated at block boundaries in the reference; here we follow
            // the reference exactly by removing the entire block first)
            var k = 0
            while (k < K) {
              val rk = r(i)(k)
              mass(k) -= rk
              var ci = 0
              while (ci < batches(i).length) { st.O(k * B + batches(i)(ci)) -= rk; ci += 1 }
              k += 1
            }
          }
          i += 1
        }
        i = 0
        while (i < n) {
          if (Harmony.blockOf(ids(i), salt, nBlocks) == blk) {
            penalizedCell(i)
            var k = 0
            while (k < K) {
              val rk = r(i)(k)
              mass(k) += rk
              var ci = 0
              while (ci < batches(i).length) { st.O(k * B + batches(i)(ci)) += rk; ci += 1 }
              k += 1
            }
          }
          i += 1
        }
        blk += 1
      }
      // sync E from the final masses
      var k = 0
      while (k < K) {
        var b = 0
        while (b < B) { st.E(k * B + b) = mass(k) * st.prB(b); b += 1 }
        k += 1
      }
    }

    def moe(): Unit = {
      val P = B + 1
      val keeps = Kernels.pruneMasks(st.O, st.nB, st.covariateOf,
        opts.batchPropCutoff, K, B)
      val gram = new Array[Double](K * P * P)
      val mom = new Array[Double](K * P * d)
      var i = 0
      while (i < n) {
        val idxs = new Array[Int](batches(i).length + 1)
        var k = 0
        while (k < K) {
          val rk = r(i)(k)
          if (rk != 0.0) {
            val keepK = keeps(k)
            var nIdx = 0
            var ci = 0
            var anyKept = false
            while (ci < batches(i).length) {
              if (keepK(batches(i)(ci))) { anyKept = true; nIdx += 1; idxs(nIdx) = 1 + batches(i)(ci) }
              ci += 1
            }
            if (anyKept) {
              idxs(0) = 0
              var a = 0
              while (a <= nIdx) {
                val ia = idxs(a)
                var b = 0
                while (b <= nIdx) { gram(k * P * P + ia * P + idxs(b)) += rk; b += 1 }
                val mOff = k * P * d + ia * d
                var j = 0
                while (j < d) { mom(mOff + j) += rk * zOrig(i)(j); j += 1 }
                a += 1
              }
            }
          }
          k += 1
        }
        i += 1
      }
      st.lastLambda = new Array[Double](K * P)
      val w = Kernels.solveW(gram, mom, keeps, st.E, st.yRowMajor,
        K, B, d, lambdaPerLevel, opts.alpha, Some(st.lastLambda))
      st.lastW = w // frozen-model serve surface (Harmony.serve)
      // correction: z_corr = z_orig - sum_k r_k sum_c W_k[level_c]
      i = 0
      while (i < n) {
        val out = new Array[Double](d)
        var j = 0
        while (j < d) { out(j) = zOrig(i)(j).toDouble; j += 1 }
        var k = 0
        while (k < K) {
          val rk = r(i)(k)
          if (rk != 0.0) {
            var ci = 0
            while (ci < batches(i).length) {
              val off = k * P * d + (1 + batches(i)(ci)) * d
              j = 0
              while (j < d) { out(j) -= rk * w(off + j); j += 1 }
              ci += 1
            }
          }
          k += 1
        }
        j = 0
        while (j < d) { zCorr(i)(j) = out(j).toFloat; j += 1 }
        i += 1
      }
    }

    // ---- the round loop, mirroring Harmony.fit ----
    refreshDist()
    plainSoftmaxAll()
    refreshEO()
    st.objectiveKmeans += objective()
    st.objectiveHarmony += st.objectiveKmeans.last

    // op 44: same abort cadence as the distributed path (no Spark jobs to
    // cancel here — the kernel is driver-local)
    def poll(where: String): Unit =
      if (opts.checkAbort.exists(f => f()))
        throw new HarmonyAbortedException(s"harmony fit aborted at $where")

    var rounds = 0
    var converged = false
    while (rounds < opts.maxIterHarmony && !converged) {
      rounds += 1
      poll(s"round $rounds")
      if (rounds > 1) { refreshDist(); plainSoftmaxAll(); refreshEO() }
      var sweep = 0
      var clusterDone = false
      while (sweep < opts.maxIterCluster && !clusterDone) {
        poll(s"round $rounds sweep $sweep")
        updateRSweep(salt = rounds * 1009L + sweep)
        st.objectiveKmeans += objective()
        if (sweep + 1 > opts.windowSize && windowConverged()) clusterDone = true
        sweep += 1
      }
      st.kmeansRounds += sweep
      st.objectiveHarmony += st.objectiveKmeans.last
      moe()
      if (opts.earlyStop && st.objectiveHarmony.length >= 2) {
        val o = st.objectiveHarmony(st.objectiveHarmony.length - 2)
        val nw = st.objectiveHarmony.last
        if ((o - nw) / math.abs(o) < opts.epsilonHarmony) converged = true
      }
    }
    (zCorr, r, rounds)
  }
}
