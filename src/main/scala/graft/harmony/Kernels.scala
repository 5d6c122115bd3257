package graft.harmony

import breeze.linalg.{DenseMatrix, inv}

/** Driver-side numeric kernels shared by the distributed path
  * (Harmony.moeCorrectRidge) and the small-N local path (LocalKernel):
  * per-cluster batch pruning + ridge solves + centroid refresh from the
  * aggregated Gram/moment tensors (SURVEY ops 13, 48-50).
  */
private[harmony] object Kernels {

  /** Per-cluster kept-level sets: drop levels with O(k,b)/N_b <= cutoff and
    * covariates left with <2 surviving levels (harmony.cpp:358-410).
    * Computed from the driver-resident O BEFORE the moment aggregation, so
    * the aggregation itself can honor the compacted design — the pruned
    * path is then exact for any covariate count (a cell participates with
    * its intercept + kept levels only; fully-pruned cells drop out, exactly
    * the reference's keep_cols subset regression).
    */
  def pruneMasks(
      o: Array[Double],
      nB: Array[Double],
      covariateOf: Array[Int],
      batchPropCutoff: Double,
      K: Int, B: Int): Array[Array[Boolean]] = {
    val nCov = covariateOf.max + 1
    Array.tabulate(K) { k =>
      val keptLevel = Array.tabulate(B) { b => o(k * B + b) / nB(b) > batchPropCutoff }
      val survivors = new Array[Int](nCov)
      var b = 0
      while (b < B) { if (keptLevel(b)) survivors(covariateOf(b)) += 1; b += 1 }
      Array.tabulate(B)(b => keptLevel(b) && survivors(covariateOf(b)) > 1)
    }
  }

  /** Solve all K ridge systems from flat Gram (K×P×P) and moment (K×P×d)
    * tensors ALREADY aggregated under `keeps` masks; refreshes `yRowMajor`
    * in place from the intercept betas and returns the W correction tensor
    * (K×P×d, intercept rows zero, pruned level rows zero). P = B + 1.
    *
    * `lambdaOut` (K×P, caller-allocated, optional): receives the EFFECTIVE
    * ridge penalty applied per (cluster, slot) — the fixed per-level λ or
    * the auto mode's α·E(k,b) — recorded at the same line it is added to
    * the Gram diagonal, so the exposed surface (`HarmonyResult.lambdas`,
    * `getLambda` parity, /root/reference/src/harmony.cpp:640-669) cannot
    * drift from what the solver used. Intercept slot 0 stays 0
    * (unpenalized); pruned levels stay 0 (absent from their solve).
    */
  def solveW(
      gram: Array[Double],
      mom: Array[Double],
      keeps: Array[Array[Boolean]],
      e: Array[Double],
      yRowMajor: Array[Double],
      K: Int, B: Int, d: Int,
      lambdaPerLevel: Option[Array[Double]],
      alpha: Double,
      lambdaOut: Option[Array[Double]] = None): Array[Double] = {
    val P = B + 1
    val w = new Array[Double](K * P * d)
    var k = 0
    while (k < K) {
      val keep = (0 until B).filter(keeps(k))

      if (keep.nonEmpty) {
        val p = keep.length + 1
        val g = DenseMatrix.zeros[Double](p, p)
        val m = DenseMatrix.zeros[Double](p, d)
        g(0, 0) = gram(k * P * P)
        var jj = 0
        while (jj < d) { m(0, jj) = mom(k * P * d + jj); jj += 1 }
        for ((bi, i) <- keep.zipWithIndex) {
          val gi = 1 + i
          g(0, gi) = gram(k * P * P + (1 + bi)); g(gi, 0) = g(0, gi)
          g(gi, gi) = gram(k * P * P + (1 + bi) * P + (1 + bi))
          for ((bj, j) <- keep.zipWithIndex if bj != bi)
            g(gi, 1 + j) = gram(k * P * P + (1 + bi) * P + (1 + bj))
          jj = 0
          while (jj < d) { m(gi, jj) = mom(k * P * d + (1 + bi) * d + jj); jj += 1 }
        }

        // lambda: fixed per level, or auto alpha*E(k,b) (utils.cpp:159-163);
        // intercept unpenalized
        for ((bi, i) <- keep.zipWithIndex) {
          val lam = lambdaPerLevel.map(_(bi)).getOrElse(alpha * e(k * B + bi))
          g(1 + i, 1 + i) += lam
          lambdaOut.foreach(_(k * P + 1 + bi) = lam)
        }

        // Arrowhead fast path (op 49, harmony.cpp:572-586): with a single
        // covariate the penalized Gram is an arrowhead matrix — levels are
        // mutually exclusive, so level×level cross terms are EXACTLY zero
        // (never accumulated). Detected structurally, which auto-enables
        // the reference's closed-form inverse: inv = (1/u)·acb·acbᵀ +
        // diag(b), applied directly to the moments in O(p·d) instead of
        // O(p³) + O(p²·d).
        var arrow = p > 1
        var ai = 1
        while (arrow && ai < p) {
          var aj = 1
          while (arrow && aj < p) {
            if (ai != aj && g(ai, aj) != 0.0) arrow = false
            aj += 1
          }
          ai += 1
        }
        val sol: DenseMatrix[Double] =
          if (arrow) {
            val ac = new Array[Double](p)
            val b = new Array[Double](p)
            ac(0) = 1.0
            var i = 1
            while (i < p) { ac(i) = -g(0, i); b(i) = 1.0 / g(i, i); i += 1 }
            var u = g(0, 0)
            i = 1
            while (i < p) { u -= ac(i) * ac(i) * b(i); i += 1 }
            val acb = new Array[Double](p)
            acb(0) = 1.0
            i = 1
            while (i < p) { acb(i) = ac(i) * b(i); i += 1 }
            val out = DenseMatrix.zeros[Double](p, d)
            var jj = 0
            while (jj < d) {
              var t = 0.0
              i = 0
              while (i < p) { t += acb(i) * m(i, jj); i += 1 }
              t /= u
              i = 0
              while (i < p) { out(i, jj) = acb(i) * t + b(i) * m(i, jj); i += 1 }
              jj += 1
            }
            out
          } else inv(g) * m
        // centroid refresh from intercept betas (harmony.cpp:610-611)
        jj = 0
        while (jj < d) { yRowMajor(k * d + jj) = sol(0, jj); jj += 1 }
        for ((bi, i) <- keep.zipWithIndex) {
          jj = 0
          while (jj < d) { w(k * P * d + (1 + bi) * d + jj) = sol(1 + i, jj); jj += 1 }
        }
      }
      k += 1
    }
    normalizeY(yRowMajor, K, d)
    w
  }

  /** Re-L2-normalize centroid rows (harmony.cpp:633). */
  def normalizeY(y: Array[Double], K: Int, d: Int): Unit = {
    var k = 0
    while (k < K) {
      var ss = 0.0
      var j = 0
      while (j < d) { val v = y(k * d + j); ss += v * v; j += 1 }
      val n = math.sqrt(ss)
      if (n > 0) { j = 0; while (j < d) { y(k * d + j) /= n; j += 1 } }
      k += 1
    }
  }

  /** Penalized soft-assignment update for one cell (harmony.cpp:307-313):
    * softmax over -dist/sigma, then the diversity penalty
    * ((2E+1)/(O+E+1))^theta summed over the cell's covariate levels, then
    * re-normalization. `dist` is the precomputed cosine-distance row so
    * callers can reuse it for the objective's Σ r·dist term. */
  def penalizedR(
      dist: Array[Double],
      batch: Array[Int],
      sigma: Array[Double],
      theta: Array[Double],
      e: Array[Double],
      o: Array[Double],
      K: Int,
      B: Int): Array[Float] = {
    val r = new Array[Double](K)
    var sum = 0.0
    var k = 0
    while (k < K) { r(k) = math.exp(-dist(k) / sigma(k)); sum += r(k); k += 1 }
    // first L1 normalization (harmony.cpp:310)
    k = 0
    while (k < K) { r(k) /= sum; k += 1 }
    // diversity penalty then re-normalize (harmony.cpp:311). A NEGATIVE
    // batch index is serveModel's unseen-level sentinel (serveUnseen =
    // interceptOnly): an unseen covariate has no (E, O, theta) entry so
    // it contributes no penalty, and a cell whose every covariate is
    // unseen keeps the plain softmax (pen = 1). The fit path never emits
    // negative indices, so this branch is dead there.
    sum = 0.0
    var anySeen = false
    var ci0 = 0
    while (ci0 < batch.length) { if (batch(ci0) >= 0) anySeen = true; ci0 += 1 }
    k = 0
    while (k < K) {
      var pen = 0.0
      var ci = 0
      while (ci < batch.length) {
        if (batch(ci) >= 0) {
          val idx = k * B + batch(ci)
          pen += math.pow((2.0 * e(idx) + 1.0) / (o(idx) + e(idx) + 1.0), theta(batch(ci)))
        }
        ci += 1
      }
      r(k) *= (if (anySeen) pen else 1.0)
      sum += r(k)
      k += 1
    }
    val rf = new Array[Float](K)
    k = 0
    while (k < K) { rf(k) = (r(k) / sum).toFloat; k += 1 }
    rf
  }
}
