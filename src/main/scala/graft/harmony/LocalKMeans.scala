package graft.harmony

/** Driver-local seeded k-means++ + Lloyd refinement for small N — the
  * reference's init (k-means++ seeding then bounded Lloyd iterations,
  * /root/reference/src/utils.cpp:10-64) without MLlib's distributed-pass
  * overhead. Selected for both execution paths whenever N is driver-sized;
  * MLlib k-means|| remains the large-N init.
  */
private[graft] object LocalKMeans {

  def fit(points: Array[Array[Double]], k: Int, maxIter: Int, seed: Long): Array[Array[Double]] = {
    val n = points.length
    val d = points(0).length
    val rng = new java.util.Random(seed)
    val centers = new Array[Array[Double]](k)

    def sqDist(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0
      var j = 0
      while (j < d) { val diff = a(j) - b(j); s += diff * diff; j += 1 }
      s
    }

    // ---- k-means++ seeding -------------------------------------------
    centers(0) = points(rng.nextInt(n)).clone()
    val d2 = Array.fill(n)(Double.MaxValue)
    var c = 1
    while (c < k) {
      var i = 0
      var total = 0.0
      while (i < n) {
        val dd = sqDist(points(i), centers(c - 1))
        if (dd < d2(i)) d2(i) = dd
        total += d2(i)
        i += 1
      }
      // weighted draw proportional to d2 (duplicate-point guard: fall back
      // to uniform when all remaining distances are ~0)
      var pick = 0
      if (total > 1e-300) {
        var u = rng.nextDouble() * total
        i = 0
        var acc = 0.0
        pick = n - 1
        var done = false
        while (i < n && !done) {
          acc += d2(i)
          if (acc >= u) { pick = i; done = true }
          i += 1
        }
      } else pick = rng.nextInt(n)
      centers(c) = points(pick).clone()
      c += 1
    }

    // ---- Lloyd refinement --------------------------------------------
    val assign = new Array[Int](n)
    var iter = 0
    while (iter < maxIter) {
      var i = 0
      while (i < n) {
        var best = 0
        var bestD = Double.MaxValue
        var kk = 0
        while (kk < k) {
          val dd = sqDist(points(i), centers(kk))
          if (dd < bestD) { bestD = dd; best = kk }
          kk += 1
        }
        assign(i) = best
        i += 1
      }
      val sums = Array.fill(k)(new Array[Double](d))
      val counts = new Array[Int](k)
      i = 0
      while (i < n) {
        val a = assign(i)
        counts(a) += 1
        var j = 0
        while (j < d) { sums(a)(j) += points(i)(j); j += 1 }
        i += 1
      }
      var kk = 0
      while (kk < k) {
        if (counts(kk) > 0) {
          var j = 0
          while (j < d) { centers(kk)(j) = sums(kk)(j) / counts(kk); j += 1 }
        } // empty cluster keeps its previous center (arma::kmeans keep_existing)
        kk += 1
      }
      iter += 1
    }
    centers
  }
}
