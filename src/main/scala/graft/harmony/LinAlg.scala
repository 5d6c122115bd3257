package graft.harmony

/** Tiny dense helpers for the per-cell hot path. Float storage (matching the
  * reference's single-precision default, `/root/reference/src/types.h:5-9`)
  * with double accumulation.
  */
object LinAlg {

  def l2Normalize(v: Array[Float]): Array[Float] = {
    var ss = 0.0
    var i = 0
    while (i < v.length) { ss += v(i).toDouble * v(i); i += 1 }
    val n = math.sqrt(ss)
    if (n == 0.0) return v.clone()
    val out = new Array[Float](v.length)
    i = 0
    while (i < v.length) { out(i) = (v(i) / n).toFloat; i += 1 }
    out
  }

  def dot(a: Array[Double], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Row-major (K x d) matrix-vector products: out_k = 2*(1 - Y_k . z). */
  def cosDistances(yRowMajor: Array[Double], k: Int, d: Int, z: Array[Float]): Array[Double] = {
    val out = new Array[Double](k)
    var kk = 0
    while (kk < k) {
      var s = 0.0
      val off = kk * d
      var j = 0
      while (j < d) { s += yRowMajor(off + j) * z(j); j += 1 }
      out(kk) = 2.0 * (1.0 - s)
      kk += 1
    }
    out
  }
}
