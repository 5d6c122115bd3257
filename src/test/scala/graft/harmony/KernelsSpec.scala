package graft.harmony

import org.scalatest.funsuite.AnyFunSuite

/** Pure-kernel pins that need `private[harmony]` access (no Spark). */
class KernelsSpec extends AnyFunSuite {

  test("penalizedR unseen sentinel: all-unseen row keeps the plain softmax") {
    val dist = Array(0.1, 0.4, 0.9)
    val sigma = Array(0.2, 0.2, 0.2)
    val theta = Array(1.5)
    val e = Array(2.0, 3.0, 4.0)
    val o = Array(1.0, 5.0, 2.0)
    // all covariates unseen -> plain softmax over -dist/sigma
    val rAll = Kernels.penalizedR(dist, Array(-1), sigma, theta, e, o, 3, 1)
    val ex = dist.map(dd => math.exp(-dd / 0.2))
    val plain = ex.map(_ / ex.sum)
    rAll.zip(plain).foreach { case (a, b) =>
      assert(math.abs(a - b.toFloat) < 1e-6f, s"$a vs $b")
    }
    // seen covariate -> the penalized form, unchanged by the sentinel path
    val rSeen = Kernels.penalizedR(dist, Array(0), sigma, theta, e, o, 3, 1)
    val pen = (0 until 3).map(k =>
      plain(k) * math.pow((2.0 * e(k) + 1.0) / (o(k) + e(k) + 1.0), theta(0)))
    val penN = pen.map(_ / pen.sum)
    rSeen.zip(penN).foreach { case (a, b) =>
      assert(math.abs(a - b.toFloat) < 1e-6f, s"$a vs $b")
    }
    // a mixed row: the unseen covariate contributes nothing, the seen one
    // penalizes exactly as if it were alone
    val rMix = Kernels.penalizedR(dist, Array(-1, 0), sigma, theta, e, o, 3, 1)
    rMix.zip(penN).foreach { case (a, b) =>
      assert(math.abs(a - b.toFloat) < 1e-6f, s"$a vs $b")
    }
  }
}
