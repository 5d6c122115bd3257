package graft.tools

import org.apache.spark.sql.functions._

/** Dev harness for the q81/st43 HyperLogLog lane's 100 TB posture: the
  * gate proves register-level cross-engine exactness on gate-sized
  * corpora; this measures the ESTIMATOR at volume — one fixed 2^p-long
  * buffer per group regardless of row count, relative error tracking the
  * 1.04/sqrt(m) theory line, and the wall staying one-scan-shaped as N
  * grows 100x.
  *
  * Keys are md5-distinct by construction (`id` cast to string), so the
  * true NDV is exactly N and the measured relative error is the
  * estimator's own, not fixture noise. A duplicated-key variant (id % d)
  * pins that duplicates cost nothing (same registers as the distinct
  * set — idempotent max).
  *
  * Usage: runMain graft.tools.HllRehearsal [nMillions] [p]
  */
object HllRehearsal {
  def main(args: Array[String]): Unit = {
    val nM = if (args.nonEmpty) args(0).toDouble else 10.0
    val p = if (args.length > 1) args(1).toInt else 12
    val n = (nM * 1e6).toLong
    val m = 1 << p

    val spark = graft.GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[hll] $label%-52s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    import graft.functions.Hll.hllSketch
    def estimate(regs: Seq[Long]): Double = {
      val zInt = regs.map(r => 1L << (49 - r).toInt).sum
      val z = zInt.toDouble / math.pow(2.0, 49)
      val alpha = 0.7213 / (1.0 + 1.079 / m)
      val raw = alpha * m * m / z
      val zero = regs.count(_ == 0L)
      if (raw <= 2.5 * m && zero > 0) m * math.log(m.toDouble / zero) else raw
    }

    // distinct keys: true NDV = n exactly
    val regsDistinct = timed(s"sketch ${nM}M distinct keys (p=$p, one scan)") {
      spark.range(0, n, 1, 64)
        .select(col("id").cast("string").as("k"))
        .agg(hllSketch(col("k"), p)).head().getSeq[Long](0)
    }
    val est = estimate(regsDistinct)
    val relErr = math.abs(est - n) / n
    println(f"[hll] estimate ${est}%.1f vs true $n (rel err ${relErr * 100}%.3f%%; " +
      f"theory 1.04/sqrt($m) = ${104.0 / math.sqrt(m)}%.3f%%)")

    // 10x duplicated keys: same registers, same estimate (idempotent max)
    val dup = (n / 10).max(1L)
    val regsDup = timed(f"sketch ${nM}M rows with ${dup / 1e6}%.1fM distinct (10x dups)") {
      spark.range(0, n, 1, 64)
        .select((col("id") % dup).cast("string").as("k"))
        .agg(hllSketch(col("k"), p)).head().getSeq[Long](0)
    }
    val regsDupRef = timed(f"sketch the ${dup / 1e6}%.1fM distinct keys alone") {
      spark.range(0, dup, 1, 64)
        .select(col("id").cast("string").as("k"))
        .agg(hllSketch(col("k"), p)).head().getSeq[Long](0)
    }
    println(s"[hll] duplicated-run registers == distinct-run registers: " +
      s"${regsDup == regsDupRef}")

    // grouped form: 16 groups, one 2^p buffer each through the shuffle
    timed("grouped sketch (16 groups, one buffer per group)") {
      spark.range(0, n, 1, 64)
        .select((col("id") % 16).as("g"), col("id").cast("string").as("k"))
        .groupBy(col("g")).agg(hllSketch(col("k"), p).as("regs"))
        .count()
    }
    spark.stop()
  }
}
