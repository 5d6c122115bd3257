package graft.tools

import org.apache.spark.sql.functions._

/** Scale rehearsal for the mergeable quantile sketch (q53): histogram
  * aggregation over 100M generated rows with an ANALYTICALLY known
  * distribution, well beyond the gate corpus — measures the
  * TypedImperativeAggregate plan where the data is cluster-sized but the
  * shuffled state stays one nBuckets×8-byte buffer per partition.
  *
  * Distribution: v = id % P over range(N) — each value v < N%P appears
  * ceil(N/P) times, the rest floor(N/P), so the exact phi-quantile has a
  * closed form and the bucket-upper-edge estimate can be checked against
  * the structural error contract (0 < est − exact ≤ bucket width) at a
  * scale where an exact sort would be the expensive path.
  *
  * Usage: runMain graft.tools.HistogramRehearsal [nRows] [p] [nBuckets]
  */
object HistogramRehearsal {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 100000000L
    val p = if (args.length > 1) args(1).toLong else 1000003L
    val nBuckets = if (args.length > 2) args(2).toInt else 4096
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")

    val lo = 0.0
    val width = p.toDouble / nBuckets
    val t0 = System.nanoTime()
    val hist = spark.range(n)
      .select((col("id") % p).cast("double").as("v"))
      .agg(graft.functions.Histogram.histogramSketch(col("v"), lo, width, nBuckets))
      .head().getSeq[Long](0).toArray
    val secs = (System.nanoTime() - t0) / 1e9

    assert(hist.sum == n, s"histogram mass ${hist.sum} != $n")
    // exact phi-quantile of (id % p): values < n%p appear ceil(n/p) times,
    // the rest floor(n/p); cum(x) = count of values <= x is piecewise linear
    val (cFloor, rem) = (n / p, n % p)
    def exactQuantile(q: Double): Double = {
      val rank = math.ceil(q * n).toLong
      def cum(x: Long): Long =
        if (x < rem) (x + 1) * (cFloor + 1)
        else rem * (cFloor + 1) + (math.min(x, p - 1) - rem + 1) * cFloor
      // smallest x with cum(x) >= rank (closed-form inverse of the two arms)
      val xa = rank / (cFloor + 1) + (if (rank % (cFloor + 1) == 0) -1 else 0)
      val x =
        if (xa < rem) xa
        else {
          val r2 = rank - rem * (cFloor + 1)
          rem + r2 / cFloor + (if (r2 % cFloor == 0) -1 else 0)
        }
      assert(cum(x) >= rank && (x == 0 || cum(x - 1) < rank))
      x.toDouble
    }
    var worst = 0.0
    for (q <- Seq(0.5, 0.9, 0.99)) {
      val rank = math.ceil(q * n).toLong
      var (b, cum) = (0, 0L)
      while (cum + hist(b) < rank) { cum += hist(b); b += 1 }
      val est = lo + (b + 1) * width
      val exact = exactQuantile(q)
      val err = est - exact
      worst = math.max(worst, err)
      println(f"q=$q est=$est%.1f exact=$exact%.1f err=$err%.2f (width=$width%.2f)")
      assert(err > 0 && err <= width + 1e-9,
        f"q=$q err $err%.3f outside (0, width=$width%.3f]")
    }
    println(f"rows=$n p=$p buckets=$nBuckets secs=$secs%.1f worst_err=$worst%.2f")
    spark.stop()
  }
}
