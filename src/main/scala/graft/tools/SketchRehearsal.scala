package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale rehearsal for the KMV sketch family (q46–q48): NDV estimation
  * over 100M generated rows with a known true cardinality, well beyond the
  * gate corpus — measures the bottom-k plan (partial distinct →
  * TakeOrderedAndProject) where the distinct set itself is cluster-sized.
  *
  * Uses xxhash64 rather than the oracle's md5 lane: the rehearsal measures
  * the PLAN at scale; cross-engine hash identity is the gate queries' job.
  *
  * Usage: runMain graft.tools.SketchRehearsal [nRows] [ndv] [k]
  */
object SketchRehearsal {
  def main(args: Array[String]): Unit = {
    val nRows = if (args.length > 0) args(0).toLong else 100000000L
    val ndv = if (args.length > 1) args(1).toLong else 10000000L
    val k = if (args.length > 2) args(2).toInt else 1024
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")

    val t0 = System.nanoTime()
    val bottomK = spark.range(nRows)
      .select(xxhash64(col("id") % ndv).as("h"))
      .distinct()
      .orderBy(col("h"))
      .limit(k)
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    // xxhash64 is uniform over the full signed-long range: shift into
    // [0, 2^64) via the unsigned interpretation for the estimator
    val kthUnsigned = BigInt(bottomK.last.getLong(0)) - BigInt(Long.MinValue)
    // below-k the bottom set IS the full distinct set -> exact (the
    // q46-q48 gate contract)
    val est =
      if (bottomK.length < k) bottomK.length.toDouble
      else (BigDecimal(k - 1) * BigDecimal(BigInt(1) << 64) /
        BigDecimal(kthUnsigned)).toDouble
    val relErr = math.abs(est - ndv.toDouble) / ndv.toDouble
    println(f"rows=$nRows true_ndv=$ndv k=$k est=$est%.0f rel_err=$relErr%.4f secs=$secs%.1f")
    assert(relErr < 5.0 / math.sqrt(k.toDouble),
      f"KMV rel_err $relErr%.4f outside 5/sqrt(k)")
    spark.stop()
  }
}
