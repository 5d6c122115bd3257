package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale rehearsal for the d09 connected-components stage: a synthetic
  * dup-cluster topology (many chains — the shape near-dup graphs take) at
  * ~1M nodes, to measure per-round cost and convergence behavior of
  * hash-to-min label propagation well beyond the gate corpus.
  *
  * Usage: runMain graft.tools.CCRehearsal [nChains] [chainLen] [algo]
  * where algo is `minprop` (hash-to-min, default) or `star`
  * (large-star/small-star).
  */
object CCRehearsal {
  def main(args: Array[String]): Unit = {
    val nChains = if (args.length > 0) args(0).toLong else 100000L
    val chainLen = if (args.length > 1) args(1).toInt else 10
    val algo = if (args.length > 2) args(2) else "minprop"
    require(algo == "minprop" || algo == "star",
      s"unknown algo '$algo' (use minprop or star)")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // chains: node ids c*chainLen + i, edges (v, v+1) within each chain —
    // diameter = chainLen-1, the worst case for min-propagation depth
    val edges = spark.range(nChains * (chainLen - 1))
      .select(
        ((col("id") / (chainLen - 1)).cast("long") * chainLen +
          col("id") % (chainLen - 1)).as("src"))
      .withColumn("dst", col("src") + 1)

    val t0 = System.nanoTime()
    val labels =
      if (algo == "star") graft.operators.Dedup.connectedComponentsStar(edges)
      else graft.operators.Dedup.connectedComponents(edges, maxIters = 40)
    val nComponents = labels.select(col("label")).distinct().count()
    val secs = (System.nanoTime() - t0) / 1e9
    val nNodes = labels.count()
    println(f"algo=$algo nodes=$nNodes components=$nComponents " +
      f"expected=$nChains diameter=${chainLen - 1} secs=$secs%.1f")
    assert(nComponents == nChains, s"expected $nChains components")
    spark.stop()
  }
}
