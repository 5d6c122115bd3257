package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale rehearsal for the d09 connected-components stage: a synthetic
  * dup-cluster topology (many chains — the shape near-dup graphs take) at
  * ~1M nodes, to measure per-round cost and convergence behavior of
  * hash-to-min label propagation well beyond the gate corpus.
  *
  * Usage: runMain graft.tools.CCRehearsal [nChains] [chainLen] [algo] [topo]
  * where algo is `minprop` (hash-to-min, default) or `star`
  * (large-star/small-star), and topo is `chains` (default) or `hub` —
  * hub ignores chainLen and builds ONE star of nChains leaves around node
  * 0: every edge shares the same dst key, the worst-case skew for the
  * per-round label join (on a cluster AQE's skew-join splitting applies;
  * locally it measures the single-hot-key ceiling).
  */
object CCRehearsal {
  def main(args: Array[String]): Unit = {
    val nChains = if (args.length > 0) args(0).toLong else 100000L
    val chainLen = if (args.length > 1) args(1).toInt else 10
    val algo = if (args.length > 2) args(2) else "minprop"
    require(algo == "minprop" || algo == "star",
      s"unknown algo '$algo' (use minprop or star)")
    val topo = if (args.length > 3) args(3) else "chains"
    require(topo == "chains" || topo == "hub",
      s"unknown topo '$topo' (use chains or hub)")
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")

    // chains: node ids c*chainLen + i, edges (v, v+1) within each chain —
    // diameter = chainLen-1, the worst case for min-propagation depth.
    // hub: all edges (leaf, 0) — the worst case for join-key skew.
    val edges =
      if (topo == "hub")
        spark.range(1, nChains + 1)
          .select(col("id").as("src"), lit(0L).as("dst"))
      else
        spark.range(nChains * (chainLen - 1))
          .select(
            ((col("id") / (chainLen - 1)).cast("long") * chainLen +
              col("id") % (chainLen - 1)).as("src"))
          .withColumn("dst", col("src") + 1)

    val t0 = System.nanoTime()
    val labels =
      if (algo == "star") graft.operators.Dedup.connectedComponentsStar(edges)
      else graft.operators.Dedup.connectedComponents(edges, maxIters = 40)
    if (algo == "star" && (topo == "hub" || chainLen <= 40)) {
      // label-level cross-check against hash-to-min (not just component
      // counts): zero disagreeing rows proves both algorithms assign the
      // identical component-min label to every node. Skipped for chains
      // deeper than hash-to-min's 40-round budget (it would throw — that
      // depth is exactly why the star variant exists).
      val other = graft.operators.Dedup.connectedComponents(edges, maxIters = 40)
      val disagree = labels.alias("a")
        .join(other.alias("b"), col("a.node") === col("b.node"))
        .filter(col("a.label") =!= col("b.label")).count()
      assert(disagree == 0L, s"$disagree nodes labeled differently across algorithms")
    }
    val nComponents = labels.select(col("label")).distinct().count()
    val secs = (System.nanoTime() - t0) / 1e9
    val nNodes = labels.count()
    val expected = if (topo == "hub") 1L else nChains
    println(f"algo=$algo topo=$topo nodes=$nNodes components=$nComponents " +
      f"expected=$expected secs=$secs%.1f")
    assert(nComponents == expected, s"expected $expected components")
    spark.stop()
  }
}
