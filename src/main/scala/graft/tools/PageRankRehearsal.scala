package graft.tools

import org.apache.spark.sql.functions._

/** Scale rehearsal for the q63 PageRank stage: a synthetic skewed bipartite
  * purchase graph well beyond the gate corpus, to measure per-iteration
  * cost of the iterated node-keyed join + grouped sum, and the hot-node
  * ceiling (a few suppliers absorb most edges — the exact skew a real
  * purchase/link graph has; map-side partial aggregation must absorb it).
  *
  * Usage: runMain graft.tools.PageRankRehearsal [nEdges] [nCust] [nSupp] [iters] [topo]
  * where topo is `zipfish` (default: supplier popularity ~ u², a 1/sqrt(p)
  * tail) or `hub` (EVERY edge lands on supplier 0 — the single-hot-key
  * ceiling for the contribution aggregation).
  */
object PageRankRehearsal {
  def main(args: Array[String]): Unit = {
    val nEdges = if (args.length > 0) args(0).toLong else 1000000L
    val nCust = if (args.length > 1) args(1).toLong else 100000L
    val nSupp = if (args.length > 2) args(2).toLong else 10000L
    val iters = if (args.length > 3) args(3).toInt else 5
    val topo = if (args.length > 4) args(4) else "zipfish"
    require(topo == "zipfish" || topo == "hub", s"unknown topo '$topo'")
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic skewed edges: cust uniform, supplier popularity
    // quadratic in a uniform hash (low ids drain most edges)
    val quadDiv = (1L << 40) / nSupp // (2^20)^2 / nSupp, precomputed in long
    // least() clamp: quadDiv floors, so hash 1048575 alone would map to
    // supplier nSupp — one past the declared [0, nSupp) universe
    val supp =
      if (topo == "hub") lit(0L)
      else expr(s"least(cast((xxhash64(id) & 1048575) * (xxhash64(id) & 1048575) " +
        s"div $quadDiv as bigint), ${nSupp - 1})")
    val e0 = spark.range(nEdges)
      .select((pmod(xxhash64(col("id"), lit(7)), lit(nCust)) * 2).as("u"),
        (supp * 2 + 1).as("v"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nE = e0.count()
    println(s"[pagerank-rehearsal] distinct edges: $nE (topo=$topo)")

    val t0 = System.nanoTime()
    val ranks = graft.operators.Relational.pageRank(e0, iters)
    val top = ranks.orderBy(col("rank").desc, col("node")).limit(10).collect()
    val totalS = (System.nanoTime() - t0) / 1e9
    val nNodes = ranks.count()
    println(f"[pagerank-rehearsal] $iters iterations over $nE%d edges / " +
      f"$nNodes%d nodes: $totalS%.1f s total (${totalS / iters}%.2f s/iter)")
    top.foreach(r => println(s"  top node=${r.getAs[Long]("node")} rank=${r.getAs[Long]("rank")}"))
    // sanity: every rank carries the teleport floor; top nodes are
    // suppliers (odd) in both topologies
    assert(top.forall(_.getAs[Long]("rank") >= 150000L))
    if (topo == "hub")
      assert(top.head.getAs[Long]("node") == 1L, "the hub must rank first")
    else
      assert(top.forall(_.getAs[Long]("node") % 2 == 1), "top-10 must be suppliers")
    e0.unpersist(false)
    spark.stop()
  }
}
