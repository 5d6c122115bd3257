package graft.tools

import org.apache.spark.sql.functions._

/** Dev harness for the s29 NN-DESCENT kNN-graph build at scale: synthesize
  * an N-vector Gaussian-mixture corpus (distributed; nothing N-sized on the
  * driver), run the full per-round descent, and report per round:
  *   - wall-clock (the Σdeg² candidate-volume bound in practice),
  *   - candidate count (growth/shrink as the graph converges),
  *   - recall on a 200-probe exact-ground-truth panel (the honest quality
  *     number — full-corpus truth is quadratic, the panel is not),
  *   - max reverse-degree (the paper's known skew hazard: hub vectors
  *     collect reverse edges; production caps reverse lists — this
  *     measures how much organic skew the cap would be absorbing).
  *
  * Usage: runMain graft.tools.NndRehearsal [nThousands] [k] [rounds]
  */
object NndRehearsal {
  def main(args: Array[String]): Unit = {
    val nK = if (args.nonEmpty) args(0).toDouble else 250.0
    val k = if (args.length > 1) args(1).toInt else 10
    val rounds = if (args.length > 2) args(2).toInt else 4
    val n = (nK * 1e3).toLong

    val spark = graft.GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")
    // the per-round vector-fetch joins hit a 64-float-array side of ~26 MB
    // per 100k vectors — beyond the 10 MB default broadcast threshold but
    // trivially broadcastable (or co-partitioned) on a real cluster; raise
    // it so the rehearsal measures the descent, not a synthetic shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (512L << 20).toString)
    import graft.functions.VectorExpressions.l2DistSq
    import graft.operators.Similarity

    def timed[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[nnd-scale] $label%-34s $s%8.2f s")
      (r, s)
    }

    val d = 64
    val (vecs, _) = timed(f"synthesize ${nK}%.0fk x $d (64 clusters)") {
      val base = spark.range(0, n, 1, 32)
        .withColumn("cl", pmod(xxhash64(col("id")), lit(64)))
      val feats = (0 until d).map(j =>
        (randn(seed = 700 + j) * 0.25
          + col("cl") * lit(math.cos(j * 1.7))).cast("float"))
      val out = base.select(col("id").as("vec_id"), array(feats: _*).as("embedding"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out.count(); out
    }

    // exact truth for a 200-probe panel only (corpus-size-linear, not N^2)
    val probes = vecs.filter(col("vec_id") % (n / 200) === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val (truth, _) = timed("exact panel ground truth (200 probes)") {
      Similarity.knnJoin(vecs, probes,
          l2DistSq(col("embedding"), col("q_emb")), k,
          probeIdCol = "q_id", idCol = "vec_id", ascending = true)
        .select(col("q_id"), col("vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }

    // cumulative timing: round r's marginal wall = wall(r) - wall(r-1) minus
    // the (small) re-derivation of earlier rounds; good enough to show the
    // incremental path's per-round work SHRINKING as the graph converges,
    // where the full re-scoring form grows superlinearly (measured at 100k:
    // 12.6 -> 30.6 -> 87.5 s/round, max reverse degree 29 -> 112 -> 443).
    val init = Similarity.nndHashInit(vecs, k, n).localCheckpoint(true)
    var prevWall = 0.0
    for (r <- 1 to rounds) {
      val (edges, wall) = timed(s"incremental descent, rounds=$r") {
        Similarity.nnDescentIncremental(vecs, k, rounds = r,
            init = init, revCap = k)
          .filter(col("u") % (n / 200) === 0)
          .select(col("u"), col("v"))
          .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      }
      val rec = (edges & truth).size.toDouble / truth.size
      println(f"[nnd-scale]   marginal_wall=${wall - prevWall}%.1f s panel_recall=$rec%.4f")
      prevWall = wall
    }
    spark.stop()
  }
}
