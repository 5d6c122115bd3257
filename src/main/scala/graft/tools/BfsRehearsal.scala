package graft.tools

import org.apache.spark.sql.functions._

/** Scale rehearsal for q72's bounded-radius multi-source BFS: the same
  * chain + express-edge graph synthesized to millions of nodes, seeds at
  * every 97th node, 6 relaxation rounds. Per round the shuffle carries one
  * (node, dist) pair per REACHED node — the frontier filter keeps the join
  * input at the reached subset, so early rounds are cheap and wall grows
  * linearly with |E| and rounds.
  *
  * Verification is distributed and closed-form: for an interior node with
  * gaps (gl, gr) to its flanking seeds, the true hop distance is
  * min over both gaps of min_{a=0..7}(a + |g - 16a|) (compose +-16 express
  * hops with +-1 chain hops; overshoot-and-walk-back included), clamped to
  * -1 beyond the 6-round horizon. Interior nodes ([128, n-128]) always
  * have an in-bounds witness path, so the engine must match EXACTLY there;
  * boundary nodes are reported separately (their witness path may need
  * out-of-range nodes, so the closed form is only a lower bound).
  *
  * Usage: runMain graft.tools.BfsRehearsal [nMillionNodes ...]
  */
object BfsRehearsal {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toDouble).toSeq else Seq(5.0, 10.0)
    val spark = graft.GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[bfs-scale] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    for (nM <- sizes) {
      val n = (nM * 1e6).toLong
      println(s"[bfs-scale] ===== $nM M nodes =====")
      val ids = spark.range(0, n, 1, 64).select(col("id").as("i"))
      val und = timed("synthesize chain + express edges") {
        val chain = ids.filter(col("i") + 1 < n)
          .select(col("i").as("a"), (col("i") + 1).as("b"))
        val express = ids.filter(col("i") + 16 < n)
          .select(col("i").as("a"), (col("i") + 16).as("b"))
        val edges = chain.unionByName(express)
        val out = edges.select(col("a").as("u"), col("b").as("v"))
          .unionByName(edges.select(col("b").as("u"), col("a").as("v")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"[bfs-scale]   undirected edge rows = ${out.count()}")
        out
      }
      val dists = timed("6 BFS relaxation rounds") {
        val out = graft.operators.Relational
          .bfsHops(und, ids, col("i") % 97 === 0, rounds = 6)
          .select(col("node"), coalesce(col("dist"), lit(-1L)).as("dist"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        out.count()
        out
      }
      timed("closed-form verification (interior)") {
        val hExpr = (g: String) =>
          s"array_min(transform(sequence(0, 7), a -> a + abs($g - 16 * a)))"
        val checked = dists
          .withColumn("gl", pmod(col("node"), lit(97L)))
          .withColumn("gr",
            when((col("node") - pmod(col("node"), lit(97L))) + 97 < n,
              lit(97L) - pmod(col("node"), lit(97L))).otherwise(lit(999L)))
          .withColumn("want0",
            least(expr(hExpr("gl")), expr(hExpr("gr"))))
          .withColumn("want",
            when(col("want0") <= 6, col("want0")).otherwise(lit(-1L)))
        val interior = checked.filter(col("node") >= 128 && col("node") < n - 128)
        val bad = interior.filter(col("dist") =!= col("want")).count()
        val nInt = interior.count()
        val reached = dists.filter(col("dist") >= 0).count()
        println(s"[bfs-scale]   interior=$nInt mismatches=$bad (must be 0); " +
          s"reached=$reached of $n")
        require(bad == 0, s"BFS mismatch on $bad interior nodes")
      }
      und.unpersist(); dists.unpersist()
    }
    spark.stop()
  }
}
