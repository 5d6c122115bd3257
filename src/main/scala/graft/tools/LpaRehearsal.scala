package graft.tools

import org.apache.spark.sql.functions._

/** Scale rehearsal for the q70 label-propagation stage: the same planted
  * 8-clique-plus-bridges structure as the gate, synthesized to millions of
  * nodes, to measure per-round cost of the node-keyed join + grouped count
  * + bounded-heap top-1 — and to verify that planted recovery (every node
  * labeled with its clique's min id, bridges outvoted) still holds exactly
  * at scale. Per round the shuffle carries (node, label) counted pairs and
  * single-pair heap buffers — nothing scales with degree beyond the edge
  * list itself, so wall should be linear in |E| and per-round.
  *
  * Usage: runMain graft.tools.LpaRehearsal [nMillionNodes] [rounds]
  */
object LpaRehearsal {
  def main(args: Array[String]): Unit = {
    val nM = if (args.nonEmpty) args(0).toDouble else 5.0
    val rounds = if (args.length > 1) args(1).toInt else 4
    val n = (nM * 1e6).toLong
    val spark = graft.GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[lpa-scale] $label%-38s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val ids = spark.range(0, n, 1, 64).select(col("id").as("i"))
    val und = timed(s"synthesize ${nM}M nodes, 8-cliques + bridges") {
      // intra-clique pairs via offset generation (no self-join at synth
      // scale): for each node, edges to the HIGHER clique-mates
      val cliquePairs = ids.select(col("i").as("a"), explode(expr(
          "filter(transform(sequence(1, 7), k -> i + k), " +
            "j -> j div 8 = i div 8 AND j < " + n + ")")).as("b"))
      val bridges = ids.filter(col("i") % 8 === 7 && col("i") + 1 < n)
        .select(col("i").as("a"), (col("i") + 1).as("b"))
      val edges = cliquePairs.unionByName(bridges)
      val out = edges.select(col("a").as("u"), col("b").as("v"))
        .unionByName(edges.select(col("b").as("u"), col("a").as("v")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[lpa-scale]   undirected edge rows = ${out.count()}")
      out
    }
    val labels = timed(s"$rounds LPA rounds") {
      val out = graft.operators.Relational.labelPropagation(und, ids, rounds)
      out.count()
      out
    }
    val bad = timed("verify planted recovery") {
      labels.filter(col("label") =!= (col("node") - pmod(col("node"), lit(8L)))).count()
    }
    val nComm = labels.select(col("label")).distinct().count()
    println(s"[lpa-scale] nodes=$n communities=$nComm mislabeled=$bad " +
      s"(must be 0; communities must be ceil(n/8) = ${(n + 7) / 8})")
    spark.stop()
  }
}
