package graft.tools

import org.apache.spark.sql.functions._

/** Dev harness for d31's 100 TB posture: takedown repair over a dup-cluster
  * graph must cost O(touched clusters), not O(corpus). Synthesizes N
  * million docs as 4-node chain clusters (the shallow re-post shape d09's
  * CC doc describes), dooms every Kth doc (hitting canonicals AND chain
  * bridges), and times the INCREMENTAL repair (relabel only clusters
  * containing a doomed member — one CC pass over their surviving edges)
  * against the from-scratch recompute (CC over ALL surviving edges), then
  * pins both equal with anti-joins.
  *
  * `runMain graft.tools.TakedownRehearsal <nM docs> <doomEvery>`
  */
object TakedownRehearsal {
  def main(args: Array[String]): Unit = {
    val nM = if (args.nonEmpty) args(0).toDouble else 1.0
    val doomEvery = if (args.length > 1) args(1).toLong else 100L
    val spark = graft.GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup.connectedComponents
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[takedown-scale] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val n = (nM * 1e6).toLong
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // 4-node chains: cluster c = docs {4c, 4c+1, 4c+2, 4c+3}
    val edges = spark.range(0, n / 4, 1, 32)
      .select(explode(array(
        struct((col("id") * 4).as("src"), (col("id") * 4 + 1).as("dst")),
        struct((col("id") * 4 + 1).as("src"), (col("id") * 4 + 2).as("dst")),
        struct((col("id") * 4 + 2).as("src"), (col("id") * 4 + 3).as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst")).persist(lvl)
    edges.count()
    val labels0 = timed(s"initial CC build ($n docs, ${n / 4} clusters)") {
      val l = connectedComponents(edges).persist(lvl); l.count(); l
    }
    val doomed = spark.range(0, n, 1, 32).filter(col("id") % doomEvery === 0L)
      .select(col("id").as("node")).persist(lvl)
    val nDoomed = doomed.count()
    val survEdges = edges
      .join(doomed.select(col("node").as("src")), Seq("src"), "left_anti")
      .join(doomed.select(col("node").as("dst")), Seq("dst"), "left_anti")
      .persist(lvl)
    survEdges.count()
    val incremental = timed(s"INCREMENTAL repair ($nDoomed doomed)") {
      val touched = labels0.join(doomed, Seq("node"))
        .select(col("label")).distinct().localCheckpoint(true)
      val touchedSurvEdges = survEdges
        .join(labels0.select(col("node").as("src"), col("label")), Seq("src"))
        .join(touched, Seq("label")).select(col("src"), col("dst"))
      val relabeled = connectedComponents(touchedSurvEdges)
      val untouched = labels0.join(touched, Seq("label"), "left_anti")
        .select(col("node"), col("label"))
      val touchedSurvivors = labels0.join(touched, Seq("label"))
        .join(doomed, Seq("node"), "left_anti").select(col("node"))
      val isolated = touchedSurvivors
        .join(relabeled.select(col("node")), Seq("node"), "left_anti")
        .select(col("node"), col("node").as("label"))
      val out = untouched.unionByName(relabeled).unionByName(isolated)
        .localCheckpoint(true)
      out.count(); out
    }
    val recompute = timed("FULL recompute (CC over all surviving edges)") {
      val re = connectedComponents(survEdges)
      val survivors = spark.range(0, n, 1, 32)
        .filter(col("id") % doomEvery =!= 0L).select(col("id").as("node"))
      val out = re.unionByName(
        survivors.join(re.select(col("node")), Seq("node"), "left_anti")
          .select(col("node"), col("node").as("label")))
        .localCheckpoint(true)
      out.count(); out
    }
    val eq = timed("incremental == recompute (anti-joins both ways)") {
      val k = Seq("node", "label")
      incremental.join(recompute, k, "left_anti").isEmpty &&
        recompute.join(incremental, k, "left_anti").isEmpty
    }
    println(s"[takedown-scale] n=$n doomed=$nDoomed equal=$eq")
    require(eq, "incremental takedown repair drifted from recompute")
    spark.stop()
  }
}
