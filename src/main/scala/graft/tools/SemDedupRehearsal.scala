package graft.tools

import org.apache.spark.sql.functions._

/** Scale rehearsal for d25's SemDeDup stage: 1M synthetic 64-dim vectors,
  * planted exact twins on every 1000th id, a 4096-centroid panel drawn by
  * the same hash-bottom-k rule as the gate, assignment through the
  * codegen'd NearestCentroid expression (one fused scan — the panel rides
  * the generated code as a constant), and the within-cluster exact-cosine
  * pair pass. Measures each stage's wall, the cluster-size distribution
  * (mean/max — the imbalance factor that bounds the within-cluster
  * quadratic), and planted recall, which must be exact: an identical copy
  * assigns to the same centroid structurally and pairs at cosine 1.
  *
  * The SemDeDup scaling law this rehearses: k grows with N (k ~ N/250
  * here), so per-cluster population stays ~constant and the pair pass is
  * corpus-LINEAR at fixed cluster width; assignment is the one N x k
  * scan, fused into a single codegen'd argmin per row.
  *
  * Usage: runMain graft.tools.SemDedupRehearsal [nThousandVecs] [nClusters]
  */
object SemDedupRehearsal {
  def main(args: Array[String]): Unit = {
    val nK = if (args.nonEmpty) args(0).toInt else 1000
    val kC = if (args.length > 1) args(1).toInt else 4096
    val n = nK * 1000L
    val spark = graft.GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[semdedup-scale] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val vecExpr = expr(
      """transform(sequence(0, 63), j -> CAST(
        pmod(xxhash64(concat(CAST(id AS STRING), '#', CAST(j AS STRING))), 1000000)
          / 1000000.0 - 0.5 AS FLOAT))""")
    val base = spark.range(0, n, 1, 64)
      .select(col("id").as("vec_id"), vecExpr.as("embedding"))
    val twins = base.filter(col("vec_id") % 1000 === 0)
      .select((col("vec_id") + 100000000L).as("vec_id"), col("embedding"))
    val all0 = base.unionByName(twins)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[semdedup-scale] corpus = ${all0.count()} vectors, k = $kC")

    val centers: Array[Array[Double]] = timed(s"draw $kC hash-bottom centroids") {
      base.withColumn("h", graft.functions.CrossEngine.md5Hash60(col("vec_id")))
        .orderBy(col("h"), col("vec_id")).limit(kC)
        .select(col("embedding")).collect()
        .map(_.getAs[scala.collection.Seq[Float]](0).map(_.toDouble).toArray)
    }
    val assigned = timed("assign: one fused argmin scan (N x k x d)") {
      val out = all0.withColumn("cluster",
          graft.functions.VectorExpressions.nearestCentroid(col("embedding"), centers))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out.count()
      out
    }
    timed("cluster-size distribution") {
      val sizes = assigned.groupBy(col("cluster")).agg(count(lit(1)).as("m"))
        .agg(count(lit(1)), avg(col("m")), max(col("m"))).head()
      println(s"[semdedup-scale]   clusters used=${sizes.getLong(0)} " +
        f"mean=${sizes.getDouble(1)}%.1f max=${sizes.getLong(2)}")
    }
    val pairs = timed("within-cluster exact-cosine pair pass") {
      import graft.functions.VectorExpressions.cosineF
      val v = assigned.select(col("cluster"), col("vec_id"), col("embedding"))
      val p = v.alias("a").join(v.alias("b"),
          col("a.cluster") === col("b.cluster") &&
            col("a.vec_id") < col("b.vec_id"))
        .filter(cosineF(col("a.embedding"), col("b.embedding")) >= 0.99)
        .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[semdedup-scale]   pairs >= 0.99 = ${p.count()}")
      p
    }
    timed("planted recall") {
      val found = pairs.filter(col("vb") >= 100000000L &&
        col("va") === col("vb") - 100000000L).count()
      val expected = n / 1000
      println(s"[semdedup-scale]   twins found = $found / $expected (must be exact)")
      require(found == expected, s"missed ${expected - found} planted twins")
    }
    spark.stop()
  }
}
