package graft.tools

import org.apache.spark.sql.functions._

/** Dev harness for the GRAPH-INDEX MAINTENANCE lane's 100 TB posture
  * (s38 delete + repair-rewrite, s41 compaction): the gate proves
  * correctness on gate-sized corpora; this measures the FILE-MAINTENANCE
  * claim at 1M+ nodes — a takedown batch must cost O(touched buckets),
  * never O(index).
  *
  * The adjacency is synthesized directly (6 hash-drawn out-neighbors per
  * node — the maintenance pass never looks at vectors, so the descent
  * build is irrelevant to what this measures) and written with the SAME
  * bucketed writer the s38/s41 entries use, scaled to 4096 buckets at
  * 1M nodes. Measured per phase: initial bucketed write, DELETE of a
  * 100-node batch (pushed-filter scan + staged rewrite of only the
  * touched buckets), a FULL-REWRITE baseline for contrast, fragmentation
  * via an append slice, and COMPACTION of only the fragmented buckets.
  *
  * Usage: runMain graft.tools.GraphLifecycleRehearsal [nMillions] [buckets]
  */
object GraphLifecycleRehearsal {
  def main(args: Array[String]): Unit = {
    val nM = if (args.nonEmpty) args(0).toDouble else 1.0
    val nBuckets = if (args.length > 1) args(1).toInt else 4096
    val n = (nM * 1e6).toLong
    val k = 6

    val spark = graft.GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions",
      math.max(64, math.round(nM * 64).toInt).toString)

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[graph-maint] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def dirFiles(p: String): Long = {
      def rec(f: java.io.File): Long =
        if (f.isFile) 1L
        else Option(f.listFiles()).map(_.map(rec).sum).getOrElse(0L)
      rec(new java.io.File(p))
    }

    val edges = timed(s"synthesize ${nM}M-node adjacency (k=$k)") {
      val e = spark.range(0, n, 1, 32).select(col("id").as("u"),
          expr(s"""explode(transform(sequence(1, $k), j ->
            abs(xxhash64(id, j)) % $n))""").as("v"))
        .filter(col("u") =!= col("v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      e.count(); e
    }

    val out = java.nio.file.Files.createTempDirectory("graft_gmaint_").toString
    try {
      // the s38 writer shape at rehearsal scale: bucket = u mod nBuckets
      timed(s"initial bucketed write ($nBuckets buckets)") {
        edges.withColumn("bucket",
            pmod(col("u"), lit(nBuckets.toLong)).cast("int"))
          .repartition(col("bucket"))
          .write.mode("overwrite").partitionBy("bucket").parquet(s"$out/knn")
      }
      println(f"[graph-maint] files after initial write: ${dirFiles(s"$out/knn")}")

      // takedown batch: 100 nodes spread across buckets
      val doomed = (0L until 100L).map(_ * 9973L % n)
      // the s38 graphDeleteNodes dataflow, inlined at rehearsal scale,
      // with DISCOVERY and REWRITE timed separately: discovery is one
      // pushed-filter scan of the whole index (parallel, no shuffle —
      // the part a reverse-edge sidecar index would bound further);
      // the rewrite is O(touched buckets), the claim under test
      val t = timed("DELETE discovery (one pushed-filter scan)") {
        spark.read.parquet(s"$out/knn")
          .filter(col("u").isin(doomed: _*) || col("v").isin(doomed: _*))
          .select(col("bucket")).distinct()
          .collect().map(_.getInt(0)).toSeq.sorted
      }
      def bucketBytes(buckets: Seq[Int]): Long = buckets.map { b =>
        Option(new java.io.File(s"$out/knn/bucket=$b").listFiles())
          .getOrElse(Array.empty).filter(_.getName.endsWith(".parquet"))
          .map(_.length()).sum
      }.sum
      val touchedBytesBefore = bucketBytes(t)
      val totalBytes = bucketBytes(0 until nBuckets)

      // the s44 refinement: a v-bucketed reverse sidecar bounds DISCOVERY
      // itself — the pushed-filter scan above still reads O(index) bytes
      // per takedown batch; the sidecar reads |doomed-bucket| pruned
      // partitions (built BEFORE the rewrite so both see the same rows)
      timed("sidecar build (one extra v-bucketed write)") {
        spark.read.parquet(s"$out/knn").select(col("u"), col("v"))
          .withColumn("bucket",
            pmod(col("v"), lit(nBuckets.toLong)).cast("int"))
          .repartition(col("bucket"))
          .write.mode("overwrite").partitionBy("bucket")
          .parquet(s"$out/knn_rev")
      }
      val tSide = timed("DELETE discovery via sidecar (pruned partitions)") {
        val doomedBuckets = doomed.map(d => (d % nBuckets).toInt).distinct
        val revU = spark.read.parquet(s"$out/knn_rev")
          .filter(col("bucket").isin(doomedBuckets: _*))
          .filter(col("v").isin(doomed: _*))
          .select(col("u")).distinct()
          .collect().map(r => (r.getLong(0) % nBuckets).toInt)
        (doomedBuckets ++ revU).distinct.sorted.toSeq
      }
      println(s"[graph-maint] sidecar discovery touched set == scan's: ${tSide == t}")
      val touched = timed("DELETE staged rewrite of touched buckets") {
        if (t.nonEmpty) {
          val staging = s"$out/knn_delete_staging"
          spark.read.parquet(s"$out/knn")
            .filter(col("bucket").isin(t: _*))
            .filter(!col("u").isin(doomed: _*) && !col("v").isin(doomed: _*))
            .repartition(col("bucket"))
            .write.mode("overwrite").partitionBy("bucket").parquet(staging)
          t.foreach { b =>
            val live = java.nio.file.Paths.get(s"$out/knn/bucket=$b")
            val staged = java.nio.file.Paths.get(s"$staging/bucket=$b")
            val retired = java.nio.file.Paths.get(s"$staging/retired_bucket=$b")
            if (java.nio.file.Files.isDirectory(live))
              java.nio.file.Files.move(live, retired)
            if (java.nio.file.Files.isDirectory(staged))
              java.nio.file.Files.move(staged, live)
          }
          graft.functions.CrossEngine.deleteRecursive(
            java.nio.file.Paths.get(staging))
        }
        t
      }
      println(f"[graph-maint] touched ${touched.size} of $nBuckets buckets " +
        f"(${touched.size * 100.0 / nBuckets}%.1f%% of the index); " +
        f"rewrote ${touchedBytesBefore / 1024}%d KiB of ${totalBytes / 1024}%d KiB " +
        f"(${touchedBytesBefore * 100.0 / totalBytes}%.1f%% write amplification avoided elsewhere)")

      // contrast: what a naive full rewrite of the same table costs
      timed("FULL-REWRITE baseline (the cost O(touched) avoids)") {
        spark.read.parquet(s"$out/knn")
          .filter(!col("u").isin(doomed: _*) && !col("v").isin(doomed: _*))
          .repartition(col("bucket"))
          .write.mode("overwrite").partitionBy("bucket")
          .parquet(s"$out/knn_fullrewrite")
      }

      // fragment: a 1-in-64 node slice's rows arrive as a second write
      timed("append slice (fragments ~1/64 of buckets)") {
        edges.filter(pmod(col("u"), lit(64L)) === 0)
          .withColumn("bucket",
            pmod(col("u"), lit(nBuckets.toLong)).cast("int"))
          .repartition(col("bucket"))
          .write.mode("append").partitionBy("bucket").parquet(s"$out/knn")
      }
      val fragged = timed("COMPACT only the fragmented buckets") {
        val files = (0 until nBuckets).map { b =>
          val d = new java.io.File(s"$out/knn/bucket=$b")
          b -> (if (!d.isDirectory) 0
                else d.listFiles.count(_.getName.endsWith(".parquet")))
        }
        val fr = files.collect { case (b, c) if c > 1 => b }
        if (fr.nonEmpty) {
          val staging = s"$out/knn_compact_staging"
          spark.read.parquet(s"$out/knn")
            .filter(col("bucket").isin(fr: _*))
            .repartition(col("bucket"))
            .write.mode("overwrite").partitionBy("bucket").parquet(staging)
          fr.foreach { b =>
            val live = java.nio.file.Paths.get(s"$out/knn/bucket=$b")
            val staged = java.nio.file.Paths.get(s"$staging/bucket=$b")
            val retired = java.nio.file.Paths.get(s"$staging/retired_bucket=$b")
            java.nio.file.Files.move(live, retired)
            java.nio.file.Files.move(staged, live)
          }
          graft.functions.CrossEngine.deleteRecursive(
            java.nio.file.Paths.get(staging))
        }
        fr
      }
      println(f"[graph-maint] compacted ${fragged.size} of $nBuckets buckets; " +
        f"files now ${dirFiles(s"$out/knn")}")

      // HEALTH (the s43 stats at rehearsal scale): the observability that
      // lets a deployment SCHEDULE the ops above — degree spread, orphans,
      // reverse symmetry, entry reachability, fragmentation
      timed("HEALTH stats (s43 shape) over the maintained index") {
        val knn = spark.read.parquet(s"$out/knn").select(col("u"), col("v"))
        val deg = knn.groupBy(col("u")).agg(count(lit(1)).as("c"))
        val d = deg.agg(min(col("c")), max(col("c")), count(lit(1)),
          sum(col("c"))).head()
        val sym = knn.alias("a").join(knn.alias("b"),
            col("b.u") === col("a.v") && col("b.v") === col("a.u"))
          .count()
        var reached = spark.range(0, 1).select(lit(0L).as("node"))
          .localCheckpoint(true)
        for (_ <- 1 to 3) {
          reached = reached.unionByName(
              reached.join(knn, reached("node") === knn("u"))
                .select(col("v").as("node")))
            .distinct().localCheckpoint(true)
        }
        println(f"[graph-maint] health: degree ${d.getLong(0)}..${d.getLong(1)} " +
          f"avg ${d.getLong(3) * 1.0 / n}%.2f, orphans ${n - d.getLong(2)}, " +
          f"symmetry ${sym * 100.0 / d.getLong(3)}%.1f%%, " +
          f"reach3(entry 0) ${reached.count()}")
      }
    } finally {
      graft.functions.CrossEngine.deleteRecursive(
        java.nio.file.Paths.get(out))
    }
    spark.stop()
  }
}
