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

      // ---- LAYERED artifact (the s47/s48/st46 contracts at rehearsal
      // scale): the four-table layout — base knn + links + routing
      // layer1 (p = 1/4 of nodes) + layer2 (1/16) — maintained as one
      // unit: delete across all four, compact all four, health per
      // table + descent reach. Maintenance stays O(touched buckets)
      // PER TABLE; the routing tables are small, so the whole layered
      // overhead rides on the base table's costs.
      val lroot = s"$out/layered"
      def writeBucketed(df: org.apache.spark.sql.DataFrame,
          table: String): Unit =
        df.withColumn("bucket",
            pmod(col("u"), lit(nBuckets.toLong)).cast("int"))
          .repartition(col("bucket"))
          .write.mode("overwrite").partitionBy("bucket")
          .parquet(s"$lroot/$table")
      def deleteFrom(table: String, dm: Seq[Long]): Seq[Int] = {
        val path = s"$lroot/$table"
        val tb = spark.read.parquet(path)
          .filter(col("u").isin(dm: _*) || col("v").isin(dm: _*))
          .select(col("bucket")).distinct()
          .collect().map(_.getInt(0)).toSeq.sorted
        if (tb.nonEmpty) {
          val staging = s"${path}_delete_staging"
          spark.read.parquet(path)
            .filter(col("bucket").isin(tb: _*))
            .filter(!col("u").isin(dm: _*) && !col("v").isin(dm: _*))
            .repartition(col("bucket"))
            .write.mode("overwrite").partitionBy("bucket").parquet(staging)
          tb.foreach { b =>
            val live = java.nio.file.Paths.get(s"$path/bucket=$b")
            val staged = java.nio.file.Paths.get(s"$staging/bucket=$b")
            val retired =
              java.nio.file.Paths.get(s"$staging/retired_bucket=$b")
            if (java.nio.file.Files.isDirectory(live))
              java.nio.file.Files.move(live, retired)
            if (java.nio.file.Files.isDirectory(staged))
              java.nio.file.Files.move(staged, live)
          }
          graft.functions.CrossEngine.deleteRecursive(
            java.nio.file.Paths.get(staging))
        }
        tb
      }
      def compactTable(table: String): Seq[Int] = {
        val path = s"$lroot/$table"
        val fr = (0 until nBuckets).filter { b =>
          Option(new java.io.File(s"$path/bucket=$b").listFiles())
            .getOrElse(Array.empty)
            .count(_.getName.endsWith(".parquet")) > 1
        }
        if (fr.nonEmpty) {
          val staging = s"${path}_compact_staging"
          spark.read.parquet(path)
            .filter(col("bucket").isin(fr: _*))
            .repartition(col("bucket"))
            .write.mode("overwrite").partitionBy("bucket").parquet(staging)
          fr.foreach { b =>
            val live = java.nio.file.Paths.get(s"$path/bucket=$b")
            val staged = java.nio.file.Paths.get(s"$staging/bucket=$b")
            val retired =
              java.nio.file.Paths.get(s"$staging/retired_bucket=$b")
            java.nio.file.Files.move(live, retired)
            java.nio.file.Files.move(staged, live)
          }
          graft.functions.CrossEngine.deleteRecursive(
            java.nio.file.Paths.get(staging))
        }
        fr
      }
      val tables = Seq("knn", "links", "layer1", "layer2")
      timed("LAYERED build: synthesize + write all four tables") {
        writeBucketed(edges, "knn")
        writeBucketed(spark.range(0, n, 1, 32).select(col("id").as("u"),
            expr(s"""explode(transform(sequence(1, 3), j ->
              abs(xxhash64(id, j + 100)) % $n))""").as("v"))
          .filter(col("u") =!= col("v")), "links")
        // level draw: 1/4 promoted to >=1, 1/16 to >=2 (id-hash only)
        def promoted(minLvl: Int) = {
          val mod = if (minLvl >= 2) 16 else 4
          spark.range(0, n, 1, 32)
            .filter(abs(xxhash64(col("id"), lit(77))) % 16 <
              (16 / mod))
            .select(col("id"))
        }
        // layer edges: k draws from the PROMOTED set via a rank join
        def layerEdges(minLvl: Int, kk: Int, salt: Int) = {
          val p = promoted(minLvl)
          val ranked = p.withColumn("idx",
            row_number().over(org.apache.spark.sql.expressions.Window
              .orderBy(col("id"))).cast("long") - 1)
            .localCheckpoint(true)
          val pCount = ranked.count()
          ranked.select(col("id").as("u"),
              expr(s"""explode(transform(sequence(1, $kk), j ->
                abs(xxhash64(id, j + $salt)) % $pCount))""").as("idx"))
            .join(ranked.withColumnRenamed("id", "v"), Seq("idx"))
            .select(col("u"), col("v"))
            .filter(col("u") =!= col("v"))
        }
        writeBucketed(layerEdges(1, 6, 200), "layer1")
        writeBucketed(layerEdges(2, 4, 300), "layer2")
      }
      // takedown across the hierarchy: base ids + promoted ids, so every
      // table class is touched (the st46 doomed-shape)
      val doomedL = (0L until 100L).map(_ * 7919L % n)
      val touchedL = timed("LAYERED delete (one batch, four tables)") {
        tables.map(t => t -> deleteFrom(t, doomedL)).toMap
      }
      println("[graph-maint] layered delete touched buckets: " +
        tables.map(t => s"$t=${touchedL(t).size}").mkString(", ") +
        s" of $nBuckets each")
      timed("LAYERED fragment (append slice per table)") {
        tables.foreach { t =>
          spark.read.parquet(s"$lroot/$t")
            .filter(pmod(col("u"), lit(64L)) === 1)
            .repartition(col("bucket"))
            .write.mode("append").partitionBy("bucket")
            .parquet(s"$lroot/$t")
        }
      }
      val frL = timed("LAYERED compact (all four tables)") {
        tables.map(t => t -> compactTable(t)).toMap
      }
      println("[graph-maint] layered compacted buckets: " +
        tables.map(t => s"$t=${frL(t).size}").mkString(", "))
      timed("LAYERED health (per-table stats + descent reach)") {
        tables.foreach { t =>
          val e = spark.read.parquet(s"$lroot/$t")
            .select(col("u"), col("v"))
          val deg = e.groupBy(col("u")).agg(count(lit(1)).as("c"))
          val d = deg.agg(min(col("c")), max(col("c")), count(lit(1)),
            sum(col("c"))).head()
          println(f"[graph-maint]   $t%-7s edges ${d.getLong(3)}%10d " +
            f"degree ${d.getLong(0)}..${d.getLong(1)} sources ${d.getLong(2)}")
        }
        def closure(start: org.apache.spark.sql.DataFrame, table: String,
            hops: Int) = {
          val g = spark.read.parquet(s"$lroot/$table")
            .select(col("u"), col("v"))
          var reached = start.localCheckpoint(true)
          for (_ <- 1 to hops) {
            reached = reached.unionByName(
                reached.join(g, reached("node") === g("u"))
                  .select(col("v").as("node")))
              .distinct().localCheckpoint(true)
          }
          reached
        }
        val entry = spark.read.parquet(s"$lroot/layer2")
          .agg(min(col("u"))).head().getLong(0)
        val d2 = closure(spark.range(0, 1)
          .select(lit(entry).as("node")), "layer2", 2)
        val d1 = closure(d2, "layer1", 2)
        val d0 = closure(d1, "knn", 3)
        println(s"[graph-maint]   descent reach from entry $entry: " +
          s"${d2.count()} -> ${d1.count()} -> ${d0.count()}")
      }
    } finally {
      graft.functions.CrossEngine.deleteRecursive(
        java.nio.file.Paths.get(out))
    }
    spark.stop()
  }
}
