package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev harness for the STREAMING ingest path's 100 TB posture (VERDICT r6
  * #6 — SCALE.md's one unmeasured lane): drive st10's streaming LSH
  * near-dup pipeline at sustained multi-batch volume and measure PER-BATCH
  * latency against corpus-table size, turning the claim "per-batch cost is
  * O(|new| + matched buckets)" into a number.
  *
  * Shape: a synthesized corpus (DedupRehearsal's hash-token generator) is
  * banded once and persisted — the slowly-growing-corpus contract; the
  * stream arrives as one parquet file per micro-batch
  * (`maxFilesPerTrigger=1`), each batch carrying fresh docs plus 10%
  * planted 80%-prefix near-dups of corpus docs. The query is st10's exact
  * per-row shape: stateless MinHash signatures (array_min over zip_with —
  * no watermark, no state store), band explode, stream-static band
  * equi-join, inline exact-Jaccard verify. Per-batch timings come from the
  * engine's own StreamingQueryProgress.
  *
  * Usage: runMain graft.tools.StreamingRehearsal [nCorpus] [nBatches] [batchSize]
  */
object StreamingRehearsal {
  def main(args: Array[String]): Unit = {
    val nCorpus = if (args.nonEmpty) args(0).toLong else 100000L
    val nBatches = if (args.length > 1) args(1).toInt else 8
    val batchSize = if (args.length > 2) args(2).toLong else 2000L

    val spark = graft.GraftSession.local(16)
    spark.sparkContext.setLogLevel("WARN")
    // st10's streaming setting: state-store/shuffle width sized to the
    // micro-batch, not the session's batch analytics width
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stream-scale] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    def synth(ids: DataFrame, nTok: Int) = {
      val toks = (0 until nTok).map(j =>
        concat(lit("w"), pmod(xxhash64(col("id"), lit(j)), lit(800))))
      ids.select(col("id").as("doc_id"), concat_ws(" ", toks: _*).as("text"))
    }

    // static side, built once: banded corpus + attached shingle sets
    val corpusDocs = synth(spark.range(0, nCorpus, 1, 32).toDF(), 40)
    val corpusSets = graft.operators.Dedup.shingleSets(corpusDocs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpusBanded = graft.operators.Dedup.kmBands(corpusSets)
      .join(corpusSets.select(col("doc_id"), col("sh").as("sh_a")), Seq("doc_id"))
      .select(col("doc_id").as("doc_a"), col("band"), col("bucket"), col("sh_a"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed(s"band corpus ($nCorpus docs)") {
      println(s"[stream-scale] corpus band rows: ${corpusBanded.count()}")
    }

    // the stream: one parquet file per micro-batch
    val srcDir = java.nio.file.Files.createTempDirectory("graft_stream_scale_")
    timed(s"write $nBatches batch files") {
      (0 until nBatches).foreach { b =>
        val lo = 3000000000L + b * batchSize
        val fresh = synth(spark.range(lo, lo + batchSize, 1, 4).toDF(), 40)
        val nNear = batchSize / 10
        val near = synth(spark.range(b * nNear, (b + 1) * nNear, 1, 4).toDF(), 32)
          .select((col("doc_id") + 4000000000L + b.toLong * nNear).as("doc_id"),
            col("text"))
        fresh.unionByName(near).coalesce(1)
          .write.mode("append").parquet(srcDir.toString)
      }
    }

    val raw = spark.readStream
      .schema(corpusDocs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir.toString)
    // st10's per-row stateless signature/band shape, verbatim
    val streamed = graft.operators.Dedup.shingleSets(raw)
      .withColumn("digs", expr("transform(sh, x -> md5(x))"))
      .withColumn("ha", expr(
        "transform(digs, d -> cast(conv(substring(d, 1, 15), 16, 10) as bigint))"))
      .withColumn("hb", expr(
        "transform(digs, d -> cast(conv(substring(d, 17, 15), 16, 10) as bigint))"))
    val sigCols = (0 until 8).map(i =>
      expr(s"array_min(zip_with(ha, hb, (a, b) -> (a + $i * b) % 4294967296))").as(s"h$i"))
    val withSigs = streamed.select(col("doc_id") +: col("sh") +: sigCols: _*)
    val bandCols = (0 until 4).map(b =>
      struct(lit(b).as("band"),
        md5(concat_ws(",", col(s"h${2 * b}"), col(s"h${2 * b + 1}"))).as("bucket")))
    val streamBanded = withSigs
      .select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
        explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_b"), col("sh_b"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val joined = streamBanded.join(corpusBanded, Seq("band", "bucket"))
      .withColumn("jaccard_raw", inter.cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - inter))
      .filter(col("jaccard_raw") >= 0.5)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard_raw"), 6).as("jaccard"))

    val query = joined.writeStream
      .format("memory").queryName("stream_scale_sink")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()

    query.recentProgress.filter(_.numInputRows > 0).foreach { p =>
      println(f"[stream-scale] batch ${p.batchId}%2d rows=${p.numInputRows}%6d " +
        f"trigger=${p.durationMs.get("triggerExecution")}%6d ms " +
        f"addBatch=${p.durationMs.get("addBatch")}%6d ms")
    }
    val matched = spark.table("stream_scale_sink").distinct().count()
    println(s"[stream-scale] matched near-dup pairs (distinct): $matched " +
      s"(planted ${nBatches * (batchSize / 10)})")
    graft.functions.CrossEngine.deleteRecursive(srcDir)
    spark.stop()
  }
}
