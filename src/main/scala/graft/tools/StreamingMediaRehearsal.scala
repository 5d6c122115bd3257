package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Scale rehearsal for the STREAMING media ingest lanes (st13 image /
  * st14 audio / st15 video): each lane's corpus-side artifact (the
  * persisted perceptual-hash table) is built once at rehearsal scale,
  * then perturbed re-uploads arrive as real micro-batches
  * (`maxFilesPerTrigger=1`) and are decoded + hashed INSIDE the stream by
  * the exact gate cores (imageDHashRows / audioFpRows / videoFrameRows),
  * joined against the static table, with per-batch latency read from the
  * engine's own StreamingQueryProgress — turning "per-batch cost is
  * O(batch) codec + the band join, zero streaming state" into numbers.
  * The image/audio lanes are stateless joins; the video lane's streaming
  * AGGREGATION (complete mode, pair when >= 3 of 4 frame positions match)
  * additionally measures the state the verdict aggregate keeps — bounded
  * by matched pairs, not by corpus or stream volume.
  *
  * Every arrival is a planted perturbation of a corpus asset (one pixel /
  * one sample / frame-0 pixel), so recall must be total: an ingest filter
  * that waves any re-upload through fails the rehearsal.
  *
  * Usage: runMain graft.tools.StreamingMediaRehearsal [nCorpus] [nBatches] [batchSize]
  */
object StreamingMediaRehearsal {
  def main(args: Array[String]): Unit = {
    val nCorpus = if (args.nonEmpty) args(0).toLong else 400000L
    val nBatches = if (args.length > 1) args(1).toInt else 8
    val batchSize = if (args.length > 2) args(2).toLong else 10000L
    require(nBatches * batchSize <= nCorpus, "arrivals must re-upload corpus assets")
    val OFF = 1000000000L

    val spark = graft.GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    import spark.implicits._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stream-media] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    def banded(dh: DataFrame): DataFrame =
      graft.operators.Multimodal.bandedHalves(dh)

    // one parquet file of arriving doc_ids per micro-batch; batch b
    // re-uploads corpus slice [b*batchSize, (b+1)*batchSize)
    def writeBatches(dir: java.nio.file.Path, scale: Long): Unit =
      (0 until nBatches).foreach { b =>
        spark.range(b * batchSize / scale, (b + 1) * batchSize / scale, 1, 4)
          .toDF("doc_id").coalesce(1).write.mode("append").parquet(dir.toString)
      }

    def drive(label: String,
        q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      q.awaitTermination()
      q.recentProgress.filter(_.numInputRows > 0).foreach { p =>
        println(f"[stream-media] $label batch ${p.batchId}%2d rows=${p.numInputRows}%6d " +
          f"trigger=${p.durationMs.get("triggerExecution")}%6d ms")
      }
    }

    // ------------------------------------------------------------ image
    locally {
      val corpus = timed(s"image corpus hash table ($nCorpus)") {
        val c = graft.operators.Multimodal.imageDHashRows(
            spark.range(0, nCorpus, 1, 32).as[Long].map(id => (id, id, false)))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        c.count(); c
      }
      val corpusBanded = banded(corpus)
        .select(col("doc_id").as("doc_a"), col("dhash_hi").as("hi_a"),
          col("dhash_lo").as("lo_a"), col("band"), col("bucket"))
      val srcDir = java.nio.file.Files.createTempDirectory("graft_smr_img_")
      writeBatches(srcDir, 1L)
      val raw = spark.readStream.schema("doc_id LONG")
        .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
      val joined = banded(graft.operators.Multimodal.imageDHashRows(
          raw.as[Long].map(id => (id + OFF, id, true))))
        .select(col("doc_id").as("doc_b"), col("dhash_hi").as("hi_b"),
          col("dhash_lo").as("lo_b"), col("band"), col("bucket"))
        .join(corpusBanded, Seq("band", "bucket"))
        .withColumn("hamming",
          bit_count(col("lo_a").bitwiseXOR(col("lo_b"))) +
            bit_count(col("hi_a").bitwiseXOR(col("hi_b"))))
        .filter(col("hamming") <= 2)
        .select(col("doc_a"), col("doc_b"))
      val q = joined.writeStream.format("memory").queryName("smr_img")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      timed("image stream (all batches)") { drive("image", q) }
      val planted = nBatches * batchSize
      val recalled = spark.table("smr_img").distinct()
        .filter(col("doc_b") === col("doc_a") + OFF).count()
      println(s"[stream-media]   image recall: $recalled/$planted")
      assert(recalled == planted, "every perturbed image re-upload must pair")
      corpus.unpersist(false)
      graft.functions.CrossEngine.deleteRecursive(srcDir)
    }

    // ------------------------------------------------------------ audio
    locally {
      val corpus = timed(s"audio corpus fingerprint table ($nCorpus)") {
        val c = graft.operators.Multimodal.audioFpRows(
            spark.range(0, nCorpus, 1, 32).as[Long].map(id => (id, id, false)))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        c.count(); c
      }
      val corpusBanded = banded(corpus)
        .select(col("doc_id").as("doc_a"), col("dhash_hi").as("hi_a"),
          col("dhash_lo").as("lo_a"), col("band"), col("bucket"))
      val srcDir = java.nio.file.Files.createTempDirectory("graft_smr_aud_")
      writeBatches(srcDir, 1L)
      val raw = spark.readStream.schema("doc_id LONG")
        .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
      val joined = banded(graft.operators.Multimodal.audioFpRows(
          raw.as[Long].map(id => (id + OFF, id, true))))
        .select(col("doc_id").as("doc_b"), col("dhash_hi").as("hi_b"),
          col("dhash_lo").as("lo_b"), col("band"), col("bucket"))
        .join(corpusBanded, Seq("band", "bucket"))
        .withColumn("hamming",
          bit_count(col("lo_a").bitwiseXOR(col("lo_b"))) +
            bit_count(col("hi_a").bitwiseXOR(col("hi_b"))))
        .filter(col("hamming") <= 2)
        .select(col("doc_a"), col("doc_b"))
      val q = joined.writeStream.format("memory").queryName("smr_aud")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      timed("audio stream (all batches)") { drive("audio", q) }
      val planted = nBatches * batchSize
      val recalled = spark.table("smr_aud").distinct()
        .filter(col("doc_b") === col("doc_a") + OFF).count()
      println(s"[stream-media]   audio recall: $recalled/$planted")
      assert(recalled == planted, "every perturbed audio re-upload must pair")
      corpus.unpersist(false)
      graft.functions.CrossEngine.deleteRecursive(srcDir)
    }

    // ------------------------------------------------------------ video
    locally {
      val nVideos = nCorpus / 4 // same codec-op count as the image lane
      val vBatch = batchSize / 4
      val corpus = timed(s"video corpus frame table ($nVideos videos)") {
        val c = graft.operators.Multimodal.videoFrameRows(
            spark.range(0, nVideos, 1, 32).as[Long].map(id => (id, id, false)))
          .select(col("doc_id").as("doc_a"), col("frame_no"),
            col("dhash_hi"), col("dhash_lo"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        c.count(); c
      }
      val srcDir = java.nio.file.Files.createTempDirectory("graft_smr_vid_")
      writeBatches(srcDir, 4L)
      val raw = spark.readStream.schema("doc_id LONG")
        .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
      val counted = graft.operators.Multimodal.videoFrameRows(
          raw.as[Long].map(id => (id + OFF, id, true)))
        .select(col("doc_id").as("doc_b"), col("frame_no"),
          col("dhash_hi"), col("dhash_lo"))
        .join(corpus, Seq("frame_no", "dhash_hi", "dhash_lo"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("n_shared_frames"))
      val q = counted.writeStream.format("memory").queryName("smr_vid")
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      timed("video stream (all batches)") { drive("video", q) }
      val planted = nBatches * vBatch
      val recalled = spark.table("smr_vid")
        .filter(col("n_shared_frames") >= 3 && col("doc_b") === col("doc_a") + OFF)
        .count()
      println(s"[stream-media]   video recall: $recalled/$planted " +
        s"(state rows: ${spark.table("smr_vid").count()})")
      assert(recalled == planted, "every frame-0-edited video re-upload must pair")
      corpus.unpersist(false)
      graft.functions.CrossEngine.deleteRecursive(srcDir)
    }

    spark.stop()
  }
}
