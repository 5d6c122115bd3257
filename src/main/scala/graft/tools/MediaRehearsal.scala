package graft.tools

import org.apache.spark.sql.functions._

/** Scale rehearsal for the perceptual-hash near-dup lanes (m07 image
  * dHash, m08 audio envelope fingerprint): the corpus-scale cost is the
  * CODEC pass — every asset is container-encoded and genuinely decoded
  * (ImageIO PNG / AudioSystem WAV) before hashing — so the rehearsal
  * measures decode+hash throughput at 1-2M assets and then the capped
  * Hamming band join + planted-twin recall on the resulting hash tables.
  * Both stages are embarrassingly parallel / capped equi-joins, so the
  * numbers here are per-core throughputs a 1000-executor run multiplies.
  *
  * Usage: runMain graft.tools.MediaRehearsal [nAssets]
  */
object MediaRehearsal {
  def main(args: Array[String]): Unit = {
    val nAssets = if (args.nonEmpty) args(0).toLong else 1000000L
    val spark = graft.GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[media-scale] $label%-38s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val ids = spark.range(0, nAssets, 1, 32).toDF("doc_id")

    for ((label, fps, offset, everyK) <- Seq(
        ("image dHash (PNG encode+decode)",
          graft.operators.Multimodal.imageDHashesOf(spark, ids), 80000000L, 37L),
        ("audio fingerprint (WAV encode+decode)",
          graft.operators.Multimodal.audioFingerprintsOf(spark, ids), 90000000L, 41L))) {
      val fp = fps.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = timed(s"$label build") { fp.count() }
      val pairs = timed(s"$label pair join") {
        // cap 1024 >= the measured max band-bucket width at this scale
        // (608 image / 369 audio in the DuckDB prototypes), so no bucket
        // splits and planted-twin recall stays structural; the sf gate
        // keeps the default 256
        val p = graft.operators.Multimodal.bitHashNeardupPairs(fp, bucketCap = 1024)
        p.count()
        p
      }
      val nTwins = (nAssets + everyK - 1) / everyK
      val recalled = pairs.filter(col("doc_b") === col("doc_a") + offset).count()
      val total = pairs.count()
      println(s"[media-scale]   $label: $n hashes, $total pairs, " +
        s"twin recall $recalled/$nTwins")
      assert(recalled == nTwins, s"every planted twin must pair ($label)")
      fp.unpersist(false)
    }

    // video lane: nAssets/4 videos x 4 frames = the same codec-op count as
    // the image lane, so the build numbers are directly comparable
    val nVideos = nAssets / 4
    val vids = spark.range(0, nVideos, 1, 32).toDF("doc_id")
    val fr = graft.operators.Multimodal.videoFrameHashesOf(spark, vids)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nFr = timed("video frame dHash (4-frame motion-PNG)") { fr.count() }
    val vPairs = timed("video pair join") {
      val p = graft.operators.Multimodal.videoNeardupPairs(fr, bucketCap = 1024)
      p.count()
      p
    }
    val nVTwins = (nVideos + 42) / 43
    val vRecalled = vPairs.filter(col("doc_b") === col("doc_a") + 70000000L).count()
    println(s"[media-scale]   video: $nFr frame hashes, ${vPairs.count()} pairs, " +
      s"twin recall $vRecalled/$nVTwins")
    assert(vRecalled == nVTwins, "every planted frame-0-edited twin must pair")
    fr.unpersist(false)
    spark.stop()
  }
}
