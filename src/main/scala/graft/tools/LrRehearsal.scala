package graft.tools

import org.apache.spark.sql.functions._

/** Scale rehearsal for the t31 logistic quality classifier: the gate
  * trains on ~500 docs; this featurizes and trains on a synthesized
  * million-doc corpus (the AdmissionRehearsal synthesizer's 60-token docs
  * over a 5k-word vocab, spam markers planted on the positive third) and
  * measures the two costs the docstring claims — ONE featurize pass whose
  * shuffle carries (doc, bucket) pairs, then GD steps whose shuffles are
  * MODEL-dimension (bucket, gradient) pairs regardless of corpus size —
  * plus held-out separation at scale.
  *
  * Usage: runMain graft.tools.LrRehearsal [nMillionDocs] [iters]
  */
object LrRehearsal {
  def main(args: Array[String]): Unit = {
    val nM = if (args.nonEmpty) args(0).toDouble else 1.0
    val iters = if (args.length > 1) args(1).toInt else 30
    val n = (nM * 1e6).toLong
    val spark = graft.GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[lr-scale] $label%-42s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    import graft.operators.TextAnalysis._
    val docs = timed(s"synthesize ${nM}M labeled docs") {
      val out = spark.range(0, n, 1, 64)
        .select(col("id").as("doc_id"),
          when(col("id") % 3 === 0, lit(1L)).otherwise(lit(0L)).as("label"),
          concat(
            array_join(expr(
              "transform(sequence(0, 59), i -> concat('w', pmod(xxhash64(id, i), 5000)))"),
              " "),
            when(col("id") % 3 === 0, lit(" clickspam buynow clickspam"))
              .otherwise(lit(" organiccontent"))).as("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out.count(); out
    }
    val nBuckets = 65536 // production capacity: 5k-word vocab + markers collide
                         // at the gate's 1024 (measured 0.69% held-out errors)
    val feats = timed(s"featurize (one corpus pass, $nBuckets buckets)") {
      val f = lrFeatures(docs, nBuckets)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      f.count(); f
    }
    val train = feats.filter(col("doc_id") % 2 === 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    train.count()
    val (w, losses) = timed(s"$iters GD iterations (AdaGrad)") {
      lrTrain(train, iters, rate = 0.3, nBuckets = nBuckets)
    }
    println(f"[lr-scale] loss ${losses.head}%.1f -> ${losses.last}%.1f")
    val heldErrs = timed("score held-out half") {
      lrPredict(feats.filter(col("doc_id") % 2 === 1), w)
        .filter(col("pred") =!= col("label")).count()
    }
    println(s"[lr-scale] held-out errors = $heldErrs / ${n / 2} (must be 0 on " +
      "the separable plant)")
    spark.stop()
  }
}
