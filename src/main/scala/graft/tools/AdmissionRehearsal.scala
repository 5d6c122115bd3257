package graft.tools

import org.apache.spark.sql.functions._

/** Dev harness for the st29 STREAMING ADMISSION lane's 100 TB posture:
  * the gate proves batch/stream verdict parity at fixture scale; this
  * measures the thing the production lane is bought for — per-doc
  * admission THROUGHPUT under frozen models, where every verdict
  * (quality, hot-block strip, decontamination, admit) is a codegen'd
  * row-local expression with no shuffle at all. The corpus is the
  * CurationRehearsal synthesizer's (template on evens, 5k-word vocab);
  * models are frozen batch-side first exactly as st29 does, then ONE
  * admission pass scans the corpus and folds the verdict counts.
  *
  * The number to watch is docs/sec on the admission pass: the pass is a
  * map over the scan — on a cluster it scales with cores x executors
  * linearly, and there is no state to grow, so the single-box docs/sec
  * IS the per-core contract at any corpus size.
  *
  * Usage: runMain graft.tools.AdmissionRehearsal [nMillions]
  */
object AdmissionRehearsal {
  def main(args: Array[String]): Unit = {
    val nM = if (args.nonEmpty) args(0).toDouble else 1.0
    val n = (nM * 1e6).toLong
    val spark = graft.GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[admission-scale] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    import graft.operators.{Curation, Dedup}
    val template = Dedup.d19Template
    val corpus = timed(s"synthesize ${nM}M docs (+template on evens)") {
      val out = spark.range(0, n, 1, 64)
        .select(col("id").as("doc_id"),
          array_join(expr(
            "transform(sequence(0, 59), i -> concat('w', pmod(xxhash64(id, i), 5000)))"),
            " ").as("text"))
        .select(col("doc_id"),
          when(col("doc_id") % 2 === 0, concat(lit(template), lit(" "), col("text")))
            .otherwise(col("text")).as("text"))
        .persist(mem)
      println(s"[admission-scale]   n_input = ${out.count()}")
      out
    }
    val (hot, evalGrams) = timed("freeze models (hot blocks + eval grams)") {
      Curation.frozenAdmissionModels(corpus)
    }
    println(s"[admission-scale]   |hot| = ${hot.size}, |evalGrams| = ${evalGrams.size}")
    val verdicts = timed("ADMISSION PASS (row-local, no shuffle)") {
      Curation.admissionVerdict(corpus, hot, evalGrams)
        .agg(count(lit(1)).as("n"),
          sum(when(col("admitted"), 1L).otherwise(0L)).as("n_admitted"),
          sum(when(col("quality_ok"), 1L).otherwise(0L)).as("n_quality_ok"),
          sum(col("n_removed")).as("blocks_removed"),
          sum(when(col("contaminated"), 1L).otherwise(0L)).as("n_contaminated"))
        .head()
    }
    println(s"[admission-scale] verdicts: n=${verdicts.getLong(0)} " +
      s"admitted=${verdicts.getLong(1)} quality_ok=${verdicts.getLong(2)} " +
      s"blocks_removed=${verdicts.getLong(3)} contaminated=${verdicts.getLong(4)}")
    spark.stop()
  }
}
