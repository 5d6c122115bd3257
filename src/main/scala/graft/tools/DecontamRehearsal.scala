package graft.tools

import org.apache.spark.sql.functions._

/** Scale rehearsal for decontamination (d16): the train corpus is the big
  * axis (at 100 TB, ~10^12 n-grams), the eval side stays benchmark-sized —
  * so the production plan must broadcast eval and keep the train explode
  * map-side. This harness synthesizes a DedupRehearsal-style corpus far
  * beyond the gate table, plants verbatim-passage leaks for half the eval
  * set (deterministic recall: an exact 20-word passage always shares its
  * 8-grams) and vocabulary-disjoint clean twins for the other half, then
  * measures the overlap pass and checks perfect separation.
  *
  * Usage: runMain graft.tools.DecontamRehearsal [nTrain] [nEval]
  */
object DecontamRehearsal {
  def main(args: Array[String]): Unit = {
    val nTrain = if (args.nonEmpty) args(0).toLong else 1000000L
    val nEval = if (args.length > 1) args(1).toLong else 1000L
    val spark = graft.GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[decontam-scale] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // DedupRehearsal's synthesis: 40 tokens/doc, token = hash(doc, pos)
    // over an 800-word vocabulary — leaked passages re-derive without a join
    def synth(ids: org.apache.spark.sql.DataFrame, lo: Int, hi: Int) = {
      val toks = (lo until hi).map(j =>
        concat(lit("w"), pmod(xxhash64(col("id"), lit(j)), lit(800))))
      ids.select(col("id").as("doc_id"), concat_ws(" ", toks: _*).as("text"))
    }
    val train = synth(spark.range(0, nTrain, 1, 32).toDF(), 0, 40)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed(s"synthesize train($nTrain)") { train.count() }

    // eval: half leaked (verbatim tokens 10..29 of every (2k)-th train
    // doc), half clean (same passage, every token suffixed out of vocab)
    val srcIds = spark.range(0, nEval / 2, 1, 8).toDF()
      .select((col("id") * 2 * (nTrain / nEval)).as("id"))
    val passages = synth(srcIds, 10, 30)
    val leaked = passages.select((col("doc_id") + 2000000000L).as("test_id"), col("text"))
    val clean = passages.select((col("doc_id") + 3000000000L).as("test_id"),
      concat_ws(" ", transform(split(col("text"), " "),
        w => concat(w, lit("zz")))).as("text"))
    val evalDocs = leaked.unionByName(clean)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    evalDocs.count()

    val res = timed(s"decontaminate ($nEval eval docs)") {
      val r = graft.operators.Dedup.decontaminate(train, evalDocs, n = 8)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      r.count()
      r
    }
    val leakedFlagged = res
      .filter(col("test_id") < 3000000000L && col("contaminated")).count()
    val cleanFlagged = res
      .filter(col("test_id") >= 3000000000L && col("contaminated")).count()
    println(s"[decontam-scale] leaked flagged: $leakedFlagged/${nEval / 2} " +
      s"(verbatim passages: deterministic); clean flagged: $cleanFlagged/${nEval / 2}")
    assert(leakedFlagged == nEval / 2, "every verbatim leak must be flagged")
    assert(cleanFlagged == 0L, "no vocabulary-disjoint doc may be flagged")
    spark.stop()
  }
}
