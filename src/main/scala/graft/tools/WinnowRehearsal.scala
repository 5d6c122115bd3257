package graft.tools

import org.apache.spark.sql.functions._

/** Scale rehearsal for winnowing exact-substring fingerprints (d17) with a
  * planted BOILERPLATE FLOOD — the scenario the MOSS document-frequency
  * ceiling exists for: license headers / repeated disclaimers put the same
  * passage in thousands of documents, every flood doc shares the passage's
  * fingerprints, and an uncapped fingerprint equi-join emits C(flood, 2)
  * pairs from a handful of keys. The rehearsal synthesizes a corpus far
  * beyond the gate table, plants (a) a flood of docs sharing one 30-token
  * boilerplate passage and (b) genuine splice twins (the d17 planting — a
  * verbatim >= w+k-1 token run, so a shared fingerprint is guaranteed),
  * then measures pair volume and wall time WITH and WITHOUT the ceiling,
  * checking that the ceiling removes exactly the boilerplate pairs while
  * keeping splice recall at 100%.
  *
  * Usage: runMain graft.tools.WinnowRehearsal [nDocs] [nFlood]
  */
object WinnowRehearsal {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 1000000L
    val nFlood = if (args.length > 1) args(1).toLong else 2000L
    val spark = graft.GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[winnow-scale] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // DedupRehearsal's synthesis: 40 tokens/doc, token = hash(doc, pos)
    // over an 800-word vocabulary (800^4 4-gram space => no accidental
    // cross-doc fingerprint sharing at this corpus size)
    val baseToks = (0 until 40).map(j =>
      concat(lit("w"), pmod(xxhash64(col("id"), lit(j)), lit(800))))
    val base = spark.range(0, nDocs, 1, 32).toDF()
      .select(col("id").as("doc_id"), concat_ws(" ", baseToks: _*).as("text"))
    // boilerplate flood: the first nFlood docs share one 30-token passage
    // (their own first 10 tokens keep each doc distinct — the license-
    // header shape: common block + unique tail)
    val passage = (0 until 30).map(i => s"boiler$i").mkString(" ")
    val flooded = base.withColumn("text",
      when(col("doc_id") < nFlood,
        concat_ws(" ", lit(passage),
          array_join(slice(split(col("text"), " "), 1, 10), " ")))
        .otherwise(col("text")))
    // genuine splice twins outside the flood: every 2000th doc's tokens
    // 5..34 verbatim + out-of-vocabulary filler (the d17 planting)
    val toks = split(col("text"), " ")
    val spliced = flooded.filter(col("doc_id") % 2000 === 0 && col("doc_id") >= nFlood)
      .select((col("doc_id") + 5000000000L).as("doc_id"),
        concat_ws(" ",
          concat_ws(" ", slice(toks, 5, 30)),
          concat_ws(" ", transform(slice(toks, 1, 4), t => concat(t, lit("zz")))))
          .as("text"))
    val corpus = flooded.unionByName(spliced)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nPlanted = spliced.count()
    timed(s"synthesize corpus($nDocs + $nPlanted splices)") { corpus.count() }

    def report(label: String, maxDocFreq: Int): Unit = {
      val pairs = timed(s"winnowingPairs $label") {
        val p = graft.operators.Dedup.winnowingPairs(corpus, maxDocFreq = maxDocFreq)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        p.count()
        p
      }
      val total = pairs.count()
      val floodPairs = pairs
        .filter(col("doc_a") < nFlood && col("doc_b") < nFlood).count()
      val recalled = pairs
        .filter(col("doc_b") === col("doc_a") + 5000000000L).count()
      println(s"[winnow-scale]   $label: $total pairs total, $floodPairs flood " +
        s"pairs, splice recall $recalled/$nPlanted")
      assert(recalled == nPlanted,
        s"every splice twin must share a fingerprint with its source ($label)")
      pairs.unpersist(false)
    }

    // WITHOUT the ceiling: the flood's shared fingerprints alone emit
    // C(nFlood, 2) pairs — the quadratic blowup VERDICT r7 #1 names
    report("UNCAPPED (maxDocFreq=0)", 0)
    // WITH the ceiling (the d17 default): boilerplate fingerprints are
    // dropped (logged), flood pairs vanish, splice recall is untouched
    report("CAPPED   (maxDocFreq=256)", 256)

    corpus.unpersist(false)
    spark.stop()
  }
}
