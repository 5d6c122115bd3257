package graft.tools

import org.apache.spark.sql.functions._

/** Dev harness for the DEDUP path's 100 TB posture (VERDICT r5 #7 — SCALE.md
  * was harmony-only): synthesize an sf1-equivalent document corpus (50k docs,
  * 10× the sf0.1 gate table; nothing N-sized on the driver) with
  *   - 1% planted EXACT duplicates (J = 1 — deterministic recall),
  *   - 1% planted 80%-prefix NEAR duplicates (J ≈ 0.79 — banding recall), and
  *   - a boilerplate FLOOD of identical docs (the real-world license-page
  *     shape the hot-bucket cap exists for),
  * then run the production MinHash LSH pair generator (bands → cap → verify)
  * and the connected-components clustering stage end to end, reporting
  * wall-clock and candidate volumes. The flood's uncapped candidate count is
  * C(flood, 2) — quadratic; the cap bounds it to ~bands × (flood/cap) ×
  * C(cap, 2), linear in flood size at fixed cap, and the cap's split is
  * logged by capHotBuckets (log level WARN, visible in this harness).
  *
  * Usage: runMain graft.tools.DedupRehearsal [nDocs] [flood] [bucketCap]
  */
object DedupRehearsal {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 50000L
    val floodN = if (args.length > 1) args(1).toLong else 2000L
    val cap = if (args.length > 2) args(2).toInt else 64

    val spark = graft.GraftSession.local(16) // WARN level keeps the cap log line

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[dedup-scale] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // distributed synthesis: 40 tokens/doc from an 800-word vocabulary,
    // token choice a pure hash of (doc id, position) so near-dup docs can
    // re-derive the SAME prefix without a join
    def synth(ids: org.apache.spark.sql.DataFrame, nTok: Int) = {
      val toks = (0 until nTok).map(j =>
        concat(lit("w"), pmod(xxhash64(col("id"), lit(j)), lit(800))))
      ids.select(col("id").as("doc_id"), concat_ws(" ", toks: _*).as("text"))
    }
    val baseIds = spark.range(0, nDocs, 1, 32).toDF()
    val base = synth(baseIds, 40)
    val exactDups = synth(baseIds.filter(col("id") % 100 === 0), 40)
      .select((col("doc_id") + 1000000000L).as("doc_id"), col("text"))
    val nearDups = synth(baseIds.filter(col("id") % 100 === 1), 32) // 80% prefix
      .select((col("doc_id") + 1200000000L).as("doc_id"), col("text"))
    val flood = spark.range(0, floodN, 1, 8)
      .select((col("id") + 2000000000L).as("doc_id"),
        lit("permission is hereby granted free of charge to any person " +
          "obtaining a copy of this software and associated documentation files")
          .as("text"))
    val docs = timed(s"synthesize $nDocs + dups + flood($floodN)") {
      val d = base.unionByName(exactDups).unionByName(nearDups).unionByName(flood)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[dedup-scale] corpus: ${d.count()} docs")
      d
    }

    val pairs = timed(s"minhashPairs (cap=$cap)") {
      val p = graft.operators.Dedup.minhashPairs(docs, bucketCap = cap)
      println(s"[dedup-scale] verified near-dup pairs: ${p.count()} " +
        s"(uncapped flood alone would be C($floodN,2) = ${floodN * (floodN - 1) / 2})")
      p
    }
    val exactFound = pairs
      .filter(col("doc_a") < 1000000000L && col("doc_b") >= 1000000000L &&
        col("doc_b") < 1200000000L).count()
    val nearFound = pairs
      .filter(col("doc_a") < 1000000000L && col("doc_b") >= 1200000000L &&
        col("doc_b") < 2000000000L).count()
    println(s"[dedup-scale] planted exact-dup recall: $exactFound/${nDocs / 100} " +
      s"(deterministic); near-dup (J~0.79) recall: $nearFound/${nDocs / 100} (probabilistic)")

    timed("connectedComponents (clustering)") {
      val labels = graft.operators.Dedup.connectedComponents(
        pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
      val nClusters = labels.select(col("label")).distinct().count()
      println(s"[dedup-scale] ${labels.count()} clustered docs in $nClusters clusters")
      labels.unpersist(false)
    }

    docs.unpersist(false)
    spark.stop()
  }
}
