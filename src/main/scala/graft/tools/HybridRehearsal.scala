package graft.tools

import org.apache.spark.sql.functions._

/** Dev harness for the HYBRID-RETRIEVAL lane's 100 TB posture (s35/st36 —
  * the one r13 family with no SCALE.md row): synthesize an N-doc corpus
  * (text = 48 mid-frequency hash-drawn tokens from a 50k vocabulary, so
  * postings run ~N/1000 docs per term; embeddings = 16-dim cluster
  * mixture), plant exact text+embedding twins of the query panel, then
  * measure the three production numbers:
  *
  *   1. lexical-index BUILD wall (BmModel: tf/dl/df aggregations) at N docs;
  *   2. SERVE wall for a panel of nQ queries through the full RRF fusion
  *      (inverted-index BM25 lane + brute cosine lane + rank fusion),
  *      in the default broadcast-panel form AND the co-partitioned
  *      shuffle form (the lever for panels too big to broadcast — the
  *      NndRehearsal precedent);
  *   3. retrieval quality: twin hit rate at rank 1 / top-10 for both the
  *      hybrid fusion and the exact-cosine lane alone (the s01 baseline),
  *      plus mean top-10 overlap between fusion and exact cosine.
  *
  * Zipf-head caveat recorded here rather than hidden: a natural-language
  * corpus has stopword postings ~N long; production systems prune them
  * (stopword lists, impact-ordered postings / WAND). This harness draws a
  * flat mid-frequency vocabulary on purpose so the measured walls reflect
  * the equi-join shape, and the head-token hazard is called out in
  * SCALE.md next to the numbers.
  *
  * Usage: runMain graft.tools.HybridRehearsal [nMillions] [nQueries]
  */
object HybridRehearsal {
  def main(args: Array[String]): Unit = {
    val nM = if (args.nonEmpty) args(0).toDouble else 1.0
    val nQ = if (args.length > 1) args(1).toInt else 1000
    val n = (nM * 1e6).toLong
    val twinBase = 1000000000L

    val spark = graft.GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")
    // size shuffle partitions for the token-explode volume (N x 48 rows
    // flow through the tf aggregation): 128 partitions per 1M docs keeps
    // per-task hash-agg state bounded (the NndRehearsal sizing pattern —
    // at the default 32 the 48M-row groupBy hits AGGREGATE_OUT_OF_MEMORY)
    spark.conf.set("spark.sql.shuffle.partitions",
      math.max(64, math.round(nM * 128).toInt).toString)

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[hybrid-scale] $label%-42s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val nTok = 48
    val d = 16
    val docs = timed(s"synthesize ${nM}M docs x $nTok tokens") {
      val base = spark.range(0, n, 1, 32)
      // token j of doc i: a 50k-vocab draw keyed on (i, j) — flat
      // frequencies, postings ~ n*48/50000 docs per term
      val txt = base.select(col("id").as("doc_id"), expr(
        s"""array_join(transform(sequence(0, ${nTok - 1}), j ->
            concat('w', CAST(abs(xxhash64(id, j)) % 50000 AS STRING))), ' ')""")
        .as("text"))
      val planted = txt.filter(col("doc_id") < nQ)
        .select((col("doc_id") + twinBase).as("doc_id"), col("text"))
      val out = txt.unionByName(planted)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out.count(); out
    }
    val embs = timed(s"synthesize ${nM}M embeddings x $d") {
      val base = spark.range(0, n, 1, 32)
        .withColumn("cl", pmod(xxhash64(col("id")), lit(64)))
      val feats = (0 until d).map(j =>
        (randn(seed = 500 + j) * 0.3
          + col("cl") * lit(math.cos(j * 1.7))).cast("float"))
      val e = base.select(col("id").as("vec_id"), array(feats: _*).as("embedding"))
      val planted = e.filter(col("vec_id") < nQ)
        .select((col("vec_id") + twinBase).as("vec_id"), col("embedding"))
      val out = e.unionByName(planted)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out.count(); out
    }

    val m = timed(s"BUILD lexical index (tf/dl/df) over ${nM}M docs") {
      val mm = graft.operators.Similarity.bmModelOn(docs)
      mm.dfT.count() // force every table
      mm
    }
    println(f"[hybrid-scale] corpus n=${m.n} avgdl=${m.avgdl}%.2f distinct terms=${m.dfT.count()}")

    val sp = spark
    import sp.implicits._
    val panel = (0L until nQ.toLong).toDF("query_id")

    def fused(broadcastPanel: Boolean) =
      graft.operators.Similarity.rrfHybridOn(docs, embs, m, panel,
        broadcastPanel = broadcastPanel)

    val fb = timed(s"SERVE $nQ queries, broadcast panel") {
      val r = fused(broadcastPanel = true).localCheckpoint(true)
      r.count(); r
    }
    timed(s"SERVE $nQ queries, co-partitioned panel") {
      fused(broadcastPanel = false).count()
    }

    // quality: twin hits for the fusion, vs the exact-cosine lane alone
    val twinAt1 = fb.filter(col("rnk") === 1 &&
      col("doc_id") === col("query_id") + twinBase).count()
    val twinAt10 = fb.filter(col("doc_id") === col("query_id") + twinBase).count()
    import graft.functions.VectorExpressions.{dotF, l2NormF}
    val q = embs.join(broadcast(panel), col("vec_id") === col("query_id"))
      .select(col("query_id"), col("embedding").as("q_emb"))
    val exact = timed(s"exact cosine top-10 baseline ($nQ probes)") {
      graft.operators.Similarity.knnJoin(embs, q,
          dotF(col("embedding"), col("q_emb"))
            / (l2NormF(col("embedding")) * l2NormF(col("q_emb"))), k = 10)
        .localCheckpoint(true)
    }
    val exTwinAt10 = exact.filter(col("vec_id") === col("query_id") + twinBase).count()
    val overlap = fb.select(col("query_id"), col("doc_id").as("vec_id"))
      .join(exact.select(col("query_id"), col("vec_id")), Seq("query_id", "vec_id"))
      .count()
    println(f"[hybrid-scale] twin@1 fusion      ${twinAt1.toDouble / nQ}%.3f")
    println(f"[hybrid-scale] twin@10 fusion     ${twinAt10.toDouble / nQ}%.3f")
    println(f"[hybrid-scale] twin@10 exact-cos  ${exTwinAt10.toDouble / nQ}%.3f")
    println(f"[hybrid-scale] mean top-10 overlap fusion vs exact ${overlap.toDouble / nQ}%.2f")
    spark.stop()
  }
}
