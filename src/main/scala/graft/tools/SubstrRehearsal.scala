package graft.tools

import org.apache.spark.sql.functions._

/** Scale rehearsal for exact duplicated-substring REMOVAL (d18,
  * `Dedup.exactSubstringRemove`) — the lane is structurally pair-free
  * (grouped gram count + boolean join back, never a doc×doc join), so the
  * d17-style pair blowup cannot happen; what CAN hurt it is the per-document
  * coverage mask. The r8 implementation scanned every duplicated start for
  * every token — O(len · k) row-local, i.e. a 100k-token fully-duplicated
  * document did ~10^10 comparisons in ONE task. The rehearsal plants exactly
  * that document class (plus a license-header flood and an
  * every-20th-token stripe that maximizes DISJOINT interval count) and
  * checks both wall time and exact removed-token counts.
  *
  * Plants, each with a closed-form expected `n_removed`:
  *  - FLOOD: nFlood docs open with one shared 30-token passage, then 10
  *    globally-unique tokens (unique tail ⇒ boundary grams are singletons,
  *    so coverage is exactly the passage: n_removed = 30 per doc, and ALL
  *    copies go — Lee et al. semantics).
  *  - IDENTICAL LONG PAIRS: pairs of 100k-token docs with identical text —
  *    every gram duplicated, ss has ~100k starts, the r8 worst case.
  *    n_removed = n_tokens = 100k.
  *  - STRIPED LONG PAIRS: 100k-token docs where tokens 13–20 of every
  *    20-token block are shared with the pair twin and the rest are
  *    globally unique — 5,000 DISJOINT coverage intervals per doc (the
  *    worst case for any interval-merging accumulator): n_removed =
  *    8 · len/20 = 40,000.
  *  - The random base corpus (40-token docs over an 800-word vocabulary,
  *    8-gram space 800^8 ≈ 1.7e23) must come through UNTOUCHED.
  *
  * Usage: runMain graft.tools.SubstrRehearsal [nDocs] [nFlood]
  */
object SubstrRehearsal {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 1000000L
    val nFlood = if (args.length > 1) args(1).toLong else 2000L
    val nLongPairs = 4
    val longLen = 100000
    val spark = graft.GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[substr-scale] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // base: 40 tokens/doc over an 800-word vocabulary (DedupRehearsal's
    // synthesis — no accidental cross-doc 8-gram sharing at this size)
    val baseToks = (0 until 40).map(j =>
      concat(lit("w"), pmod(xxhash64(col("id"), lit(j)), lit(800))))
    val base = spark.range(0, nDocs, 1, 32).toDF()
      .select(col("id").as("doc_id"), concat_ws(" ", baseToks: _*).as("text"))
    // license-header flood: shared 30-token passage + globally-unique tail
    val passage = (0 until 30).map(i => s"boiler$i").mkString(" ")
    val uniqueTail = (0 until 10).map(j =>
      concat(lit("u"), col("doc_id"), lit(s"_$j")))
    val flooded = base.withColumn("text",
      when(col("doc_id") < nFlood,
        concat_ws(" ", lit(passage) +: uniqueTail: _*))
        .otherwise(col("text")))
    // identical long pairs: twin ids 6e9+i / 6_500_000_000+i, same text
    // (tokens keyed by PAIR id, not doc id)
    def longDocs(idBase: Long, striped: Boolean) =
      spark.range(0, nLongPairs, 1, nLongPairs.toInt).toDF()
        .select((col("id") + idBase).as("doc_id"), col("id").as("pair"))
        .select(col("doc_id"), concat_ws(" ",
          transform(sequence(lit(1), lit(longLen)), j =>
            if (!striped)
              concat(lit("p"), col("pair"), lit("_"),
                pmod(xxhash64(col("pair"), j), lit(800)), lit("_"), j)
            else {
              // block = (j-1) / 20; offset = (j-1) % 20; offsets 12..19
              // (tokens 13..20 of the block) are shared within the pair
              val block = ((j - lit(1)) / lit(20)).cast("long")
              val off = pmod(j - lit(1), lit(20))
              when(off >= 12, concat(lit("s"), col("pair"), lit("_"), block, lit("_"), off))
                .otherwise(concat(lit("u"), col("doc_id"), lit("_"), j))
            })).as("text"))
    val longIdentical = longDocs(6000000000L, striped = false)
      .unionByName(longDocs(6500000000L, striped = false))
    val longStriped = longDocs(7000000000L, striped = true)
      .unionByName(longDocs(7500000000L, striped = true))
    val corpus = flooded.unionByName(longIdentical).unionByName(longStriped)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed(s"synthesize corpus($nDocs + flood $nFlood + ${4 * nLongPairs} long)") {
      corpus.count()
    }

    val out = timed(s"exactSubstringRemove(w=8)") {
      val o = graft.operators.Dedup.exactSubstringRemove(corpus, w = 8)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      o.count()
      o
    }

    val floodRm = out.filter(col("doc_id") < nFlood)
      .agg(min("n_removed"), max("n_removed"), count(lit(1))).as[(Long, Long, Long)].head()
    println(s"[substr-scale]   flood: n_removed min/max ${floodRm._1}/${floodRm._2} over ${floodRm._3} docs (expect 30/30)")
    assert(floodRm == ((30L, 30L, nFlood)),
      "every flood doc must lose exactly the 30-token passage — all copies go")

    val identRm = out.filter(col("doc_id") >= 6000000000L && col("doc_id") < 7000000000L)
      .agg(min("n_removed"), max("n_removed"), count(lit(1))).as[(Long, Long, Long)].head()
    println(s"[substr-scale]   identical 100k pairs: n_removed min/max ${identRm._1}/${identRm._2} (expect $longLen/$longLen)")
    assert(identRm == ((longLen.toLong, longLen.toLong, 2L * nLongPairs)),
      "fully-duplicated long docs must be fully removed")

    val stripeExpect = 8L * (longLen / 20)
    val stripeRm = out.filter(col("doc_id") >= 7000000000L)
      .agg(min("n_removed"), max("n_removed"), count(lit(1))).as[(Long, Long, Long)].head()
    println(s"[substr-scale]   striped 100k pairs: n_removed min/max ${stripeRm._1}/${stripeRm._2} (expect $stripeExpect; 5,000 disjoint intervals/doc)")
    assert(stripeRm == ((stripeExpect, stripeExpect, 2L * nLongPairs)),
      "striped long docs must lose exactly the shared blocks")

    val baseTouched = out
      .filter(col("doc_id") >= nFlood && col("doc_id") < nDocs && col("n_removed") > 0)
      .count()
    println(s"[substr-scale]   base docs touched: $baseTouched (expect 0)")
    assert(baseTouched == 0, "the random base corpus must pass through unchanged")

    spark.stop()
  }
}
