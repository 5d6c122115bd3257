package graft.tools

import org.apache.spark.sql.functions._

/** Scale rehearsal for the q60 blocked fuzzy-match stage: synthetic title
  * corpora well beyond the gate, to measure (a) candidate-pair volume under
  * blocking — the number the all-pairs alternative cannot survive — and
  * (b) wall time of the block join + in-block levenshtein verify, plus the
  * hot-block ceiling when one prefix floods.
  *
  * FIRST FINDING of this rehearsal (kept as the design note it produced):
  * blocking only works when the blocking key's cardinality scales with the
  * corpus. A low-cardinality prefix (the first draft used a 40-word vocab →
  * ~40 blocks of 25k rows each at 1M titles) reproduces the quadratic
  * disaster INSIDE each block — ~25 billion levenshtein calls, unusable.
  * Production blockers use high-cardinality keys (longer prefixes,
  * phonetic codes, q-gram buckets) and bound residual hot blocks exactly
  * like an LSH hot bucket — [[graft.operators.Dedup.capHotBuckets]] applies
  * unchanged (at the cost of in-block recall for the flooded key).
  *
  * Usage: runMain graft.tools.FuzzyJoinRehearsal [nTitles] [topo]
  * where topo is `uniform` (default: block cardinality ~ n/10 — average
  * block width ~10, the healthy regime) or `hot` (an extra 2,000 titles
  * share ONE blocking prefix — a bounded flood that measures the ceiling:
  * 2k×2k = 4M in-block verifies on one key).
  */
object FuzzyJoinRehearsal {
  def main(args: Array[String]): Unit = {
    val nTitles = if (args.length > 0) args(0).toLong else 1000000L
    val topo = if (args.length > 1) args(1) else "uniform"
    require(topo == "uniform" || topo == "hot", s"unknown topo '$topo'")
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic titles whose FIRST FOUR CHARS carry a high-cardinality
    // block code (base-36 in exactly 4 chars — 1.68M possible codes; the
    // second draft packed the code in decimal AFTER a constant letter, so
    // the 4-char prefix saw only its first 3 digits = 1,000 blocks of
    // 1,000 rows = 10^9 in-block verifies — the same lesson at one more
    // remove: the blocking key is what the JOIN sees, not what you meant)
    val nBlocks = math.max(math.min(nTitles / 10L, 1600000L), 1L)
    val words = (0 until 40).map(i => s"w${i}x$i")
    val wordArr = array(words.map(lit): _*)
    def wordAt(seed: Int) =
      element_at(wordArr, (pmod(xxhash64(col("id"), lit(seed)), lit(40)) + 1).cast("int"))
    val first = lpad(lower(conv(
      pmod(xxhash64(col("id"), lit(1)), lit(nBlocks)).cast("string"), 10, 36)), 4, "0")
    val base = spark.range(nTitles).select(col("id"),
      concat_ws(" ", first, wordAt(2), wordAt(3), wordAt(4), wordAt(5)).as("title"))
    val clean = (
      if (topo == "hot")
        base.unionByName(spark.range(nTitles, nTitles + 2000).select(col("id"),
          concat_ws(" ", lit("hotprefix"), wordAt(2), wordAt(3), wordAt(4), wordAt(5))
            .as("title")))
      else base
    ).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nClean = clean.count()
    // dirty side: delete one char past the blocking prefix (the q60 plant)
    val dirty = clean.select((col("id") + 1000000000L).as("dirty_id"),
      expr("""concat(substring(title, 1, 4 + cast(id % 3 as int)),
                     substring(title, 6 + cast(id % 3 as int), 100000))""").as("dtitle"))

    val t0 = System.nanoTime()
    val cand = dirty.join(clean,
        substring(col("dtitle"), 1, 4) === substring(col("title"), 1, 4))
      .select(col("dirty_id"), col("id"),
        levenshtein(col("dtitle"), col("title")).cast("long").as("dist"))
      .filter(col("dist") <= 2)
    val nCand = cand.count()
    val matched = cand.groupBy(col("dirty_id"))
      .agg(min(struct(col("dist"), col("id"))).as("m"))
    val nMatched = matched.count()
    val exact = matched.filter(col("m.id") === col("dirty_id") - 1000000000L).count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"[fuzzy-rehearsal] topo=$topo n=$nClean%d blocks=$nBlocks%d: " +
      f"verified pairs $nCand%d, matched $nMatched%d " +
      f"(exact-source ${100.0 * exact / nMatched}%.1f%%), $wall%.1f s")
    // every dirty row must match (its source always co-blocks at dist 1)
    assert(nMatched == nClean, s"$nMatched of $nClean dirty rows matched")
    clean.unpersist(false)
    spark.stop()
  }
}
