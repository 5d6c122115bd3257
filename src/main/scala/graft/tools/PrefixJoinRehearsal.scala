package graft.tools

import org.apache.spark.sql.functions._

/** Scale rehearsal for d26's exact AllPairs prefix-filter join: a Zipf
  * synthetic corpus (the distribution prefix filtering is DESIGNED for —
  * each doc's rarest-first prefix lands on long-tail tokens with tiny
  * document frequency, so candidate buckets stay small even as the corpus
  * grows) with planted 90%-truncation twins on every 1000th doc. Measures
  * candidate volume, verified-pair volume, wall per stage, and planted
  * recall — which must be 100%: the algorithm is EXACT, so every plant
  * whose true Jaccard clears the threshold must surface.
  *
  * Doc model: 60 word draws via inverse-CDF Zipf(1) over a 5M-word id
  * space (word j drawn with p ~ 1/j): word = exp(u * ln V) from a
  * md5-derived uniform u per (doc, slot). A 1M-doc corpus carries ~60M
  * token draws; the prefix (the ~13 rarest per doc) sits at ranks above
  * ~V^0.78 where df is single-digit — the Bayardo/PPJoin argument
  * reproduced, not assumed.
  *
  * Usage: runMain graft.tools.PrefixJoinRehearsal [nThousandDocs ...]
  */
object PrefixJoinRehearsal {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(100, 250, 500)
    val spark = graft.GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[prefix-scale] $label%-42s $s%8.2f s")
      (r, s)
    }

    for (kDocs <- sizes) {
      val n = kDocs * 1000L
      println(s"[prefix-scale] ===== corpus = ${kDocs}k docs =====")
      // 60 Zipf(1) word draws per doc; word id = exp(u * ln(5e6))
      val lnV = math.log(5e6)
      val base = spark.range(0, n, 1, 64)
        .select(col("id").as("doc_id"),
          expr(
            s"""array_join(transform(sequence(0, 59), j ->
              concat('w', CAST(CAST(exp(
                (conv(substring(md5(concat(CAST(id AS STRING), '#', CAST(j AS STRING))), 1, 15), 16, 10)
                 / 1152921504606846976.0) * $lnV) AS BIGINT) AS STRING))), ' ')""")
            .as("text"))
      // plants: every 1000th doc contributes a 90%-prefix twin
      val twins = base.filter(col("doc_id") % 1000 === 0)
        .select((col("doc_id") + 100000000L).as("doc_id"),
          expr("array_join(slice(split(text, ' '), 1, 54), ' ')").as("text"))
      val docs = base.unionByName(twins)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nDocs = docs.count()
      val (pairs, _) = timed(s"prefix-filter join over $nDocs docs") {
        val p = graft.operators.Dedup.prefixFilterPairs(docs, 4, 5)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"[prefix-scale]   verified pairs = ${p.count()}")
        p
      }
      val (planted, _) = timed("planted-twin recall check") {
        // a twin's true J: 54-word prefix set vs 60-word set — compute the
        // truth side independently and demand every above-threshold plant
        // is IN the result (exactness)
        val truth = base.filter(col("doc_id") % 1000 === 0)
          .select(col("doc_id"),
            array_distinct(split(col("text"), " ")).as("full"),
            array_distinct(expr("slice(split(text, ' '), 1, 54)")).as("pref"))
          .withColumn("inter", size(array_intersect(col("full"), col("pref"))).cast("long"))
          .withColumn("sa", size(col("full")).cast("long"))
          .withColumn("sb", size(col("pref")).cast("long"))
          .filter(col("inter") * 9 >= (col("sa") + col("sb")) * 4)
          .select(col("doc_id"))
        val found = pairs
          .filter(col("doc_b") >= 100000000L &&
            col("doc_a") === col("doc_b") - 100000000L)
          .select(col("doc_a").as("doc_id"))
        val missed = truth.join(found, Seq("doc_id"), "left_anti").count()
        val expected = truth.count()
        (expected, missed)
      }
      println(s"[prefix-scale] plants above threshold = ${planted._1}, " +
        s"missed = ${planted._2} (exactness demands 0)")
      docs.unpersist()
      pairs.unpersist()
    }
    spark.stop()
  }
}
