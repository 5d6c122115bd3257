package graft.tools

import org.apache.spark.sql.functions._

/** Scale rehearsal for the t28/t30 unigram-LM trainer: the gate corpus has
  * 32 distinct words; this synthesizes a MORPHEME-STRUCTURED distinct-word
  * table at production vocab scale (each word = 2-4 morphemes drawn from a
  * known 200-morpheme inventory, Zipf-ish counts) and runs the SAME
  * trainer with production-sized caps — the claim under test is the
  * docstring's scale posture: one substring explode + bounded TakeOrdered
  * to seed, then EM rounds that map the word table under a broadcast
  * model with exact-Long micro-counts. Recovery metric: how much of the
  * TRUE morpheme inventory the final vocabulary contains (the planted
  * structure the trainer is supposed to find), plus fertility vs the
  * character baseline.
  *
  * Usage: runMain graft.tools.UnigramRehearsal [nMillionWords] [soft] [vocabCap]
  */
object UnigramRehearsal {
  def main(args: Array[String]): Unit = {
    val nM = if (args.nonEmpty) args(0).toDouble else 1.0
    val soft = args.length > 1 && args(1) == "soft"
    val vocabCap = if (args.length > 2) args(2).toInt else 8000
    val n = (nM * 1e6).toLong
    val spark = graft.GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")
    val sp = spark
    import sp.implicits._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[unigram-scale] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // 200 deterministic 3-char morphemes (distinct by construction via index digits)
    val morphemes: Array[String] = Array.tabulate(200) { i =>
      val c1 = ('a' + i % 20).toChar
      val c2 = ('a' + (i / 20) % 10).toChar
      val c3 = ('a' + (i * 7) % 26).toChar
      s"$c1$c2$c3"
    }
    require(morphemes.distinct.length == 200)

    val words = timed(s"synthesize ${nM}M distinct words (2-4 morphemes each)") {
      val out = spark.range(0, n, 1, 32)
        .select(expr(s"""array_join(transform(sequence(1, 2 + CAST(pmod(xxhash64(id, 0), 3) AS INT)),
            k -> element_at(${morphemes.mkString("array('", "','", "')")},
              CAST(pmod(xxhash64(id, k), 200) AS INT) + 1)), '')""").as("w"),
          (lit(1L) + pmod(xxhash64(col("id"), lit(9)), lit(100L))).as("cnt"))
        .groupBy(col("w")).agg(sum(col("cnt")).as("cnt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[unigram-scale]   distinct words = ${out.count()}")
      out
    }
    val (model, lls) = timed(s"train (soft=$soft, vocabCap=$vocabCap, seedCap=${4 * vocabCap})") {
      graft.operators.TextAnalysis.unigramTrain(words, soft = soft,
        seedCap = 4 * vocabCap, vocabCap = vocabCap)
    }
    val learned = morphemes.count(model.contains)
    println(f"[unigram-scale] model pieces=${model.size} " +
      f"morphemes_recovered=$learned/200 negloglik ${lls.head}%.3e -> ${lls.last}%.3e")
    val wt = timed("apply: per-word token table") {
      val t = graft.operators.TextAnalysis.ugWordTokens(words.select(col("w")), model)
        .join(words, Seq("w"))
        .agg(sum(col("n_pieces") * col("cnt")).as("toks"),
          sum(length(col("w")) * col("cnt")).as("chars"),
          min(col("lossless")).as("lossless")).head()
      t
    }
    println(f"[unigram-scale] corpus fertility: ${wt.getLong(0)} tokens over " +
      f"${wt.getLong(1)} chars (chars/token ${wt.getLong(1).toDouble / wt.getLong(0)}%.2f, " +
      f"lossless=${wt.getBoolean(2)}; a character model would emit 1.00)")
    spark.stop()
  }
}
