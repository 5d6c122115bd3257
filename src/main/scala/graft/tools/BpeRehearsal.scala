package graft.tools

import org.apache.spark.sql.functions._

/** Dev harness for the BPE train+apply path's 100 TB posture: synthesize a
  * corpus whose DISTINCT-WORD vocabulary is large (the quantity that
  * governs both stages — t16's merge rounds aggregate the vocab table, and
  * t17's encode tokenizes each distinct word once before the corpus join),
  * learn the merge table, then encode the whole corpus into token ids and
  * report tokens/second.
  *
  * Word shape: "w<k>" over `vocabSize` distinct k, zipf-ish via double
  * hashing so the pair counts are skewed like real text. The claims under
  * measurement:
  *   - a merge round's cost is bounded by the VOCAB table, not the corpus
  *     (the corpus is touched once, to build word frequencies);
  *   - encode throughput is corpus-linear with a vocab-sized join side.
  *
  * Usage: runMain graft.tools.BpeRehearsal [nDocs] [vocabSize] [nMerges]
  */
object BpeRehearsal {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 1000000L
    val vocabSize = if (args.length > 1) args(1).toInt else 100000
    val nMerges = if (args.length > 2) args(2).toInt else 6

    val spark = graft.GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[bpe-scale] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // 40 tokens/doc; token k drawn zipf-ish: square a uniform hash fraction
    // so low k (short words, frequent pairs) dominate like real text
    val toks = (0 until 40).map { j =>
      val u = pmod(xxhash64(col("id"), lit(j)), lit(1000000L)).cast("double") / 1000000.0
      concat(lit("w"), (u * u * vocabSize).cast("long"))
    }
    val docs = timed(s"synthesize $nDocs docs (vocab ~$vocabSize)") {
      val d = spark.range(0, nDocs, 1, 32)
        .select(col("id").as("doc_id"), concat_ws(" ", toks: _*).as("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[bpe-scale] corpus: ${d.count()} docs, " +
        s"${d.select(explode(split(col("text"), " "))).distinct().count()} distinct words")
      d
    }

    val (merges, state) = timed(s"learn $nMerges merges (vocab-table rounds)") {
      graft.operators.TextAnalysis.bpeLearnMerges(docs, nMerges)
    }
    state.unpersist(false)
    merges.foreach { case (step, l, r, cnt) =>
      println(s"[bpe-scale] merge $step: '$l' + '$r' (weight $cnt)")
    }

    // one pass: the full encode including token_ids string assembly, folded
    // straight into the summary agg (persisting the multi-GB id strings a
    // second time measured cache spill, not the pipeline — a production run
    // writes this frame to parquet exactly once, the shape this measures)
    val totals = timed("encode corpus -> token ids") {
      graft.operators.TextAnalysis.bpeEncodeCorpus(
          docs, merges.map(m => (m._2, m._3)))
        .agg(sum(col("n_tokens")).as("toks"), count(lit(1)).as("docs"),
          sum(length(col("token_ids"))).as("chars")).head()
    }
    println(s"[bpe-scale] encoded ${totals.getLong(1)} docs -> " +
      s"${totals.getLong(0)} tokens (${totals.getLong(2) / 1e9} GB of ids)")
    docs.unpersist(false)
    spark.stop()
  }
}
