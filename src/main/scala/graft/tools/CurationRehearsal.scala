package graft.tools

import org.apache.spark.sql.functions._

/** Dev harness for the COMPOSED curation pipeline's 100 TB posture: p04's
  * gate proves the six stages chain correctly at fixture scale; this runs
  * the same stage cores (the d19 line-dedup functions, the d06 banding +
  * verify + d09 connected components, the d16 gram overlap, the t10
  * prefix-sum packer) end-to-end on a SYNTHESIZED million-doc corpus with
  * the same planted structure (boilerplate template on evens, 80%-prefix
  * near-dup twins on every 10th id, self-overlap contamination on every
  * 97th) and reports per-stage wall + cardinalities. Every stage's scale
  * argument is individually rehearsed elsewhere (LineDedupRehearsal,
  * DedupRehearsal, DecontamRehearsal, PackRehearsal); the quantity this
  * adds is the COMPOSITION: stage outputs really are the next stage's
  * inputs at 1M+ docs, with no driver-sized frame between stages.
  *
  * Usage: runMain graft.tools.CurationRehearsal [nMillions]
  */
object CurationRehearsal {
  def main(args: Array[String]): Unit = {
    val nM = if (args.nonEmpty) args(0).toDouble else 1.0
    val n = (nM * 1e6).toLong
    val spark = graft.GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[curation-scale] $label%-42s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    import graft.operators.{Dedup, TextAnalysis}

    // ---- synthesize: ~60-token docs over a 5k-word vocab; evens carry the
    // 20-token template; every 10th doc gets an 80%-prefix twin at +n ids
    val template = Dedup.d19Template
    val corpus = timed(s"synthesize ${nM}M docs (+twins, +template)") {
      val base = spark.range(0, n, 1, 64)
        .select(col("id").as("doc_id"),
          array_join(expr(
            "transform(sequence(0, 59), i -> concat('w', pmod(xxhash64(id, i), 5000)))"),
            " ").as("text"))
      val g1 = base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + n).as("doc_id"),
          array_join(slice(split(col("text"), " "), 1, 48), " ").as("text"))
      val out = base.unionByName(g1)
        .select(col("doc_id"),
          when(col("doc_id") % 2 === 0, concat(lit(template), lit(" "), col("text")))
            .otherwise(col("text")).as("text"))
        .persist(mem)
      println(s"[curation-scale]   n_input = ${out.count()}")
      out
    }

    // ---- stage 1: quality verdict
    val filtered = timed("stage 1: quality filter") {
      val cnts = corpus.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("cnt"))
      val stats = cnts.groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_tokens"), max(col("cnt")).as("top_cnt"))
      val out = corpus.join(stats, Seq("doc_id"))
        .filter(col("n_tokens").between(30, 130) &&
          round(col("top_cnt").cast("double") / col("n_tokens"), 4) <= 0.2)
        .select(col("doc_id"), col("text")).persist(mem)
      println(s"[curation-scale]   n_after_filter = ${out.count()}")
      out
    }
    corpus.unpersist(false)

    // ---- stage 2: corpus line dedup (template df = ~n/2 >> 50)
    val cleaned = timed("stage 2: line dedup (hot-block strip)") {
      val out = Dedup.lineDedup(filtered, blockTokens = 10, maxDf = 50)
        .filter(col("text_clean") =!= "")
        .select(col("doc_id"), col("text_clean").as("text"), col("n_removed"))
        .persist(mem)
      val removed = out.agg(sum(col("n_removed"))).head().getLong(0)
      println(s"[curation-scale]   n_after_linededup = ${out.count()}, blocks_removed = $removed")
      out
    }
    filtered.unpersist(false)

    // ---- stage 3: near-dup keep-one (banding + verify + CC)
    val kept3 = timed("stage 3: minhash near-dup keep-one") {
      val sets = Dedup.shingleSets(cleaned.select(col("doc_id"), col("text")))
        .persist(mem)
      val banded = Dedup.kmBands(sets)
      val cand = banded.alias("a").join(banded.alias("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
      val edges = Dedup.jaccardVerify(cand, sets)
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      val labels = Dedup.connectedComponents(edges)
      val out = cleaned.join(
          labels.filter(col("node") =!= col("label")).select(col("node").as("doc_id")),
          Seq("doc_id"), "left_anti").persist(mem)
      sets.unpersist(false)
      println(s"[curation-scale]   n_after_neardup = ${out.count()}")
      out
    }
    cleaned.unpersist(false)

    // ---- stage 4: decontamination (8-gram overlap vs %97 eval extracts)
    val kept4 = timed("stage 4: decontaminate (8-gram overlap)") {
      val evalGrams = kept3.filter(col("doc_id") % 97 === 0)
        .select(concat_ws(" ", slice(split(col("text"), " "), 3, 20)).as("text"))
        .select(split(col("text"), " ").as("tk"))
        .select(explode(Dedup.wordNgrams(8)).as("g")).distinct()
      val contaminated = kept3.select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"), explode(Dedup.wordNgrams(8)).as("g"))
        .join(broadcast(evalGrams), Seq("g"))
        .select(col("doc_id")).distinct()
      val out = kept3.join(contaminated, Seq("doc_id"), "left_anti").persist(mem)
      println(s"[curation-scale]   n_after_decontam = ${out.count()}")
      out
    }
    kept3.unpersist(false)

    // ---- stage 5+6: pack + split
    timed("stage 5: pack (budget 2048) + stage 6: split") {
      val counted = kept4.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      val packed = TextAnalysis.packSequences(counted, budget = 2048L)
      val split10 = packed.withColumn("slot",
          pmod(graft.functions.CrossEngine.md5Hash60(col("doc_id")), lit(10L)))
        .groupBy(col("slot") < 8).agg(count(lit(1)).as("n"), max(col("seq_id")).as("max_seq"))
        .collect()
      split10.foreach(r => println(
        s"[curation-scale]   train?=${r.get(0)} n=${r.getLong(1)} max_seq=${r.getLong(2)}"))
    }

    // ---- the p11 last mile: token-budget select (the SHARED
    // Curation.tokenBudgetSelect kernel — one implementation for
    // p10/p11/this rehearsal) -> epoch shuffle -> token-balanced
    // 32-shard export, with the conservation facts asserted at volume
    val outDir = java.nio.file.Files.createTempDirectory("graft_cur_reh_")
    try {
      val sel0 = timed("last mile: token-budget select (T/2)") {
        val b = graft.operators.Curation.tokenBudgetSelect(
          kept4.select(col("doc_id"), col("text")))
        println(s"[curation-scale]   n_selected = ${b.selected.count()}, " +
          s"budget = ${b.budget} / tokens_in = ${b.tokensIn}")
        b
      }
      val (selected, tokensIn, budget) =
        (sel0.selected, sel0.tokensIn, sel0.budget)
      val manifest = timed("last mile: epoch shuffle + 32-shard export") {
        graft.operators.Curation.exportShards(selected, "epoch1", 32,
          s"$outDir/shards", s"$outDir/manifest").localCheckpoint(true)
      }
      timed("last mile: conservation checks") {
        val rows = manifest.collect().sortBy(_.getAs[Long]("shard_id"))
        val truth = selected.agg(count(lit(1)), sum(col("n_tokens")),
          max(col("n_tokens"))).head()
        val (nSel, tokSel, maxDoc) =
          (truth.getLong(0), truth.getLong(1), truth.getLong(2))
        assert(tokSel <= budget && tokSel * 2 > budget,
          s"selection $tokSel vs budget $budget looks degenerate")
        assert(rows.map(_.getAs[Long]("n_docs")).sum == nSel, "docs lost")
        assert(rows.map(_.getAs[Long]("shard_tokens")).sum == tokSel,
          "tokens lost")
        assert(rows.head.getAs[Long]("first_pos") == 0L &&
          rows.last.getAs[Long]("last_pos") == nSel - 1)
        rows.sliding(2).foreach {
          case Array(a, b) => assert(a.getAs[Long]("last_pos") + 1 ==
            b.getAs[Long]("first_pos"), "ranges do not tile")
          case _ =>
        }
        val target = (tokSel + 31) / 32
        val spread = rows.map(r =>
          math.abs(r.getAs[Long]("shard_tokens") - target)).max
        assert(spread <= maxDoc,
          s"token balance off: spread $spread vs max doc $maxDoc")
        println(s"[curation-scale]   32 shards, target $target tokens, " +
          s"max deviation $spread (<= 1 doc = $maxDoc); " +
          s"tokens_selected = $tokSel / tokens_in = $tokensIn")
      }
      sel0.release()
    } finally {
      graft.functions.CrossEngine.deleteRecursive(outDir)
    }
    spark.stop()
  }
}
