package graft

import org.apache.spark.sql.functions._

/** Spot-checks of the query surface on sf0.001 (full oracle equivalence runs
  * through graft.Verify + the driver's DuckDB gate; these pin fast local
  * invariants so `sbt test` catches regressions without DuckDB). */
class OperatorsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("every query has a unique name and every oracle key has a query") {
    val names = graft.Registry.all.map(_.name)
    assert(names.distinct.length === names.length, "duplicate query names")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("no-oracle set is exactly the documented randomized-twin entries") {
    // drift guard: every gate entry ships WITH a DuckDB oracle unless it is
    // one of the documented engine-hash randomized variants (each twinned
    // by an oracle-green or planted-recall entry). A new query landing
    // oracle-less — the r8 failure mode where breakage hid outside the
    // gate — fails here by name.
    val noOracle = graft.Registry.all.filter(_.oracle.isEmpty).map(_.name).toSet
    // r11: empty — the last 7 randomized-hash lanes now fold their raw
    // pipelines into recomputed contract + planted-recall booleans under
    // constant-true oracles, so EVERY gate entry carries an oracle.
    assert(noOracle === Set.empty[String])
  }

  test("q01 pricing summary: 6 (returnflag, linestatus) groups, counts add up") {
    val rows = run("q01_pricing_summary").collect()
    assert(rows.length === 6)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    // sf0.001 lineitem has 6000 rows; the shipdate predicate keeps ~half
    assert(total > 1000 && total <= 6000)
  }

  test("q08 per-customer top-k never exceeds k=3 and ranks are 1..3") {
    val df = run("q08_top_orders_per_cust")
    val byCust = df.groupBy("o_custkey").count().agg(max("count")).head().getLong(0)
    assert(byCust <= 3)
    assert(df.agg(min("rn"), max("rn")).head().toSeq === Seq(1L, 3L))
  }

  test("q14/q15/q16 set ops are consistent: |union| = |A| + |B\\A|") {
    val union = run("q14_union_nations").count()
    val intersect = run("q15_intersect_nations").count()
    val except = run("q16_except_nations").count()
    val a = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_nationkey")).distinct().count()
    val b = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select(col("s_nationkey")).distinct().count()
    assert(union === a + b - intersect)
    assert(except === a - intersect)
  }

  test("q24 as-of join: one row per matched event, picks the latest order <= ts") {
    val df = run("q24_asof_join")
    val dupEvents = df.groupBy("event_id").count().filter(col("count") > 1).count()
    assert(dupEvents === 0)
  }

  test("q25 top-k is ordered by totalprice desc") {
    val prices = run("q25_topk_orders").collect().map(_.getAs[Double]("o_totalprice"))
    assert(prices.length === 20)
    assert(prices.sameElements(prices.sorted(Ordering[Double].reverse)))
  }

  test("d01 exact dedup covers all docs") {
    assert(run("d01_exact_dedup").agg(sum("n_copies")).head().getLong(0) === 500)
  }

  test("d02 minhash LSH finds every planted near-duplicate pair") {
    // raw pair lane via the library entry point (the gate entry now folds
    // it into booleans; the raw frame remains minhashPairs' return)
    val pairs = operators.Dedup.minhashPairs(
        operators.Dedup.withPlantedDups(spark, sfDir)).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val expected = (0L until 500L by 10).map(i => (i, i + 10000000L)).toSet
    val found = expected.intersect(pairs)
    // planted copies keep ~90% of tokens => jaccard >= 0.5 => must be found
    assert(found.size >= (expected.size * 0.9).toInt,
      s"found only ${found.size}/${expected.size} planted pairs")
  }

  test("d03 simhash: planted pairs have small hamming distance") {
    val pairs = operators.Dedup.simhashPairs(
        operators.Dedup.withPlantedDups(spark, sfDir)).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val expected = (0L until 500L by 10).map(i => (i, i + 10000000L)).toSet
    assert(expected.intersect(pairs).size >= (expected.size * 0.6).toInt)
  }

  test("r11 no-oracle greening: all seven wrapped lanes report every boolean true") {
    // the wrapped gate entries reduce the randomized-hash lanes to
    // recomputed booleans; at the test SF every one must hold (thresholds
    // were pinned strictly inside NoOracleRecallScratch measurements)
    Seq("d02_minhash_lsh", "d03_simhash", "d05_embedding_neardup",
        "s02_knn_lsh", "s03_ann_ivf", "s08_ann_pq_trained", "s10_ann_ivfpq")
      .foreach { name =>
        val rows = run(name).collect()
        assert(rows.length === 1, s"$name must fold to one summary row")
        val row = rows.head
        row.schema.fields.zipWithIndex.foreach { case (f, i) =>
          assert(row.getBoolean(i), s"$name.${f.name} must be true")
        }
      }
  }

  test("s01 brute-force kNN: 10 neighbors per query, cosine in [-1,1], descending") {
    val rows = run("s01_knn_bruteforce").collect()
    assert(rows.length === 30)
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    byQuery.values.foreach { g =>
      val cos = g.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("cosine"))
      assert(cos.forall(c => c >= -1.0001 && c <= 1.0001))
      assert(cos.sameElements(cos.sorted(Ordering[Double].reverse)))
    }
  }

  test("s02 LSH candidates are a subset of brute-force ranking (same cosine)") {
    val bf = run("s01_knn_bruteforce").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("cosine"))
      .toMap
    val lsh = operators.Similarity.lshRanked(
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))).collect()
    lsh.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      bf.get(key).foreach(c => assert(math.abs(c - r.getAs[Double]("cosine")) < 1e-9))
    }
  }

  test("s03 quantizer training draws a seeded uniform sample, not a head slice") {
    // ids baked into slot 0 of the embedding reveal WHICH rows were drawn:
    // over a single sorted file, limit(cap) would only ever see ids < cap,
    // while the required seeded uniform sample spans the whole id range —
    // the 100 TB first-shard-bias failure mode this guards against.
    val tagged = spark.range(10000)
      .select(col("id").as("vec_id"),
        array(col("id").cast("float"), lit(1.0f)).as("embedding"))
      .orderBy("vec_id").coalesce(1)
    val sample = operators.Similarity.quantizerSample(tagged, "embedding", cap = 1000L, seed = 7L)
    val ids = sample.map(_(0))
    assert(math.abs(ids.length - 1000.0) < 200.0,
      s"expected ~cap rows from the bounded sample, got ${ids.length}")
    assert(ids.max > 9000.0 && ids.min < 1000.0,
      "sample must span the id range (a head slice would stop at id=cap)")
    assert(ids.count(_ > 5000.0) > 300, "upper half of the corpus under-sampled")
  }

  test("s08 trained PQ: Lloyd cuts quantization error; planted recall >= fixed codebooks") {
    import graft.operators.Similarity
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    // corpus with exact copies of the 3 query vectors planted at +1e6 (the
    // s09 pattern): an exact twin encodes to the query's own codes, so its
    // ADC is the global minimum and it must appear in the query's top-10
    val planted = emb.filter(col("vec_id") < 3)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val corpus = emb.unionByName(planted)

    val fixed = Similarity.pqFixedCodebooks(emb)
    val trained = Similarity.pqTrainedCodebooks(emb, seed = 42L)

    // Lloyd must not worsen mean quantization error on the training draw
    val sample = Similarity.quantizerSample(emb, "embedding", 20000L, 42L)
    def meanErr(books: Array[Array[Array[Double]]]): Double = {
      var tot = 0.0
      sample.foreach { v =>
        (0 until Similarity.pqM).foreach { m =>
          val sub = v.slice(m * Similarity.pqSubDim, (m + 1) * Similarity.pqSubDim)
          tot += books(m).map(cw =>
            cw.zip(sub).map { case (a, b) => (a - b) * (a - b) }.sum).min
        }
      }
      tot / sample.length
    }
    val errFixed = meanErr(fixed)
    val errTrained = meanErr(trained)
    assert(errTrained < errFixed,
      s"Lloyd refinement must cut quantization error: trained=$errTrained fixed=$errFixed")

    def plantedRecall(books: Array[Array[Array[Double]]]): Int =
      Similarity.pqTopK(corpus, books, topK = 10).collect()
        .count(r => r.getAs[Long]("neighbor_id") ===
          r.getAs[Long]("query_id") + 1000000L)
    val recallTrained = plantedRecall(trained)
    assert(recallTrained >= plantedRecall(fixed),
      "trained codebooks must not lose planted recall vs the fixed path")
    assert(recallTrained === 3, "every query must recover its exact planted twin")
  }

  test("s10 IVF+PQ: planted twins route to the query's list and win the ADC rank") {
    import graft.operators.Similarity
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    // an exact twin gets the query's coarse list AND its residual codes, so
    // its ADC equals the query's own quantization error — the global
    // minimum over every candidate in the probed lists
    val planted = emb.filter(col("vec_id") < 3)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val top = Similarity.ivfpqTopK(emb.unionByName(planted), topK = 10, seed = 42L)
      .collect()
    val recovered = top.count(r =>
      r.getAs[Long]("neighbor_id") === r.getAs[Long]("query_id") + 1000000L)
    assert(recovered === 3, s"only $recovered/3 planted twins recovered")
    // ranks are well-formed per query
    top.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("rn")).sorted.toSeq === (1L to rows.length).toSeq)
    }
  }

  test("s10 encode plan is nLists-independent: pqM+1 argmins, no CASE, at nLists=64") {
    // VERDICT r5 #1: the encode must NOT branch per list (the r5 CASE chain
    // embedded nLists×K×subDim literals — plan blowup at deployment list
    // counts). The residual-subtract form plans exactly 1 coarse-route +
    // pqM subspace NearestCentroid expressions at ANY list count.
    import org.apache.spark.sql.catalyst.expressions.CaseWhen
    import graft.operators.Similarity
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    def planCounts(nLists: Int) = {
      val model = Similarity.trainIvfPq(emb, seed = 42L, nLists = nLists)
      val codes = Similarity.ivfpqEncode(emb, model)
      val exprs = codes.queryExecution.optimizedPlan.collect { case p => p.expressions }.flatten
      (codes,
        exprs.flatMap(_.collect { case n: graft.functions.NearestCentroid => n }).length,
        exprs.flatMap(_.collect { case c: CaseWhen => c }).length)
    }
    val (_, nc8, case8) = planCounts(8)
    val (codes, nc64, case64) = planCounts(64)
    assert(case8 === 0 && case64 === 0,
      "encode plan must not contain a per-list CASE chain")
    assert(nc64 === nc8, s"NearestCentroid count must not grow with nLists ($nc8 -> $nc64)")
    // pqM subspace encodes + the coarse route, which the optimizer plans
    // twice (project output + the inferred isnotnull on the join key)
    assert(nc64 === Similarity.pqM + 2,
      s"expected ${Similarity.pqM + 2} NearestCentroid exprs, saw $nc64")
    // and the ENCODE itself (the output projection's code columns) is
    // exactly pqM argmins — one per subspace, none per list
    val encodeNcs = codes.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case n: graft.functions.NearestCentroid => n })
    assert(encodeNcs.length === Similarity.pqM,
      s"encode projection must hold exactly ${Similarity.pqM} argmins, saw ${encodeNcs.length}")
    // and the encode stays correct at the larger list count: codes complete,
    // in range, every list routed by some vector is a trained list id
    val rows = codes.collect()
    assert(rows.length === emb.count())
    rows.foreach { r =>
      assert((0 until 64).contains(r.getAs[Int]("list_id")))
      (0 until Similarity.pqM).foreach(m =>
        assert((0 until 16).contains(r.getAs[Int](s"c$m"))))
    }
  }

  test("s13 persisted index: codes partitioned by list_id, probe dynamically prunes") {
    import graft.operators.Similarity
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val out = java.nio.file.Files.createTempDirectory("graft_s13spec_").toString
    try {
      Similarity.ivfpqWriteIndex(emb, Similarity.trainIvfPq(emb, seed = 42L, nLists = 8), out)
      // physical layout: one directory per inverted list — probe IO is
      // corpus/nLists × nProbe by construction at any scale
      val dirs = new java.io.File(s"$out/codes").listFiles()
        .filter(_.isDirectory).map(_.getName).filter(_.startsWith("list_id="))
      assert(dirs.length === 8, s"expected 8 list_id partitions, saw ${dirs.toSeq}")
      // task-aligned build write: one data file per list, not tasks × lists
      dirs.foreach { d =>
        val files = new java.io.File(s"$out/codes/$d").listFiles()
          .map(_.getName).filter(_.endsWith(".parquet"))
        assert(files.length === 1, s"$d must hold exactly one build file, saw ${files.toSeq}")
      }
      val served = Similarity.ivfpqServe(spark, out, emb.filter(col("vec_id") < 3), nProbe = 2)
      // the probed lists are known before the scan, so the codes read must
      // carry a static IN partition filter — probe IO = nProbe directories
      val explained = served.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val partFilter = explained.linesIterator
        .find(_.contains("PartitionFilters:")).getOrElse("")
      assert(partFilter.contains("list_id") && partFilter.contains(" IN ("),
        s"serve scan must statically prune list_id partitions:\n$explained")
      assert(served.count() > 0)
    } finally {
      graft.functions.CrossEngine.deleteRecursive(java.nio.file.Paths.get(out))
    }
  }

  test("s14 index append: only the new batch's list directories gain files") {
    import graft.operators.Similarity
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val out = java.nio.file.Files.createTempDirectory("graft_s14spec_").toString
    try {
      val model = Similarity.trainIvfPq(emb, seed = 42L, nLists = 8)
      Similarity.ivfpqWriteIndex(emb, model, out)
      def filesPerList: Map[String, Set[String]] =
        new java.io.File(s"$out/codes").listFiles().filter(_.isDirectory)
          .map(d => d.getName -> d.listFiles().map(_.getName).toSet).toMap
      val before = filesPerList
      // append a small new batch encoded with the RELOADED (frozen) model
      val newBatch = emb.filter(col("vec_id") < 5)
        .select((col("vec_id") + 5000000L).as("vec_id"), col("embedding"))
      Similarity.ivfpqAppendCodes(spark, out, newBatch)
      val after = filesPerList
      val gained = after.keySet.filter(d =>
        (after(d) -- before.getOrElse(d, Set.empty)).nonEmpty)
      val newLists = Similarity.ivfpqEncode(newBatch, Similarity.ivfpqLoadModel(spark, out))
        .select(col("list_id")).distinct().collect()
        .map(r => s"list_id=${r.getInt(0)}").toSet
      // an append is O(new batch): untouched lists' directories are
      // byte-identical, and every touched one is a list the batch routed to
      assert(gained === newLists,
        s"append touched $gained but the batch routes to $newLists")
      // and the appended rows serve: each new vec appears among candidates
      // when probing its own source vector
      val served = Similarity.ivfpqServe(spark, out, emb.filter(col("vec_id") < 5), nProbe = 2)
      val newIds = served.filter(col("vec_id") >= 5000000L)
        .select(col("vec_id")).distinct().count()
      assert(newIds === 5, s"expected 5 appended vectors served, saw $newIds")
    } finally {
      graft.functions.CrossEngine.deleteRecursive(java.nio.file.Paths.get(out))
    }
  }

  test("t16 BPE merges: deterministic rounds, max pair count non-increasing") {
    val n = operators.TextAnalysis.nBpeMerges.toLong
    val rows = run("t16_bpe_merges").orderBy(col("step")).collect()
    assert(rows.map(_.getAs[Long]("step")).toSeq === (1L to n))
    // the chosen pair's count can only fall round over round: any new pair
    // created by a merge occurs at most as often as the sequence it came
    // from, which was itself bounded by the previous round's maximum
    val counts = rows.map(_.getAs[Long]("pair_count"))
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"pair counts must be non-increasing: ${counts.toSeq}")
    rows.foreach { r =>
      assert(r.getAs[String]("lhs").nonEmpty && r.getAs[String]("rhs").nonEmpty)
    }
    // determinism: a second run picks the identical merge table
    val again = run("t16_bpe_merges").orderBy(col("step")).collect()
    assert(again.map(_.toSeq).toSeq === rows.map(_.toSeq).toSeq)
  }

  test("t16 merge fold: property-matches the list-fold reference on random sequences") {
    val sp = spark
    import sp.implicits._
    def ref(syms: Seq[String], l: String, r: String): Seq[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, s) =>
        if (acc.nonEmpty && acc.last == l && s == r) acc.init :+ (l + r)
        else acc :+ s
      }
    val rng = new scala.util.Random(7)
    // alphabet includes multi-char symbols (the state after earlier merges)
    val alphabet = Vector("a", "b", "c", "ab", "ba", "aab")
    val cases = (0 until 200).map { _ =>
      val syms = Vector.fill(1 + rng.nextInt(12))(alphabet(rng.nextInt(alphabet.length)))
      val l = alphabet(rng.nextInt(alphabet.length))
      val r = alphabet(rng.nextInt(alphabet.length))
      (syms.mkString(" "), l, r, ref(syms, l, r).mkString(" "))
    }
    // group cases by merge pair so each (l, r) evaluates as one column pass
    cases.groupBy { case (_, l, r, _) => (l, r) }.foreach { case ((l, r), cs) =>
      val got = cs.map(c => (c._1, c._4)).toDF("s", "expected")
        .withColumn("merged", operators.TextAnalysis.bpeApplyMerge(col("s"), l, r))
        .filter(col("merged") =!= col("expected"))
        .collect()
      assert(got.isEmpty, s"fold mismatch for merge ($l,$r): ${got.take(3).mkString}")
    }
  }

  test("s40 l2DistSqLocal is bit-identical to the L2DistSq expression") {
    val sp = spark
    import sp.implicits._
    val rng = new scala.util.Random(17)
    val cases = (0 until 200).map { _ =>
      (Seq.fill(8)(rng.nextDouble() * 2 - 1), Seq.fill(8)(rng.nextDouble() * 2 - 1))
    }
    val expr = cases.toDF("a", "b")
      .select(graft.functions.VectorExpressions.l2DistSq(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    cases.zip(expr).foreach { case ((a, b), e) =>
      val local = graft.functions.VectorExpressions
        .l2DistSqLocal(a.toArray, b.toArray)
      assert(java.lang.Double.doubleToRawLongBits(local)
        === java.lang.Double.doubleToRawLongBits(e),
        s"l2DistSqLocal drifted from the expression on $a / $b")
    }
  }

  test("t16 row-local merge fold (applyMergeLocal) matches the list-fold reference") {
    // the learner's RDD loop applies merges with this Scala twin of the
    // bpeApplyMerge expression; drift between the two would make the
    // learned merge table diverge from the oracle's CTE chain
    def ref(syms: Seq[String], l: String, r: String): Seq[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, s) =>
        if (acc.nonEmpty && acc.last == l && s == r) acc.init :+ (l + r)
        else acc :+ s
      }
    val rng = new scala.util.Random(13)
    val alphabet = Vector("a", "b", "c", "ab", "ba", "aab")
    (0 until 500).foreach { _ =>
      val syms = Vector.fill(1 + rng.nextInt(12))(alphabet(rng.nextInt(alphabet.length)))
      val l = alphabet(rng.nextInt(alphabet.length))
      val r = alphabet(rng.nextInt(alphabet.length))
      assert(operators.TextAnalysis.applyMergeLocal(syms.mkString(" "), l, r)
        === ref(syms, l, r).mkString(" "),
        s"local fold mismatch on ${syms.mkString(" ")} under ($l,$r)")
    }
  }

  test("t17 apply == learn: chained merge fold reproduces t16's final vocab state") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val (merges, finalState) = operators.TextAnalysis.bpeLearnMerges(docs, 6)
    try {
      assert(merges.nonEmpty)
      // the encoder's apply path IS the learner's state evolution: folding
      // the learned merges over state0 must land on the identical per-word
      // symbol strings the loop ended with (both keyed by the same vocab)
      val applied = merges.foldLeft(
        operators.TextAnalysis.bpeState0(docs).select(col("w"), col("s"))) {
        case (acc, (_, l, r, _)) =>
          acc.withColumn("s", operators.TextAnalysis.bpeApplyMerge(col("s"), l, r))
      }
      assert(applied.count() === finalState.count())
      assert(applied.except(finalState.select(col("w"), col("s"))).count() === 0)
      // ...and the one-expression kernel t17 actually ships
      // (BpeApplyAllMerges) lands on the same state as the chained fold
      val kernel = operators.TextAnalysis.bpeState0(docs)
        .select(col("w"), graft.functions.BpeApply.applyAllMerges(col("s"),
          merges.map(m => (m._2, m._3))).as("s"))
      assert(kernel.except(finalState.select(col("w"), col("s"))).count() === 0)
    } finally finalState.unpersist(false)
  }

  test("t17 kernel: BpeApplyAllMerges property-matches the chained fold on random merge tables") {
    val sp = spark
    import sp.implicits._
    def refOne(syms: Seq[String], l: String, r: String): Seq[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, s) =>
        if (acc.nonEmpty && acc.last == l && s == r) acc.init :+ (l + r)
        else acc :+ s
      }
    val rng = new scala.util.Random(11)
    val alphabet = Vector("a", "b", "c", "ab", "ba", "aab")
    (0 until 20).foreach { _ =>
      // a random merge TABLE: interactions between merges are the point
      val merges = Vector.fill(1 + rng.nextInt(6))(
        (alphabet(rng.nextInt(alphabet.length)),
          alphabet(rng.nextInt(alphabet.length))))
      val cases = (0 until 30).map { _ =>
        val syms =
          Vector.fill(1 + rng.nextInt(12))(alphabet(rng.nextInt(alphabet.length)))
        val expect = merges.foldLeft(syms: Seq[String]) {
          case (st, (l, r)) => refOne(st, l, r) }
        (syms.mkString(" "), expect.mkString(" "))
      }
      // local kernel vs the list-fold reference
      cases.foreach { case (s, expect) =>
        assert(graft.functions.BpeApply.applyAll(s,
          merges.map(m => Array(m._1, m._2)).toArray) === expect,
          s"local kernel mismatch on '$s' under $merges")
      }
      // column expression (codegen path) vs the same reference
      val bad = cases.toDF("s", "expected")
        .withColumn("got",
          graft.functions.BpeApply.applyAllMerges(col("s"), merges))
        .filter(col("got") =!= col("expected")).collect()
      assert(bad.isEmpty, s"expression mismatch under $merges: ${bad.take(3).mkString}")
    }
  }

  test("t20 gopher repetition: coverage semantics exact on planted docs") {
    val sp = spark
    import sp.implicits._
    // doc 1: maximal self-overlap — occurrence-weighted top-2-gram mass
    // would be 5x2/6 > 1; coverage must pin exactly 1.0
    // doc 2: 40 distinct 3-char tokens — all dup fracs 0, passes every rule
    // doc 3: a 5-token phrase repeated once + distinct tail; dup5 coverage
    // is the 10 phrase positions' chars over 31 total
    val docs = Seq(
      (1L, "z z z z z z"),
      (2L, (0 until 40).map(i => f"t$i%02d").mkString(" ")),
      (3L, "p q r s t p q r s t u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"))
      .toDF("doc_id", "text")
    val got = operators.TextAnalysis.gopherRepetition(docs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    def f(id: Long, c: String) = got(id).getAs[Double](c)
    def approx(a: Double, b: Double) = math.abs(a - b) < 1e-9
    // doc 1: every fraction with grams present is exactly 1.0
    for (c <- Seq("top2_frac", "top3_frac", "top4_frac", "dup5_frac"))
      assert(approx(f(1, c), 1.0), s"doc1 $c = ${f(1, c)}")
    // 6-gram occurs once (not duplicated); 7..10-grams don't exist
    for (c <- Seq("dup6_frac", "dup7_frac", "dup8_frac", "dup9_frac", "dup10_frac"))
      assert(approx(f(1, c), 0.0), s"doc1 $c = ${f(1, c)}")
    assert(!got(1L).getAs[Boolean]("gopher_rep_pass"))
    // doc 2: single-occurrence top grams cover n tokens of 3 chars / 120
    assert(approx(f(2, "top2_frac"), 0.05) && approx(f(2, "top3_frac"), 0.075)
      && approx(f(2, "top4_frac"), 0.1))
    for (k <- 5 to 10) assert(approx(f(2, s"dup${k}_frac"), 0.0))
    assert(got(2L).getAs[Boolean]("gopher_rep_pass"))
    // doc 3: hand-computed coverages over 31 token chars; the repeated
    // phrase's two occurrences cover 10 single-char positions
    assert(approx(f(3, "top2_frac"), 0.129), s"${f(3, "top2_frac")}")
    assert(approx(f(3, "top3_frac"), 0.1935), s"${f(3, "top3_frac")}")
    assert(approx(f(3, "top4_frac"), 0.2581), s"${f(3, "top4_frac")}")
    assert(approx(f(3, "dup5_frac"), 0.3226), s"${f(3, "dup5_frac")}")
    for (k <- 6 to 10) assert(approx(f(3, s"dup${k}_frac"), 0.0))
    assert(!got(3L).getAs[Boolean]("gopher_rep_pass"))
  }

  test("t17 output: n_tokens equals the emitted id-sequence length") {
    val bad = run("t17_bpe_apply")
      .filter(size(split(col("token_ids"), " ")) =!= col("n_tokens")).count()
    assert(bad === 0)
  }

  test("m05 image decode: PNG roundtrip is pixel-exact and really runs ImageIO") {
    // the oracle pins the SUMS; this pins the mechanism — the payload is a
    // real PNG (magic bytes) and the decoded raster equals the generator
    // pixel-for-pixel (losslessness is what makes the oracle valid)
    val (w, h) = (32, 16)
    val id = 4242L
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
      val g = ((id * 17 + x * 3 + y * 5) % 256).toInt
      val b = ((id * 7 + x * 11 + y * 29) % 256).toInt
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    assert(png.take(8).map(_ & 0xff).toSeq ===
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a), "not a PNG payload")
    val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(dec.getWidth === w && dec.getHeight === h)
    for (y <- 0 until h; x <- 0 until w)
      assert((dec.getRGB(x, y) & 0xffffff) === (img.getRGB(x, y) & 0xffffff),
        s"PNG roundtrip must be lossless; pixel ($x,$y) differs")
    // and the gate entry's dims come from the decoder, not constants
    val row = run("m05_image_decode").filter(col("doc_id") === 0).head()
    assert(row.getAs[Long]("width") === w.toLong)
    assert(row.getAs[Long]("height") === h.toLong)
  }

  test("m06 audio decode: WAV roundtrip is sample-exact and really runs AudioSystem") {
    // the oracle pins the SUMS; this pins the mechanism — the payload is a
    // real RIFF/WAVE container and the decoded int16 stream equals the
    // generator sample-for-sample (PCM losslessness validates the oracle)
    val n = 240
    val id = 4242L
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, false)
    val pcm = new Array[Byte](2 * n)
    for (t <- 0 until n) {
      val v = ((id * 131 + t * 17) % 65536 - 32768).toInt
      pcm(2 * t) = (v & 0xff).toByte
      pcm(2 * t + 1) = ((v >> 8) & 0xff).toByte
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val wav = baos.toByteArray
    assert(new String(wav.take(4), "US-ASCII") === "RIFF", "not a RIFF payload")
    assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE", "not a WAVE container")
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(in.getFrameLength === n.toLong)
    assert(in.getFormat.getSampleRate === 8000f)
    val raw = in.readAllBytes()
    in.close()
    for (t <- 0 until n) {
      val got = ((raw(2 * t) & 0xff) | (raw(2 * t + 1) << 8)).toShort.toInt
      val want = ((id * 131 + t * 17) % 65536 - 32768).toInt
      assert(got === want, s"WAV roundtrip must be lossless; sample $t differs")
    }
    // and the gate entry's rate/length come from the decoder, not constants
    val row = run("m06_audio_decode").filter(col("doc_id") === 0).head()
    assert(row.getAs[Long]("sample_rate") === 8000L)
    assert(row.getAs[Long]("n_samples") === n.toLong)
    assert(row.getAs[Long]("duration_us") === 30000L)
  }

  test("m07 image near-dup: every planted one-pixel twin pairs with its source") {
    val rows = run("m07_image_neardup").collect()
    val found = rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val sources = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 37 === 0).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(sources.nonEmpty)
    // a one-pixel perturbation of a SAMPLED pixel moves at most the one
    // dHash bit its grid cell feeds -> Hamming <= 1 -> at least 3 of the
    // 4 bands still collide, so recall is structural, not probabilistic
    sources.foreach { id =>
      assert(found.contains((id, id + 80000000L)),
        s"planted twin pair ($id, ${id + 80000000L}) must surface")
    }
    rows.foreach(r => assert(r.getAs[Long]("hamming") <= 2L))
    // near-dup, not exact-dup: some planted twins genuinely differ in a bit
    // (the perturbed comparison flips) yet still pair — the perceptual-hash
    // property a byte-level hash lacks
    val twinRows = rows.filter(r =>
      sources.contains(r.getAs[Long]("doc_a")) &&
        r.getAs[Long]("doc_b") === r.getAs[Long]("doc_a") + 80000000L)
    assert(twinRows.nonEmpty)
  }

  test("m08 audio near-dup: every planted one-sample twin pairs with its source") {
    val rows = run("m08_audio_neardup").collect()
    val found = rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val sources = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 41 === 0).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(sources.nonEmpty)
    // a one-sample perturbation moves only window 0's energy, so only
    // fingerprint bit 0 can flip -> Hamming <= 1 -> at least 3 of the 4
    // bands still collide: recall is structural, not probabilistic
    sources.foreach { id =>
      assert(found.contains((id, id + 90000000L)),
        s"planted twin pair ($id, ${id + 90000000L}) must surface")
    }
    rows.foreach(r => assert(r.getAs[Long]("hamming") <= 2L))
  }

  test("m09 video near-dup: every planted frame-0-edited twin pairs with its source") {
    val rows = run("m09_video_neardup").collect()
    val found = rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    // twins planted on the 1-in-3 decode slice (the d21 sampling knob)
    val sources = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 43 === 0 && col("doc_id") % 3 === 0)
      .select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(sources.nonEmpty)
    // the twin's edit touches only frame 0, so frames 1-3 hash
    // bit-identically: >= 3 shared frame positions is structural
    sources.foreach { id =>
      assert(found.contains((id, id + 70000000L)),
        s"planted twin pair ($id, ${id + 70000000L}) must surface")
    }
    rows.foreach { r =>
      val n = r.getAs[Long]("n_shared_frames")
      assert(n >= 3L && n <= 4L)
    }
    // the temporal granularity is the point: at least one twin pair must
    // share only 3 of 4 frames (the edited frame 0 hash actually moved) —
    // a whole-file hash would call these videos unrelated
    val twinShared = rows.filter(r =>
      sources.contains(r.getAs[Long]("doc_a")) &&
        r.getAs[Long]("doc_b") === r.getAs[Long]("doc_a") + 70000000L)
      .map(_.getAs[Long]("n_shared_frames"))
    assert(twinShared.nonEmpty)
  }

  test("m10 image dedup canonicalization: twin clusters keep the min-id original") {
    val rows = run("m10_image_dedup_canonical").collect()
    // twins planted on the 1-in-3 decode slice (the d21 sampling knob)
    val sources = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 37 === 0 && col("doc_id") % 3 === 0)
      .select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(sources.nonEmpty)
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    sources.foreach { id =>
      // source and twin land in the same cluster, labeled by the source
      // (min id), and exactly the source is the canonical keeper
      val (src, twin) = (byId(id), byId(id + 80000000L))
      assert(src.getAs[Long]("cluster_id") === id)
      assert(twin.getAs[Long]("cluster_id") === id)
      assert(src.getAs[Boolean]("is_canonical"))
      assert(!twin.getAs[Boolean]("is_canonical"))
    }
    // every cluster keeps exactly one canonical representative
    rows.groupBy(_.getAs[Long]("cluster_id")).foreach { case (_, members) =>
      assert(members.count(_.getAs[Boolean]("is_canonical")) === 1)
      assert(members.forall(_.getAs[Long]("cluster_size") === members.length.toLong))
    }
  }

  test("st13 streaming image ingest: every perturbed arrival pairs with its source") {
    val rows = run("st13_stream_image_ingest").collect()
    val found = rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val arrivals = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 === 0).select(col("doc_id"))
      .collect().map(_.getLong(0))
    assert(arrivals.nonEmpty)
    // the arrival is a one-pixel perturbation of its corpus source, so it
    // sits within Hamming 1 and >= 3 of 4 bands co-bucket: recall is
    // structural, the ingest filter can never wave a re-upload through
    arrivals.foreach { id =>
      assert(found.contains((id, id + 80000000L)),
        s"arrival ${id + 80000000L} must pair with its corpus source $id")
    }
    rows.foreach(r => assert(r.getAs[Long]("hamming") <= 2L))
  }

  test("st14 streaming audio ingest: every perturbed arrival pairs with its source") {
    val rows = run("st14_stream_audio_ingest").collect()
    val found = rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val arrivals = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 === 0).select(col("doc_id"))
      .collect().map(_.getLong(0))
    assert(arrivals.nonEmpty)
    // the arrival perturbs ONE sample of its corpus source, which moves
    // only window 0's energy, so only fingerprint bit 0 can flip: the
    // re-upload sits within Hamming 1 and >= 3 of 4 bands co-bucket —
    // recall is structural, the ingest filter can never wave it through
    arrivals.foreach { id =>
      assert(found.contains((id, id + 90000000L)),
        s"arrival ${id + 90000000L} must pair with its corpus source $id")
    }
    rows.foreach(r => assert(r.getAs[Long]("hamming") <= 2L))
  }

  test("m11 cross-codec dHash: JPEG q90 re-encode survives within Hamming 2, twins pair") {
    val row = run("m11_jpeg_crosscodec").head()
    assert(row.getAs[Long]("n_assets") > 0)
    assert(row.getAs[Long]("n_twins") > 0, "the 1-in-29 twin slice must be non-empty")
    // the published perceptual-hash claim, on REAL lossy bytes: hashing the
    // decoded JPEG must land within the band-join pairing bound of the
    // PNG-master hash for EVERY asset...
    assert(row.getAs[Boolean]("all_jpeg_hamming_le2"))
    // ...and a perturbed re-upload hashed from JPEG still pairs with its
    // PNG-hashed corpus source (the cross-codec re-upload catch)
    assert(row.getAs[Boolean]("all_twins_pair_cross_codec"))
  }

  test("st15 streaming video ingest: every frame-0-edited arrival pairs with its source") {
    val rows = run("st15_stream_video_ingest").collect()
    val found = rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val arrivals = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 === 0).select(col("doc_id"))
      .collect().map(_.getLong(0))
    assert(arrivals.nonEmpty)
    // the arrival's frame 0 carries the one-pixel edit; frames 1-3 are
    // bit-identical to the corpus source, so >= 3 of 4 positions match
    // structurally — the streaming aggregate must count them
    arrivals.foreach { id =>
      assert(found.contains((id, id + 70000000L)),
        s"arrival ${id + 70000000L} must share >= 3 frame hashes with its source $id")
    }
    rows.foreach(r => assert(r.getAs[Long]("n_shared_frames") >= 3L))
  }

  test("t22 ccnet buckets: per-lang tercile ordering holds, all buckets populated") {
    val rows = run("t22_ccnet_buckets").collect()
    assert(rows.nonEmpty)
    val scored = run("t21_bigram_logprob").collect()
      .count(_.getAs[Long]("n_bigrams") > 0)
    // every scored doc lands in exactly one bucket, scoreless docs dropped
    assert(rows.length === scored)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val byBucket = rs.groupBy(_.getAs[String]("bucket"))
        .view.mapValues(_.map(_.getAs[Double]("avg_bigram_logprob10"))).toMap
      assert(byBucket.keySet === Set("head", "middle", "tail"),
        s"$lang: all three buckets must be populated")
      // higher log-prob = lower perplexity = head; buckets are ordered by
      // construction (cutoff comparison), so the ranges must not cross
      assert(byBucket("head").min >= byBucket("middle").max,
        s"$lang: head scores must dominate middle")
      assert(byBucket("middle").min >= byBucket("tail").max,
        s"$lang: middle scores must dominate tail")
      // terciles: no bucket can hold more than ~60% of a language's docs
      // (exact thirds modulo ties at the interpolated cutoffs)
      byBucket.foreach { case (b, vs) =>
        assert(vs.length <= math.ceil(rs.length * 0.6),
          s"$lang/$b: bucket holds ${vs.length} of ${rs.length} docs")
      }
    }
  }

  test("t18 gopher rules: keep is exactly the conjunction; both verdicts occur") {
    val rows = run("t18_gopher_rules").collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val expect = r.getAs[Long]("n_words") >= 50 && r.getAs[Long]("n_words") <= 100000 &&
        r.getAs[Double]("mean_word_len") >= 3.0 && r.getAs[Double]("mean_word_len") <= 10.0 &&
        r.getAs[Double]("symbol_ratio") <= 0.1 &&
        r.getAs[Double]("alpha_word_frac") >= 0.8 &&
        r.getAs[Long]("stop_hits") >= 2
      assert(r.getAs[Boolean]("keep") === expect, s"keep != rule conjunction for $r")
    }
    // the rules discriminate on this corpus (neither all-pass nor all-fail)
    assert(rows.exists(_.getAs[Boolean]("keep")))
    assert(rows.exists(!_.getAs[Boolean]("keep")))
  }

  test("t19 temperature mix: copies hit targets exactly, small sources flattened up") {
    val rows = run("t19_temperature_mix").collect()
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    bySrc.foreach { case (src, rs) =>
      val target = rs.head.getAs[Long]("target_docs")
      // the copy-count closed form must hit the integer target EXACTLY:
      // target/n full epochs + one extra for the target%n lowest md5 ranks
      assert(rs.map(_.getAs[Long]("n_copies")).sum === target,
        s"$src: sum of n_copies must equal target_docs")
    }
    val stats = bySrc.values.map { rs =>
      (rs.head.getAs[Long]("n_src"), rs.head.getAs[Long]("target_docs")) }.toSeq
    val (nSmall, tSmall) = stats.minBy(_._1)
    val (nBig, tBig) = stats.maxBy(_._1)
    assert(nSmall < nBig, "the planted skew must produce unequal source sizes")
    // α = 0.5 flattening signature: sampling rate decreases with source
    // size (exact integer cross-multiplication, no float compare)
    assert(BigInt(tSmall) * BigInt(nBig) > BigInt(tBig) * BigInt(nSmall),
      s"small source rate ($tSmall/$nSmall) must exceed big source rate ($tBig/$nBig)")
    // and both directions of the reweighting actually occur on this corpus
    assert(rows.exists(_.getAs[Long]("n_copies") >= 2L), "upsampling must occur")
    assert(tBig < nBig, "downsampling must occur")
  }

  test("t01 token counts: distinct <= total, chars consistent") {
    val bad = run("t01_token_counts")
      .filter(col("n_distinct_tokens") > col("n_tokens")).count()
    assert(bad === 0)
  }

  test("m01 media features: stub decode emits unit-sum histograms") {
    // the gate query projects scalars (driver can't sort arrays); the
    // unit-sum invariant survives as f_sum ~= 1 and f1 in [0, 1]
    val rows = run("m01_media_features").collect()
    assert(rows.length === 500)
    rows.take(20).foreach { r =>
      assert(math.abs(r.getAs[Double]("f_sum") - 1.0) < 1e-3)
      val f1 = r.getAs[Double]("f1")
      assert(f1 >= 0.0 && f1 <= 1.0)
    }
    // the raw decode contract: 16-wide unit-sum histogram
    val f = operators.Multimodal.stubDecode("the quick brown fox".getBytes("UTF-8"), 16)
    assert(f.length === 16)
    assert(math.abs(f.map(_.toDouble).sum - 1.0) < 1e-6)
  }

  test("q29 HLL estimate within 10% of exact distinct count") {
    // gate query emits exact counts + the 5%-bound booleans; the raw
    // estimate check runs here on the source table directly
    val r = run("q29_approx_distinct").head()
    assert(r.getAs[Boolean]("parts_within_5pct"))
    assert(r.getAs[Boolean]("orders_within_5pct"))
    val li = graft.sources.Tables.lineitem(spark, sfDir)
    val raw = li.agg(
      approx_count_distinct(col("l_partkey")).as("ap"),
      countDistinct(col("l_partkey")).as("ep")).head()
    val (ap, ep) = (raw.getAs[Long]("ap").toDouble, raw.getAs[Long]("ep").toDouble)
    assert(math.abs(ap - ep) / ep < 0.10, s"parts: approx $ap vs exact $ep")
  }

  test("t06 scale_coo: scaled values are clipped to [-10, 10] and centered-ish") {
    val df = run("t06_scale_coo")
    assert(df.filter(col("scaled") > 10.0 || col("scaled") < -10.0).count() === 0)
    assert(df.count() > 0)
  }

  test("h05 theta diversity query reports a positive chi2 drop") {
    val r = run("h05_theta_diversity").head()
    assert(r.getAs[Boolean]("chi2_drop_positive"),
      s"theta=3 should reduce chi2: ${r.toSeq}")
    assert(r.getAs[Boolean]("chi2_finite"))
    assert(r.getAs[Boolean]("chi2_nonnegative"))
  }

  test("q45 as-of maxby matches q24 and plans as partial agg, not a window sort") {
    val viaWindow = run("q24_asof_join").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("o_orderkey"))).toMap
    val viaMaxBy = run("q45_asof_maxby").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("o_orderkey"))).toMap
    assert(viaWindow === viaMaxBy)
    // scale contract: the join expansion pipelines into a partial
    // aggregation — no Window operator (which would shuffle + sort the
    // full expansion first)
    val plan = SparkEntry.queries("q45_asof_maxby")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "q45 must not plan a window sort")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"))
  }

  test("q45 shape survives a skewed user history (partial agg eats the expansion)") {
    // one user with 5,000 orders x 100 events -> a 500k-pair expansion that
    // the window form would shuffle+sort; the aggregation form folds it
    // map-side into 100 partial maxima
    val sp = spark
    import sp.implicits._
    val orders = (1 to 5000).map(i =>
      (1L, i.toLong, java.sql.Date.valueOf("2020-01-01"), i * 1.0))
      .toDF("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    val events = (1 to 100).map(i =>
      (i.toLong, 1L, java.sql.Timestamp.valueOf("2021-01-01 00:00:00")))
      .toDF("event_id", "user_id", "ts")
    val res = events
      .join(orders, col("o_custkey") === col("user_id") &&
        col("o_orderdate") <= col("ts").cast("date"))
      .groupBy(col("event_id"))
      .agg(max_by(struct(col("o_orderkey"), col("o_totalprice")),
        struct(col("o_orderdate"), col("o_orderkey"))).as("best"))
    assert(res.count() === 100)
    // every event resolves to the max-tiebreak order despite the skew
    assert(res.select(col("best.o_orderkey")).distinct().collect()
      .map(_.getLong(0)).toSeq === Seq(5000L))
    val plan = res.queryExecution.executedPlan.toString
    // the expansion folds into a partial max_by BEFORE the exchange
    assert(!plan.contains("Window") && plan.contains("partial_max_by"))
  }

  test("q38 seeded sample keeps roughly the requested fraction") {
    val n = run("q38_sample").head().getAs[Long]("n_sampled").toDouble
    assert(n > 6000 * 0.05 && n < 6000 * 0.15, s"sampled $n of 6000 at 10%")
    // seeded Bernoulli .sample() fraction contract (the engine-RNG path
    // the gate query's deterministic md5 sample replaced)
    val li = graft.sources.Tables.lineitem(spark, sfDir)
    val total = li.count().toDouble
    val s = li.sample(withReplacement = false, 0.1, seed = 42L).count().toDouble
    assert(s > total * 0.05 && s < total * 0.15, s"sampled $s of $total at 10%")
  }

  test("d05 embedding near-dup finds every planted exact copy") {
    val pairs = operators.Dedup.embeddingNeardupPairs(
        operators.Dedup.withPlantedVecDups(spark, sfDir)).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    val expected = (0L until 20L).map(i => (i, i + 1000000L)).toSet
    // exact copies share every hyperplane sign -> always co-bucketed
    assert(expected.subsetOf(pairs), s"missing ${expected.diff(pairs)}")
  }

  test("q36 map extraction equals direct conditional counts") {
    val viaMap = run("q36_map_funcs").collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_click")).toMap
    val direct = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_type") === "click")
      .groupBy("user_id").count().collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("count")).toMap
    direct.foreach { case (u, n) => assert(viaMap.getOrElse(u, 0L) === n) }
  }

  test("custom expressions are SQL-registrable and match the Column API") {
    graft.functions.GraftFunctions.register(spark)
    spark.read.parquet(s"$sfDir/embeddings.parquet").createOrReplaceTempView("emb_sql")
    val viaSql = spark.sql(
      "SELECT vec_id, round(l2_norm_f(embedding), 6) AS n FROM emb_sql ORDER BY vec_id LIMIT 5")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val viaCol = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"),
        round(graft.functions.VectorExpressions.l2NormF(col("embedding")), 6).as("n"))
      .orderBy("vec_id").limit(5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(viaSql.sameElements(viaCol))
  }

  test("harmony local path is deterministic run-to-run") {
    val cells = spark.read.parquet(s"$sfDir/embeddings.parquet").select(
      col("vec_id").as("cell_id"), col("embedding").as("features"),
      col("label").cast("string").as("batch"))
    import graft.harmony._
    def fitOnce() = Harmony.fit(cells, Seq("batch"),
      HarmonyOptions(nclust = Some(8), maxIterHarmony = 1, maxIterCluster = 2,
        earlyStop = false)).cells.collect()
      .map(c => c.cellId -> c.zCorr.toSeq).toMap
    val a = fitOnce()
    val b = fitOnce()
    assert(a.keySet === b.keySet)
    a.foreach { case (id, z) => assert(z === b(id), s"cell $id differs across runs") }
  }

  test("stub decode is deterministic") {
    val payload = "hello world".getBytes("UTF-8")
    val a = graft.operators.Multimodal.stubDecode(payload, 16)
    val b = graft.operators.Multimodal.stubDecode(payload, 16)
    assert(a.sameElements(b))
  }

  test("t08 repetition: fractions in [0,1], dup bigrams <= dup tokens signal sanity") {
    val rows = run("t08_repetition").collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val top = r.getAs[Double]("top_token_frac")
      val dup = r.getAs[Double]("dup_bigram_frac")
      assert(top > 0 && top <= 1.0)
      assert(dup >= 0 && dup < 1.0)
      assert(r.getAs[Long]("n_distinct_tokens") <= r.getAs[Long]("n_tokens"))
    }
  }

  test("t09 pii: planted emails/phones are found and redacted, others untouched") {
    val rows = run("t09_pii_redact").collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val red = r.getAs[String]("redacted")
      assert(r.getAs[Long]("n_emails") === (if (id % 7 == 0) 1L else 0L))
      assert(r.getAs[Long]("n_phones") === (if (id % 11 == 0) 1L else 0L))
      assert(red.contains("<EMAIL>") === (id % 7 == 0))
      assert(red.contains("<PHONE>") === (id % 11 == 0))
      assert(!red.contains("@") && !red.contains("555-"))
    }
  }

  test("q46/q48 KMV sketch: estimate within 20% of exact; merge equals single-pass") {
    val single = run("q46_kmv_ndv").head()
    // at sf0.001 NDV(l_partkey)=200 < k=256: the bottom set IS the full set
    assert(single.getAs[Long]("k") === math.min(256L, single.getAs[Long]("exact_ndv")))
    assert(single.getAs[Double]("rel_err") < 0.20,
      s"KMV k=256 should land within ~2/sqrt(k)=12.5% (3 sigma ~ 19%); got ${single.getAs[Double]("rel_err")}")
    // partition-wise merge must reconstruct the identical global bottom-k:
    // the merged kth_min and estimate are bit-equal to the single-pass sketch
    val merged = run("q48_kmv_merge").head()
    assert(merged.getAs[Long]("kth_min") === single.getAs[Long]("kth_min"),
      "union-merge of per-partition bottom-k sets must equal the global bottom-k")
    assert(merged.getAs[Double]("est_ndv") === single.getAs[Double]("est_ndv"))
  }

  test("q47 grouped KMV: exact path kicks in below k and estimates are positive") {
    val rows = run("q47_kmv_grouped").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_in_sketch")
      val est = r.getAs[Double]("est_ndv")
      assert(est > 0)
      if (n < 64) assert(est === n.toDouble, "below-k groups must report exact NDV")
    }
  }

  test("q53 histogram sketch: partition-wise merge == single-pass bit-identically") {
    import graft.functions.Histogram.histogramSketch
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice"))
    def hist(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("l_returnflag"))
      .agg(histogramSketch(col("l_extendedprice"), 900.0, 1626.5625, 64).as("hist"))
      .collect().map(r => r.getAs[String]("l_returnflag") -> r.getSeq[Long](1)).toMap
    // merge() is an elementwise long add: any partitioning must produce the
    // identical buffer — the q48 pattern for the quantile family
    val one = hist(li.coalesce(1))
    val many = hist(li.repartition(13))
    assert(one.keySet === many.keySet)
    one.keySet.foreach(k => assert(one(k) === many(k),
      s"group $k: partition-wise merged histogram differs from single-pass"))
    // and nothing is lost: bucket counts total the row count
    assert(one.values.map(_.sum).sum === li.count())
  }

  test("q55 count-min: merge == single-pass bit-identically, estimates never underestimate") {
    import graft.functions.CountMin.countMinSketch
    val keys = graft.sources.Tables.orders(spark, sfDir)
      .select(col("o_custkey").cast("string").as("k"))
    def cms(df: org.apache.spark.sql.DataFrame) = df
      .agg(countMinSketch(col("k"), 4, 256)).head().getSeq[Long](0)
    val one = cms(keys.coalesce(1))
    val many = cms(keys.repartition(13))
    assert(one === many, "partition-wise merged CMS differs from single-pass")
    // mass conservation: every row adds exactly 1 to each of the 4 rows
    val n = keys.count()
    (0 until 4).foreach { j =>
      assert(one.slice(j * 256, (j + 1) * 256).sum === n,
        s"row $j of the sketch must hold the full input mass")
    }
    // the gate entry's own guarantee column, across every probe
    run("q55_count_min").collect().foreach { r =>
      assert(r.getAs[Boolean]("never_underestimates"),
        s"probe ${r.getAs[String]("k")}: est ${r.getAs[Long]("est")} " +
          s"below true ${r.getAs[Long]("true_cnt")}")
    }
  }

  test("q56 bloom semi-join: zero false negatives, exact false-positive count vs a JVM-recomputed bitmap") {
    // recompute the 8 KB bitmap on the driver via the documented md5Hash60
    // contract (md5 of "<key>#<salt>", first 15 hex chars -> long, mod m) —
    // the JVM digest of the same bytes must land on the same bits as both
    // the Spark build side and the DuckDB oracle
    def h(s: String, j: Int): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$s#$j".getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 65536L).toInt
    }
    val dim = spark.read.parquet(s"$sfDir/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val bits = new java.util.BitSet(65536)
    for (k <- dim; j <- 0 until 4) bits.set(h(k.toString, j))
    val facts = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_custkey").collect().map(_.getLong(0))
    def passes(k: Long) = (0 until 4).forall(j => bits.get(h(k.toString, j)))
    val nPass = facts.count(passes).toLong
    val nTrue = facts.count(dim.contains).toLong
    val row = run("q56_bloom_semijoin").head()
    assert(row.getAs[Long]("n_fact") === facts.length.toLong)
    assert(row.getAs[Long]("n_pass") === nPass,
      "probe bit indices disagree with the recomputed bitmap (the r8 double-precision bug class)")
    assert(row.getAs[Long]("n_true") === nTrue)
    // a bloom filter CANNOT miss a built key: every true member must pass
    assert(row.getAs[Long]("n_true_pass") === nTrue)
    assert(row.getAs[Boolean]("no_false_negatives"))
    assert(row.getAs[Long]("n_false_pos") === nPass - nTrue)
  }

  test("d30 bloom sketch: merge == single-pass bit-identically, FPR near theory") {
    import graft.functions.Bloom.bloomSketch
    val keys = graft.sources.Tables.documents(spark, sfDir)
      .select(col("text").as("k"))
    def bloom(df: org.apache.spark.sql.DataFrame) = df
      .agg(bloomSketch(col("k"), 65536, 4)).head().getSeq[Long](0)
    val one = bloom(keys.coalesce(1))
    val many = bloom(keys.repartition(13))
    assert(one === many, "partition-wise merged bloom differs from single-pass")
    // idempotent OR: merging the filter with itself is the filter
    assert(one.zip(many).forall { case (a, b) => (a | b) == a })
    // FPR over a 10k fresh-probe panel lands near (1-e^{-kn/m})^k — the
    // hashes are fixed, so this is a measured constant with margin, not
    // a probabilistic assertion
    val n = keys.distinct().count()
    val theory = math.pow(1 - math.exp(-4.0 * n / 65536.0), 4)
    val bits = new java.util.BitSet(65536)
    one.zipWithIndex.foreach { case (w, wi) =>
      (0 until 64).foreach(b => if (((w >> b) & 1L) == 1L) bits.set(wi * 64 + b))
    }
    def h(s: String, salt: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$s#$salt".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val fp = (0 until 10000).count { i =>
      val key = s"fpr-probe-$i"
      val (h1, h2) = (h(key, 101), h(key, 102))
      (0 until 4).forall(j => bits.get(((h1 + j * h2) % 65536L).toInt))
    }
    val fpr = fp / 10000.0
    assert(fpr <= theory * 3 + 0.002, s"FPR $fpr far above theory $theory")
    // the gate entry's own structural guarantee
    val rows = run("d30_bloom_dedup_prefilter").collect()
    assert(rows.forall(_.getAs[Boolean]("no_false_negatives")))
    rows.filter(_.getAs[Boolean]("expected_dup")).foreach(r =>
      assert(r.getAs[Boolean]("in_filter"), "a planted duplicate missed"))
  }

  test("q81 hll: merge == single-pass, registers JVM-exact, estimate in bound") {
    import graft.functions.Hll.hllSketch
    val keys = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_partkey").cast("string").as("k"))
    def regs(df: org.apache.spark.sql.DataFrame) =
      df.agg(hllSketch(col("k"), 12)).head().getSeq[Long](0)
    val one = regs(keys.coalesce(1))
    val many = regs(keys.repartition(13))
    assert(one === many, "partition-wise merged HLL differs from single-pass")
    // idempotent max-merge: merging the state with itself is the state
    assert(one.zip(many).forall { case (a, b) => math.max(a, b) == a })
    // register-level recompute from scratch in plain JVM code
    val jvm = new Array[Long](4096)
    keys.distinct().collect().map(_.getString(0)).foreach { key =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$key#103".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      val idx = (h >>> 48).toInt
      val w = h & ((1L << 48) - 1)
      val rank = if (w == 0L) 49 else 48 - (64 - java.lang.Long.numberOfLeadingZeros(w)) + 1
      if (rank.toLong > jvm(idx)) jvm(idx) = rank.toLong
    }
    assert(one.toIndexedSeq === jvm.toIndexedSeq,
      "aggregate registers differ from the from-scratch recompute")
    // the SQL surface plans the same aggregate
    keys.createOrReplaceTempView("graft_q81_keys")
    val viaSql = spark.sql("SELECT hll_sketch(k, 12) FROM graft_q81_keys")
      .head().getSeq[Long](0)
    spark.catalog.dropTempView("graft_q81_keys")
    assert(viaSql === one)
    // gate entry: one row per return flag, every estimate inside 3 sigma
    val rows = run("q81_hll_distinct").collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_3sigma"),
        s"flag ${r.getAs[String]("flag")}: est ${r.getAs[Double]("hll_estimate")} " +
          s"vs exact ${r.getAs[Long]("exact_distinct")}")
      assert(r.getAs[Long]("register_sum") > 0L)
    }
  }

  test("t42 wordpiece: likelihood argmax diverges from BPE where planted") {
    val sp = spark
    import sp.implicits._
    // (a,b) occurs 10x but its parts are common (10 each) -> score 0.1;
    // (c,d) occurs 3x with rare parts (3 each) -> score 1/3: WordPiece
    // must pick (c,d) where frequency-greedy BPE picks (a,b)
    val docs = Seq((("ab " * 10) + ("cd " * 3)).trim).toDF("text")
    val wp = graft.operators.TextAnalysis.wordpieceLearn(docs, 1)
    assert(wp.head === ((1L, "c", "d", 3L, 3L, 3L)), s"got ${wp.head}")
    val (bpe, st) = graft.operators.TextAnalysis.bpeLearnMerges(docs, 1)
    st.unpersist(false)
    assert(bpe.head._2 === "a" && bpe.head._3 === "b",
      s"BPE fixture broke: ${bpe.head}")
    // gate entry: full depth on the corpus, counts all positive
    val rows = run("t42_wordpiece_merges").collect()
    assert(rows.length === graft.operators.TextAnalysis.nWordpieceMerges)
    rows.foreach { r =>
      assert(r.getAs[Long]("pair_count") > 0L)
      assert(r.getAs[Long]("lhs_count") >= r.getAs[Long]("pair_count"))
      assert(r.getAs[Long]("rhs_count") >= r.getAs[Long]("pair_count"))
    }
    // merge steps are distinct pairs
    val ps = rows.map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs")))
    assert(ps.distinct.length === ps.length, "a pair was merged twice")
  }

  test("p08 k-anonymity: every released group passes both bars, accounting ties") {
    val rows = run("p08_k_anonymity").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("group_size") >= 5L, "a sub-k group was released")
      assert(r.getAs[Long]("distinct_sensitive") >= 2L,
        "a sensitive-homogeneous group was released")
    }
    // suppression accounting recomputed exactly
    val cust = graft.sources.Tables.customer(spark, sfDir)
    val total = cust.count()
    val releasedRows = rows.map(_.getAs[Long]("group_size")).sum
    val suppressedRows = rows.head.getAs[Long]("suppressed_rows")
    assert(releasedRows + suppressedRows === total,
      s"released $releasedRows + suppressed $suppressedRows != $total")
    assert(rows.head.getAs[Long]("released_fraction_micro") ===
      (total - suppressedRows) * 1000000L / total)
    // the gate has teeth on this fixture: something is actually withheld
    assert(suppressedRows > 0L || rows.head.getAs[Long]("suppressed_groups") > 0L,
      "fixture has no suppression — the bars never fire")
  }

  test("q83 epoch shuffle: true permutation, seeds differ, batches tight") {
    val rows = run("q83_epoch_shuffle").collect()
      .sortBy(_.getAs[Long]("batch_id"))
    val n = graft.sources.Tables.documents(spark, sfDir).count()
    // batches partition 0..N-1 with no gaps: sizes sum to N, ranges tile
    assert(rows.map(_.getAs[Long]("n_docs")).sum === n)
    assert(rows.head.getAs[Long]("first_pos") === 0L)
    assert(rows.last.getAs[Long]("last_pos") === n - 1)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("last_pos") + 1 === b.getAs[Long]("first_pos"))
        assert(a.getAs[Long]("n_docs") === 64L, "only the tail may be short")
      case _ =>
    }
    // every batch is position-tight: range width == size - 1
    rows.foreach { r =>
      assert(r.getAs[Long]("last_pos") - r.getAs[Long]("first_pos") + 1 ===
        r.getAs[Long]("n_docs"))
    }
    // a different epoch seed reorders: per-batch doc sets move
    val epoch2 = graft.operators.Relational
      .epochShuffleBatches(spark, sfDir, "epoch2").collect()
      .map(r => r.getAs[Long]("batch_id") -> r.getAs[Long]("docid_sum")).toMap
    val epoch1 = rows
      .map(r => r.getAs[Long]("batch_id") -> r.getAs[Long]("docid_sum")).toMap
    assert(epoch1.keySet === epoch2.keySet)
    assert(epoch1.exists { case (b, s0) => epoch2(b) != s0 },
      "two epoch seeds produced the identical batch assignment")
    // the scale claim: positions come from PARTITIONED bucket windows +
    // driver offsets, never a global (empty-partitionBy) window sort
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    val plan0 = SparkEntry.queries("q83_epoch_shuffle")(spark, sfDir)
      .queryExecution.executedPlan
    val plan = plan0 match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "the rank window must be partitioned by bucket")
    // the 2^k decomposition is a free parameter: any width must yield
    // the IDENTICAL permutation (the top-bits prefix property), so a
    // 100 TB run can size buckets to executor memory without changing
    // the epoch order
    def key(r: org.apache.spark.sql.Row) =
      r.getAs[Long]("batch_id") -> (r.getAs[Long]("n_docs"),
        r.getAs[Long]("first_pos"), r.getAs[Long]("last_pos"),
        r.getAs[Long]("docid_sum"))
    val wide = graft.operators.Relational
      .epochShuffleBatches(spark, sfDir, "epoch1", bucketBits = 4)
      .collect().map(key).toMap
    assert(wide === rows.map(key).toMap,
      "bucketBits changed the permutation")
  }

  test("m20 exif: real TIFF roundtrip, corruption degrades, strip is total") {
    import graft.operators.Multimodal.{exifInject, exifParse, exifStrip}
    // a real JPEG carrier
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 16).foreach(y => (0 until 16).foreach(x =>
      img.setRGB(x, y, (x * 16 + y) << 8)))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "jpg", baos)
    val plain = baos.toByteArray
    // inject + parse roundtrip at a known id
    val id = 42L
    val jpg = exifInject(plain, id, withGps = true)
    val meta = exifParse(jpg)
    assert(meta.isDefined && meta.get.make === "cam2")
    val Some((latRef, latMicro, lonRef, lonMicro)) = meta.get.gps
    assert(latRef === "N" && lonRef === "E")
    assert(latMicro === (42 % 89) * 1000000L + (42 % 20) * 50000L + 42 * 25L)
    assert(lonMicro === (42 % 179) * 1000000L + (42 % 20) * 50000L + 42 * 25L)
    // EXIF without GPS
    val noGps = exifParse(exifInject(plain, id, withGps = false))
    assert(noGps.isDefined && noGps.get.gps.isEmpty)
    // plain carrier has no EXIF
    assert(exifParse(plain).isEmpty)
    // corruption degrades to absent, never a throw: flip AND zero every
    // byte through the ENTIRE injected segment — the tail holds the GPS
    // rationals, so zeroing reaches the den=0 ArithmeticException class,
    // and flipping the Make entry's count u32 reaches the >=2^31 class
    val segLen = jpg.length - plain.length
    (2 until (2 + segLen)).foreach { k =>
      val bad = jpg.clone(); bad(k) = (bad(k) ^ 0x5a).toByte
      exifParse(bad) // must not throw
      val zeroed = jpg.clone(); zeroed(k) = 0
      exifParse(zeroed) // must not throw
      val maxed = jpg.clone(); maxed(k) = 0xff.toByte
      exifParse(maxed) // must not throw (count overflow class)
    }
    // strip removes the metadata and only the metadata
    val stripped = exifStrip(jpg)
    assert(exifParse(stripped).isEmpty)
    assert(stripped.length < jpg.length)
    val d0 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    val d1 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(stripped))
    assert(d0 != null && d1 != null)
    assert((0 until 16).forall(y => (0 until 16).forall(x =>
      d0.getRGB(x, y) == d1.getRGB(x, y))), "strip touched pixels")
    // the gate entry: presence classes and coordinates all as planted
    val rows = run("m20_exif_gps_strip").collect()
    assert(rows.forall(_.getAs[Boolean]("stripped_has_no_exif")))
    assert(rows.forall(_.getAs[Boolean]("pixels_unchanged")))
    rows.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      assert(r.getAs[Boolean]("has_exif") === (d % 3 < 2))
      assert(r.getAs[Boolean]("has_gps") === (d % 3 == 0))
      if (d % 3 == 0)
        assert(r.getAs[Long]("lat_micro") ===
          (d % 89) * 1000000L + (d % 20) * 50000L + (d % 400) * 25L)
    }
  }

  test("p10 budget select: maximal quality prefix, windows bucket-partitioned") {
    val rows = run("p10_token_budget_select").collect()
      .sortBy(-_.getAs[Long]("grade"))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_budget"))
      assert(r.getAs[Boolean]("prefix_maximal"))
      assert(r.getAs[Long]("n_selected") <= r.getAs[Long]("n_docs"))
    }
    val budget = rows.head.getAs[Long]("budget")
    val total = rows.head.getAs[Long]("total_tokens")
    assert(budget === total / 2)
    val selTokens = rows.map(_.getAs[Long]("tokens_selected")).sum
    assert(selTokens <= budget && selTokens > budget / 2,
      s"selection $selTokens vs budget $budget looks degenerate")
    // prefix shape across grades: selection saturates high grades first —
    // once a grade is partially selected, every LOWER grade selects none
    val partialIdx = rows.indexWhere(r =>
      r.getAs[Long]("n_selected") < r.getAs[Long]("n_docs"))
    if (partialIdx >= 0)
      rows.drop(partialIdx + 1).foreach(r =>
        assert(r.getAs[Long]("n_selected") === 0L,
          s"grade ${r.getAs[Long]("grade")} selected below a partial grade"))
    // the scale claim: the running sums ride windows PARTITIONED by
    // grade, never a global (empty-partitionBy) window
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    val plan0 = SparkEntry.queries("p10_token_budget_select")(spark, sfDir)
      .queryExecution.executedPlan
    val plan = plan0 match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "p10 planned a global window")
    // the maximality predicate over all witness shapes, including the
    // two NULL aggregates (ADVICE r16: the empty selection NPE'd)
    import graft.operators.Curation.prefixMaximal
    assert(prefixMaximal(None, Some(11L), 10L)) // nothing fits: empty prefix
    assert(prefixMaximal(Some(9L), None, 10L)) // everything fits
    assert(prefixMaximal(None, None, 10L)) // empty input
    assert(prefixMaximal(Some(9L), Some(12L), 10L))
    assert(!prefixMaximal(Some(9L), Some(10L), 10L)) // rejected doc fits
    assert(!prefixMaximal(Some(11L), Some(12L), 10L)) // selection overdraws
  }

  test("p09 shard export: token-balanced, epoch-ordered, manifest honest") {
    val rows = run("p09_corpus_export_shards").collect()
      .sortBy(_.getAs[Long]("shard_id"))
    assert(rows.length === 8)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("one_file_per_shard"))
      assert(r.getAs[Boolean]("readback_order_matches"))
    }
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
    val n = docs.count()
    val agg = docs.agg(sum(col("n")), max(col("n"))).head()
    val (total, maxDoc) = (agg.getLong(0), agg.getLong(1))
    // shards partition the corpus: docs and tokens conserved, position
    // ranges tile the permutation contiguously in shard order
    assert(rows.map(_.getAs[Long]("n_docs")).sum === n)
    assert(rows.map(_.getAs[Long]("shard_tokens")).sum === total)
    assert(rows.head.getAs[Long]("first_pos") === 0L)
    assert(rows.last.getAs[Long]("last_pos") === n - 1)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getAs[Long]("last_pos") + 1 ===
        b.getAs[Long]("first_pos"), "shard ranges do not tile")
      case _ =>
    }
    // greedy contiguous split: every shard's token count deviates from
    // the target by at most one document
    val target = (total + 7) / 8
    rows.foreach { r =>
      val t = r.getAs[Long]("shard_tokens")
      assert(t <= target + maxDoc && t >= target - maxDoc,
        s"shard ${r.getAs[Long]("shard_id")} tokens $t vs target $target")
    }
  }

  test("p11 composed export: lineage partitions input, shards hold the selection") {
    val rows = run("p11_corpus_train_export").collect()
      .sortBy(_.getAs[Long]("shard_id"))
    assert(rows.length === 4)
    Seq("docs_conserved", "tokens_conserved", "shard_totals_match",
      "one_file_per_shard").foreach { c =>
      assert(rows.forall(_.getAs[Boolean](c)), s"$c is false")
    }
    val r0 = rows.head
    // the curation outcome classes are POPULATED on this corpus (the
    // planted template, twins, contamination and the T/2 budget all do
    // real work) — a stage silently passing everything reds here.
    // fully_boilerplate is exempt: a doc whose EVERY block is hot and
    // that still passes the 30..130-token quality filter is structurally
    // rare (p05 pins its count against the stage deltas instead).
    Seq("n_filtered_out", "n_near_dup",
      "n_contaminated", "n_budget_rejected", "n_exported").foreach { c =>
      assert(r0.getAs[Long](c) > 0L, s"$c is zero — stage did no work")
    }
    // the shards partition exactly the exported selection
    assert(rows.map(_.getAs[Long]("n_docs")).sum === r0.getAs[Long]("n_exported"))
    assert(rows.map(_.getAs[Long]("shard_tokens")).sum ===
      r0.getAs[Long]("tokens_selected"))
    assert(r0.getAs[Long]("tokens_selected") <= r0.getAs[Long]("budget"))
    // position ranges tile 0..n_exported-1 in shard order
    assert(rows.head.getAs[Long]("first_pos") === 0L)
    assert(rows.last.getAs[Long]("last_pos") ===
      r0.getAs[Long]("n_exported") - 1)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getAs[Long]("last_pos") + 1 ===
        b.getAs[Long]("first_pos"), "shard ranges do not tile")
      case _ =>
    }
  }

  test("q84 dp ledger: branches pinned, two racing releases never both land") {
    val u = math.pow(2.0, -20)
    val rows = run("q84_dp_budget_ledger").collect()
      .sortBy(_.getAs[Long]("attempt"))
    assert(rows.length === 11)
    Seq("ledger_sum_equals_cumulative", "over_budget_refused",
      "over_delta_refused", "duplicate_noop", "budget_never_exceeded",
      "parallel_composition_admitted", "overlapping_scope_refused",
      "keyed_delta_refused", "scopes_disjoint_proven").foreach { c =>
      assert(rows.forall(_.getAs[Boolean](c)), s"$c is false")
    }
    assert(rows.map(_.getAs[String]("outcome")).toSeq ===
      Seq("landed", "landed", "duplicate", "refused_eps",
        "refused_delta", "landed",
        "landed", "landed", "refused_eps", "landed", "refused_delta"))
    assert(rows.map(_.getAs[String]("scope")).toSeq ===
      Seq("*", "*", "*", "*", "*", "*",
        "view", "click", "purchase,view", "view", "click"))
    // nothing leaves the pipeline on a refused/duplicate attempt
    assert(rows.filter(r => r.getAs[String]("outcome") != "landed")
      .forall(_.getAs[Double]("released_count") == -1.0))
    // the sequential boundary release (attempt 6) lands EXACTLY on both
    // ceilings; the keyed tail then drives view's per-key spend to the
    // ceiling while the sequential sum of landed ε is 3.2 (> budget —
    // legal precisely because r6/r7/r9 ride disjoint scopes)
    assert(rows(5).getAs[Double]("eps_spent_after") === 2.75)
    assert(rows(5).getAs[Double]("delta_spent_after") === 10 * u)
    assert(rows.last.getAs[Double]("eps_spent_after") === 3.0)
    assert(rows.last.getAs[Double]("delta_spent_after") === 10 * u)
    // the REAL race, repeated, on BOTH budget axes: two threads whose
    // combined spend overdraws exactly one axis — the snapshot-then-
    // claim discipline means exactly one can land per round (a
    // stale-budget + fresh-slot interleaving once let BOTH land; 8
    // fresh-ledger rounds per axis keep that window covered)
    import java.util.concurrent.{CountDownLatch, Executors}
    val pool = Executors.newFixedThreadPool(2)
    try {
      (1 to 8).foreach { round =>
        val root = java.nio.file.Files
          .createTempDirectory(s"graft_q84_spec_$round")
        try {
          val ledger = new graft.operators.Sketches.DpLedger(root, 3.0)
          val gate = new CountDownLatch(1)
          def racer(id: String) = pool.submit(
            new java.util.concurrent.Callable[String] {
              def call(): String = {
                gate.await()
                ledger.release(id, "count_all", 2.0, 0.0)
              }
            })
          val (ra, rb) = (racer("A"), racer("B"))
          gate.countDown()
          val outcomes = Seq(ra.get(), rb.get())
          assert(outcomes.sorted === Seq("landed", "refused_eps"),
            s"round $round race outcomes $outcomes")
          assert(ledger.spentEps() === 2.0 && ledger.latest() === 1)
          // and a sequential release inside the remainder still lands
          assert(ledger.release("C", "count_view", 1.0, 0.0) === "landed")
          assert(ledger.release("D", "count_view", 0.5, 0.0) ===
            "refused_eps")
          assert(ledger.spentEps() === 3.0)
          // the content-atomic claim leaves no temp residue: the ledger
          // directory holds exactly the landed slots, nothing else
          assert(Option(root.toFile.listFiles()).get
            .forall(_.getName.matches("release_v\\d+\\.txt")),
            "claim temp files leaked into the ledger")
        } finally {
          graft.functions.CrossEngine.deleteRecursive(root)
        }
      }
      // the δ-axis race: ε budget is ample, δ budget of 10u against two
      // racers at 6u each — exactly one lands, the loser is refused on
      // the δ axis specifically
      (1 to 8).foreach { round =>
        val root = java.nio.file.Files
          .createTempDirectory(s"graft_q84_spec_delta_$round")
        try {
          val ledger = new graft.operators.Sketches.DpLedger(
            root, 100.0, budgetDelta = 10 * u)
          val gate = new CountDownLatch(1)
          def racer(id: String) = pool.submit(
            new java.util.concurrent.Callable[String] {
              def call(): String = {
                gate.await()
                ledger.release(id, "count_all", 1.0, 6 * u)
              }
            })
          val (ra, rb) = (racer("A"), racer("B"))
          gate.countDown()
          val outcomes = Seq(ra.get(), rb.get())
          assert(outcomes.sorted === Seq("landed", "refused_delta"),
            s"round $round delta race outcomes $outcomes")
          assert(ledger.spentDelta() === 6 * u && ledger.latest() === 1)
          // the remaining 4u of δ is still claimable...
          assert(ledger.release("C", "count_view", 1.0, 4 * u) === "landed")
          // ...and the exhausted axis refuses even a δ-only ask
          assert(ledger.release("D", "count_view", 0.0, 1 * u) ===
            "refused_delta")
          assert(ledger.spentDelta() === 10 * u)
        } finally {
          graft.functions.CrossEngine.deleteRecursive(root)
        }
      }
      // the PARALLEL-composition race (VERDICT r17 #6): sequential
      // budget nearly exhausted (2.75 of 3.0 spent globally), then two
      // threads race releases over DISJOINT partition keys at ε=0.1875
      // each (all values binary-exact so the spend compares with ===) —
      // under sequential composition at most one could land
      // (2.75+0.1875+0.1875 = 3.125 > 3.0); the theorem admits BOTH,
      // and the worst-off key ends at 2.9375
      (1 to 8).foreach { round =>
        val root = java.nio.file.Files
          .createTempDirectory(s"graft_q84_spec_par_$round")
        try {
          val ledger = new graft.operators.Sketches.DpLedger(root, 3.0)
          assert(ledger.release("G", "count_all", 2.75, 0.0) === "landed")
          val gate = new CountDownLatch(1)
          def racer(id: String, key: String) = pool.submit(
            new java.util.concurrent.Callable[String] {
              def call(): String = {
                gate.await()
                ledger.release(id, s"count_$key", 0.1875, 0.0, Some(Set(key)))
              }
            })
          val (ra, rb) = (racer("A", "view"), racer("B", "click"))
          gate.countDown()
          val outcomes = Seq(ra.get(), rb.get())
          assert(outcomes === Seq("landed", "landed"),
            s"round $round disjoint race outcomes $outcomes — parallel " +
              "composition must admit both")
          assert(ledger.latest() === 3 && ledger.spentEps() === 2.9375)
          // overlapping keys still SUM: a second view release past the
          // per-key remainder refuses, a 0.0625 ask lands exactly on it
          assert(ledger.release("C", "count_view", 0.125, 0.0,
            Some(Set("view"))) === "refused_eps")
          assert(ledger.release("D", "count_view", 0.0625, 0.0,
            Some(Set("view"))) === "landed")
          assert(ledger.spentEps() === 3.0)
          // ...and a "*" release now refuses: it would touch view too
          assert(ledger.release("E", "count_all", 0.0625, 0.0) ===
            "refused_eps")
        } finally {
          graft.functions.CrossEngine.deleteRecursive(root)
        }
      }
      // the SAME-key race keeps the OCC discipline under scoping: two
      // racers on one key whose combined spend overdraws that key's
      // remainder — exactly one lands per round
      (1 to 8).foreach { round =>
        val root = java.nio.file.Files
          .createTempDirectory(s"graft_q84_spec_samekey_$round")
        try {
          val ledger = new graft.operators.Sketches.DpLedger(root, 3.0)
          assert(ledger.release("G", "count_all", 2.75, 0.0) === "landed")
          val gate = new CountDownLatch(1)
          def racer(id: String) = pool.submit(
            new java.util.concurrent.Callable[String] {
              def call(): String = {
                gate.await()
                ledger.release(id, "count_view", 0.1875, 0.0,
                  Some(Set("view")))
              }
            })
          val (ra, rb) = (racer("A"), racer("B"))
          gate.countDown()
          val outcomes = Seq(ra.get(), rb.get())
          assert(outcomes.sorted === Seq("landed", "refused_eps"),
            s"round $round same-key race outcomes $outcomes")
          assert(ledger.spentEps() === 2.9375 && ledger.latest() === 2)
        } finally {
          graft.functions.CrossEngine.deleteRecursive(root)
        }
      }
    } finally {
      pool.shutdown()
    }
  }

  test("m21 png text: chunk roundtrip, corruption degrades, strip is total") {
    import graft.operators.Multimodal.{pngTextFixture, pngTextChunks, pngStripText, pngInjectText}
    val id = 42L // class 0: Author + Software
    val png = pngTextFixture(id)
    val meta = pngTextChunks(png)
    assert(meta.isDefined && meta.get.toMap ===
      Map("Author" -> "user42", "Software" -> "tool-0"))
    // plain carrier has zero text chunks (present, empty — not None)
    val plain = pngTextFixture(2L) // class 2: clean
    assert(pngTextChunks(plain).exists(_.isEmpty))
    // strip removes the metadata and only the metadata
    val stripped = pngStripText(png)
    assert(pngTextChunks(stripped).exists(_.isEmpty))
    assert(stripped.length < png.length)
    val d0 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val d1 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(stripped))
    assert(d0 != null && d1 != null)
    assert((0 until d0.getHeight).forall(y => (0 until d0.getWidth).forall(
      x => d0.getRGB(x, y) == d1.getRGB(x, y))), "strip touched pixels")
    // corruption degrades to absent, never a throw: flip, zero and max
    // every byte of the injected chunk region (CRC verification turns
    // almost any of these into a structural reject)
    (8 until png.length).foreach { k =>
      Seq[Byte]((png(k) ^ 0x5a).toByte, 0, 0xff.toByte).foreach { b =>
        val bad = png.clone(); bad(k) = b
        pngTextChunks(bad) // must not throw
        pngStripText(bad) // must not throw
      }
    }
    // injection is CRC-correct anywhere in the key/value space
    val weird = pngInjectText(pngTextFixture(2L),
      Seq("Comment" -> "x" * 300))
    assert(pngTextChunks(weird).exists(_.toMap == Map("Comment" -> "x" * 300)))
    // the gate entry: classes and values as planted
    val rows = run("m21_png_text_strip").collect()
    assert(rows.forall(_.getAs[Boolean]("stripped_clean")))
    assert(rows.forall(_.getAs[Boolean]("pixels_unchanged")))
    rows.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_text_chunks") ===
        (if (d % 3 == 0) 2L else if (d % 3 == 1) 1L else 0L))
      if (d % 3 == 0) assert(r.getAs[String]("author") === s"user${d % 50}")
    }
  }

  test("q82 dp release: Laplace inverse-CDF exact, clipping and eps scale") {
    val rows = run("q82_dp_release").collect()
    val ev = graft.sources.Tables.events(spark, sfDir)
    assert(rows.length ===
      ev.select(col("event_type")).distinct().count())
    // recompute the mechanism per group in plain JVM code
    val truth = ev
      .select(col("event_type"), col("value")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).groupBy(_._1)
      .map { case (t, vs) =>
        val cents = vs.map { case (_, v) =>
          math.round(math.min(math.max(v, 0.0), 200.0) * 100)
        }.sum
        t -> (vs.length.toLong, cents)
      }
    def u(t: String, salt: Int): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$t#$salt".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      ((h % 1125899906842624L).toDouble + 1.0) / (1125899906842624.0 + 2.0)
    }
    def lap(uu: Double, b: Double): Double =
      -b * math.signum(uu - 0.5) * math.log(1.0 - 2.0 * math.abs(uu - 0.5))
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val (n, cents) = truth(t)
      val expCount =
        BigDecimal(n.toDouble + lap(u(t, 104), 1.0))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val expSum =
        BigDecimal(cents.toDouble / 100.0 + lap(u(t, 105), 200.0))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("released_count") - expCount) < 1e-9,
        s"$t count: ${r.getAs[Double]("released_count")} vs $expCount")
      assert(math.abs(r.getAs[Double]("released_sum") - expSum) < 1e-9,
        s"$t sum: ${r.getAs[Double]("released_sum")} vs $expSum")
      // the sum's noise is exactly clip/eps = 200x the count's scale for
      // the same |u - 1/2| shape; here just pin positivity + magnitudes
      assert(r.getAs[Double]("debug_count_noise_abs") >= 0.0)
      assert(r.getAs[Double]("debug_sum_noise_abs") >= 0.0)
    }
    // halving epsilon doubles the noise scale exactly (b = sens/eps)
    val u0 = 0.811
    assert(math.abs(lap(u0, 2.0) - 2.0 * lap(u0, 1.0)) < 1e-12)
    // clipping: a value above C contributes exactly C
    assert(math.round(math.min(math.max(1234.5, 0.0), 200.0) * 100) === 20000L)
  }

  test("q53 error contract: upper-edge estimate within one bucket width above exact") {
    val w = 1626.5625
    val est = run("q53_quantile_sketch").collect()
      .map(r => (r.getAs[String]("l_returnflag"), r.getAs[Double]("q")) ->
        r.getAs[Double]("est")).toMap
    assert(est.size === 9, s"3 groups x 3 quantiles expected, got ${est.size}")
    // exact discrete percentiles per group (same rank convention: the
    // ceil(q*n)-th smallest value)
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).groupBy(_._1)
      .map { case (g, vs) => g -> vs.map(_._2).sorted }
    for (((g, q), e) <- est) {
      val vs = li(g)
      val exact = vs(math.ceil(q * vs.length).toInt - 1)
      assert(e >= exact && e - exact <= w,
        s"group $g q=$q: est $e must cover exact $exact within bucket width $w")
    }
  }

  test("d15 chunk near-dup: cross-doc only, planted passages aligned, exact heads") {
    val rows = run("d15_chunk_neardup").collect()
    assert(rows.nonEmpty)
    // the chunker's own 16-token intra-doc overlap must NEVER surface
    rows.foreach(r => assert(r.getAs[Long]("src_a") !== r.getAs[Long]("src_b"),
      s"intra-doc chunk pair leaked: $r"))
    // planted 90%-prefix copies surface as window-ALIGNED chunk pairs
    // (natural cross-doc passage repeats in the corpus may surface too —
    // at sf0.001 docs 120/360 genuinely share a chunk; that's the operator
    // working, not noise)
    val planted = rows.filter(r =>
      r.getAs[Long]("src_b") - r.getAs[Long]("src_a") === 10000000L)
    assert(planted.nonEmpty, "planted passage duplicates must be found")
    planted.foreach { r =>
      assert(r.getAs[Long]("doc_a") % 1000000L === r.getAs[Long]("doc_b") % 1000000L,
        s"planted chunk pair must align by window: $r")
    }
    // prefix-identical windows exist (truncate90 keeps early chunks intact)
    assert(planted.exists(_.getAs[Double]("jaccard") === 1.0),
      "expected some token-identical early chunks at J = 1")
  }

  test("chunkMinhashPairs production lane covers d15's gate pairs (VERDICT r7 missing #2)") {
    // the production lane (capped xxhash generator) over the SAME planted
    // corpus as the d15 gate lane (km oracle hash family): every verified
    // gate pair must also surface in the production lane — the two differ
    // only in LSH hash family, and verification (exact Jaccard >= 0.5 on
    // the same shingle sets) is identical, so coverage can only diverge if
    // the 32-perm banding misses a candidate the km banding caught
    val docs = graft.operators.Dedup.withPlantedDups(spark, sfDir)
      .filter(col("doc_id") % 5 === 0)
    val prod = graft.operators.Dedup.chunkMinhashPairs(docs).collect()
    prod.foreach(r => assert(r.getAs[Long]("src_a") !== r.getAs[Long]("src_b")))
    val prodPairs = prod.map(r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val gate = run("d15_chunk_neardup").collect()
    gate.foreach { r =>
      val p = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(prodPairs.contains(p),
        s"gate pair $p (J=${r.getAs[Double]("jaccard")}) missing from the production lane")
    }
  }

  test("d09 dup clusters: one canonical per cluster, label = min member, chains grouped") {
    val rows = run("d09_dup_clusters").collect()
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (cid, members) =>
      assert(members.count(_.getAs[Boolean]("is_canonical")) === 1,
        s"cluster $cid must keep exactly one canonical doc")
      assert(members.map(_.getAs[Long]("doc_id")).min === cid,
        "cluster label must be the min member id (deterministic survivor rule)")
      assert(members.forall(_.getAs[Long]("cluster_size") === members.length.toLong))
    }
    // the planted 2-generation chains must come out as 3-member components:
    // that only happens when label propagation crosses >= 2 hops
    assert(byCluster.values.exists(_.length === 3),
      "at least one transitive 3-member chain expected from the planted generations")
  }

  test("st06 streaming dedup equals batch distinct keys") {
    val streamed = run("st06_stream_dedup").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"))).toSet
    val batch = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type")).distinct().collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"))).toSet
    assert(streamed === batch)
  }

  test("m04 resize: every payload lands at exactly 32 bytes, checksum consistent") {
    val rows = run("m04_media_resize").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bytes = java.util.Base64.getDecoder.decode(r.getAs[String]("resized_b64"))
      assert(bytes.length === 32, "nearest-neighbor resample must emit the target width")
      val sum = bytes.map(b => java.lang.Byte.toUnsignedInt(b).toLong).sum
      assert(sum === r.getAs[Long]("byte_sum"))
    }
  }

  test("t10 packing: distributed prefix sum equals the naive global cumsum") {
    import org.apache.spark.sql.expressions.Window
    val got = run("t10_pack_sequences").collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("seq_id"), r.getAs[Long]("seq_offset")))).toMap
    val w = Window.orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum_end", sum(col("n_tokens")).over(w))
      .collect()
      .map { r =>
        val start = r.getAs[Long]("cum_end") - r.getAs[Long]("n_tokens")
        (r.getAs[Long]("doc_id"), (r.getAs[Long]("n_tokens"), start / 2048, start % 2048))
      }.toMap
    assert(got === naive)
  }

  test("t11 chunking: full coverage, fixed stride, chunk sizes clamp at the tail") {
    val byDoc = run("t11_chunk_windows").collect()
      .groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (_, chunks) =>
      val sorted = chunks.sortBy(_.getAs[Long]("chunk_no"))
      val n = sorted.head.getAs[Long]("n_tokens")
      // starts advance by the stride and the last chunk reaches the doc end
      sorted.zipWithIndex.foreach { case (c, i) =>
        assert(c.getAs[Long]("tok_start") === i.toLong * 48)
        val expectLen = math.min(64L, n - i.toLong * 48)
        assert(c.getAs[Long]("chunk_tokens") === expectLen)
      }
      assert(sorted.last.getAs[Long]("tok_start") + sorted.last.getAs[Long]("chunk_tokens") === n)
    }
  }

  test("q49 sampled quantiles: estimated rank lands near the requested quantile") {
    val ests = run("q49_sample_quantiles").collect()
      .map(r => r.getAs[Double]("q") -> r.getAs[Double]("est")).toMap
    assert(ests.keySet === Set(0.5, 0.9, 0.99))
    val all0 = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_extendedprice")).collect().map(_.getDouble(0)).sorted
    ests.foreach { case (q, est) =>
      val trueRank = all0.count(_ <= est).toDouble / all0.length
      // k=1000 uniform sample: 3-sigma rank error ~ 3*sqrt(q(1-q)/k) < 0.05
      assert(math.abs(trueRank - q) < 0.06,
        s"quantile $q estimate $est has true rank $trueRank")
    }
  }

  test("q50 cdc compaction: one survivor per key, latest timestamp, versions add up") {
    val rows = run("q50_cdc_compact").collect()
    val events = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_timestamp(col("ts")).as("es"))
      .collect()
    val byKey = events.groupBy(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")))
    assert(rows.length === byKey.size)
    assert(rows.map(_.getAs[Long]("n_versions")).sum === events.length.toLong)
    rows.foreach { r =>
      val key = (r.getAs[Long]("user_id"), r.getAs[String]("event_type"))
      assert(r.getAs[Long]("last_ts") === byKey(key).map(_.getAs[Long]("es")).max,
        s"survivor for $key must carry the max event time")
    }
  }

  test("round-3 scale contracts: plan shapes for sketches, chunking, compaction") {
    // t11: pure per-row generate — a chunker that shuffles is wrong
    val t11 = SparkEntry.queries("t11_chunk_windows")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!t11.contains("Exchange"), "t11 chunking must not shuffle")
    assert(t11.contains("Generate"))
    // q50: partial aggregation before the exchange, no window sort —
    // asserted on the aggregate NODES (exec class + AggregateExpression
    // modes), not on plan-rendering substrings, which drift across Spark
    // versions and could match an unrelated operator's "partial merge"
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Max, Partial}
    val q50plan0 = SparkEntry.queries("q50_cdc_compact")(spark, sfDir)
      .queryExecution.executedPlan
    val q50plan = q50plan0 match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(q50plan.collect { case w: WindowExec => w }.isEmpty,
      "q50 must not plan a window sort")
    val partialFns = q50plan.collect { case h: BaseAggregateExec =>
      h.aggregateExpressions.filter(_.mode == Partial).map(_.aggregateFunction)
    }.flatten
    assert(partialFns.exists(_.isInstanceOf[Max]),
      s"q50 must fold versions map-side (Partial-mode max) before the shuffle; saw $partialFns")
  }

  test("s15 index compaction: serves bit-identical scores, heals fragmented lists only") {
    import graft.operators.Similarity
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val out = java.nio.file.Files.createTempDirectory("graft_s15spec_").toString
    try {
      Similarity.ivfpqWriteIndex(emb, Similarity.trainIvfPq(emb, seed = 42L, nLists = 8), out)
      val newBatch = emb.filter(col("vec_id") < 5)
        .select((col("vec_id") + 5000000L).as("vec_id"), col("embedding"))
      Similarity.ivfpqAppendCodes(spark, out, newBatch)
      def serve() = Similarity
        .ivfpqServe(spark, out, emb.filter(col("vec_id") < 3), nProbe = 2)
        .select(col("query_id"), col("vec_id"), col("adc")).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val before = serve()
      def filesPerList: Map[String, Seq[String]] =
        new java.io.File(s"$out/codes").listFiles().filter(_.isDirectory)
          .map(d => d.getName ->
            d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSeq.sorted)
          .toMap
      val preFiles = filesPerList
      val fragged = Similarity.ivfpqCompactCodes(spark, out)
      assert(fragged.nonEmpty, "the append must have fragmented at least one list")
      val postFiles = filesPerList
      // compaction is a pure layout change: the index answers every probe
      // with bit-identical candidate sets and ADC scores
      assert(serve() === before, "compaction must not change served scores")
      // fragmented lists end at exactly one data file; untouched lists'
      // files are never rewritten (O(fragmented) pass, not O(index))
      fragged.foreach { id =>
        assert(postFiles(s"list_id=$id").size === 1,
          s"list $id still fragmented: ${postFiles(s"list_id=$id")}")
      }
      postFiles.keySet.filterNot(d => fragged.contains(d.stripPrefix("list_id=").toInt))
        .foreach(d => assert(postFiles(d) === preFiles(d),
          s"compaction rewrote untouched list $d"))
      // idempotence: a second pass finds nothing to do
      assert(Similarity.ivfpqCompactCodes(spark, out).isEmpty)
    } finally {
      graft.functions.CrossEngine.deleteRecursive(java.nio.file.Paths.get(out))
    }
  }

  test("s16 index delete: removes exactly the doomed rows, touches only their lists") {
    import graft.operators.Similarity
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val out = java.nio.file.Files.createTempDirectory("graft_s16spec_").toString
    try {
      Similarity.ivfpqWriteIndex(emb, Similarity.trainIvfPq(emb, seed = 42L, nLists = 8), out)
      def serve() = Similarity
        .ivfpqServe(spark, out, emb.filter(col("vec_id") < 3), nProbe = 8)
        .select(col("query_id"), col("vec_id"), col("adc")).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      def filesPerList: Map[String, Seq[String]] =
        new java.io.File(s"$out/codes").listFiles().filter(_.isDirectory)
          .map(d => d.getName ->
            d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSeq.sorted)
          .toMap
      val before = serve()
      val preFiles = filesPerList
      // the takedown batch: three arbitrary corpus ids
      val doomed = Seq(7L, 11L, 23L)
      val touched = Similarity.ivfpqDeleteCodes(spark, out, doomed)
      assert(touched.nonEmpty && touched.size <= doomed.size)
      // a delete is surgical: afterwards the index serves EXACTLY the
      // prior answers minus the doomed rows — nothing else moves
      assert(serve() === before.filterNot { case ((_, v), _) => doomed.contains(v) })
      val postFiles = filesPerList
      postFiles.keySet.filterNot(d => touched.contains(d.stripPrefix("list_id=").toInt))
        .foreach(d => assert(postFiles(d) === preFiles(d),
          s"delete rewrote untouched list $d"))
      // idempotence: the rows are gone, so a second pass touches nothing
      assert(Similarity.ivfpqDeleteCodes(spark, out, doomed).isEmpty)
      // the empty-list edge: deleting EVERY row of one list leaves an
      // absent directory, and serving still works (zero candidates there)
      val victim = touched.head
      val allOfList = spark.read.parquet(s"$out/codes")
        .filter(col("list_id") === victim)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
      assert(Similarity.ivfpqDeleteCodes(spark, out, allOfList) === Seq(victim))
      assert(!new java.io.File(s"$out/codes/list_id=$victim").exists)
      val finalServed = serve()
      assert(finalServed.nonEmpty)
      assert(finalServed.keySet.forall { case (_, v) =>
        !allOfList.contains(v) && !doomed.contains(v) })
    } finally {
      graft.functions.CrossEngine.deleteRecursive(java.nio.file.Paths.get(out))
    }
  }

  test("wordNgrams is total on docs shorter than n (ADVICE r7)") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a b c"), (2L, "a b c d e f g h i j")).toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"), graft.operators.Dedup.wordNgrams(8).as("gs"))
    val m = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(m(1L).isEmpty, "a 3-token doc has no 8-grams (and must not throw)")
    assert(m(2L) === Seq("a b c d e f g h", "b c d e f g h i", "c d e f g h i j"))
  }

  test("d16 decontamination: planted leaks flagged, clean twins never, eval side broadcast") {
    val rows = run("d16_decontaminate").collect()
    assert(rows.nonEmpty && rows.length % 2 === 0, "one contaminated + one clean twin per source")
    rows.foreach { r =>
      val id = r.getAs[Long]("test_id")
      val contaminated = r.getAs[Boolean]("contaminated")
      assert(contaminated === (r.getAs[Long]("n_overlap_grams") > 0))
      if (id >= 60000000L) {
        // clean twin: every word carries the 'zz' suffix, which is outside
        // the corpus vocabulary -> no 8-gram can exist in train
        assert(!contaminated, s"clean twin $id must not be flagged: $r")
      } else {
        // contaminated doc: a verbatim 20-word passage of a train doc (the
        // corpus min doc length of 10 words still yields >= 1 8-gram)
        assert(contaminated && r.getAs[Long]("n_train_docs") >= 1L,
          s"planted leak $id must be flagged: $r")
      }
    }
    // the suffix guarantee is real: no suffixed vocab word is itself a word
    val vocab = graft.sources.Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(vocab.map(_ + "zz").intersect(vocab).isEmpty,
      "suffix construction must leave the corpus vocabulary")
    // scale shape: the benchmark-sized eval side broadcasts; the train
    // corpus never shuffles its exploded n-grams into the overlap join
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val plan0 = SparkEntry.queries("d16_decontaminate")(spark, sfDir)
      .queryExecution.executedPlan
    val plan = (plan0 match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    assert(plan.contains("BroadcastHashJoin"),
      "d16's overlap join must broadcast the eval n-gram side")
  }

  test("s17 rerank: exact refine surfaces the planted twin at distance zero, shortlist broadcasts") {
    val rows = run("s17_ivfadc_rerank").collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      val q = r.getAs[Long]("query_id")
      assert(r.getAs[Long]("nn_id") === q + 1000000L,
        s"query $q: exact rerank must surface the identical twin as top-1")
      assert(r.getAs[Double]("nn_d2") === 0.0,
        s"query $q: the twin's exact distance is identically zero")
    }
    // scale shape: the Q x L shortlist broadcasts into the full-precision
    // vector table; the corpus side is semi-joined without a shuffle
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val plan0 = SparkEntry.queries("s17_ivfadc_rerank")(spark, sfDir)
      .queryExecution.executedPlan
    val plan = (plan0 match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    assert(plan.contains("BroadcastHashJoin"),
      "s17's refine join must broadcast the shortlist side")
  }

  test("s18 codebook retrain: twins survive the generation swap, migration is incremental") {
    val row = run("s18_ivfpq_codebook_retrain").head()
    // the retrain must actually change the model, and the half-migrated
    // serve must genuinely mix generations across the probe queries' own
    // lists — otherwise the mid-transition booleans prove nothing
    assert(row.getAs[Boolean]("retrained_books_differ"))
    assert(row.getAs[Boolean]("mixed_generations_served"))
    // the planted twin shares its query's list and codes under ANY
    // codebooks, so it ties the min ADC both MID-transition (each list
    // scored under its own generation's LUT) and after the full swap
    Seq("mid_all_queries_scored", "mid_twins_are_candidates",
      "mid_twins_attain_min_adc", "final_all_queries_scored",
      "final_twins_are_candidates", "final_twins_attain_min_adc")
      .foreach(c => assert(row.getAs[Boolean](c), s"$c must hold"))
    // s15-pattern file invariants: staged+swapped lists end single-file,
    // not-yet-migrated lists keep their original files byte-for-byte
    assert(row.getAs[Boolean]("migrated_lists_single_file"))
    assert(row.getAs[Boolean]("pending_lists_intact"))
  }

  test("d17 winnowing: planted splices guaranteed found, selection sparsifies") {
    val rows = run("d17_winnowing").collect()
    // every 89th doc of >= 15 tokens has a splice twin carrying a verbatim
    // run of >= 11 tokens; winnowing GUARANTEES a shared fingerprint for
    // runs >= w+k-1 = 11 (shorter docs are not spliced — ADVICE r7)
    val expected = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 89 === 0 && size(split(col("text"), " ")) >= 15)
      .select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(expected.nonEmpty)
    val found = rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    expected.foreach { id =>
      assert(found.contains((id, id + 70000000L)),
        s"splice pair ($id, ${id + 70000000L}) must share a fingerprint — the w+k-1 guarantee")
    }
    rows.foreach(r => assert(r.getAs[Long]("n_shared_fp") >= 1L))
  }

  test("d18 exact-substring removal: twins lose exactly the verbatim run, flanks survive") {
    val out = run("d18_exact_substring_rm").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"), r.getAs[String]("text_clean")))
      .toMap
    // every 101st doc of >= 20 tokens gets a twin (+8e7): 4 'qq'-suffixed
    // filler tokens, the verbatim run (source tokens 5..14), 4 'rr'-suffixed
    // filler tokens. The run's grams are duplicated (they exist in the
    // source); the filler grams are unique per twin (doc_id suffix), so the
    // twin must lose EXACTLY the 10-token run and keep both flanks.
    val sources = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 101 === 0 && size(split(col("text"), " ")) >= 20)
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    assert(sources.nonEmpty)
    sources.foreach { case (sid, tk) =>
      val (nTok, nRem, clean) = out(sid + 80000000L)
      assert(nTok === 18L, s"twin of $sid must have 4+10+4 tokens")
      assert(nRem === 10L, s"twin of $sid must lose exactly the 10-token run, lost $nRem")
      val expected = (tk.take(4).map(t => s"${t}qq$sid") ++
        tk.slice(14, 18).map(t => s"${t}rr$sid")).mkString(" ")
      assert(clean === expected, s"twin of $sid must keep exactly its unique flanks")
      // the source doc itself loses (at least) the same run — all copies go
      assert(out(sid)._2 >= 10L, s"source $sid must lose its copy of the run too")
    }
    // docs shorter than the gram width pass through untouched
    out.values.foreach { case (nTok, nRem, _) => assert(nRem <= nTok) }
  }

  test("d19 line dedup: planted template stripped from every even doc, odd docs untouched") {
    val out = run("d19_line_dedup").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_blocks"), r.getAs[Long]("n_removed"), r.getAs[String]("text_clean")))
      .toMap
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(docs.nonEmpty && out.size === docs.length)
    docs.foreach { case (id, text) =>
      val (nBlocks, nRemoved, clean) = out(id)
      val nOrig = math.ceil(text.split(" ").length / 10.0).toLong
      if (id % 2 == 0) {
        // the 20-token template is exactly blocks 0-1; stripping them must
        // restore the original text byte-for-byte (prepend keeps the
        // organic blocks aligned to the same boundaries)
        assert(nBlocks === nOrig + 2, s"doc $id block count")
        assert(nRemoved === 2L, s"doc $id must lose exactly the 2 template blocks, lost $nRemoved")
        assert(clean === text, s"doc $id must reassemble to its original text")
      } else {
        assert(nBlocks === nOrig, s"doc $id block count")
        assert(nRemoved === 0L, s"odd doc $id must be untouched")
        assert(clean === text)
      }
    }
  }

  test("d20 incremental model merge equals the full recompute, batch by batch") {
    val merged = run("d20_line_dedup_incremental").collect()
      .map(r => r.getAs[Long]("h") -> r.getAs[Long]("doc_freq")).toMap
    // full recompute, same corpus derivation
    val corpus = graft.operators.Dedup.d19Corpus(
      graft.sources.Tables.documents(spark, sfDir))
    val full = graft.operators.Dedup.blockTable(corpus, 10)
      .groupBy(col("h")).agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 50).collect()
      .map(r => r.getAs[Long]("h") -> r.getAs[Long]("df")).toMap
    assert(full.nonEmpty, "the planted template must clear the threshold")
    assert(merged === full,
      "summing per-batch distinct counts must reproduce the full model exactly")
  }

  test("t21 bigram logprob: one score per doc, n-1 bigrams, mass is negative") {
    val rows = run("t21_bigram_logprob").collect()
    val lens = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.length === lens.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_bigrams") === math.max(lens(id) - 1, 0).toLong)
      if (r.getAs[Long]("n_bigrams") > 0) {
        val lp = r.getAs[Double]("avg_bigram_logprob10")
        // a probability is < 1 (V >= 2 makes every smoothed P < 1), so the
        // mean log10 is strictly negative; and no smoothed P can be below
        // 0.5 / (maxCu + 0.5 V) — loose floor of -12 catches unit slips
        assert(lp < 0.0 && lp > -12.0, s"doc $id scored $lp")
      }
    }
  }

  test("s21 recall eval: k=10 per query, recall in [0,1], consistent with hits") {
    val rows = run("s21_ann_recall_eval").collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("k") === 10L)
      val hits = r.getAs[Long]("n_hits")
      val rec = r.getAs[Double]("recall_at_10")
      assert(hits >= 0L && hits <= 10L)
      assert(math.abs(rec - hits / 10.0) < 1e-9)
      // nProbe=2 of 8 lists must beat random candidate coverage: an IVF
      // probing a quarter of the lists that found NOTHING is broken
      assert(hits >= 1L, s"query ${r.getAs[Long]("query_id")} had zero recall")
    }
  }

  test("p02 PSI drift: terms nonnegative, same-process years read as stable") {
    val rows = run("p02_drift_psi").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      // (p-q) and log(p/q) share a sign, so every PSI term is >= 0 up to
      // the micro rounding
      assert(r.getAs[Double]("psi_term") >= -1e-6,
        s"bin ${r.getAs[Long]("bin")} has a negative PSI term")
    }
    val total = rows.map(_.getAs[Double]("psi_term")).sum
    // 1995 and 1996 orders come from the same synthetic process: PSI must
    // sit under the industry "no significant shift" threshold of 0.1
    assert(total >= 0.0 && total < 0.1, s"total PSI $total")
  }

  test("t25 stratified split: fractions near 80/10/10, partition per language") {
    val rows = run("t25_stratified_split").collect()
    val target = Map("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, parts) =>
      // fractions within a stratum must sum to 1 and every split must exist
      assert(parts.map(_.getAs[String]("split")).toSet === target.keySet, s"lang $lang")
      val fracSum = parts.map(_.getAs[Double]("frac")).sum
      assert(math.abs(fracSum - 1.0) < 1e-4, s"lang $lang fracs sum to $fracSum")
      parts.foreach { p =>
        val f = p.getAs[Double]("frac")
        val t = target(p.getAs[String]("split"))
        // binomial tolerance at the smallest stratum (~60 docs at
        // sf0.001): 4 sigma of sqrt(p(1-p)/n) ~ 0.2
        assert(math.abs(f - t) < 0.2, s"lang $lang ${p.getAs[String]("split")} frac $f")
      }
    }
  }

  test("s20 hard negatives: off-label only, 8 per query, cosine-descending") {
    val labels = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = run("s20_hard_negatives").collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size === 3)
    byQ.foreach { case (qid, negs) =>
      assert(negs.length === 8)
      negs.foreach { n =>
        assert(n.getAs[Int]("negative_label") !== labels(qid),
          s"query $qid mined a positive as a negative")
      }
      val ordered = negs.sortBy(_.getAs[Long]("rn"))
      ordered.zip(ordered.tail).foreach { case (a, b) =>
        assert(a.getAs[Double]("cosine") >= b.getAs[Double]("cosine"))
      }
    }
  }

  test("s19 MMR greedy: hand-computable trajectory on a 4-candidate shortlist") {
    val ss = spark
    import ss.implicits._
    // query = x-axis. Candidates: a/b near-duplicates hugging the query
    // (rel .999950/.999928), c diagonal (rel .7071), d orthogonal (rel 0).
    // At λ=0.3 the hand-computed trajectory is a, d, c, b: step 2 scores
    // b ≈ .3·.999928 − .7·cos(b,a)≈1 = −.400, c = .2121 − .7·.7141 =
    // −.288, d = 0 − .7·.0100 = −.007 → d; step 3 c (−.288) beats b
    // (−.400); the redundant twin seats LAST.
    val shortlist = Seq(
      (1L, 10L, Seq(1.0, 0.01), 0.0),
      (1L, 11L, Seq(1.0, 0.012), 0.0),
      (1L, 12L, Seq(1.0, 1.0), 0.0),
      (1L, 13L, Seq(0.0, 1.0), 0.0))
      .toDF("query_id", "vec_id", "v", "ignore")
      .select(col("query_id"), col("vec_id"),
        expr("v[0] / sqrt(v[0]*v[0] + v[1]*v[1])").as("rel"),
        col("v").cast("array<float>").as("emb"))
    val out = graft.operators.Similarity.mmrSelect(shortlist, k = 4, lambda = 0.3)
      .orderBy("mmr_rank").collect()
      .map(r => r.getAs[Long]("mmr_rank") -> r.getAs[Long]("vec_id"))
    assert(out.toSeq === Seq(1L -> 10L, 2L -> 13L, 3L -> 12L, 4L -> 11L))
  }

  test("q59 SCD2: per key exactly one current row, intervals chain without gaps") {
    val rows = run("q59_scd2_history").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (uid, hist) =>
      assert(hist.count(_.getAs[Boolean]("is_current")) === 1,
        s"user $uid must have exactly one open interval")
      val sorted = hist.sortBy(_.getAs[Long]("valid_from"))
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        // half-open intervals: each version closes exactly where the next
        // opens (epoch-second resolution), and only the last is open-ended
        assert(!a.isNullAt(a.fieldIndex("valid_to")), s"user $uid closed out of order")
        assert(a.getAs[Long]("valid_to") === b.getAs[Long]("valid_from"),
          s"user $uid has a gap/overlap")
      }
      assert(sorted.last.isNullAt(sorted.last.fieldIndex("valid_to")))
    }
  }

  test("q58 z-order: every bucket bounds both dimensions within 2^13") {
    val rows = run("q58_zorder_layout").collect()
    assert(rows.length === 64, "top-6 morton bits must yield all 64 buckets")
    rows.foreach { r =>
      val b = r.getAs[Long]("zbucket")
      assert(b >= 0 && b < 64)
      // bucket = interleaved top-3 bits of each normalized dim, so within
      // a bucket each dimension varies only in its low 13 bits — this is
      // the min/max tightness that makes file-stat pruning work on EITHER
      // filter dimension after a z-order write
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") < 8192, s"bucket $b x-span")
      assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") < 8192, s"bucket $b y-span")
      assert(r.getAs[Long]("n_rows") > 0)
    }
  }

  test("q57 KMV set ops: estimates track exact union/intersection") {
    val r = run("q57_kmv_setops").collect().head
    val k = r.getAs[Long]("k")
    val estU = r.getAs[Double]("est_union")
    val estI = r.getAs[Double]("est_intersect")
    val exU = r.getAs[Long]("exact_union")
    val exI = r.getAs[Long]("exact_intersect")
    assert(k > 0 && exU >= exI && exI >= 0)
    if (k < 256) {
      // below-k the union sketch IS the full distinct set: both exact
      assert(estU === exU.toDouble)
      assert(math.abs(estI - exI.toDouble) < 1e-6)
    } else {
      // k=256 KMV: 1/sqrt(k) ~ 6% expected error; 25% is a loose 4-sigma
      assert(math.abs(estU - exU) / exU < 0.25, s"union est $estU vs $exU")
      assert(math.abs(estI - exI) / math.max(exI, 1L) < 0.25, s"intersect est $estI vs $exI")
    }
  }

  test("t23 DSIR weights: target-language docs outscore the off-target slice") {
    val langs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), size(split(col("text"), " ")).as("len"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    val rows = run("t23_dsir_weights").collect()
    assert(rows.length === langs.size)
    var enSum = 0.0; var enN = 0; var zhSum = 0.0; var zhN = 0
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (lang, len) = langs(id)
      // unigrams + bigrams of an n-token doc: n + (n-1)
      assert(r.getAs[Long]("n_grams") === (2 * len - 1).toLong)
      val w = r.getAs[Double]("dsir_logratio")
      assert(!w.isNaN && !w.isInfinite)
      if (lang == "en") { enSum += w; enN += 1 }
      if (lang == "zh") { zhSum += w; zhN += 1 }
    }
    assert(enN > 0 && zhN > 0)
    // the importance ratio must recognize its own target distribution:
    // mean weight of the en slice strictly above the zh slice
    assert(enSum / enN > zhSum / zhN,
      s"en mean ${enSum / enN} should exceed zh mean ${zhSum / zhN}")
  }

  test("t24 stupid backoff: held-out docs scored, every tier exercised") {
    val rows = run("t24_stupid_backoff").collect()
    val lens = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), size(split(col("text"), " ")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.length === lens.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_scored") === math.max(lens(id) - 2, 0).toLong)
      if (r.getAs[Long]("n_scored") > 0) {
        val lp = r.getAs[Double]("avg_sbo_logprob10")
        assert(lp < 0.0 && lp > -12.0, s"doc $id scored $lp")
      }
    }
    // the held-out split must actually exercise backoff: some test trigrams
    // exist in the training half (tier 1) and some don't (tier 2/3)
    def tris(parity: Int) = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 2 === parity)
      .select(explode(expr(
        """transform(sequence(1, greatest(size(split(text, ' ')) - 2, 0)),
           i -> array_join(slice(split(text, ' '), i, 3), ' '))""")).as("g"))
      .distinct()
    val seen = tris(1).intersect(tris(0)).count()
    val unseen = tris(1).except(tris(0)).count()
    assert(seen > 0, "no held-out trigram hits the trigram table - tier 1 dead")
    assert(unseen > 0, "every held-out trigram was seen - backoff never fires")
  }

  test("st11 stream decontamination: every passage source is quarantined") {
    val rows = run("st11_stream_decontaminate").collect()
    val flagged = rows.map(_.getAs[Long]("doc_id")).toSet
    // a source doc contains its own leaked passage verbatim, so every one
    // of the passage's 8-grams hits; the expected gram count derives from
    // the doc's ACTUAL length (passage = tokens 3..22, so
    // min(20, len - 2) - 7 grams), not a fixture-specific constant
    // (ADVICE r7: the old hardcoded 13 assumed every source doc yields a
    // full 20-token passage)
    val sources = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 97 === 0)
      .select(col("doc_id"), size(split(col("text"), " ")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    assert(sources.nonEmpty)
    sources.foreach { case (id, len) =>
      val expectedGrams = math.max(math.min(20, len - 2) - 7, 0).toLong
      if (expectedGrams > 0) {
        assert(flagged.contains(id), s"passage source $id must be quarantined")
        val r = rows.find(_.getAs[Long]("doc_id") == id).get
        assert(r.getAs[Long]("n_hit_grams") >= expectedGrams,
          s"source $id (len $len) must hit all $expectedGrams passage 8-grams: $r")
        assert(r.getAs[Long]("n_test_docs") >= 1L)
      }
    }
  }

  test("st12 stream ANN ingest: streamed vectors served, model frozen through the stream") {
    val rows = run("st12_stream_ann_ingest").collect()
    assert(rows.length === 1)
    val r = rows.head
    // new_twins_are_candidates can only be true if the STREAM appended
    // them — the built index contains only the base corpus + old twins
    for (c <- Seq("all_queries_scored", "old_twins_are_candidates",
        "new_twins_are_candidates", "twins_attain_min_adc",
        "model_frozen_through_stream"))
      assert(r.getAs[Boolean](c), s"$c must hold: $r")
  }

  test("BottomKHeap: dedup, eviction order, merge == union bottom-k") {
    val h = new graft.functions.BottomKHeap(4)
    Seq(9L, 3L, 9L, 7L, 5L, 1L, 5L, 8L).foreach(h.insert)
    // distinct values {9,3,7,5,1,8} -> bottom 4 = {1,3,5,7}
    assert(h.sortedAscending.toSeq === Seq(1L, 3L, 5L, 7L))
    val a = new graft.functions.BottomKHeap(3)
    val b = new graft.functions.BottomKHeap(3)
    Seq(10L, 20L, 30L).foreach(a.insert)
    Seq(5L, 20L, 40L).foreach(b.insert)
    a.mergeFrom(b)
    // union distinct {5,10,20,30,40} -> bottom 3
    assert(a.sortedAscending.toSeq === Seq(5L, 10L, 20L))
    // fewer than k distinct: sketch IS the full set
    val c = new graft.functions.BottomKHeap(8)
    Seq(2L, 2L, 2L, 6L).foreach(c.insert)
    assert(c.sortedAscending.toSeq === Seq(2L, 6L))
  }

  test("BottomKHeap property: random streams + random merge splits == sorted distinct take k") {
    val rng = new scala.util.Random(20260812L)
    (1 to 200).foreach { _ =>
      val k = 1 + rng.nextInt(64)
      val n = rng.nextInt(500)
      // small value domain forces heavy duplication
      val xs = Array.fill(n)(rng.nextInt(150).toLong - 75L)
      val expected = xs.distinct.sorted.take(k).toSeq
      // single heap
      val h = new graft.functions.BottomKHeap(k)
      xs.foreach(h.insert)
      assert(h.sortedAscending.toSeq === expected)
      // random split into partial heaps, merged (the Partial/Final path)
      val parts = Array.fill(1 + rng.nextInt(4))(new graft.functions.BottomKHeap(k))
      xs.foreach(x => parts(rng.nextInt(parts.length)).insert(x))
      val merged = parts.reduce { (a, b) => a.mergeFrom(b); a }
      assert(merged.sortedAscending.toSeq === expected,
        s"merge path diverged at k=$k n=$n")
    }
  }

  test("MisraGries property: summary is a superset of every key with freq > N/(k+1)") {
    val rng = new scala.util.Random(774422L)
    (1 to 100).foreach { _ =>
      val k = 8 + rng.nextInt(56)
      // adversarial stream: a few genuinely heavy keys buried in a
      // mostly-unique tail, shuffled
      val nHeavy = 1 + rng.nextInt(4)
      val n = 2000 + rng.nextInt(3000)
      val heavyShare = 2.0 * nHeavy / (k + 1) + 0.05 // comfortably above the bound
      val heavyEach = (n * heavyShare / nHeavy).toInt
      val stream = rng.shuffle(
        (0 until nHeavy).flatMap(h => Seq.fill(heavyEach)(h.toLong)) ++
          (0 until n - nHeavy * heavyEach).map(i => 1000L + i))
      val total = stream.length
      // random split into partial summaries, merged (the Partial/Final path)
      val parts = Array.fill(1 + rng.nextInt(5))(new graft.functions.MisraGriesSummary(k))
      stream.foreach(v => parts(rng.nextInt(parts.length)).add(v))
      val merged = parts.reduce { (a, b) => a.mergeFrom(b); a }
      assert(merged.size <= k)
      val cand = merged.candidates.toSet
      val trueHeavy = stream.groupBy(identity).collect {
        case (v, occ) if occ.length > total / (k + 1) => v
      }
      trueHeavy.foreach(v => assert(cand.contains(v),
        s"key $v with freq > N/(k+1) missing from the summary (k=$k, n=$total)"))
    }
  }

  test("bottom_k_distinct aggregate == window-rank bottom-k on real data") {
    import org.apache.spark.sql.expressions.Window
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        graft.functions.CrossEngine.md5Hash60(col("l_suppkey")).as("h"))
    val viaAgg = li.groupBy(col("l_returnflag"))
      .agg(graft.functions.BottomK.bottomKDistinct(col("h"), 16).as("bottom"))
      .select(col("l_returnflag"), explode(col("bottom")).as("h"))
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("h"))
    val viaWindow = li.distinct()
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 16)
      .select(col("l_returnflag"), col("h"))
    assert(viaAgg.exceptAll(viaWindow).count() === 0)
    assert(viaWindow.exceptAll(viaAgg).count() === 0)
  }

  test("q47/q48 scale contracts: Partial-mode sketch aggregate, no window sort") {
    // VERDICT r4 #1: the grouped bottom-k must fold map-side (Partial-mode
    // BottomKDistinct) and never plan a row_number window over the distinct
    // hashes — asserted on the aggregate nodes, like the q50 pattern
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Partial, PartialMerge}
    for (q <- Seq("q46_kmv_ndv", "q47_kmv_grouped", "q48_kmv_merge")) {
      val plan0 = SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan
      val plan = plan0 match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      assert(plan.collect { case w: WindowExec => w }.isEmpty,
        s"$q must not plan a window sort")
      val partialFns = plan.collect { case h: BaseAggregateExec =>
        h.aggregateExpressions
          .filter(e => e.mode == Partial || e.mode == PartialMerge)
          .map(_.aggregateFunction)
      }.flatten
      assert(partialFns.exists(_.isInstanceOf[graft.functions.BottomKDistinct]),
        s"$q must fold the KMV sketch map-side before the exchange; saw $partialFns")
    }
  }

  test("q54 grouped top-k: Partial-mode heap aggregate, no window sort, window-exact") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Partial, PartialMerge}
    val df = run("q54_grouped_topk")
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      "grouped top-k must not plan a window sort")
    val partialFns = plan.collect { case h: BaseAggregateExec =>
      h.aggregateExpressions
        .filter(e => e.mode == Partial || e.mode == PartialMerge)
        .map(_.aggregateFunction)
    }.flatten
    assert(partialFns.exists(_.isInstanceOf[graft.functions.TopKPairs]),
      s"q54 must fold the top-k heap map-side before the exchange; saw $partialFns")
    // pair-for-pair equal to Spark's own window formulation
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(length(col("text")).desc, col("doc_id").desc)
    val expect = graft.sources.Tables.documents(spark, sfDir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("source"), col("rn").cast("long"), col("doc_id"),
        length(col("text")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expect)
    // merge == single-pass: identical output under adversarial splits
    def topkOf(parts: Int) = graft.sources.Tables.documents(spark, sfDir)
      .repartition(parts)
      .groupBy(col("source"))
      .agg(graft.functions.TopK.topKPairs(
        length(col("text")).cast("long"), col("doc_id"), 3).as("top"))
      .select(col("source"), col("top").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(topkOf(1) === topkOf(13))
  }

  test("LSH hot-bucket cap: a 1000-identical-doc flood stays bounded, organic recall intact") {
    val sp = spark
    import sp.implicits._
    // the pathological shape VERDICT r4 #4 names: boilerplate/license pages
    // — identical text, identical signatures, ONE band bucket
    val flood = (0L until 1000L).map(i =>
      (i, "permission is hereby granted free of charge to any person obtaining a copy"))
    val organic = Seq(
      (5000L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (5001L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"))
    val docs = (flood ++ organic).toDF("doc_id", "text")
    val pairs = graft.operators.Dedup.minhashPairs(docs, bucketCap = 32).collect()
    // uncapped the flood alone is C(1000,2) = 499,500 candidate pairs; the
    // cap bounds it near bands*w*cap/2 (each band splits independently to
    // preserve the OR-redundancy) — linear in flood size at fixed cap
    assert(pairs.length < 200000, s"hot bucket not capped: ${pairs.length} pairs")
    assert(pairs.length > 1000, "flood docs must still pair within sub-buckets")
    // recall outside the hot bucket is untouched
    assert(pairs.exists(r => r.getAs[Long]("doc_a") === 5000L &&
      r.getAs[Long]("doc_b") === 5001L), "organic pair outside the flood lost")
    // no flood doc silently vanishes: each still pairs inside its sub-bucket
    val floodSeen = pairs.flatMap(r =>
      Seq(r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).filter(_ < 1000L).toSet
    assert(floodSeen.size === 1000, s"only ${floodSeen.size}/1000 flood docs pair")

    // same contract on the embedding path: one sign bucket, capped
    val vflood = (0L until 500L).map(i =>
      (i, Array.tabulate(64)(j => (j + 1).toFloat / 64f)))
    val vecs = vflood.toDF("vec_id", "embedding")
    val vpairs = graft.operators.Dedup.embeddingNeardupPairs(vecs, bucketCap = 16)
      .collect()
    assert(vpairs.length < 8000, s"embedding hot bucket not capped: ${vpairs.length}")
    val vSeen = vpairs.flatMap(r =>
      Seq(r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(vSeen.size === 500)
  }

  test("winnowing boilerplate ceiling: a 1000-doc shared-passage flood stays bounded (VERDICT r7 #1)") {
    val sp = spark
    import sp.implicits._
    // 1000 docs all carrying one 30-token boilerplate passage (a license
    // block), each followed by 10 unique filler tokens; one organic
    // near-dup pair (df = 2, far under any ceiling) outside the flood
    val passage = (0 until 30).map(i => s"boiler$i").mkString(" ")
    val flood = (0L until 1000L).map(i =>
      (i, passage + " " + (0 until 10).map(j => s"u${i}x$j").mkString(" ")))
    val organicText = (0 until 40).map(j => s"org$j").mkString(" ")
    val organic = Seq((5000L, organicText), (5001L, organicText + " tail1 tail2"))
    val docs = (flood ++ organic).toDF("doc_id", "text")

    // UNCAPPED, the passage fingerprints (document frequency 1000) alone
    // emit C(1000,2) = 499,500 pairs — the quadratic blowup the ceiling
    // exists for
    val uncapped = graft.operators.Dedup.winnowingPairs(docs, maxDocFreq = 0)
    assert(uncapped.count() >= 499500L, "flood sanity: uncapped join must go quadratic")

    // with the MOSS ceiling, the boilerplate fingerprints are dropped
    // (logged): flood docs share ONLY the passage, so they emit zero
    // pairs; the organic pair's fingerprints (df = 2) are untouched
    val pairs = graft.operators.Dedup.winnowingPairs(docs, maxDocFreq = 8).collect()
    assert(pairs.length < 100, s"boilerplate flood not bounded: ${pairs.length} pairs")
    assert(pairs.exists(r => r.getAs[Long]("doc_a") === 5000L &&
      r.getAs[Long]("doc_b") === 5001L), "organic pair outside the flood lost")
    assert(!pairs.exists(r => r.getAs[Long]("doc_a") < 1000L &&
      r.getAs[Long]("doc_b") < 1000L),
      "flood docs share only dropped boilerplate — no pair may survive")
  }

  test("d17 kernel: WinnowFingerprintSet matches the declarative gram/window/distinct pipeline") {
    import org.apache.spark.sql.expressions.Window
    // the pre-r18 declarative reference, verbatim: stride-1 gram-string
    // explode -> md5Hash60 -> per-doc window minima -> distinct
    def reference(docs: org.apache.spark.sql.DataFrame, k: Int, w: Int) = {
      val grams = docs.select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"), expr(
          s"filter(transform(sequence(1, greatest(size(tk) - ${k - 1}, 1)), " +
            s"i -> concat_ws(' ', slice(tk, i, $k))), g -> size(tk) >= $k)").as("gs"))
        .select(col("doc_id"), size(col("gs")).as("n_grams"),
          posexplode(col("gs")).as(Seq("pos", "g")))
        .select(col("doc_id"), col("n_grams"), col("pos"),
          graft.functions.CrossEngine.md5Hash60(col("g")).as("h"))
      grams
        .withColumn("wmin", min(col("h")).over(
          Window.partitionBy(col("doc_id")).orderBy(col("pos"))
            .rowsBetween(Window.currentRow, w - 1)))
        .filter(col("pos") <= greatest(col("n_grams") - w, lit(0)))
        .select(col("doc_id"), col("wmin").as("fp")).distinct()
    }
    val sp = spark
    import sp.implicits._
    // real corpus + the edge lengths: 0 grams (< k tokens), 1..w-1 grams
    // (single clipped window), exactly w grams, w+1 grams
    val edges = Seq(
      (9000001L, "a b c"), (9000002L, "a b c d"), (9000003L, "a b c d e f"),
      (9000004L, (0 until 11).map(i => s"e$i").mkString(" ")),
      (9000005L, (0 until 12).map(i => s"e$i").mkString(" ")),
      (9000006L, ("dup dup dup dup dup " * 6).trim))
      .toDF("doc_id", "text")
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).unionByName(edges)
    for ((k, w) <- Seq((4, 8), (2, 3))) {
      val kernel = graft.operators.Dedup.winnowFingerprints(docs, k, w)
      val ref = reference(docs, k, w)
      assert(kernel.except(ref).count() === 0L, s"kernel-only rows at k=$k w=$w")
      assert(ref.except(kernel).count() === 0L, s"reference-only rows at k=$k w=$w")
    }
  }

  test("t12 filter verdict: planted copies never survive, keeps are within bounds") {
    val rows = run("t12_filter_verdict").collect()
    val planted = rows.filter(_.getAs[Long]("doc_id") >= 30000000L)
    assert(planted.nonEmpty)
    planted.foreach { r =>
      assert(!r.getAs[Boolean]("is_canonical"), "planted exact copy must lose to its original")
      assert(!r.getAs[Boolean]("keep"))
    }
    val kept = rows.filter(_.getAs[Boolean]("keep"))
    assert(kept.nonEmpty)
    kept.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      assert(n >= 30 && n <= 90)
      assert(r.getAs[Double]("dup_bigram_frac") <= 0.2)
    }
  }

  test("connectedComponents: hash-to-min and large-star/small-star agree exactly") {
    val sp = spark
    import sp.implicits._
    // chains (deep), a star, a triangle, a 2-clique — mixed topologies
    val edges = (
      (0L until 9L).map(i => (100 + i, 100 + i + 1)) ++   // 10-node path
        Seq((200L, 201L), (200L, 202L), (200L, 203L)) ++  // star
        Seq((300L, 301L), (301L, 302L), (300L, 302L)) ++  // triangle
        Seq((400L, 401L))
      ).toDF("src", "dst")
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap
    val viaMin = toMap(graft.operators.Dedup.connectedComponents(edges))
    val viaStar = toMap(graft.operators.Dedup.connectedComponentsStar(edges))
    assert(viaMin === viaStar)
    assert(viaMin(109L) === 100L, "deep chain must collapse to its min")
    assert(viaMin(203L) === 200L && viaMin(302L) === 300L && viaMin(401L) === 400L)
  }

  test("s06 PQ: well-formed top-10 per query, ADC nondecreasing, beats random recall") {
    import graft.functions.VectorExpressions
    val rows = run("s06_ann_pq_oracle").collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet === Set(0L, 1L, 2L))
    byQ.values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Long]("rn"))
      assert(sorted.map(_.getAs[Long]("rn")).toSeq === (1L to 10L))
      val adcs = sorted.map(_.getAs[Double]("adc"))
      assert(adcs.zip(adcs.tail).forall { case (a, b) => a <= b },
        "ADC must be nondecreasing down the ranking")
    }
    // recall vs exact L2 top-10: random would overlap ~0.6 of 30 slots;
    // even the unrefined 16-codeword PQ should hit several
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val exact = emb.crossJoin(q).filter(col("vec_id") =!= col("query_id"))
      .withColumn("d2", expr(
        """aggregate(zip_with(embedding, q_emb,
           (x, y) -> (cast(x as double) - cast(y as double)) * (cast(x as double) - cast(y as double))),
           0.0D, (acc, v) -> acc + v)"""))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("d2"), col("vec_id"))))
      .filter(col("rn") <= 10)
      .select(col("query_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert((got & exact).size >= 4,
      s"PQ recall collapsed: ${(got & exact).size}/30 overlap with exact top-10")
  }

  test("d10 incremental near-dup: asymmetric pairs only, every origin recovered") {
    val rows = run("d10_incremental_neardup").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < 10000000L && r.getAs[Long]("doc_b") >= 10000000L,
        "incremental candidates must be corpus-vs-new, never corpus-vs-corpus")
      assert(r.getAs[Double]("jaccard") >= 0.5)
    }
    // EVERY planted new doc must appear and recover its origin among its
    // matches (grouping only returned rows would let dropped docs pass)
    val expected = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 === 0).select(col("doc_id")).collect()
      .map(_.getLong(0) + 10000000L).toSet
    val byNew = rows.groupBy(_.getAs[Long]("doc_b"))
    assert(expected.subsetOf(byNew.keySet),
      s"planted docs missing from output: ${(expected -- byNew.keySet).take(5)}")
    byNew.foreach { case (newId, matches) =>
      if (expected(newId))
        assert(matches.exists(_.getAs[Long]("doc_a") === newId - 10000000L),
          s"new doc $newId failed to recover its origin")
    }
  }

  test("t14 source mix: per-source keep counts hit the tier fractions exactly") {
    val rows = run("t14_source_mix").collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    assert(bySource.nonEmpty)
    val srcCounts = graft.sources.Tables.documents(spark, sfDir)
      .groupBy(col("source")).count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    bySource.foreach { case (src, kept) =>
      // trailing-digit parse, exactly the query's tier rule (sources with
      // no trailing digits fall to the low tier)
      val trail = "([0-9]+)$".r.findFirstIn(src)
      val frac = if (trail.exists(_.toInt % 2 == 0)) 0.6 else 0.2
      assert(kept.length === math.floor(frac * srcCounts(src)).toLong,
        s"$src kept ${kept.length} of ${srcCounts(src)}")
    }
  }

  test("s07 contrastive pairs: 3 positives + 5 negatives per query, disjoint, positives stronger") {
    val rows = run("s07_contrastive_pairs").collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet === Set(0L, 1L, 2L))
    byQ.foreach { case (_, g) =>
      val pos = g.filter(_.getAs[String]("label") == "pos")
      val neg = g.filter(_.getAs[String]("label") == "neg")
      assert(pos.length === 3 && neg.length === 5)
      val posIds = pos.map(_.getAs[Long]("cand_id")).toSet
      val negIds = neg.map(_.getAs[Long]("cand_id")).toSet
      assert((posIds & negIds).isEmpty, "a negative must never be a positive")
      // the WEAKEST positive is at least as strong as the STRONGEST
      // sampled negative (>= not >: the rank-3/rank-4 cosines can collapse
      // to the same 6dp-rounded value on an adversarial fixture)
      assert(pos.map(_.getAs[Double]("cosine")).min >=
        neg.map(_.getAs[Double]("cosine")).max)
    }
  }

  test("d21 dedup eval: metrics are consistent and banding recall is high") {
    val r = run("d21_dedup_eval").head()
    val (nTruth, nCand, nHit) = (r.getAs[Long]("n_truth"),
      r.getAs[Long]("n_cand"), r.getAs[Long]("n_hit"))
    assert(nTruth > 0 && nCand > 0)
    // hits are an intersection: bounded by both sides
    assert(nHit <= nTruth && nHit <= nCand)
    assert(r.getAs[Long]("precision_micro") === nHit * 1000000L / nCand)
    assert(r.getAs[Long]("recall_micro") === nHit * 1000000L / nTruth)
    // planted truncations sit at J~0.9 where 4-band/2-row banding catches
    // ~99.9%; organic >= 0.5 pairs pull the floor down — 60% is the loose
    // bound that still proves the candidate generator finds real pairs
    assert(r.getAs[Long]("recall_micro") >= 600000L,
      s"banding recall collapsed: ${r.getAs[Long]("recall_micro")}")
  }

  test("q60 fuzzy match: every dirty row links at distance <= 1, mostly to its source") {
    val rows = run("q60_fuzzy_match").collect()
    val nDocs = graft.sources.Tables.documents(spark, sfDir).count()
    // the true source always co-blocks (deletion is past the prefix) and
    // sits at exactly distance 1, so min-dist can never exceed 1
    assert(rows.length === nDocs, "every dirty row must find a match")
    assert(rows.forall(_.getAs[Long]("dist") <= 1L))
    // duplicate titles make a few dirty rows tie to a smaller doc_id; the
    // overwhelming majority must still link to their exact source
    val exact = rows.count(r =>
      r.getAs[Long]("matched_id") === r.getAs[Long]("dirty_id") - 5000000L)
    assert(exact.toDouble / rows.length > 0.9,
      s"only $exact/${rows.length} linked to their source")
  }

  test("q61 interval concurrency: day counts conserve exploded interval mass") {
    val rows = run("q61_interval_concurrency").collect()
    // each lineitem contributes exactly dur+1 day-rows; the per-day counts
    // must conserve that mass exactly (explode drops/duplicates nothing)
    val expected = graft.sources.Tables.lineitem(spark, sfDir)
      .select((col("l_quantity").cast("long") % 14 + 2).as("m"))
      .agg(sum(col("m"))).head().getLong(0)
    assert(rows.map(_.getAs[Long]("n_active")).sum === expected)
    assert(rows.forall(_.getAs[Long]("n_active") > 0))
  }

  test("q62 systematic sample: exactly one row per crossed stride, 200 strides") {
    val rows = run("q62_systematic_sample").collect()
    // 200 sample points (multiples of step <= total) each land in exactly
    // one weight interval; a heavy row may swallow several points but is
    // emitted once, so rows <= 200 with distinct, increasing sample_no
    assert(rows.length <= 200 && rows.length >= 150)
    val nos = rows.map(_.getAs[Long]("sample_no")).sorted
    assert(nos.distinct.length === nos.length, "duplicate sample_no")
    assert(nos.last === 200L, s"last stride must be crossed, got ${nos.last}")
    assert(rows.forall(_.getAs[Long]("w_cents") > 0))
  }

  test("q63 pagerank: top-25 are suppliers, ranks bounded below by the damping floor") {
    val rows = run("q63_pagerank").collect()
    assert(rows.length === 25)
    // suppliers are ~10x rarer than customers in the bipartite purchase
    // graph, so they absorb ~10x the incoming mass — the top of the
    // ranking must be supplier nodes (odd ids under the 2k/2k+1
    // namespacing) for as many suppliers as exist (sf0.001 has only 10)
    val nSupp = graft.sources.Tables.supplier(spark, sfDir).count().toInt
    assert(rows.take(math.min(nSupp, 25))
        .forall(_.getAs[Long]("node") % 2 === 1),
      "a customer outranked suppliers")
    val ranks = rows.map(_.getAs[Long]("rank"))
    // every rank carries at least the (1-d) teleport floor, and the
    // returned set is ordered
    assert(ranks.forall(_ >= 150000L))
    assert(ranks.sameElements(ranks.sorted.reverse))
  }

  test("t26 naive bayes: held-out accuracy on the planted label is perfect") {
    val rows = run("t26_naive_bayes").collect()
    val nTest = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 2 === 1).count()
    assert(rows.length === nTest, "every held-out doc must be classified")
    // the planted promo template gives marker tokens decisive likelihood
    // ratios, and promo's larger token total depresses non-marker
    // likelihoods for organic docs — the learned model must recover the
    // plant on docs it never trained on
    rows.foreach { r =>
      val truth = if (r.getAs[Long]("doc_id") % 3 === 0) "promo" else "organic"
      assert(r.getAs[String]("pred_label") === truth,
        s"doc ${r.getAs[Long]("doc_id")} predicted ${r.getAs[String]("pred_label")}")
    }
  }

  test("m12 audio VAD: every clip segments, bounds are consistent") {
    val rows = run("m12_audio_vad").collect()
    val nDocs = graft.sources.Tables.documents(spark, sfDir).count()
    assert(rows.length === nDocs)
    rows.foreach { r =>
      val (nSeg, nAct) = (r.getAs[Long]("n_segments"), r.getAs[Long]("n_active_windows"))
      // window 2 is forced active, so every clip has at least one segment
      // and its first segment starts no later than window 2
      assert(nSeg >= 1 && nSeg <= 4, s"doc ${r.getAs[Long]("doc_id")}: $nSeg segments")
      assert(nAct >= nSeg && nAct <= 8)
      val (s0, e0) = (r.getAs[Long]("first_start_us"), r.getAs[Long]("first_end_us"))
      assert(s0 >= 0 && s0 <= 2 * 3750L)
      assert(e0 > s0 && e0 <= 8 * 3750L)
    }
  }

  test("m13 shot boundaries: exactly the planted cut per video, wide margin") {
    val rows = run("m13_shot_boundaries").collect()
    val nDocs = graft.sources.Tables.documents(spark, sfDir).count()
    // one hard cut planted per video at frame 2 + doc_id % 5; within-shot
    // frames are identical (Hamming 0) so no spurious boundary can appear
    assert(rows.length === nDocs)
    rows.foreach { r =>
      assert(r.getAs[Long]("cut_frame") === 2 + r.getAs[Long]("doc_id") % 5,
        s"doc ${r.getAs[Long]("doc_id")} cut at wrong frame")
      assert(r.getAs[Long]("hamming") >= 8L)
    }
  }

  test("m14 chunk walker: truncated/corrupt containers degrade to crc_ok=false, never throw") {
    // ADVICE r10: the chunk length is untrusted input; a corrupt container
    // must route to quarantine (crcOk=false), not kill the task
    def validPng(): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val png = validPng()
    // 1) truncated mid-chunk: drop the tail
    val truncated = png.take(png.length / 2)
    assert(graft.operators.Multimodal.pngTextWalk(truncated)._4 === false)
    // 2) absurd declared length in the first chunk (IHDR len field at offset 8)
    val hugeLen = png.clone()
    hugeLen(8) = 0x7F.toByte; hugeLen(9) = 0xFF.toByte
    assert(graft.operators.Multimodal.pngTextWalk(hugeLen)._4 === false)
    // 3) negative declared length
    val negLen = png.clone()
    negLen(8) = 0xFF.toByte
    assert(graft.operators.Multimodal.pngTextWalk(negLen)._4 === false)
    // 4) tiny buffer (shorter than the signature)
    assert(graft.operators.Multimodal.pngTextWalk(Array[Byte](1, 2, 3))._4 === false)
    // 5) a well-formed spliced container still extracts and CRC-verifies
    val keyword = "Source"; val value = "unit-test"
    val data = keyword.getBytes("ISO-8859-1") ++ Array(0.toByte) ++
      value.getBytes("ISO-8859-1")
    val crc = new java.util.zip.CRC32()
    crc.update("tEXt".getBytes("ISO-8859-1")); crc.update(data)
    val bb = java.nio.ByteBuffer.allocate(12 + data.length)
    bb.putInt(data.length).put("tEXt".getBytes("ISO-8859-1"))
      .put(data).putInt(crc.getValue.toInt)
    val cut = 8 + 25
    val spliced = png.take(cut) ++ bb.array() ++ png.drop(cut)
    val (n, kw, vl, ok) = graft.operators.Multimodal.pngTextWalk(spliced)
    assert(ok && kw === keyword && vl === value && n >= 4L)
  }

  test("q71 grouped sample: 3 per source, repeatable, members of their groups") {
    val rows = run("q71_grouped_sample").collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    val nSources = graft.sources.Tables.documents(spark, sfDir)
      .select(col("source")).distinct().count()
    assert(bySource.size === nSources)
    bySource.foreach { case (_, g) =>
      assert(g.length === 3)
      assert(g.map(_.getAs[Long]("draw")).sorted.toSeq === Seq(1L, 2L, 3L))
    }
    // the draw is deterministic: an independent run yields identical ids
    val again = run("q71_grouped_sample").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("draw"))
        -> r.getAs[Long]("doc_id")).toMap
    rows.foreach { r =>
      assert(again((r.getAs[String]("source"), r.getAs[Long]("draw")))
        === r.getAs[Long]("doc_id"))
    }
    // sampled ids really belong to their claimed source
    val srcOf = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
    rows.foreach(r => assert(srcOf(r.getAs[Long]("doc_id")) === r.getAs[String]("source")))
  }

  test("q70 label propagation: cliques converge to min id, bridges outvoted (not CC)") {
    val rows = run("q70_label_propagation").collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap
    val n = graft.sources.Tables.documents(spark, sfDir).count()
    assert(rows.size === n)
    // every node must carry its clique's min id — including bridge
    // endpoints, whose foreign neighbor label is outvoted by clique-mates
    rows.foreach { case (node, label) =>
      assert(label === (node / 8) * 8, s"node $node got label $label")
    }
    // the bridges chain every clique into ONE connected component, so a
    // CC-style closure would yield a single label; LPA must keep them apart
    val nCommunities = rows.values.toSet.size
    assert(nCommunities === ((n + 7) / 8).toInt,
      s"expected ${(n + 7) / 8} communities, got $nCommunities")
    assert(nCommunities > 1)
  }

  test("q72 BFS hops: equals an independent local BFS; both reached and unreached exist") {
    val rows = run("q72_bfs_hops").collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("dist")).toMap
    val n = graft.sources.Tables.documents(spark, sfDir).count().toInt
    assert(rows.size === n)
    // independent recount: textbook queue BFS on the same chain+express graph
    val adj = Array.fill(n)(List.empty[Int])
    for (i <- 0 until n) {
      if (i + 1 < n) { adj(i) ::= i + 1; adj(i + 1) ::= i }
      if (i + 16 < n) { adj(i) ::= i + 16; adj(i + 16) ::= i }
    }
    val dist = Array.fill(n)(Int.MaxValue)
    val queue = scala.collection.mutable.Queue((0 until n).filter(_ % 97 == 0).map { s =>
      dist(s) = 0; s
    }: _*)
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      adj(u).foreach { v =>
        if (dist(v) == Int.MaxValue) { dist(v) = dist(u) + 1; queue += v }
      }
    }
    for (i <- 0 until n) {
      val expected = if (dist(i) <= 6) dist(i).toLong else -1L
      assert(rows(i.toLong) === expected, s"node $i")
    }
    // the 6-round horizon must genuinely split the graph
    assert(rows.values.count(_ == 0L) === (n + 96) / 97)
    assert(rows.values.exists(d => d > 0 && d <= 6))
    assert(rows.values.exists(_ == -1L), "some nodes must sit beyond the horizon")
  }

  test("d25 SemDeDup: twins share their original's cluster and drop; originals survive") {
    val rows = run("d25_semdedup_clusters").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("cluster"), r.getAs[Boolean]("dropped"))).toMap
    val nBase = graft.sources.Tables.embeddings(spark, sfDir).count()
    assert(rows.size === nBase + 20)
    for (i <- 0L until 20L) {
      val (origCluster, _) = rows(i)
      val (twinCluster, twinDropped) = rows(i + 1000000L)
      // an exact copy has identical distance to every centroid, so the
      // cid tiebreak lands it in the same cluster structurally
      assert(twinCluster === origCluster, s"twin of $i changed cluster")
      assert(twinDropped, s"planted twin of $i must drop (original has the smaller id)")
      // the original may only drop if an even-smaller organic neighbor exists;
      // vec 0 can never drop (no smaller id)
    }
    assert(!rows(0L)._2, "vec 0 has no smaller-id neighbor, must keep")
    // clustering must genuinely partition (more than one cluster used)
    assert(rows.values.map(_._1).toSet.size > 1)
    // most of the corpus is organic and must survive
    assert(rows.values.count(!_._2) > nBase / 2)
  }

  test("d26 prefix-filter join: equals brute-force exact Jaccard >= 0.8 (nothing missed)") {
    val got = run("d26_prefix_filter_join").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Double]("jaccard"))
      .toMap
    // brute-force ground truth over the same planted 1-in-5 slice
    val baseTexts = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val texts = baseTexts ++
      baseTexts.filter(_._1 < 50).map { case (id, t) => (id + 1000000L) -> t } ++
      baseTexts.filter(kv => kv._1 >= 50 && kv._1 < 100).map { case (id, t) =>
        val words = t.split(" ", -1)
        (id + 2000000L) -> words.take((words.length * 9 + 9) / 10).mkString(" ")
      }
    val sets = texts.map { case (id, t) => id -> t.split(" ", -1).toSet }
    val ids = sets.keys.toArray.sorted
    var expected = Map.empty[(Long, Long), Double]
    for (i <- ids.indices; j <- (i + 1) until ids.length) {
      val (a, b) = (sets(ids(i)), sets(ids(j)))
      val inter = (a & b).size.toLong
      if (inter * 9 >= (a.size + b.size) * 4L) {
        val jac = inter.toDouble / (a.size + b.size - inter)
        expected += (ids(i), ids(j)) -> (math.rint(jac * 1e6) / 1e6)
      }
    }
    assert(got.keySet === expected.keySet,
      s"missed=${(expected.keySet -- got.keySet).take(5)} extra=${(got.keySet -- expected.keySet).take(5)}")
    expected.foreach { case (k, j) => assert(math.abs(got(k) - j) < 1e-9, s"pair $k") }
    // the plants are genuinely found: every exact copy at J=1
    for (i <- 0L until 50L by 5L) assert(got((i, i + 1000000L)) === 1.0)
    // and at least one truncated plant pairs below J=1 but above threshold
    assert(got.exists { case ((a, b), j) => b >= 2000000L && j < 1.0 && j >= 0.8 })
  }

  test("s25 SQ8: codes bounded, reconstruction within half a bucket, ranks well-formed") {
    val base = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val (arrs, coded) = graft.operators.Similarity.sq8Parts(base)
    val a = arrs.collect()(0)
    val mns = a.getAs[scala.collection.Seq[Double]]("mns").toArray
    val mxs = a.getAs[scala.collection.Seq[Double]]("mxs").toArray
    assert(mns.length === mxs.length)
    mns.indices.foreach(i => assert(mns(i) <= mxs(i)))
    val byId = base.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[scala.collection.Seq[Float]]("embedding")).toMap
    coded.collect().foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val code = r.getAs[scala.collection.Seq[Int]]("code")
      val x = byId(id)
      code.indices.foreach { i =>
        assert(code(i) >= 0 && code(i) <= 255)
        val w = mxs(i) - mns(i)
        val dec = mns(i) + (code(i) + 0.5) * w / 256.0
        // SQ8 contract: the +0.5-centered dequantization sits within half a
        // 1/256 bucket of the original (equality only at x == mx)
        assert(math.abs(x(i).toDouble - dec) <= w / 512.0 + 1e-12,
          s"vec $id dim $i: x=${x(i)} dec=$dec w=$w")
      }
    }
    val rows = run("s25_sq8_ann").collect()
    assert(rows.length === 30)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rn"))
      assert(sorted.map(_.getAs[Long]("rn")).toSeq === (1L to 10L))
      val dists = sorted.map(_.getAs[Double]("dist"))
      assert(dists.zip(dists.tail).forall { case (d1, d2) => d1 <= d2 })
      assert(rs.forall(_.getAs[Long]("neighbor_id") != qid))
      assert(dists.forall(_ >= 0.0))
    }
  }

  test("w15 stats skipping: files skipped, skipped files clean, pruned == full") {
    val r = run("w15_stats_skipping").collect()
    assert(r.length === 1)
    val row = r(0)
    assert(row.getAs[Long]("n_rows") > 0)
    assert(row.getAs[Boolean]("skipped_some"), "the BETWEEN predicate must prune files")
    assert(row.getAs[Boolean]("skipped_clean"), "skipped files must hold no matching rows")
    assert(row.getAs[Boolean]("pruned_equals_full"))
  }

  test("w22 z-order: box touches 1 z-bucket vs 4 linear, y-only prunes z but not linear") {
    val r = run("w22_zorder_clustering").collect()
    assert(r.length === 1)
    val row = r(0)
    assert(row.getAs[Long]("box_rows") > 0)
    // the 4..7 x 4..7 box is exactly one morton nibble: one z bucket of 16
    assert(row.getAs[Long]("z_buckets_box") === 1L)
    assert(row.getAs[Long]("lin_buckets_box") === 4L)
    // the non-range column: z-order prunes 12 of 16, linear prunes nothing
    assert(row.getAs[Long]("z_buckets_yonly") === 4L)
    assert(row.getAs[Long]("lin_buckets_yonly") === 16L)
    assert(row.getAs[Boolean]("pruned_equals_full"))
    assert(row.getAs[Boolean]("skipped_clean"))
    assert(row.getAs[Boolean]("zorder_prunes_nonrange_column"))
  }

  test("w19 partition evolution: each predicate prunes only its own layout") {
    val rows = run("w19_partition_evolution").collect()
    assert(rows.length === 2)
    val byPred = rows.map(r => r.getAs[String]("pred") -> r).toMap
    // spec A covers pred A: 1 of 8 A-files + all 5 B-files; and vice versa
    assert(byPred("mod8_eq_3").getAs[Long]("files_scanned") === 6L)
    assert(byPred("mod5_eq_4").getAs[Long]("files_scanned") === 9L)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") > 0)
      assert(r.getAs[Boolean]("pruned_equals_full"),
        s"${r.getAs[String]("pred")}: pruned read diverged from the full table")
    }
  }

  test("w20 multi-table commit: versions consistent, the torn interleaving is not") {
    val rows = run("w20_multi_table_commit").collect()
      .map(r => r.getAs[String]("view") -> r).toMap
    assert(rows.size === 3)
    Seq("v1", "v2").foreach { v =>
      assert(rows(v).getAs[Boolean]("consistent"), s"$v must reconcile")
      assert(rows(v).getAs[Long]("fact_cents") === rows(v).getAs[Long]("summary_cents"))
    }
    val torn = rows("torn")
    assert(!torn.getAs[Boolean]("consistent"),
      "fact@v2 with summary@v1 must break the invariant")
    assert(torn.getAs[Long]("fact_cents") !== torn.getAs[Long]("summary_cents"))
  }

  test("w16 incremental MV: delta-merged view equals full recompute") {
    val merged = run("w16_incremental_mv").collect()
      .map(r => r.getAs[String]("flag") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("qty_sum"), r.getAs[Long]("cents_sum")))
      .toMap
    val base = graft.sources.Tables.lineitem(spark, sfDir).select(
      col("l_orderkey").as("k"), col("l_returnflag").as("flag"),
      col("l_quantity").cast("long").as("qty"),
      expr("cast(round(l_extendedprice * 100) as bigint)").as("cents"))
    val changed = base.filter(col("k") % 7 =!= 3)
      .unionByName(base.filter(col("k") % 11 === 5))
    val full = changed.groupBy(col("flag"))
      .agg(count(lit(1)).as("n"), sum(col("qty")).as("q"), sum(col("cents")).as("c"))
      .collect()
      .map(r => r.getAs[String]("flag") ->
        (r.getAs[Long]("n"), r.getAs[Long]("q"), r.getAs[Long]("c"))).toMap
    assert(merged === full)
    assert(merged.nonEmpty)
  }

  test("st31 quota admission: 5 smallest ids per host, ranks ordered, state spans batches") {
    val rows = run("st31_stream_quota_admission").collect()
      .map(r => (r.getAs[String]("host"), r.getAs[Long]("doc_id"), r.getAs[Long]("adm_rank")))
    val mxId = graft.sources.Tables.documents(spark, sfDir)
      .agg(max(col("doc_id"))).head().getLong(0)
    val span = mxId / 4 + 1
    val expected = (0L to mxId).groupBy(id => id % 37)
      .flatMap { case (h, ids) => ids.sorted.take(5).zipWithIndex.map {
        case (id, i) => (s"site-$h", id, (i + 1).toLong) } }.toSet
    assert(rows.toSet === expected)
    // every host's 5 admissions must span at least two range files — the
    // quota ledger genuinely crossed micro-batch boundaries
    rows.groupBy(_._1).foreach { case (h, rs) =>
      assert(rs.map(_._2 / span).distinct.length >= 2,
        s"host $h admissions all in one batch — statefulness untested")
    }
  }

  test("GraftExtensions: native functions callable from SQL text") {
    val d = spark.sql(
      "SELECT l2_dist_sq(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head().getDouble(0)
    assert(d === 8.0)
    val dot = spark.sql(
      "SELECT dot_f(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT))) AS x").head().getDouble(0)
    assert(dot === 9.0)
    val nrm = spark.sql("SELECT l2_norm_f(array(3.0D, 4.0D)) AS x").head().getDouble(0)
    assert(nrm === 5.0)
    val bk = spark.sql(
      "SELECT bottom_k_distinct(x, 3) AS s FROM VALUES (CAST(5 AS BIGINT)), " +
        "(CAST(1 AS BIGINT)), (CAST(9 AS BIGINT)), (CAST(1 AS BIGINT)), " +
        "(CAST(7 AS BIGINT)) AS t(x)").head()
      .getAs[scala.collection.Seq[Long]]("s")
    assert(bk.toSet === Set(1L, 5L, 7L))
    val tp = spark.sql(
      "SELECT top_k_pairs(k, p, 2) AS tp FROM VALUES " +
        "(CAST(1 AS BIGINT), CAST(-1 AS BIGINT)), (CAST(4 AS BIGINT), CAST(-4 AS BIGINT)), " +
        "(CAST(3 AS BIGINT), CAST(-3 AS BIGINT)) AS t(k, p)").head()
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("tp")
    assert(tp.map(_.getAs[Long]("sort_key")).toSeq === Seq(4L, 3L))
    // non-literal k must refuse loudly, not mis-size a buffer
    val e = intercept[Exception](spark.sql(
      "SELECT top_k_pairs(k, p, CAST(k AS INT)) FROM VALUES " +
        "(CAST(1 AS BIGINT), CAST(1 AS BIGINT)) AS t(k, p)").head())
    assert(e.getMessage.contains("INT literal") ||
      Option(e.getCause).exists(_.getMessage.contains("INT literal")))
    // bloom_sketch SQL path == the DataFrame aggregate bit-identically
    val sqlWords = spark.sql(
      "SELECT bloom_sketch(x, 128, 4) AS w FROM VALUES ('a'), ('b'), ('c') AS t(x)")
      .head().getAs[scala.collection.Seq[Long]]("w")
    val dfWords = spark.sql("SELECT x FROM VALUES ('a'), ('b'), ('c') AS t(x)")
      .agg(graft.functions.Bloom.bloomSketch(col("x"), 128, 4).as("w"))
      .head().getAs[scala.collection.Seq[Long]]("w")
    assert(sqlWords === dfWords)
    assert(sqlWords.exists(_ != 0L))
  }

  test("q73 SQL parity: the shared text runs through spark.sql and views are dropped") {
    val rows = run("q73_sql_parity").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("r_name")).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      val byRank = rs.sortBy(_.getAs[Long]("rnk"))
      val revs = byRank.map(_.getAs[Long]("revenue_cents"))
      assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    }
    assert(!spark.catalog.tableExists("lineitem"),
      "q73 must drop its temp views after analysis")
  }

  test("q74 SQL native top-k: equals the window formulation; heap plan, no WindowExec") {
    val got = run("q74_sql_native_topk").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("rnk")) ->
        (r.getAs[Long]("doc_id"), r.getAs[Long]("n_chars"))).toMap
    val want = graft.sources.Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"), length(col("text")).cast("long").as("n"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
          .orderBy(col("n").desc, col("doc_id"))))
      .filter(col("rn") <= 3).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("rn").toLong) ->
        (r.getAs[Long]("doc_id"), r.getAs[Long]("n"))).toMap
    assert(got === want)
    // the SQL text must plan the Partial-mode bounded heap, not a window
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    val plan0 = SparkEntry.queries("q74_sql_native_topk")(spark, sfDir)
      .queryExecution.executedPlan
    val plan = plan0 match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      "q74 must not plan a window")
    assert(plan.toString.contains("partial_top_k_pairs"),
      s"q74 must plan the Partial-mode TopKPairs aggregate:\n$plan")
  }

  test("d27 memorization rate: verbatim passages at exactly 1.0, clean twins at 0") {
    val rows = run("d27_memorization_rate").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("test_id")
      val rate = r.getAs[Long]("mem_rate_micro")
      val (ng, nov) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_overlap_grams"))
      assert(nov <= ng)
      if (id >= 50000000L && id < 60000000L) {
        // contaminated plant: a contiguous train passage — every 8-gram hits
        assert(rate === 1000000L, s"plant $id rate=$rate")
        assert(nov === ng)
      } else {
        // vocabulary-disjoint clean twin: no gram can hit
        assert(rate === 0L, s"clean twin $id rate=$rate")
        assert(nov === 0L)
      }
    }
    // both populations present
    assert(rows.exists(_.getAs[Long]("test_id") < 60000000L))
    assert(rows.exists(_.getAs[Long]("test_id") >= 60000000L))
  }

  test("s26 matryoshka: top-10 drawn from the 16-dim shortlist, measured recall reported") {
    val rows = run("s26_matryoshka_rerank").collect()
    assert(rows.length === 30)
    // the re-ranked answers must be a subset of the stage-1 shortlist
    import graft.functions.VectorExpressions.l2DistSq
    val base = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val probes = base.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), expr("slice(embedding, 1, 16)").as("q16"))
    val shortlist = graft.operators.Similarity.knnJoin(
        base.select(col("vec_id"), expr("slice(embedding, 1, 16)").as("emb16")),
        probes, l2DistSq(col("q16"), col("emb16")), k = 50, ascending = true)
      .select(col("query_id"), col("vec_id")).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    rows.foreach { r =>
      assert(shortlist.contains(
        (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))))
      assert(r.getAs[Long]("neighbor_id") !== r.getAs[Long]("query_id"))
    }
    // measured (not asserted) full-recall: how many of the exact full-dim
    // top-10 survive the truncated shortlist — prints for SCALE notes
    val exact = graft.operators.Similarity.knnJoin(base,
        base.filter(col("vec_id") < 3)
          .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")),
        l2DistSq(col("q_emb"), col("embedding")), k = 10, ascending = true)
      .select(col("query_id"), col("vec_id")).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val got = rows.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    info(s"s26 recall@10 vs exact full-dim: ${(exact & got).size}/${exact.size}")
  }

  test("m16 JPEG frame metadata: dims/components from the marker walk, no decode") {
    val rows = run("m16_jpeg_frame_metadata").collect()
    val n = graft.sources.Tables.documents(spark, sfDir).count()
    assert(rows.length === n)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("width") === 24 + (id % 3) * 8)
      assert(r.getAs[Long]("height") === 16 + (id % 2) * 8)
      assert(r.getAs[Long]("n_components") === (if (id % 5 == 0) 1L else 3L))
      assert(r.getAs[Boolean]("baseline_sof_ok"))
      assert(r.getAs[Boolean]("walked_marker_segments"))
      assert(r.getAs[Boolean]("still_decodes"))
    }
  }

  test("m16 jpegSofWalk: corrupt/truncated streams degrade to ok=false, never throw") {
    import graft.operators.Multimodal.jpegSofWalk
    // real JDK-encoded JPEG: walk must find the SOF before any entropy bytes
    val img = new java.awt.image.BufferedImage(40, 24,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    val good = baos.toByteArray
    val (w, h, nc, prog, segs, ok) = jpegSofWalk(good)
    assert(ok && w === 40 && h === 24 && nc === 3 && !prog && segs >= 2)
    // the SOF sits in the header: truncating PAST it still parses, and
    // truncating anywhere BEFORE it degrades gracefully
    val sofEnd = {
      var i = 2; var e = -1
      while (e < 0) {
        val m = good(i + 1) & 0xff
        val len = ((good(i + 2) & 0xff) << 8) | (good(i + 3) & 0xff)
        if (m == 0xc0 || m == 0xc2) e = i + 2 + len else i += 2 + len
      }
      e
    }
    assert(jpegSofWalk(good.take(sofEnd))._6,
      "metadata must parse from the header prefix alone")
    for (cut <- 0 until sofEnd)
      assert(!jpegSofWalk(good.take(cut))._6, s"truncation at $cut must not verify")
    // wrong magic / garbage lengths
    assert(!jpegSofWalk(Array[Byte](1, 2, 3))._6)
    val badLen = good.clone(); badLen(4) = 0x7f.toByte; badLen(5) = 0xff.toByte
    assert(!jpegSofWalk(badLen)._6, "a declared length past EOF must not verify")
  }

  test("m15 WAV INFO metadata: strings extracted, size verified, container decodes") {
    val rows = run("m15_wav_info_metadata").collect()
    val n = graft.sources.Tables.documents(spark, sfDir).count()
    assert(rows.length === n)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("artist") === s"artist-${id % 11}")
      assert(r.getAs[String]("comment") === s"take-${id % 5}")
      assert(r.getAs[Boolean]("has_chunk_framing"))
      assert(r.getAs[Boolean]("riff_ok"))
      assert(r.getAs[Boolean]("decodes_with_info"))
    }
  }

  test("m15 riffInfoWalk: corrupt containers degrade to ok=false, never throw") {
    import graft.operators.Multimodal.riffInfoWalk
    // build one valid spliced WAV through the query machinery is overkill;
    // construct a minimal RIFF by hand
    def le(i: Int): Array[Byte] = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(i).array()
    val info = "INFO".getBytes("ISO-8859-1") ++
      ("IART".getBytes("ISO-8859-1") ++ le(5) ++ "abcd\u0000".getBytes("ISO-8859-1") :+ 0.toByte)
    val body = "WAVE".getBytes("ISO-8859-1") ++
      ("LIST".getBytes("ISO-8859-1") ++ le(info.length) ++ info)
    val good = "RIFF".getBytes("ISO-8859-1") ++ le(body.length) ++ body
    val (nc, art, _, ok) = riffInfoWalk(good)
    assert(ok && nc === 1L && art === "abcd")
    // truncations at every prefix: graceful, no throw
    for (cut <- 0 to good.length - 1) {
      val (_, _, _, okT) = riffInfoWalk(good.take(cut))
      assert(!okT, s"truncation at $cut must not verify")
    }
    // wrong magic
    assert(!riffInfoWalk("JUNK".getBytes ++ good.drop(4))._4)
    // unpatched (stale) outer size — the corruption the walker must catch
    val stale = good.clone()
    stale(4) = (stale(4) - 8).toByte
    assert(!riffInfoWalk(stale)._4)
    // huge declared sub-chunk length inside LIST
    val hugeSub = good.clone()
    // IART length field sits after RIFF(12) + LIST id+len(8) + INFO(4) + IART(4)
    System.arraycopy(le(Int.MaxValue), 0, hugeSub, 12 + 8 + 4 + 4, 4)
    val (_, _, _, okH) = riffInfoWalk(hugeSub)
    assert(!okH)
  }

  test("st33 exactly-once publish: crash replays under same batch id, table matches batch") {
    val rows = run("st33_stream_exactly_once_publish").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("exactly_once_protocol_ok"),
      "crash/replay/idempotence/orphan obligations must all recompute true"))
    // the published table must equal the batch aggregate over ALL events —
    // short if the crashed batch were skipped, doubled if committed twice
    val expect = graft.sources.Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("k"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (n, k) = expect(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_events") === n)
      assert(r.getAs[Long]("key_sum") === k)
    }
  }

  test("st32 streaming MV: maintained view equals full recompute, three merge cycles ran") {
    val rows = run("st32_stream_mv_maintenance").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("multi_batch"),
      "the three change files must drive separate merge cycles"))
    val maintained = rows.map(r => r.getAs[String]("flag") ->
      (r.getAs[Long]("n_rows"), r.getAs[Long]("qty_sum"), r.getAs[Long]("cents_sum"))).toMap
    val base = graft.sources.Tables.lineitem(spark, sfDir).select(
      col("l_orderkey").as("k"), col("l_returnflag").as("flag"),
      col("l_quantity").cast("long").as("qty"),
      expr("cast(round(l_extendedprice * 100) as bigint)").as("cents"))
    val after = base.filter(col("k") % 7 =!= 3)
      .withColumn("qty", col("qty") +
        when(col("k") % 13 === 2, 1L).otherwise(0L))
      .unionByName(base.filter(col("k") % 11 === 5))
    val full = after.groupBy(col("flag"))
      .agg(count(lit(1)).as("n"), sum(col("qty")).as("q"), sum(col("cents")).as("c"))
      .collect().map(r => r.getAs[String]("flag") ->
        (r.getAs[Long]("n"), r.getAs[Long]("q"), r.getAs[Long]("c"))).toMap
    assert(maintained === full)
  }

  test("t36 calibration: label shift makes raw ECE large, Platt repairs it out of sample") {
    val r = run("t36_classifier_calibration").collect()
    assert(r.length === 1)
    val row = r(0)
    assert(row.getAs[Long]("n_test_docs") > 0)
    assert(row.getAs[Boolean]("raw_overconfident"),
      "planted 20% label noise must make the confident classifier miscalibrated")
    assert(row.getAs[Boolean]("platt_improves_ece"))
    assert(row.getAs[Boolean]("platt_shrinks_scores"),
      "the fitted slope must soften (0 < a < 1), not sharpen")
    // Platt machinery sanity on a hand-built frame: perfectly calibrated
    // scores should fit a ~ 1, b ~ 0 and leave ECE unchanged-small
    val sp = spark
    import sp.implicits._
    val rng = new scala.util.Random(7)
    val hand = (1 to 4000).map { _ =>
      val z = rng.nextGaussian() * 2.0
      val p = 1.0 / (1.0 + math.exp(-z))
      (z, if (rng.nextDouble() < p) 1L else 0L)
    }.toDF("z", "label")
    val (a, b) = graft.operators.TextAnalysis.plattFit(hand, "z", "label")
    assert(math.abs(a - 1.0) < 0.25 && math.abs(b) < 0.25,
      s"calibrated data must fit near identity, got a=$a b=$b")
  }

  test("s27 IVF+SQ8: ranks well-formed, candidates confined to probed lists") {
    val rows = run("s27_ivf_sq8").collect()
    assert(rows.length === 30)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rn"))
      assert(sorted.map(_.getAs[Long]("rn")).toSeq === (1L to 10L))
      val ds = sorted.map(_.getAs[Double]("adc"))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
      assert(rs.forall(_.getAs[Long]("neighbor_id") != qid))
    }
    // every returned neighbor must live in one of the query's 2 probed
    // lists — recompute the fixed-quantizer routing independently
    import graft.functions.VectorExpressions.l2DistSq
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val centers = emb.orderBy(col("vec_id")).limit(8)
      .select(col("vec_id").as("cid"), col("embedding").as("center"))
    val crossed = emb.crossJoin(broadcast(centers))
      .select(col("vec_id"), col("cid"),
        round(l2DistSq(col("embedding"), col("center")), 6).as("d2"))
    val listOf = crossed.groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cid"))).as("b"))
      .select(col("vec_id"), col("b.cid").as("list_id")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("list_id")).toMap
    val probed = crossed.filter(col("vec_id") < 3)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
          .orderBy(col("d2"), col("cid"))))
      .filter(col("rn") <= 2).collect()
      .groupBy(_.getAs[Long]("vec_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("cid")).toSet }
    rows.foreach { r =>
      val (q, nb) = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(probed(q).contains(listOf(nb)),
        s"query $q neighbor $nb outside probed lists")
    }
  }

  test("s28 radius search: every pair inside the radius, exact within probed lists") {
    val rows = run("s28_ivf_radius_search").collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("cosine") >= 0.25)
      assert(r.getAs[Long]("neighbor_id") !== r.getAs[Long]("query_id"))
    }
    // range semantics: no rank column, pairs unique
    assert(!rows.headOption.exists(_.schema.fieldNames.contains("rn")))
    val keys = rows.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    assert(keys.distinct.length === keys.length)
    // soundness vs brute force: every returned cosine equals the exact
    // pairwise cosine (the index prunes candidates, never alters scores)
    import graft.functions.VectorExpressions.{dotF, l2NormF}
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val exact = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(dotF(col("embedding"), col("q_emb")) /
          (l2NormF(col("embedding")) * l2NormF(col("q_emb"))), 6).as("c"))
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("c"))
      .toMap
    rows.foreach { r =>
      val k = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(exact(k) === r.getAs[Double]("cosine"))
    }
  }

  test("w17 shallow clone: zero-copy fork, one-file divergence, source untouched") {
    val rows = run("w17_shallow_clone").collect()
    assert(rows.length === 2)
    val byT = rows.map(r => r.getAs[String]("table_name") -> r).toMap
    Seq("source", "clone").foreach { t =>
      val r = byT(t)
      assert(r.getAs[Boolean]("clone_zero_copy"))
      assert(r.getAs[Boolean]("seven_files_shared"))
      assert(r.getAs[Boolean]("one_new_file_from_clone_write"))
      assert(r.getAs[Boolean]("source_manifest_untouched"))
    }
    // same rows/keys, clone cents diverged upward by exactly 7 per b5 row
    assert(byT("source").getAs[Long]("n_rows") === byT("clone").getAs[Long]("n_rows"))
    assert(byT("source").getAs[Long]("key_sum") === byT("clone").getAs[Long]("key_sum"))
    assert(byT("clone").getAs[Long]("cents_sum") > byT("source").getAs[Long]("cents_sum"))
  }

  test("w18 change data feed: classes balance, updates pair, feed reads only changed files") {
    val rows = run("w18_change_data_feed").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("changed_files_only"),
      "the manifest diff must isolate exactly one rewritten file per side"))
    val byType = rows.groupBy(_.getAs[String]("change_type"))
    assert(byType("insert").length === 25)
    assert(byType("update_preimage").length === byType("update_postimage").length)
    // every update pre/post pair shares its key and moved by exactly +100
    val pre = byType("update_preimage").map(r => r.getAs[Long]("k") -> r.getAs[Long]("cents")).toMap
    byType("update_postimage").foreach { r =>
      assert(pre(r.getAs[Long]("k")) + 100L === r.getAs[Long]("cents"))
    }
    // deletes are exactly the k%8==2, k%3==1 slice of orders
    val expectDel = graft.sources.Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") % 8 === 2 && col("o_orderkey") % 3 === 1).count()
    assert(byType("delete").length.toLong === expectDel)
  }

  test("t37 distinct-n: ratios in (0,1], bigrams bound by tokens, all sources present") {
    val rows = run("t37_distinct_n_eval").collect()
    val nSources = graft.sources.Tables.documents(spark, sfDir)
      .select(col("source")).distinct().count()
    assert(rows.length.toLong === nSources)
    rows.foreach { r =>
      val d1 = r.getAs[Double]("distinct_1")
      val d2 = r.getAs[Double]("distinct_2")
      assert(d1 > 0 && d1 <= 1.0)
      assert(d2 > 0 && d2 <= 1.0)
      assert(r.getAs[Long]("n_distinct_unigrams") <= r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("n_distinct_bigrams") <= r.getAs[Long]("n_bigrams"))
      // cross-document diversity: bigram variety can't exceed the square
      // of the unigram vocabulary
      val v = r.getAs[Long]("n_distinct_unigrams")
      assert(r.getAs[Long]("n_distinct_bigrams") <= v * v)
    }
  }

  test("p06 quarantine: all four constraints fire, overlaps multi-reason, totals conserve") {
    val rows = run("p06_constraint_quarantine").collect()
    assert(rows.nonEmpty)
    val reasons = rows.flatMap(_.getAs[String]("reasons").split(","))
    Seq("not_null_cents", "check_cents_positive", "fk_customer",
      "check_status_domain").foreach { c =>
      assert(reasons.contains(c), s"constraint $c never fired")
    }
    rows.foreach(r => assert(r.getAs[Boolean]("clean_landed_constraint_free")))
    // conservation: quarantined + landed == input
    val nInput = graft.sources.Tables.orders(spark, sfDir).count()
    assert(rows.length + rows.head.getAs[Long]("clean_rows") === nInput)
    // reasons are reported in declaration order, no duplicates per row
    val order = Seq("not_null_cents", "check_cents_positive", "fk_customer",
      "check_status_domain")
    rows.foreach { r =>
      val rs = r.getAs[String]("reasons").split(",").toSeq
      assert(rs.distinct === rs)
      assert(rs.sortBy(order.indexOf) === rs)
    }
  }

  test("p03 quality suite: all eight checks run and the clean fixtures pass") {
    val rows = run("p03_quality_checks").collect()
    assert(rows.length === 8)
    val byName = rows.map(r => r.getAs[String]("check") ->
      (r.getAs[Long]("n_bad"), r.getAs[Boolean]("pass"))).toMap
    assert(byName.size === 8, "check names must be unique")
    // pass must be exactly n_bad == 0
    byName.values.foreach { case (n, p) => assert(p === (n === 0L)) }
    // the driver's synthetic star schema is referentially intact
    assert(byName("orders_custkey_fk")._1 === 0L)
    assert(byName("lineitem_orderkey_fk")._1 === 0L)
    assert(byName("orders_orderkey_unique")._1 === 0L)
    assert(byName("customer_name_format")._1 === 0L)
  }

  test("q64 HDR quantiles: log-bucket estimates bound exact percentiles within 2^-4") {
    val rows = run("q64_hdr_quantiles").collect()
    val flags = rows.map(_.getAs[String]("l_returnflag")).distinct
    assert(rows.length === flags.length * 3)
    val exact = graft.sources.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(cast(round(l_extendedprice * 100) as bigint), array(0.5, 0.9, 0.99))").as("p"))
      .collect().map(r => r.getAs[String]("l_returnflag") ->
        r.getSeq[Double](1)).toMap
    rows.foreach { r =>
      val est = r.getAs[Long]("est_cents").toDouble
      val q = r.getAs[Double]("q")
      val ex = exact(r.getAs[String]("l_returnflag"))(Seq(0.5, 0.9, 0.99).indexOf(q))
      // est is the inclusive upper edge of the bucket containing the
      // ceil(q*n)-th order statistic; bucket width is <= 2^-4 of its
      // lower edge, and Spark's `percentile` interpolates between order
      // stats, so the estimate must sit within one relative bucket width
      // of the interpolated exact value on either side
      assert(est >= ex * (1 - 0.0625) - 1, s"$q est $est below exact $ex")
      assert(est <= ex * (1 + 0.0625) + 1, s"$q est $est too far above exact $ex")
    }
  }

  test("s22 filtered kNN: every neighbor satisfies the predicate") {
    val e = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = run("s22_filtered_knn").collect()
    assert(rows.length === 30, "3 queries x top-10")
    rows.foreach { r =>
      val qLabel = e(r.getAs[Long]("query_id"))
      // the filter is part of candidate generation, not post-hoc: no
      // off-label vector may appear at any rank
      assert(r.getAs[Long]("label") === qLabel.toLong,
        s"query ${r.getAs[Long]("query_id")} got an off-label neighbor")
      assert(r.getAs[Long]("rn") >= 1 && r.getAs[Long]("rn") <= 10)
    }
  }

  test("d22 domain cap: exactly min(k, |domain|) kept, hash-uniform") {
    val perSource = graft.sources.Tables.documents(spark, sfDir)
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = run("d22_domain_cap").collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    assert(bySource.keySet === perSource.keySet)
    bySource.foreach { case (src, rs) =>
      assert(rs.length === math.min(20L, perSource(src)).toInt, s"source $src")
      val ids = rs.map(_.getAs[Long]("doc_id"))
      assert(ids.distinct.length === ids.length, s"source $src kept a doc twice")
      // ranks are 1..n and follow ascending hash order (uniform draw)
      val byRank = rs.sortBy(_.getAs[Long]("rnk"))
      assert(byRank.map(_.getAs[Long]("rnk")).toSeq === (1L to rs.length).toSeq)
      val hs = byRank.map(_.getAs[Long]("h"))
      assert(hs.zip(hs.tail).forall { case (a, b) => a <= b }, s"source $src not hash-ordered")
    }
  }

  test("q65 merge upsert: op accounting and values are exact") {
    val rows = run("q65_merge_upsert").collect()
    val n = graft.sources.Tables.orders(spark, sfDir).count()
    val keys = graft.sources.Tables.orders(spark, sfDir)
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    val (nU, nD, nI) = (keys.count(_ % 7 === 0), keys.count(_ % 7 === 1), keys.count(_ % 7 === 2))
    val byOp = rows.groupBy(_.getAs[String]("op")).map { case (k, v) => k -> v.length }
    assert(byOp("U") === nU)
    assert(byOp("I") === nI)
    // inserts land under NEW keys; their source snapshot rows stay 'K'
    assert(byOp("K") === (n - nU - nD).toInt)
    assert(rows.length === (n - nD + nI).toInt, "merged cardinality must be n - deletes + inserts")
    rows.filter(_.getAs[String]("op") === "I").foreach { r =>
      assert(r.getAs[Long]("o_orderkey") >= 10000000L)
      assert(r.getAs[Long]("cents") === 12345L)
    }
  }

  test("t27 tokenizer eval: fertility and compression are consistent per source") {
    val rows = run("t27_tokenizer_eval").collect()
    val nSources = graft.sources.Tables.documents(spark, sfDir)
      .select(col("source")).distinct().count()
    assert(rows.length === nSources)
    rows.foreach { r =>
      val (w, c, t) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("n_tokens"))
      // BPE with merges can never emit more tokens than characters, nor
      // fewer tokens than words (within-word merges only)
      assert(t <= c && t >= w, s"source ${r.getAs[String]("source")}: w=$w c=$c t=$t")
      assert(r.getAs[Long]("chars_per_token_micro") === c * 1000000L / t)
      assert(r.getAs[Long]("fertility_micro") === t * 1000000L / w)
      // 24 merges on this corpus must actually compress: fewer tokens
      // than characters by a real margin
      assert(r.getAs[Long]("chars_per_token_micro") > 1000000L)
    }
  }

  test("t28 ugViterbi: matches brute-force max-likelihood on every segmentation") {
    import graft.operators.TextAnalysis.ugViterbi
    val lp = Map("a" -> -3.0, "b" -> -3.0, "ab" -> -2.0, "ba" -> -2.5,
      "aba" -> -4.9, "abab" -> -3.5, "bb" -> -2.2)
    def brute(w: String): Option[(List[String], Double)] = {
      if (w.isEmpty) Some((Nil, 0.0))
      else (1 to math.min(6, w.length)).flatMap { l =>
        lp.get(w.take(l)).flatMap(p =>
          brute(w.drop(l)).map { case (rest, s) => (w.take(l) :: rest, s + p) })
      }.sortBy(-_._2).headOption
    }
    for (w <- Seq("abab", "ababab", "bbab", "aab", "babba", "a", "abba")) {
      val got = ugViterbi(w, lp)
      val want = brute(w)
      assert(got.map(_._2) === want.map(_._2), s"score mismatch for '$w'")
      got.foreach { case (pieces, _) =>
        assert(pieces.mkString("") === w, s"'$w' must re-concatenate exactly") }
    }
    // missing character -> no segmentation, never a throw
    assert(ugViterbi("abcab", lp).isEmpty)
    // exact tie resolves to the longest final piece: "aba"(-4.9) vs
    // "a"+"ab" = -5.0 vs "ab"+"a" = -5.0 — construct a true tie instead
    val tie = Map("a" -> -1.0, "aa" -> -2.0)
    assert(ugViterbi("aa", tie).get._1 === List("aa"),
      "on equal scores the single longer piece must win")
  }

  test("t30 ugForwardBackward: evidence and expected counts match brute-force enumeration") {
    import graft.operators.TextAnalysis.ugForwardBackward
    val lp = Map("a" -> math.log(0.3), "b" -> math.log(0.2),
      "ab" -> math.log(0.25), "ba" -> math.log(0.15), "abab" -> math.log(0.1))
    def segs(w: String): List[List[String]] =
      if (w.isEmpty) List(Nil)
      else (1 to math.min(6, w.length)).toList.flatMap { l =>
        val h = w.take(l)
        if (lp.contains(h)) segs(w.drop(l)).map(h :: _) else Nil
      }
    for (w <- Seq("abab", "ababab", "aab", "ba", "abba")) {
      val all = segs(w)
      assert(all.nonEmpty)
      val probs = all.map(s => s.map(lp).sum) // log prob per segmentation
      val evidence = math.log(probs.map(math.exp).sum)
      val Some((edges, logEv)) = ugForwardBackward(w, lp)
      assert(math.abs(logEv - evidence) < 1e-9, s"evidence mismatch for '$w'")
      // expected count of each piece = sum over segmentations of
      // P(seg|w) * (occurrences of piece in seg)
      val want = all.zip(probs).foldLeft(Map.empty[String, Double]) {
        case (m, (s, lpr)) =>
          val post = math.exp(lpr - evidence)
          s.foldLeft(m)((m2, p) => m2.updated(p, m2.getOrElse(p, 0.0) + post))
      }
      val got = edges.toMap
      assert(got.keySet === want.keySet, s"piece set mismatch for '$w'")
      want.foreach { case (p, e) =>
        assert(math.abs(got(p) - e) < 1e-9, s"E[count($p)] for '$w': ${got(p)} vs $e")
      }
    }
    assert(ugForwardBackward("abc", lp).isEmpty, "missing char -> None")
  }

  test("t30 soft-EM training: planted morpheme learned, deterministic retrain") {
    import graft.operators.TextAnalysis._
    val words = ugWords(ugCorpus(spark, sfDir)).localCheckpoint(true)
    val (m1, lls) = unigramTrain(words, soft = true)
    assert(m1.contains("zxzxzx"))
    assert(ugViterbi("zxzxzx", m1).get._1 === List("zxzxzx"))
    assert(lls.last <= lls.head + 1e-6,
      s"soft EM must not worsen marginal evidence: ${lls.head} -> ${lls.last}")
    // micro-quantized Long expectations => bit-identical retrain
    val (m2, _) = unigramTrain(words.repartition(5), soft = true)
    assert(m1 === m2, "soft training must be deterministic under repartitioning")
  }

  test("t31 logistic trainer: gradient matches finite differences on a tiny fixture") {
    // the distributed micro-quantized gradient fold against numeric
    // differentiation of the loss it claims to descend
    import graft.operators.TextAnalysis._
    val sp = spark
    import sp.implicits._
    val feats = Seq(
      (1L, 1L, Seq(3, 7), Seq(1.0, 1.0)),
      (2L, 0L, Seq(3, 9), Seq(1.0, 1.0)),
      (3L, 1L, Seq(7), Seq(1.0)),
      (4L, 0L, Seq(9, 11), Seq(1.0, 1.0)))
      .toDF("doc_id", "label", "bks", "vls")
    // one GD step from w=0 recovers the mean gradient: w1 = -rate*g/sqrt(g^2)
    // is sign-only under AdaGrad, so instead recompute the RAW gradient by
    // hand from the same quantized fold the trainer uses: run 1 iteration
    // and invert the AdaGrad update (|step| = rate for every touched coord)
    val (w1, loss1) = lrTrain(feats, iters = 1, rate = 0.25)
    def loss(w: Array[Double]): Double = {
      val rows = Seq((1.0, Seq(3, 7)), (0.0, Seq(3, 9)), (1.0, Seq(7)), (0.0, Seq(9, 11)))
      rows.map { case (y, bks) =>
        val z = w(lrBuckets) + bks.map(w(_)).sum
        val p = 1.0 / (1.0 + math.exp(-z))
        -(y * math.log(p + 1e-12) + (1 - y) * math.log(1 - p + 1e-12))
      }.sum
    }
    assert(math.abs(loss1.head - loss(new Array[Double](lrBuckets + 1))) < 1e-3,
      "reported round-0 loss must equal the analytic loss at w=0")
    // the sign of each first step must OPPOSE the finite-difference slope
    val w0 = new Array[Double](lrBuckets + 1)
    for (k <- Seq(3, 7, 9, 11, lrBuckets)) {
      val eps = 1e-6
      val wp = w0.clone(); wp(k) += eps
      val slope = (loss(wp) - loss(w0)) / eps
      // coords whose first-order gradient cancels exactly (bucket 3: one
      // positive and one negative doc) show only the O(eps) second-order
      // term in the finite difference — guard above it
      if (math.abs(slope) > 1e-4)
        assert(math.signum(w1(k) - w0(k)) === -math.signum(slope),
          s"coord $k must step against the loss slope")
      else
        assert(w1(k) === 0.0, s"coord $k has zero gradient and must not step")
    }
  }

  test("t31 quality classifier: separates plants, generalizes, deterministic retrain") {
    import graft.operators.TextAnalysis._
    val docs = graft.sources.Tables.documents(spark, sfDir).select(col("doc_id"),
      when(col("doc_id") % 3 === 0, lit(1L)).otherwise(lit(0L)).as("label"),
      when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" clickspam buynow clickspam")))
        .otherwise(concat(col("text"), lit(" organiccontent"))).as("text"))
    // train on even ids only; the held-out odd ids probe generalization
    val feats = lrFeatures(docs).localCheckpoint(true)
    val train = feats.filter(col("doc_id") % 2 === 0).localCheckpoint(true)
    val (w, losses) = lrTrain(train, iters = 30, rate = 0.3)
    assert(losses.last < losses.head * 0.5, "training must at least halve the loss")
    val heldErrs = lrPredict(feats.filter(col("doc_id") % 2 === 1), w)
      .filter(col("pred") =!= col("label")).count()
    assert(heldErrs === 0, s"held-out docs misclassified: $heldErrs")
    val (w2, _) = lrTrain(train.repartition(7), iters = 30, rate = 0.3)
    assert(w.toSeq === w2.toSeq, "training must be deterministic under repartitioning")
  }

  test("t32 binnedAuc: matches exact Mann-Whitney AUC when bins separate") {
    import graft.operators.TextAnalysis.binnedAuc
    val sp = spark
    import sp.implicits._
    // hand case 1: perfect separation -> AUC exactly 1
    val perfect = Seq((0.9, 1L), (0.8, 1L), (0.2, 0L), (0.1, 0L)).toDF("z", "label")
    assert(binnedAuc(perfect, "z", "label") === 1.0)
    // hand case 2: one inversion among 2x3 -> exact AUC = 5/6
    val mixed = Seq((0.9, 1L), (0.3, 1L), (0.5, 0L), (0.2, 0L), (0.1, 0L))
      .toDF("z", "label")
    val got = binnedAuc(mixed, "z", "label")
    assert(math.abs(got - 5.0 / 6.0) < 1e-6, s"got $got")
    // hand case 3: random labels on identical scores -> ties give 0.5
    val ties = Seq((0.5, 1L), (0.5, 0L), (0.5, 1L), (0.5, 0L)).toDF("z", "label")
    assert(math.abs(binnedAuc(ties, "z", "label") - 0.5) < 1e-9)
    // degenerate: single-class input reports the uninformative 0.5
    val onecls = Seq((0.9, 1L), (0.1, 1L)).toDF("z", "label")
    assert(binnedAuc(onecls, "z", "label") === 0.5)
    // property: binned == exact on 100 seeded-random well-spread scores
    val rng = new scala.util.Random(77)
    val rand = (0 until 100).map(i => (rng.nextDouble() * 10, (i % 3 == 0).compareTo(false).toLong))
    def exactAuc(xs: Seq[(Double, Long)]): Double = {
      val pos = xs.filter(_._2 == 1L).map(_._1)
      val neg = xs.filter(_._2 == 0L).map(_._1)
      pos.map(p => neg.count(_ < p) + 0.5 * neg.count(_ == p)).sum / (pos.size.toDouble * neg.size)
    }
    val gotR = binnedAuc(rand.toDF("z", "label"), "z", "label")
    // 1024 bins over 100 distinct uniform scores: collisions are rare and
    // tie-handling bounds the deviation well under 1e-2
    assert(math.abs(gotR - exactAuc(rand)) < 1e-2, s"binned $gotR vs exact ${exactAuc(rand)}")
  }

  test("st30 scorer: row-local scoring is bit-identical to the batch predictor") {
    import graft.operators.TextAnalysis._
    val docs = graft.sources.Tables.documents(spark, sfDir).select(col("doc_id"),
      when(col("doc_id") % 3 === 0, lit(1L)).otherwise(lit(0L)).as("label"),
      when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" clickspam buynow clickspam")))
        .otherwise(concat(col("text"), lit(" organiccontent"))).as("text"))
    val feats = lrFeatures(docs).localCheckpoint(true)
    val (w, _) = lrTrain(feats, iters = 5, rate = 0.3) // deliberately
    // under-trained: parity must hold for ANY weights, not just converged
    // ones where both sides saturate to the same sign
    val batch = lrPredict(feats, w).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pred")).toMap
    val rowLocal = lrScoreRowLocal(docs, w).select(col("doc_id"), col("pred"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rowLocal.keySet === batch.keySet)
    rowLocal.foreach { case (id, p) =>
      assert(p === batch(id), s"doc $id: row-local $p vs batch ${batch(id)}")
    }
  }

  test("t28 unigram training: planted morpheme learned, deterministic retrain") {
    import graft.operators.TextAnalysis._
    val words = ugWords(ugCorpus(spark, sfDir)).localCheckpoint(true)
    val (m1, lls) = unigramTrain(words)
    assert(m1.contains("zxzxzx"), "planted whole-word piece must be learned")
    assert(ugViterbi("zxzxzx", m1).get._1 === List("zxzxzx"))
    assert(lls.last <= lls.head + 1e-6,
      s"training must not worsen corpus likelihood: ${lls.head} -> ${lls.last}")
    assert(m1.keys.count(_.length > 1) <= ugVocabCap)
    // exact-Long count pipeline => bit-identical model on retrain
    val (m2, _) = unigramTrain(words.repartition(7))
    assert(m1 === m2, "training must be deterministic under repartitioning")
  }

  test("st29 admission kernel: row-local formulation equals the batch stage chain") {
    // the streaming lane recomputes quality/strip/decontam with in-row
    // HOFs; the batch stages use explode+groupBy. Same corpus, same frozen
    // models — every per-doc verdict must agree between the two
    // formulations (cross-engine parity is the gate's oracle; THIS pins
    // the engine-internal reformulation).
    import graft.operators.{Curation, Dedup}
    val corpus = Dedup.d19Corpus(graft.sources.Tables.documents(spark, sfDir))
      .localCheckpoint(true)
    val (hot, evalGrams) = Curation.frozenAdmissionModels(corpus)
    assert(hot.nonEmpty, "the planted template must produce hot blocks")
    assert(evalGrams.nonEmpty, "the %97 eval slice must produce grams")
    val rowLocal = Curation.admissionVerdict(corpus, hot, evalGrams).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Boolean]("quality_ok"),
          r.getAs[Long]("n_removed"), r.getAs[Boolean]("stripped_empty"),
          r.getAs[Boolean]("contaminated"), r.getAs[Boolean]("admitted"))).toMap
    // batch formulation: explode+groupBy quality stats, lineDedup strip,
    // explode+broadcast-join decontam
    val tk = split(col("text"), " ")
    val stats = corpus.select(col("doc_id"), explode(tk).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_tokens"), max(col("cnt")).as("top_cnt"))
    val stripped = Dedup.lineDedup(corpus, blockTokens = 10, maxDf = 50)
    val sp2 = spark
    import sp2.implicits._
    val evalSet = evalGrams.toSet
    val contaminated = stripped.filter(col("text_clean") =!= "")
      .select(col("doc_id"), split(col("text_clean"), " ").as("tk"))
      .select(col("doc_id"), explode(Dedup.wordNgrams(8)).as("g"))
      .select(col("doc_id"), graft.functions.CrossEngine.md5Hash60(col("g")).as("h"))
      .filter(col("h").isin(evalSet.toSeq: _*))
      .select(col("doc_id")).distinct().as[Long].collect().toSet
    val batch = stats.join(stripped, Seq("doc_id")).collect().map { r =>
      val nt = r.getAs[Long]("n_tokens")
      val q = nt >= 30 && nt <= 130 &&
        BigDecimal(r.getAs[Long]("top_cnt").toDouble / nt)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble <= 0.2
      val id = r.getAs[Long]("doc_id")
      val empty = r.getAs[String]("text_clean") == ""
      val cont = contaminated.contains(id)
      id -> ((nt, q, r.getAs[Long]("n_removed"), empty, cont, q && !empty && !cont))
    }.toMap
    assert(rowLocal.keySet === batch.keySet)
    rowLocal.foreach { case (id, v) =>
      assert(v === batch(id), s"doc $id: row-local $v vs batch ${batch(id)}")
    }
  }

  test("SortedSetOverlap: binary-search membership, codegen and interpreted agree") {
    val sp = spark
    import sp.implicits._
    val set = Array(-50L, 0L, 7L, 1000L, Long.MaxValue).sorted
    val rows = Seq(
      (1L, Seq(1L, 2L, 7L)),     // hit mid
      (2L, Seq(-50L)),           // hit first
      (3L, Seq(Long.MaxValue)),  // hit last
      (4L, Seq(1L, 2L, 3L)),     // miss
      (5L, Seq.empty[Long]),     // empty array
      (6L, Seq(999L, 1001L)))    // straddles without hitting
      .toDF("id", "xs")
    val got = rows.select(col("id"),
        graft.functions.VectorExpressions.sortedSetOverlap(col("xs"), set).as("o"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got === Map(1L -> true, 2L -> true, 3L -> true,
      4L -> false, 5L -> false, 6L -> false))
    // interpreted path must agree (the HOF-lambda context runs eval())
    val e = graft.functions.SortedSetOverlap(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1L, 2L, 7L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)), set)
    assert(e.eval(null) === true)
    // wrong element type fails at analysis, not mid-job
    intercept[org.apache.spark.sql.AnalysisException] {
      rows.select(graft.functions.VectorExpressions
        .sortedSetOverlap(col("id"), set)).collect()
    }
  }

  test("w07 compaction preserves data identity and reduces files") {
    val r = run("w07_compact_small_files").head()
    val o = graft.sources.Tables.orders(spark, sfDir)
    assert(r.getAs[Long]("n_rows") === o.count())
    assert(r.getAs[Long]("key_sum") ===
      o.agg(sum(col("o_orderkey"))).head().getLong(0))
    assert(r.getAs[Boolean]("fragmented"), "harness must start fragmented")
    assert(r.getAs[Boolean]("compacted_to_4"), "compaction must reduce file count")
  }

  test("s23 IVF filtered search: predicate holds and recall can only shrink vs s05") {
    val e = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = run("s23_ivf_filtered").collect()
    assert(rows.nonEmpty && rows.length <= 30)
    rows.foreach { r =>
      assert(r.getAs[Long]("label") === e(r.getAs[Long]("query_id")).toLong,
        "off-label neighbor escaped the pushed filter")
    }
    // restricting candidates can never improve the best hit: per query,
    // the filtered top-1 cosine is bounded by the unfiltered top-1
    val unfilteredBest = run("s05_ann_ivf_oracle").collect()
      .filter(_.getAs[Long]("rn") === 1L)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("cosine")).toMap
    rows.filter(_.getAs[Long]("rn") === 1L).foreach { r =>
      assert(r.getAs[Double]("cosine") <=
        unfilteredBest(r.getAs[Long]("query_id")) + 1e-9,
        s"filtered top-1 beat unfiltered for query ${r.getAs[Long]("query_id")}")
    }
  }

  test("st21 drift monitor: PSI terms match the two-period batch formula") {
    val rows = run("st21_stream_drift_psi").collect()
    assert(rows.length === 10, "all 10 frozen bins must materialize")
    val (na, nb) = (rows.map(_.getAs[Long]("n_a")).sum, rows.map(_.getAs[Long]("n_b")).sum)
    val total = graft.sources.Tables.events(spark, sfDir).count()
    assert(na + nb === total, "every event must land in exactly one period+bin")
    assert(na > 0 && nb > 0, "both periods must be populated")
    rows.foreach(r => assert(!r.getAs[Double]("psi_term").isNaN))
  }

  test("q66 unpivot: 3 measures per flag, discount/tax ordering holds") {
    val rows = run("q66_unpivot_measures").collect()
    val flags = rows.map(_.getAs[String]("l_returnflag")).distinct
    assert(rows.length === flags.length * 3)
    flags.foreach { f =>
      val m = rows.filter(_.getAs[String]("l_returnflag") === f)
        .map(r => r.getAs[String]("measure") -> r.getAs[Long]("total_cents")).toMap
      assert(m.keySet === Set("extended", "discounted", "charged"))
      // discounts only subtract; tax only adds
      assert(m("discounted") <= m("extended"))
      assert(m("charged") >= m("discounted"))
      val ns = rows.filter(_.getAs[String]("l_returnflag") === f)
        .map(_.getAs[Long]("n")).distinct
      assert(ns.length === 1, "every measure sees the same row count")
    }
  }

  test("q67 batch sessionization agrees with the streaming session windows") {
    val rows = run("q67_sessionize").collect()
    // same 30-minute gap rule as st03's session_window lane: the batch
    // window formulation and Structured Streaming's session merge must
    // carve the identical sessions
    val streaming = run("st03_session_window").count()
    assert(rows.length.toLong === streaming,
      s"batch carved ${rows.length} sessions, streaming $streaming")
    rows.foreach { r =>
      assert(r.getAs[Long]("end_sec") >= r.getAs[Long]("start_sec"))
      assert(r.getAs[Long]("n_events") >= 1L)
      assert(r.getAs[Long]("session_no") >= 1L)
    }
  }

  test("d23 quality canonical: the keeper is the longest member, not the min id") {
    val rows = run("d23_quality_canonical").collect()
    val byCluster = rows.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (cid, members) =>
      val keepers = members.filter(_.getAs[Boolean]("is_keeper"))
      assert(keepers.length === 1, s"cluster $cid has ${keepers.length} keepers")
      val k = keepers.head
      // the keeper carries the cluster's max token count
      assert(k.getAs[Long]("n_tokens") === members.map(_.getAs[Long]("n_tokens")).max)
      // the plant makes quality-keep observable: generation 1 (+1e7) is
      // strictly longer than its base, so min-id would ALWAYS pick the
      // base and always be wrong here
      assert(k.getAs[Long]("doc_id") >= 10000000L && k.getAs[Long]("doc_id") < 20000000L,
        s"cluster $cid kept ${k.getAs[Long]("doc_id")} — not the long variant")
      assert(k.getAs[Long]("doc_id") !== cid, "keeper must differ from the min-id label")
    }
  }

  test("s24 IVF stats: shares sum to ~1, imbalance bounded below by 1") {
    val rows = run("s24_ivf_stats").collect()
    assert(rows.length === 8, "one row per coarse list")
    val total = rows.map(_.getAs[Long]("n_vecs")).sum
    assert(total === graft.sources.Tables.embeddings(spark, sfDir).count())
    val shares = rows.map(_.getAs[Long]("share_micro")).sum
    assert(shares > 990000L && shares <= 1000000L, s"shares sum $shares")
    val imb = rows.map(_.getAs[Long]("imbalance_micro")).distinct
    assert(imb.length === 1, "imbalance is a global stat replicated per row")
    assert(imb.head >= 1000000L, "max/mean can never be below 1")
  }

  test("h11 LISI eval: correction improves neighborhood batch mixing") {
    val r = run("h11_lisi_eval").head()
    // the planted batch offset separates raw neighborhoods by batch;
    // after harmony's correction each probe's k-NN must be more
    // batch-diverse — the harmony paper's own iLISI ordering
    assert(r.getAs[Boolean]("mixing_improves"), "iLISI did not increase")
    assert(r.getAs[Boolean]("lisi_in_range"))
    assert(r.getAs[Boolean]("lisi_finite"))
    assert(r.getAs[Boolean]("cells_preserved"))
    assert(r.getAs[Long]("n_cells") ===
      graft.sources.Tables.embeddings(spark, sfDir).count())
  }

  test("q77 retention cohorts: week-0 is total, counts bounded, cohorts complete") {
    val rows = run("q77_retention_cohorts").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("week_offset") >= 0L)
      assert(r.getAs[Long]("n_active") <= r.getAs[Long]("n_cohort"))
      assert(r.getAs[Double]("retention") > 0.0 &&
        r.getAs[Double]("retention") <= 1.0)
    }
    // a user's signup event is itself week-0 activity, so every cohort's
    // offset-0 cell retains everyone
    val week0 = rows.filter(_.getAs[Long]("week_offset") == 0L)
    val cohorts = rows.map(_.getAs[java.sql.Date]("cohort")).distinct
    assert(week0.length === cohorts.length, "every cohort must have a week-0 row")
    week0.foreach { r =>
      assert(r.getAs[Long]("n_active") === r.getAs[Long]("n_cohort"))
      assert(r.getAs[Double]("retention") === 1.0)
    }
    // cohort sizes partition the signup-user population
    val ev = graft.sources.Tables.events(spark, sfDir)
    val nSignupUsers = ev.filter(col("event_type") === "signup")
      .select("user_id").distinct().count()
    assert(week0.map(_.getAs[Long]("n_cohort")).sum === nSignupUsers)
  }

  test("w21 deletion vectors: mask arithmetic exact, base untouched, compaction faithful") {
    val rows = run("w21_deletion_vectors").collect()
    assert(rows.length === 4) // one row per bucket
    rows.foreach { r =>
      assert(r.getAs[Long]("n_live") ===
        r.getAs[Long]("n_base") - r.getAs[Long]("n_del_v1") - r.getAs[Long]("n_del_v2"))
      assert(r.getAs[Boolean]("base_untouched_through_deletes"))
      assert(r.getAs[Boolean]("compaction_equals_masked_read"))
      assert(r.getAs[Boolean]("dv_sidecars_disjoint"))
    }
    // both delete commits must actually bind on the fixture
    assert(rows.map(_.getAs[Long]("n_del_v1")).sum > 0L)
    assert(rows.map(_.getAs[Long]("n_del_v2")).sum > 0L)
  }

  test("q80 SCD2: purchases partition across tiers, exactly one current version per user") {
    val rows = run("q80_scd2_dimension").collect()
    val ev = graft.sources.Tables.events(spark, sfDir)
    val nPurch = ev.filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getAs[Long]("n_purchases")).sum === nPurch,
      "every purchase must land in exactly one tier (or -1 untracked)")
    val nUsers = ev.filter(col("event_type") === "view")
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_current")).sum === nUsers,
      "current versions must equal versioned users")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("one_current_per_user"))
      assert(r.getAs[Boolean]("point_in_time_unique"))
      assert(r.getAs[Long]("n_versions") >= r.getAs[Long]("n_current"))
    }
    val tiers = rows.map(_.getAs[Long]("tier")).toSet
    assert(tiers.subsetOf(Set(-1L, 0L, 1L, 2L)))
  }

  test("q78 attribution: channels partition purchases, shares sum to one") {
    val rows = run("q78_last_touch_attribution").collect()
    val ev = graft.sources.Tables.events(spark, sfDir)
    val nPurch = ev.filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getAs[Long]("n_purchases")).sum === nPurch,
      "every purchase must be attributed to exactly one channel (or direct)")
    val channels = rows.map(_.getAs[String]("channel")).toSet
    assert(channels.subsetOf(Set("view", "click", "direct")))
    val shares = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shares - 1.0) < 1e-4, s"shares sum to $shares")
    // the fixture has touch activity, so not everything can be direct
    assert(rows.exists(r => r.getAs[String]("channel") != "direct" &&
      r.getAs[Long]("n_purchases") > 0L))
  }

  test("d31 takedown dedup: incremental == recompute, re-election and splits both exercised") {
    val after = run("d31_takedown_dedup").collect()
    assert(after.nonEmpty)
    after.foreach { r =>
      assert(r.getAs[Boolean]("incremental_equals_recompute"))
      assert(r.getAs[Boolean]("takedown_complete"))
      assert(r.getAs[Long]("doc_id") % 7 !== 0L, "a doomed doc survived")
    }
    // exactly one canonical per cluster
    after.groupBy(_.getAs[Long]("cluster_id")).foreach { case (cid, rows) =>
      assert(rows.count(_.getAs[Boolean]("is_canonical")) === 1, s"cluster $cid")
      assert(rows.length === rows.head.getAs[Long]("cluster_size"))
    }
    // the fixture must exercise BOTH interesting paths vs the pre-takedown
    // clustering (d09 on the same synthesis):
    val before = run("d09_dup_clusters").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Boolean]("is_canonical"))).toMap
    val afterById = after.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("cluster_id"), r.getAs[Boolean]("is_canonical"))).toMap
    // (a) re-election: a doc canonical NOW that was not canonical before
    assert(afterById.exists { case (id, (_, can)) =>
      can && before.get(id).exists(!_._2)
    }, "no canonical was re-elected — the doomed set missed every representative")
    // (b) split: some pre-takedown cluster's survivors land in >= 2 clusters
    val splits = before.toSeq
      .flatMap { case (id, (cid0, _)) => afterById.get(id).map(a => cid0 -> a._1) }
      .groupBy(_._1).count(_._2.map(_._2).distinct.size >= 2)
    assert(splits >= 1, "no cluster split — the doomed set bridged nothing")
  }

  test("d29 cdc chunking: boundaries resync after the planted prefix shift") {
    val rows = run("d29_cdc_chunking").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_cdc_shared") <= r.getAs[Long]("n_cdc_chunks"))
      // a shared chunk set larger than the fixed scheme's is the whole
      // point of content-defined boundaries under a prefix shift
      assert(r.getAs[Long]("n_cdc_shared") >= r.getAs[Long]("n_fixed_shared"))
    }
    // aggregate teeth: CDC recovers real overlap (measured 18/13/135
    // shared chunks at the three SFs) while 16-token fixed chunking is
    // destroyed by the 3-token shift (0 shared everywhere); allow a rare
    // boundary-less or periodic doc without flaking
    val cdc = rows.map(_.getAs[Long]("n_cdc_shared")).sum
    val fixed = rows.map(_.getAs[Long]("n_fixed_shared")).sum
    assert(cdc > 0L, "CDC recovered no shared chunks across all planted pairs")
    assert(fixed * 4 <= cdc,
      s"fixed chunking ($fixed) should be far below CDC ($cdc) under the shift")
    val wins = rows.count(r =>
      r.getAs[Long]("n_cdc_shared") > r.getAs[Long]("n_fixed_shared"))
    assert(wins * 10 >= rows.length * 9,
      s"CDC strictly beat fixed on only $wins/${rows.length} planted pairs")
  }

  test("h13 ASW eval: planted batches separate, correction lifts the batch score") {
    val r = run("h13_asw_eval").head()
    assert(r.getAs[Boolean]("planted_separation_detected"),
      "raw batch-ASW above 0.6 — the planted offset should separate the batches")
    assert(r.getAs[Boolean]("mixing_improves"),
      "harmony correction did not lift the batch-ASW score")
    assert(r.getAs[Boolean]("scores_in_range"))
    assert(r.getAs[Boolean]("cells_preserved"))
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    assert(r.getAs[Long]("n_batches") ===
      emb.select("label").distinct().count())
    assert(r.getAs[Long]("n_cells") === emb.count())
    // simplified-silhouette identity on a worked example: point at x=1,
    // own centroid at 0, nearest other at 4 -> a=1, b=3, s=(3-1)/3,
    // batch score contribution 1-|s| = 1/3
    assert(math.abs((1.0 - (3.0 - 1.0) / 3.0) - 1.0 / 3.0) < 1e-12)
  }

  test("h14 correction serve: frozen apply exact, held-out mixing improves") {
    val r = run("h14_correction_serve").head()
    assert(r.getAs[Boolean]("exact_apply_matches"),
      "frozen-W re-apply must reproduce the fit's corrected output bit-for-bit")
    assert(r.getAs[Boolean]("heldout_mixing_improves"),
      "serving held-out cells through the frozen model must lift batch-ASW")
    assert(r.getAs[Boolean]("r_column_stochastic"))
    assert(r.getAs[Boolean]("served_finite"))
    assert(r.getAs[Boolean]("cells_preserved"))
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    assert(r.getAs[Long]("n_held") ===
      emb.filter(col("vec_id") % 2 === 1).count())
  }

  test("h15 model persist: fields roundtrip exact, disk serve == memory serve") {
    val r = run("h15_model_persist").head()
    assert(r.getAs[Boolean]("fields_roundtrip_exact"),
      "a persisted model field drifted through the parquet roundtrip")
    assert(r.getAs[Boolean]("disk_serve_equals_memory_serve"),
      "serving from the reloaded model diverged from the in-memory fit")
    assert(r.getAs[Boolean]("cells_preserved"))
    assert(r.getAs[Boolean]("single_model_file"))
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    assert(r.getAs[Long]("n_served") ===
      emb.filter(col("vec_id") % 2 === 1).count())
    // fit-once/serve-many: h14 and h15 serve under ONE shared reference
    // fit (the GraphIndexCache discipline) — a second entry must not refit
    run("h14_correction_serve").head()
    assert(graft.harmony.HarmonyQueries.FrozenFitCache.buildCount.get() === 1L,
      "frozen-model entries regressed to fit-per-entry")
  }

  test("h12 kBET eval: planted effect rejects, correction drops the rate") {
    val r = run("h12_kbet_eval").head()
    assert(r.getAs[Boolean]("planted_effect_detected"),
      "raw rejection rate below 0.9 — the planted offset should be obvious")
    assert(r.getAs[Boolean]("rejection_drops"),
      "harmony correction did not drop the kBET rejection rate")
    assert(r.getAs[Boolean]("rates_in_range"))
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    assert(r.getAs[Long]("n_batches") ===
      emb.select("label").distinct().count())
    assert(r.getAs[Long]("n_probes") === math.min(200L, emb.count()))
    // the zero-count-safe χ² identity used by the entry equals the
    // textbook all-categories sum on a worked example: k=15, B=3,
    // p=(0.5,0.3,0.2), observed n=(10,5,0)
    val p = Seq(0.5, 0.3, 0.2); val n = Seq(10.0, 5.0, 0.0); val k = 15.0
    val textbook = (p, n).zipped.map((pb, nb) =>
      math.pow(nb - k * pb, 2) / (k * pb)).sum
    val identity = (p, n).zipped.collect {
      case (pb, nb) if nb > 0 => nb * nb / (k * pb) }.sum - k
    assert(math.abs(textbook - identity) < 1e-12)
  }

  test("q68 source overlap: matrix covers all pairs, below-k estimates exact") {
    val rows = run("q68_source_overlap").collect()
    val nSources = graft.sources.Tables.documents(spark, sfDir)
      .select(col("source")).distinct().count().toInt
    assert(rows.length === nSources * (nSources - 1) / 2, "one row per unordered pair")
    rows.foreach { r =>
      val (k, est, ex) = (r.getAs[Long]("k_used"),
        r.getAs[Long]("est_jaccard_micro"), r.getAs[Long]("exact_jaccard_micro"))
      assert(est >= 0L && est <= 1000000L && ex >= 0L && ex <= 1000000L)
      // the synthetic vocab keeps every pair union below k=128: the KMV
      // sketch then IS the distinct set and the estimate must be exact
      // (the q57 below-k contract); at real vocab sizes this becomes the
      // 1/sqrt(k) approximate regime
      if (k < 128L) assert(est === ex, s"below-k must be exact: $est vs $ex")
    }
  }

  test("ordered-bits bijection: order-isomorphic and exactly invertible") {
    import graft.functions.OrderedBits
    val sp = spark
    import sp.implicits._
    // adversarial doubles: signs, zeros, denormals, magnitudes, exact ties
    val vals = Seq(-1.0e300, -3.5, -1.0, -1.0e-310, -0.0, 0.0, 1.0e-310,
      0.1, 0.1, 1.0, 2.5, 1.0e300, Double.MinPositiveValue,
      -Double.MinPositiveValue, math.Pi, -math.Pi)
    val rows = vals.toDF("d")
      .select(col("d"), OrderedBits.toBits(col("d")).as("k"))
      .select(col("d"), col("k"), OrderedBits.toDouble(col("k")).as("back"))
      .collect()
    rows.foreach { r =>
      val (d, back) = (r.getDouble(0), r.getDouble(2))
      assert(java.lang.Double.compare(d + 0.0, back + 0.0) === 0 || d === back,
        s"roundtrip $d -> ${r.getLong(1)} -> $back")
    }
    val byD = rows.sortBy(_.getDouble(0))
    val byK = rows.sortBy(_.getLong(1))
    assert(byD.map(_.getDouble(0)).toSeq === byK.map(_.getDouble(0)).toSeq,
      "long-key order must equal double order")
  }

  test("l2DistSq matches the HOF zip_with formulation bit-for-bit") {
    // the codegen'd distance must be a pure drop-in for the HOF form it
    // replaces on the kNN hot path: same double math, same index order
    val e = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val pairs = e.crossJoin(broadcast(
        e.filter(col("vec_id") < 3)
          .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))))
      .select(
        graft.functions.VectorExpressions.l2DistSq(col("embedding"), col("q_emb")).as("fast"),
        aggregate(
          zip_with(col("embedding"), col("q_emb"),
            (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
          lit(0.0), (acc, dd) => acc + dd).as("hof"))
    assert(pairs.filter(col("fast") =!= col("hof")).count() === 0L)
  }

  test("knnJoin: window-exact for both directions, ties break toward small ids") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.expressions.Window
    // deliberately tie-heavy scores (score = id % 5 has 20 ties per value)
    // plus negatives, so selection AT the k boundary exercises tie-break
    val corpus = sp.range(0, 100).toDF("vec_id")
      .withColumn("score_base", (col("vec_id") % 5).cast("double") - lit(2.0))
    val probes = Seq(0L, 1L).toDF("query_id")
    val score = col("score_base") + col("query_id") * lit(0.25)
    for (asc <- Seq(false, true)) {
      val got = graft.operators.Similarity.knnJoin(
          corpus, probes, score, k = 7, ascending = asc)
        .select(col("query_id"), col("vec_id"), col("score"), col("rn"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .sortBy(t => (t._1, t._4))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(if (asc) col("s") else col("s").desc, col("vec_id"))
      val want = corpus.crossJoin(probes)
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("s", score)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 7)
        .select(col("query_id"), col("vec_id"), col("s"), col("rn"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .sortBy(t => (t._1, t._4))
      assert(got.toSeq === want.toSeq, s"knnJoin(asc=$asc) diverged from window")
    }
  }

  test("s01/knnJoin scale contract: Partial-mode heap aggregate, no window sort") {
    // VERDICT r9 #1: rank-after-distance lanes must fold per-probe
    // neighborhoods into the bounded TopKPairs heap map-side — never a
    // WindowExec over the scored pairs (the q54 pattern, applied to kNN)
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Partial, PartialMerge}
    val sp = spark
    import sp.implicits._
    // s01 itself (cosine desc) plus h11's shape (d2 asc over the same table)
    val e = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val probes = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val d2 = graft.functions.VectorExpressions.l2DistSq(col("embedding"), col("q_emb"))
    // every rank-after-distance gate entry (brute force, LSH buckets, IVF
    // probes, PQ/ADC, filtered, hard negatives) plus h11's ascending shape;
    // s07 is the one deliberate window (it needs unbounded ranks)
    val shapes = Seq("s01_knn_bruteforce", "s02_knn_lsh", "s03_ann_ivf",
        "s04_knn_lsh_oracle", "s05_ann_ivf_oracle", "s06_ann_pq_oracle",
        "s08_ann_pq_trained", "s10_ann_ivfpq", "s20_hard_negatives",
        "s22_filtered_knn", "s23_ivf_filtered",
        "s25_sq8_ann", "s26_matryoshka_rerank").map(n => n -> run(n)) :+
      ("h11 d2-ascending shape" ->
        graft.operators.Similarity.knnJoin(e, probes, d2, k = 15, ascending = true))
    for ((label, df) <- shapes) {
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      assert(plan.collect { case w: WindowExec => w }.isEmpty,
        s"$label must not plan a window sort")
      val partialFns = plan.collect { case h: BaseAggregateExec =>
        h.aggregateExpressions
          .filter(x => x.mode == Partial || x.mode == PartialMerge)
          .map(_.aggregateFunction)
      }.flatten
      assert(partialFns.exists(_.isInstanceOf[graft.functions.TopKPairs]),
        s"$label must fold neighborhoods map-side; saw $partialFns")
    }
  }

  test("URL canonicalizer: adversarial raw forms normalize correctly") {
    val sp = spark
    import sp.implicits._
    val cases = Seq(
      // case noise + default port + utm-only query + fragment: all erased
      ("HTTP://WWW.Example.COM:80/Path?utm_source=a#frag",
        "http://www.example.com/Path", "example.com"),
      // https default port; utm leading, real param kept with repaired '?'
      ("https://Example.com:443/p?utm_campaign=c&id=2",
        "https://example.com/p?id=2", "example.com"),
      // non-default port survives; trailing utm stripped cleanly
      ("http://example.com:8080/p?id=2&utm_medium=m",
        "http://example.com:8080/p?id=2", "example.com"),
      // consecutive utm params, nothing else: whole query goes
      ("http://a.org/x?utm_a=1&utm_b=2", "http://a.org/x", "a.org"),
      // utm sandwich: leading and trailing around a kept param
      ("http://a.org/x?utm_a=1&id=3&utm_b=2", "http://a.org/x?id=3", "a.org"),
      // path/query case is preserved; only scheme+authority folds
      ("HTTPS://A.ORG/CasePath?ID=Q", "https://a.org/CasePath?ID=Q", "a.org"),
      // :80 on https is NOT default and must survive
      ("https://a.org:80/p", "https://a.org:80/p", "a.org"),
      // fragment containing '?' must not resurrect a query
      ("http://a.org/p#frag?utm_x=1", "http://a.org/p", "a.org"))
    val got = cases.map(_._1).toDF("u")
      .select(graft.operators.Dedup.canonicalUrl(col("u")).as("c"))
      .select(col("c"), graft.operators.Dedup.urlHost(col("c")).as("h"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    got.zip(cases).foreach { case ((canon, host), (raw, wantCanon, wantHost)) =>
      assert(canon === wantCanon, s"canonical($raw)")
      assert(host === wantHost, s"host($raw)")
    }
  }

  test("p04 composed curation pipeline: stages chain, conservation holds") {
    val rows = run("p04_curation_pipeline").collect()
    assert(rows.nonEmpty)
    val r = rows.head
    assert(r.getAs[Boolean]("rows_monotone"), "every stage may only drop rows")
    assert(r.getAs[Boolean]("tokens_conserved"),
      "packing must place every surviving token exactly once")
    assert(rows.length.toLong === r.getAs[Long]("n_after_decontam"),
      "output rows = final-stage survivors")
    // near-dup stage must do real work: the 80%-prefix twins are planted
    // on every 30th id (10th of the 1/3 subset) and must collapse
    assert(r.getAs[Long]("n_after_neardup") < r.getAs[Long]("n_after_linededup"),
      "planted near-dup twins must be removed")
    // packing is gapless: offsets live inside the budget, seq ids dense
    rows.foreach { x =>
      assert(x.getAs[Long]("seq_offset") >= 0L && x.getAs[Long]("seq_offset") < 256L)
    }
    val seqIds = rows.map(_.getAs[Long]("seq_id")).distinct.sorted
    assert(seqIds.head === 0L && seqIds.last === seqIds.length - 1L,
      "seq ids must be dense from 0")
    assert(rows.map(_.getAs[String]("split")).distinct.toSet.subsetOf(
      Set("train", "val", "test")))
  }

  test("q69 triangle count matches a brute-force local recount") {
    val rows = run("q69_triangle_count").collect()
    assert(rows.length === 10)
    val nTris = rows.head.getAs[Long]("n_triangles")
    // rebuild the same deterministic graph locally and count naively
    val ids = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val v = ids.max + 1
    def h60(i: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }
    val es = ids.flatMap(i => Seq((i, (i + 1) % v), (i, (i + 2) % v), (i, h60(i) % v)))
      .map { case (x, y) => (math.min(x, y), math.max(x, y)) }
      .filter(p => p._1 != p._2).distinct
    val adj = es.groupBy(_._1).map { case (k, ps) => k -> ps.map(_._2).toSet }
      .withDefaultValue(Set.empty[Long])
    val brute = es.map { case (a, b) => (adj(a) & adj(b)).size }.sum
    assert(nTris.toInt === brute, s"oriented count $nTris vs brute $brute")
    // local counts are consistent: every triangle increments 3 nodes
    assert(rows.forall(_.getAs[Long]("t_cnt") >= 1L))
  }

  test("p05 audit outcomes reconcile exactly with p04's stage cardinalities") {
    val audit = run("p05_curation_audit").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byOutcome = audit.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      .withDefaultValue(0L)
    val p04row = run("p04_curation_pipeline").head()
    val nIn = p04row.getAs[Long]("n_input")
    assert(audit.length.toLong === nIn, "one verdict per input document")
    assert(audit.map(_._1).distinct.length === audit.length, "one verdict each")
    // the audit's attrition must equal the pipeline's own stage counts
    assert(byOutcome("filtered_out") === nIn - p04row.getAs[Long]("n_after_filter"))
    assert(byOutcome("fully_boilerplate") ===
      p04row.getAs[Long]("n_after_filter") - p04row.getAs[Long]("n_after_linededup"))
    assert(byOutcome("near_dup") ===
      p04row.getAs[Long]("n_after_linededup") - p04row.getAs[Long]("n_after_neardup"))
    assert(byOutcome("contaminated") ===
      p04row.getAs[Long]("n_after_neardup") - p04row.getAs[Long]("n_after_decontam"))
    assert(byOutcome("kept") === p04row.getAs[Long]("n_after_decontam"))
  }

  test("h09 distributed-Sequential invariants all hold") {
    val row = run("h09_sequential_invariants").head()
    // n_cells must equal the oracle's recomputation of the slice predicate
    // (the fit must not drop or duplicate cells)
    val expected = graft.sources.Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey") % 8 === 0).count()
    assert(row.getAs[Long]("n_cells") === expected)
    assert(row.getAs[Long]("rounds") === 1L)
    assert(row.getAs[Boolean]("objectives_recorded"))
    assert(row.getAs[Boolean]("objective_nonincreasing"),
      "block-online sweeps must not increase the clustering objective")
    assert(row.getAs[Boolean]("corrected_finite"))
    assert(row.getAs[Boolean]("chi2_finite"))
  }

  test("q75 weighted sample: 3 per source, deterministic, weight-proportional") {
    val rows = run("q75_weighted_sample").collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (_, g) =>
      assert(g.length === 3)
      assert(g.map(_.getAs[Long]("draw")).sorted.toSeq === Seq(1L, 2L, 3L))
    }
    val again = run("q75_weighted_sample").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("draw")))
      .sorted
    assert(again.toSeq === rows.map(r =>
      (r.getAs[String]("source"), r.getAs[Long]("draw"))).sorted.toSeq)
    // Efraimidis-Spirakis proportionality: 400 independent trials (trial =
    // group), 10 items each, item 0 carrying 91% of the trial's weight mass.
    // Its k=1 win share must track P(win) = 0.91 (the hash draw is fixed, so
    // this is a one-time audit of the scheme, not a flaky statistical test).
    val sp = spark
    import sp.implicits._
    val items = (0 until 400).flatMap(t => (0 until 10).map(i =>
      (t.toLong, t * 100L + i, if (i == 0) 91.0 else 1.0)))
      .toDF("trial", "id", "w")
    val h52 = shiftright(graft.functions.CrossEngine.md5Hash60(col("id")), 8)
    val key = log((h52 + 1).cast("double") / lit(4503599627370496.0)) / col("w")
    val wins = graft.operators.Similarity.topKByScore(
        items.withColumn("k", key), "trial", "id", col("k"), k = 1,
        ascending = false)
      .filter(col("id") % 100 === 0).count()
    val share = wins.toDouble / 400.0
    assert(share > 0.85 && share < 0.97,
      s"heavy item won $share of trials; expected ~0.91")
  }

  test("s29 nn-descent: near-exact recall in 3 rounds, improving monotonically") {
    import graft.functions.VectorExpressions.l2DistSq
    val e = graft.operators.Similarity.nndPlantedVecs(spark, sfDir)
    val n = e.count()
    val k = 6
    def edgeSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"))).toSet
    // exact ground truth: full cross L2 top-k (the s01 shape, L2 metric)
    val probes = e.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val truth = edgeSet(graft.operators.Similarity.knnJoin(
        e, probes, l2DistSq(col("embedding"), col("q_emb")), k,
        probeIdCol = "q_id", idCol = "vec_id", ascending = true)
      .select(col("q_id").as("u"), col("vec_id").as("v")))
    assert(truth.size === (n * k).toInt)
    // recall trajectory: hash init -> 1 round -> the gate's 3-round graph
    val init = graft.operators.Similarity.nndHashInit(e, k, n)
    val r1 = edgeSet(graft.operators.Similarity
      .nnDescent(e, k, rounds = 1, init = init, revCap = 24)
      .select(col("u"), col("v")))
    val rows3 = run("s29_nn_descent").collect()
    // the gate routes through the INCREMENTAL path while the oracle mirrors
    // the full re-scoring form — pin their exact equivalence here
    def quads(rows: Array[org.apache.spark.sql.Row], nc: String, rc: String,
        vc: String, dc: String) = rows.map(r => (r.getAs[Long](nc),
      r.getAs[Long](rc), r.getAs[Long](vc),
      math.round(r.getAs[Double](dc) * 1e6))).toSet
    val full3 = graft.operators.Similarity
      .nnDescent(e, k, rounds = 3, init = init, revCap = 24)
      .select(col("u"), col("rn"), col("v"), round(col("score"), 6).as("d"))
      .collect()
    assert(quads(full3, "u", "rn", "v", "d")
      === quads(rows3, "node", "rnk", "neighbor_id", "dist_sq"),
      "incremental descent must equal full re-scoring on the gate corpus")
    val r3 = rows3.map(r =>
      (r.getAs[Long]("node"), r.getAs[Long]("neighbor_id"))).toSet
    def recall(g: Set[(Long, Long)]): Double =
      (g & truth).size.toDouble / truth.size
    val (rec0, rec1, rec3) = (recall(edgeSet(init)), recall(r1), recall(r3))
    assert(rec0 < 0.1, s"random init should be near-zero recall, got $rec0")
    assert(rec1 > rec0 && rec3 > rec1,
      s"recall must improve with rounds: $rec0 -> $rec1 -> $rec3")
    assert(rec3 > 0.95, s"3-round recall $rec3 below floor (measured 0.998)")
    // structural contract: k per node, ranks 1..k, no self, dist monotone
    val byNode = rows3.groupBy(_.getAs[Long]("node"))
    assert(byNode.size === n.toInt)
    byNode.foreach { case (node, g) =>
      assert(g.length === k)
      val sorted = g.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq === (1L to k).toSeq)
      sorted.foreach(r => assert(r.getAs[Long]("neighbor_id") !== node))
      val ds = sorted.map(_.getAs[Double]("dist_sq"))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
    }
  }

  test("m17 fft: matches the naive DFT, and the gate's tones dominate their bin") {
    // property check: radix-2 FFT equals the O(n^2) textbook DFT
    val rnd = new scala.util.Random(7)
    val n = 64
    val xs = Array.fill(n)(rnd.nextDouble() * 2 - 1)
    val re = xs.clone(); val im = new Array[Double](n)
    graft.operators.Multimodal.fftInPlace(re, im)
    for (k <- 0 until n) {
      var (dr, di) = (0.0, 0.0)
      for (t <- 0 until n) {
        val a = -2.0 * math.Pi * k * t / n
        dr += xs(t) * math.cos(a); di += xs(t) * math.sin(a)
      }
      assert(math.abs(re(k) - dr) < 1e-9 && math.abs(im(k) - di) < 1e-9,
        s"fft bin $k diverges from naive DFT: (${re(k)},${im(k)}) vs ($dr,$di)")
    }
    // the gate entry: every frame's dominant bin is the planted one and the
    // FFT self-checks hold
    val rows = run("m17_audio_spectrum").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("dominant_bin")
        === 3 + r.getAs[Long]("doc_id") % 13)
      assert(r.getAs[Boolean]("power_concentrated"))
      assert(r.getAs[Boolean]("parseval_ok"))
    }
  }

  test("m19 mfcc: mel argmax matches the closed form, self-checks all hold") {
    val rows = run("m19_audio_mfcc").collect()
    assert(rows.nonEmpty && rows.length % 2 == 0) // 2 frames per doc
    // closed-form triangle-weight argmax for the 13 planted tones (the
    // oracle's formula, derived independently here)
    def mel(f: Double) = 2595.0 * math.log10(1.0 + f / 700.0)
    val pts = Array.tabulate(12)(i =>
      700.0 * (math.pow(10.0, mel(4000.0) * i / 11 / 2595.0) - 1.0))
    def expectedBand(bin: Long): Long = {
      val f = 31.25 * bin
      val ws = (1 to 10).map { i =>
        val (lo, c, hi) = (pts(i - 1), pts(i), pts(i + 1))
        if (f >= lo && f <= c) (f - lo) / (c - lo)
        else if (f > c && f <= hi) (hi - f) / (hi - c) else 0.0
      }
      (ws.indexOf(ws.max) + 1).toLong
    }
    rows.foreach { r =>
      val bin = 3 + r.getAs[Long]("doc_id") % 13
      assert(r.getAs[Long]("dominant_mel_band") === expectedBand(bin))
      val ratio = r.getAs[Double]("dom_pair_ratio")
      assert(ratio >= 0.5 && ratio <= 1.0) // dominant >= runner-up, by def
      assert(r.getAs[Boolean]("pair_concentrated"))
      assert(r.getAs[Boolean]("dct_roundtrip_ok"))
    }
    // both frames of a doc carry the same tone, so per-doc features agree
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, g) =>
      assert(g.map(_.getAs[Long]("dominant_mel_band")).distinct.length === 1)
      assert(g.map(_.getAs[Double]("dom_pair_ratio")).distinct.length === 1)
    }
  }

  test("s30 graph-ann search: beam reaches the target cluster, ranks sound") {
    val rows = run("s30_graph_ann_search").collect()
    assert(rows.map(_.getAs[Long]("query_id")).distinct.length === 20)
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    byQ.foreach { case (_, g) =>
      assert(g.map(_.getAs[Long]("rnk")).sorted.toSeq === Seq(1L, 2L, 3L))
      val sorted = g.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("dist_sq"))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
    }
    // search quality: query q targets planted cluster (q*7)%50; a top-1 hit
    // means the beam NAVIGATED there from entry node 0 (clusters are only
    // connected through the long-range init links). Not all walks make it —
    // that is the honest beam/hops tradeoff — but most must.
    val hits = byQ.count { case (q, g) =>
      val top1 = g.minBy(_.getAs[Long]("rnk")).getAs[Long]("neighbor_id")
      top1 % 50 === (q * 7) % 50
    }
    assert(hits >= 14, s"only $hits/20 walks reached their target cluster")
  }

  test("p07 reconciliation: key graph intact, header totals honestly broken") {
    val rows = run("p07_reconciliation").collect()
      .map(r => r.getAs[String]("check_name") -> r).toMap
    assert(rows.size === 4)
    Seq("lineitem_has_order", "order_has_customer", "customer_has_nation")
      .foreach { c =>
        assert(rows(c).getAs[Long]("n_violations") === 0L, s"$c found orphans")
        assert(rows(c).getAs[Long]("violation_rate_micro") === 0L)
      }
    // the fixture's o_totalprice is generated independently of lineitems —
    // the audit must SAY so, not paper over it
    val rec = rows("header_total_reconciles")
    assert(rec.getAs[Long]("n_violations") === rec.getAs[Long]("n_rows_checked"))
    assert(rec.getAs[Long]("violation_rate_micro") === 1000000L)
  }

  test("s31 persisted graph index: reloaded adjacency serves identically to s30") {
    def keyed(name: String) = run(name).collect().map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("rnk"),
        r.getAs[Long]("neighbor_id"),
        math.round(r.getAs[Double]("dist_sq") * 1e6))).toSet
    assert(keyed("s31_graph_index_persist") === keyed("s30_graph_ann_search"),
      "the parquet-roundtripped graph must serve bit-identical results")
  }

  test("st34 streaming resample: drained close table fills exactly like q76") {
    def keyed(name: String) = run(name).collect().map(r =>
      (r.getAs[Long]("user_id"), r.getAs[java.sql.Date]("day").toString,
        math.round(r.getAs[Double]("close_value") * 1e6),
        r.getAs[Boolean]("gap_filled"), r.getAs[Boolean]("observed_ever")))
      .toSet
    assert(keyed("st34_stream_resample") === keyed("q76_resample_ffill"),
      "the streaming-maintained daily closes must fill exactly like batch")
  }

  test("q76 resample+ffill: 30 rows per user, fills carry the last close") {
    val rows = run("q76_resample_ffill").collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (u, g) =>
      assert(g.length === 30, s"user $u grid incomplete")
      val sorted = g.sortBy(_.getAs[java.sql.Date]("day").toString)
      var lastObserved = -1.0
      sorted.foreach { r =>
        val v = r.getAs[Double]("close_value")
        if (r.getAs[Boolean]("gap_filled"))
          assert(v === lastObserved, s"user $u fill broke the carry")
        else lastObserved = v
        assert(r.getAs[Boolean]("observed_ever") === (v != -1.0))
      }
      assert(g.exists(!_.getAs[Boolean]("gap_filled")),
        s"user $u has no observation at all — slice fixture broke")
    }
  }

  test("t39 zipf fit: recovers a planted exponent; flags the template corpus") {
    val sp = spark
    import sp.implicits._
    // planted freq = 3000 / rank over 800 ranks: slope must come back ~ -1
    val planted = (1 to 800).map(r => (f"w$r%04d", (3000L / r).max(1L)))
      .toDF("w", "cnt")
    val fit = graft.operators.TextAnalysis.zipfFit(planted).head()
    assert(math.abs(fit.getAs[Double]("slope") + 1.0) < 0.12,
      s"planted 1/rank corpus fit slope ${fit.getAs[Double]("slope")}")
    assert(fit.getAs[Double]("r2") > 0.97)
    assert(fit.getAs[Boolean]("zipf_like"))
    // the driver fixture is template-generated and must be flagged as such
    val gate = run("t39_zipf_fit").head()
    assert(!gate.getAs[Boolean]("zipf_like"),
      "the 31-word template corpus must fail the Zipf health check")
    assert(gate.getAs[Double]("r2") < 0.5)
    // the top-1000 rank must ride the bounded heap, never a vocab-wide
    // window sort (the q74 precedent)
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    val plan0 = SparkEntry.queries("t39_zipf_fit")(spark, sfDir)
      .queryExecution.executedPlan
    val plan = plan0 match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      "t39 must not plan a window over the vocabulary")
    assert(plan.toString.contains("top_k_pairs"),
      s"t39 must plan the TopKPairs bounded heap:\n$plan")
  }

  test("m18 dct/phash: matches the 2-D definition; invariances hold on random rasters") {
    val rnd = new scala.util.Random(11)
    val n = 8
    val px = Array.fill(n, n)(rnd.nextDouble() * 200)
    val fast = graft.operators.Multimodal.dct2d(px)
    for (u <- 0 until n; v <- 0 until n) {
      var s = 0.0
      for (y <- 0 until n; x <- 0 until n)
        s += px(y)(x) * math.cos(math.Pi / n * (y + 0.5) * u) *
          math.cos(math.Pi / n * (x + 0.5) * v)
      assert(math.abs(fast(u)(v) - s) < 1e-9,
        s"dct2d($u,$v) ${fast(u)(v)} vs definition $s")
    }
    // invariance theorems on 50 random 32x32 rasters
    for (_ <- 1 to 50) {
      val r = Array.fill(32, 32)(rnd.nextDouble() * 200)
      val h = graft.operators.Multimodal.pHash(r)
      assert(h === graft.operators.Multimodal.pHash(r.map(_.map(_ + 40.0))))
      assert(h === graft.operators.Multimodal.pHash(r.map(_.map(_ * 1.2))))
    }
    val rows = run("m18_phash_dct").collect()
    rows.foreach { r =>
      assert(r.getAs[Boolean]("shift_invariant"))
      assert(r.getAs[Boolean]("contrast_invariant"))
      assert(r.getAs[Boolean]("neighbor_distant"))
    }
  }

  test("d28 leakage-safe split: clusters move whole; naive doc-hash split leaks") {
    val rows = run("d28_leakage_safe_split").collect()
    val byCluster = rows.groupBy(_.getAs[Long]("cluster_id"))
    // the whole point: every cluster lands on exactly one side
    byCluster.foreach { case (c, g) =>
      assert(g.map(_.getAs[String]("split")).distinct.length === 1,
        s"cluster $c torn across splits")
    }
    // near-dup triples (base, +1e7, +2e7) share a cluster => share a side
    val sideOf = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    sideOf.keys.filter(_ < 10000000L).foreach { id =>
      Seq(id + 10000000L, id + 20000000L).filter(sideOf.contains).foreach { twin =>
        assert(sideOf(twin) === sideOf(id), s"twin $twin split away from $id")
      }
    }
    // the demonstrated hazard: a doc-hash split tears a large share apart
    val leaky = byCluster.count(_._2.head.getAs[Boolean]("leaks_under_naive"))
    assert(leaky.toDouble / byCluster.size > 0.2,
      s"expected the naive split to leak on this corpus; got $leaky/${byCluster.size}")
    // and the cluster-keyed split still lands near 80/20
    val trainFrac = rows.count(_.getAs[String]("split") == "train").toDouble / rows.length
    assert(trainFrac > 0.6 && trainFrac < 0.95, s"train fraction $trainFrac")
  }

  test("s32 filtered graph search: all results match, pool beats final-beam post-filter") {
    val rows = run("s32_filtered_graph_search").collect()
    assert(rows.map(_.getAs[Long]("query_id")).distinct.length === 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") % 3 === 1L,
        s"non-matching node ${r.getAs[Long]("neighbor_id")} in filtered results")
    }
    // the accumulated pool must serve at least as well as post-filtering the
    // unfiltered walk's final top-3 (every filtered s30 answer is in s32's
    // pool by construction, since both walks route identically)
    val s30Matching = run("s30_graph_ann_search").collect()
      .filter(_.getAs[Long]("neighbor_id") % 3 == 1L)
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val s32Set = rows
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(s30Matching.subsetOf(s32Set),
      "filtered search lost matches the unfiltered walk already surfaced")
    // depth: most queries fill all 3 ranks from the accumulated pool
    val full = rows.groupBy(_.getAs[Long]("query_id")).count(_._2.length == 3)
    assert(full >= 18, s"only $full/20 queries filled 3 filtered results")
  }

  test("s33 graph append: twins land on their originals, standing lists only improve") {
    val rows = run("s33_graph_index_append").collect()
    val (appended, old) = rows.partition(_.getAs[Long]("node") >= 30000000L)
    assert(appended.map(_.getAs[Long]("node")).distinct.length === 20)
    // search-then-link: most exact twins must hold their original at rank 1
    // with distance exactly 0 (measured 18/20 at sf0.001/sf0.01, 20/20 at
    // sf0.1; random attach managed 4/20 — the motivating measurement)
    val hits = appended.groupBy(_.getAs[Long]("node")).count { case (n, g) =>
      val r1 = g.minBy(_.getAs[Long]("rnk"))
      r1.getAs[Long]("neighbor_id") == n - 30000000L &&
        r1.getAs[Double]("dist_sq") == 0.0
    }
    assert(hits >= 15, s"only $hits/20 twins found their original at rank 1")
    // monotone absorption: an old node's neighborhood can only improve
    val pre = run("s29_nn_descent").collect()
      .groupBy(_.getAs[Long]("node"))
      .map { case (n, g) => n -> g.map(_.getAs[Double]("dist_sq")).sum }
    old.groupBy(_.getAs[Long]("node")).foreach { case (n, g) =>
      val post = g.map(_.getAs[Double]("dist_sq")).sum
      assert(post <= pre(n) + 1e-9,
        s"node $n neighborhood worsened after append: ${pre(n)} -> $post")
    }
    // structural: k per node, no self
    rows.groupBy(_.getAs[Long]("node")).foreach { case (n, g) =>
      assert(g.length === 6)
      g.foreach(r => assert(r.getAs[Long]("neighbor_id") !== n))
    }
  }

  test("graph lane trains once: s29-s33 all serve from one persisted build") {
    // first touch trains (or reuses an earlier test's build); running
    // every serving entry after that must not add another build (the s13
    // train-once/serve-many contract, VERDICT r12 #1)
    run("s29_nn_descent").collect()
    val before = operators.Similarity.GraphIndexCache.buildCount.get()
    assert(before >= 1L, "no graph-index build recorded for the suite corpus")
    Seq("s29_nn_descent", "s30_graph_ann_search", "s31_graph_index_persist",
      "s32_filtered_graph_search", "s33_graph_index_append")
      .foreach(n => run(n).collect())
    assert(operators.Similarity.GraphIndexCache.buildCount.get() === before,
      "a serving entry re-ran the NN-descent build instead of loading the artifact")
    // the APPEND is also once-per-corpus: s33 + s39 share one attach+polish
    run("s33_graph_index_append").collect()
    val appendBefore = operators.Similarity.AppendedGraphCache.buildCount.get()
    assert(appendBefore >= 1L)
    run("s39_hnsw_layered_insert").collect()
    run("s33_graph_index_append").collect()
    assert(operators.Similarity.AppendedGraphCache.buildCount.get() === appendBefore,
      "an append consumer re-ran the attach+polish instead of loading the artifact")
  }

  test("s38 graph delete: lifecycle facts hold and every survivor stays at k") {
    val rows = run("s38_graph_index_delete").collect()
    assert(rows.length === 60) // 20 queries x top-3, served post-delete
    // recomputed file/lifecycle facts all true (staged swaps, idempotence)
    Seq("delete_touched_bounded", "untouched_buckets_intact",
      "rewritten_buckets_single_file", "delete_idempotent").foreach { c =>
      assert(rows.forall(_.getAs[Boolean](c)), s"$c is false")
    }
    // repair refilled every orphan to full k
    assert(rows.head.getAs[Long]("min_orphan_degree") === 6L)
    // and the repaired state covers every survivor at exactly k = 6
    val n = graft.sources.Tables.documents(spark, sfDir).count()
    assert(rows.head.getAs[Long]("repaired_edge_count") === 6L * (n - 3))
    // the served answers never include a node at distance exactly matching
    // a doomed twin is pinned by the oracle; here pin per-query structure
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, g) =>
      assert(g.map(_.getAs[Long]("rnk")).sorted.toSeq === Seq(1L, 2L, 3L))
    }
  }

  test("s39 layered insert: promoted twins reachable, recall >= flat append") {
    val rows = run("s39_hnsw_layered_insert").collect()
    assert(rows.length === 2)
    val byM = rows.map(r => r.getAs[String]("method") -> r).toMap
    // the md5 level draw promotes a fixed subset of the 20 twin ids
    // (ids are SF-independent, so this is a constant of the engine)
    assert(byM("layered").getAs[Long]("promoted_twins") === 5L)
    // the judge criterion: layered twin recall >= the flat append's,
    // at the same layer-0 hop budget (measured 17 vs 17 at sf0.001,
    // 17 vs 12 at sf0.1)
    val hl = byM("layered").getAs[Long]("twin_hits")
    val hf = byM("flat").getAs[Long]("twin_hits")
    assert(hl >= hf, s"layered $hl < flat $hf")
    assert(rows.forall(_.getAs[Boolean]("layered_recall_ge_flat")))
    assert(hl >= 15L, s"layered twin recall collapsed: $hl/20")
  }

  test("s41 graph compaction: fragmented buckets healed, facts hold") {
    val rows = run("s41_graph_index_compact").collect()
    assert(rows.length === 60) // 20 queries x top-3, served post-compaction
    Seq("fragmentation_planted", "compacted_buckets_single_file",
      "untouched_buckets_intact", "compact_idempotent").foreach { c =>
      assert(rows.forall(_.getAs[Boolean](c)), s"$c is false")
    }
  }

  test("s42 layered delete: entry re-elected, per-layer unlink, facts hold") {
    val rows = run("s42_hnsw_layered_delete").collect()
    assert(rows.length === 60) // 20 queries x top-3, served post-delete
    Seq("entry_reelected", "delete_touched_bounded",
      "untouched_buckets_intact", "rewritten_buckets_single_file",
      "delete_idempotent").foreach { c =>
      assert(rows.forall(_.getAs[Boolean](c)), s"$c is false")
    }
    // the doomed set includes the standing entry + one more upper-layer
    // node, so at least their per-layer adjacency (forward + reverse)
    // must have been dropped from the routing layers
    assert(rows.head.getAs[Long]("dropped_routing_edges") > 0L,
      "deleting the entry point must drop routing-layer edges")
    // the re-elected entry is a surviving upper-layer node: serving from
    // it still returns a full panel, and never a doomed node. Recompute
    // the doomed ids exactly as the entry does (level draw over the
    // corpus) and check the answers avoid them.
    val emb = graft.operators.Similarity.nndPlantedVecs(spark, sfDir)
      .select(col("vec_id").as("id"))
    val lv = emb.select(col("id"), expr(
      """CASE WHEN CAST(conv(substring(md5(concat('lv', CAST(id AS STRING))), 1, 15), 16, 10) AS DOUBLE) / 1152921504606846976.0 < 0.0625 THEN 2
              WHEN CAST(conv(substring(md5(concat('lv', CAST(id AS STRING))), 1, 15), 16, 10) AS DOUBLE) / 1152921504606846976.0 < 0.25 THEN 1
              ELSE 0 END""").as("lvl"))
    val entry0 = lv.filter(col("lvl") >= 2).agg(min(col("id"))).head().getLong(0)
    val upper = lv.filter(col("lvl") >= 1 && col("id") =!= entry0)
      .agg(min(col("id"))).head().getLong(0)
    val baseOnly = lv.filter(col("lvl") === 0 && col("id") >= 100)
      .agg(min(col("id"))).head().getLong(0)
    val doomed = Set(entry0, upper, baseOnly)
    assert(rows.forall(r => !doomed.contains(r.getAs[Long]("neighbor_id"))),
      "served a deleted node")
    val newEntry = rows.head.getAs[Long]("new_entry")
    assert(!doomed.contains(newEntry) && newEntry != entry0,
      s"entry $newEntry not re-elected away from doomed $doomed")
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, g) =>
      assert(g.map(_.getAs[Long]("rnk")).sorted.toSeq === Seq(1L, 2L, 3L))
    }
    // build-once: s34/s39/s42 share ONE layer contraction (the
    // GraphIndexCache discipline applied to the hierarchy)
    run("s34_hnsw_search").count()
    assert(graft.operators.Similarity.LayeredGraphCache.buildCount.get() === 1L,
      "layered entries regressed to contraction-per-entry")
  }

  test("s43 graph health: degrees exact, no orphans, entry reaches, frag seen") {
    val r = run("s43_graph_index_health").head()
    val n = graft.operators.Similarity.nndPlantedVecs(spark, sfDir).count()
    // the 3-round descent keeps exactly k = 6 ranked rows per node
    assert(r.getAs[Long]("n_nodes") === n)
    assert(r.getAs[Long]("min_degree") === 6L)
    assert(r.getAs[Long]("max_degree") === 6L)
    assert(r.getAs[Long]("total_edges") === 6L * n)
    assert(r.getAs[Long]("avg_degree_micro") === 6000000L)
    assert(r.getAs[Long]("orphan_count") === 0L)
    // kNN graphs are asymmetric by nature but never fully one-way on a
    // clustered corpus; the share lives strictly inside (0, 1)
    val sym = r.getAs[Long]("symmetry_micro")
    assert(sym > 0L && sym < 1000000L, s"symmetry_micro $sym")
    // the entry's 3-hop neighborhood is non-trivial and bounded
    val reach = r.getAs[Long]("reach_3hop")
    assert(reach > 12L && reach <= n, s"reach_3hop $reach")
    // the planted fragmentation is observed exactly
    assert(r.getAs[Long]("fragmented_buckets") === 32L)
    assert(r.getAs[Long]("max_files_per_bucket") === 2L)
    assert(r.getAs[Boolean]("compaction_recommended"))
  }

  test("s44 sidecar delete: bounded discovery agrees with scan, pruned plan") {
    val rows = run("s44_graph_delete_sidecar").collect()
    assert(rows.length === 60) // 20 queries x top-3, served post-delete
    Seq("sidecar_discovery_equals_scan", "sidecar_consistent_after",
      "second_lookup_empty").foreach { c =>
      assert(rows.forall(_.getAs[Boolean](c)), s"$c is false")
    }
    assert(rows.head.getAs[Long]("reverse_edges_found") > 0L,
      "the doomed set must have in-edges for the fixture to mean anything")
    assert(rows.head.getAs[Long]("knn_touched_buckets") <
      graft.operators.Similarity.s38Buckets.toLong)
    // no served answer is a doomed node
    val doomed = graft.operators.Similarity.maintenanceDoomed.toSet
    assert(rows.forall(r => !doomed.contains(r.getAs[Long]("neighbor_id"))))
    // the bounded lookup PRUNES: its scan lists only the doomed v-buckets
    val tmp = java.nio.file.Files.createTempDirectory("graft_s44spec_")
    try {
      val sp = spark
      import sp.implicits._
      (0L until 1000L).map(i => (i, i * 7 % 1000)).toDF("u", "v")
        .withColumn("bucket", pmod(col("v"),
          lit(graft.operators.Similarity.s38Buckets.toLong)).cast("int"))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(tmp.toString)
      val lookup = graft.operators.Similarity
        .sidecarReverseLookup(spark, tmp.toString, Seq(5L, 11L, 23L))
      import org.apache.spark.sql.execution.FileSourceScanExec
      val scans = lookup.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f
      }
      assert(scans.nonEmpty, "expected a file scan in the lookup plan")
      assert(scans.forall(_.partitionFilters.nonEmpty),
        "the bucket filter must reach the scan as a PARTITION filter")
      assert(scans.map(_.selectedPartitions.partitionCount).sum <= 3,
        "discovery must list at most |doomed| bucket directories")
    } finally {
      graft.functions.CrossEngine.deleteRecursive(tmp)
    }
  }

  test("s45 ivf sidecar delete: bounded id-map discovery, consistent, pruned") {
    val r = run("s45_ivfpq_delete_sidecar").head()
    Seq("all_queries_scored", "deleted_twins_absent",
      "surviving_twin_attains_min", "sidecar_discovery_equals_scan",
      "touched_lists_bounded", "sidecar_buckets_bounded",
      "sidecar_consistent_after", "second_lookup_empty").foreach { c =>
      assert(r.getAs[Boolean](c), s"$c is false")
    }
    // the id-map lookup PRUNES partitions, same contract as s44's
    val tmp = java.nio.file.Files.createTempDirectory("graft_s45spec_")
    try {
      val sp = spark
      import sp.implicits._
      (0L until 1000L).map(i => (i, (i % 8).toInt)).toDF("vec_id", "list_id")
        .withColumn("bucket", pmod(col("vec_id"),
          lit(graft.operators.Similarity.s38Buckets.toLong)).cast("int"))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(tmp.toString)
      val doomed = Seq(1000001L, 1000002L)
      val lookup = spark.read.parquet(tmp.toString)
        .filter(col("bucket").isin(
          doomed.map(d => (d % graft.operators.Similarity.s38Buckets).toInt)
            .distinct: _*))
        .filter(col("vec_id").isin(doomed: _*))
      import org.apache.spark.sql.execution.FileSourceScanExec
      val scans = lookup.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f
      }
      assert(scans.nonEmpty && scans.forall(_.partitionFilters.nonEmpty))
      assert(scans.map(_.selectedPartitions.partitionCount).sum <= 2,
        "id-map discovery must list at most |doomed| bucket directories")
    } finally {
      graft.functions.CrossEngine.deleteRecursive(tmp)
    }
  }

  test("s46 index generations: atomic flip, rollback exact, GC safe") {
    val rows = run("s46_graph_index_generations").collect()
    assert(rows.length === 60) // 20 queries x top-3, served from gen2
    Seq("flip_atomic_single_pointer", "gen1_intact_through_build",
      "rollback_serves_gen1_exact", "gc_after_flip_safe").foreach { c =>
      assert(rows.forall(_.getAs[Boolean](c)), s"$c is false")
    }
    // gen2 is the takedown-wave rebuild: no doomed node is ever served
    val doomed = graft.operators.Similarity.maintenanceDoomed.toSet
    assert(rows.forall(r => !doomed.contains(r.getAs[Long]("neighbor_id"))))
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, g) =>
      assert(g.map(_.getAs[Long]("rnk")).sorted.toSeq === Seq(1L, 2L, 3L))
    }
  }

  test("s49 ivfpq generations: flip serves gen2, rollback serves gen1, NN exact") {
    val rows = run("s49_ivfpq_generations").collect()
    assert(rows.length === 3) // one exact-NN row per probe query
    Seq("flip_atomic_single_pointer", "gen1_intact_through_build",
      "retrained_books_differ", "rollback_pointer_digest_exact",
      "rollback_serve_equal", "gc_after_flip_safe").foreach { c =>
      assert(rows.forall(_.getAs[Boolean](c)), s"$c is false")
    }
    // the planted twin is the global NN of its query in every generation
    rows.foreach { r =>
      assert(r.getAs[Long]("nn_id") ===
        r.getAs[Long]("query_id") + 1000000L)
      assert(r.getAs[Double]("nn_d2") === 0.0)
    }
  }

  test("s50 layered generations: flip serves gen2, entry survives, GC safe") {
    val rows = run("s50_hnsw_layered_generations").collect()
    assert(rows.length === 60) // 20 queries x top-3, served from gen2
    Seq("entry_survives", "flip_atomic_single_pointer",
      "gen1_intact_through_build", "rollback_serves_gen1_exact",
      "gc_after_flip_safe").foreach { c =>
      assert(rows.forall(_.getAs[Boolean](c)), s"$c is false")
    }
    // gen2 is the takedown-wave rebuild: no doomed node is ever served
    val doomed = Set(30L, 16L, 100L)
    assert(rows.forall(r => !doomed.contains(r.getAs[Long]("neighbor_id"))))
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, g) =>
      assert(g.map(_.getAs[Long]("rnk")).sorted.toSeq === Seq(1L, 2L, 3L))
    }
  }

  test("s51 layered retrain: new levels/Ms served, rollback digest-exact") {
    val rows = run("s51_hnsw_layered_retrain").collect()
    assert(rows.length === 60) // 20 queries x top-3, served from gen2
    Seq("levels_redrawn", "routing_retrained",
      "flip_atomic_single_pointer", "gen1_intact_through_build",
      "rollback_pointer_digest_exact", "gc_after_flip_safe").foreach { c =>
      assert(rows.forall(_.getAs[Boolean](c)), s"$c is false")
    }
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, g) =>
      assert(g.map(_.getAs[Long]("rnk")).sorted.toSeq === Seq(1L, 2L, 3L))
    }
    // the retrain is non-vacuous end to end: the retrained descent must
    // NOT reproduce s34's serve verbatim (new entry election + new
    // routing move at least one query's beam on this corpus)
    val served = rows.map(r => (r.getAs[Long]("query_id"),
      r.getAs[Long]("rnk"), r.getAs[Long]("neighbor_id"))).toSet
    val s34rows = run("s34_hnsw_search").collect().map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("rnk"),
        r.getAs[Long]("neighbor_id"))).toSet
    assert(served !== s34rows, "retrained serve identical to s34's")
  }

  test("s47 layered compaction: all four tables healed, serve == s34 exactly") {
    val rows = run("s47_hnsw_layered_compact").collect()
    assert(rows.length === 60) // 20 queries x top-3, served post-compaction
    Seq("all_tables_fragmented", "compacted_buckets_single_file",
      "untouched_buckets_intact", "compact_idempotent").foreach { c =>
      assert(rows.forall(_.getAs[Boolean](c)), s"$c is false")
    }
    // compaction is content-preserving: the post-compaction layered
    // descent must equal s34's serve row for row
    val served = rows.map(r => (r.getAs[Long]("query_id"),
      r.getAs[Long]("rnk"), r.getAs[Long]("neighbor_id"),
      r.getAs[Double]("dist_sq"))).toSet
    val s34rows = run("s34_hnsw_search").collect().map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("rnk"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("dist_sq"))).toSet
    assert(served === s34rows, "compaction changed the served descent")
  }

  test("s48 layered health: per-table stats exact, descent reaches, frag pinned") {
    val rows = run("s48_hnsw_layered_health").collect()
    assert(rows.map(_.getAs[String]("tbl")).sorted.toSeq ===
      Seq("knn", "layer1", "layer2", "links"))
    val byT = rows.map(r => r.getAs[String]("tbl") -> r).toMap
    val n = graft.operators.Similarity.nndPlantedVecs(spark, sfDir).count()
    // base kNN: the 3-round descent keeps exactly k = 6 rows per node
    val knn = byT("knn")
    assert(knn.getAs[Long]("population") === n)
    assert(knn.getAs[Long]("min_degree") === 6L)
    assert(knn.getAs[Long]("max_degree") === 6L)
    assert(knn.getAs[Long]("total_edges") === 6L * n)
    assert(knn.getAs[Long]("orphan_count") === 0L)
    // fragmentation planted on the base table only, observed exactly
    assert(knn.getAs[Long]("fragmented_buckets") === 32L)
    assert(knn.getAs[Long]("max_files_per_bucket") === 2L)
    assert(knn.getAs[Boolean]("compaction_recommended"))
    Seq("links", "layer1", "layer2").foreach { t =>
      assert(byT(t).getAs[Long]("fragmented_buckets") === 0L, t)
      assert(byT(t).getAs[Long]("max_files_per_bucket") === 1L, t)
      assert(!byT(t).getAs[Boolean]("compaction_recommended"), t)
    }
    // layer populations are the level draw's: corpus > lvl>=1 > lvl>=2,
    // and no routing node is orphaned on the planted corpus
    assert(byT("links").getAs[Long]("population") === n)
    val p1 = byT("layer1").getAs[Long]("population")
    val p2 = byT("layer2").getAs[Long]("population")
    assert(n > p1 && p1 > p2 && p2 > 0L, s"populations $n/$p1/$p2")
    rows.foreach { r =>
      val avg = r.getAs[Long]("avg_degree_micro")
      assert(avg === r.getAs[Long]("total_edges") * 1000000L /
        r.getAs[Long]("population"), r.getAs[String]("tbl"))
      val sym = r.getAs[Long]("symmetry_micro")
      assert(sym >= 0L && sym <= 1000000L, s"symmetry_micro $sym")
    }
    // the descent neighborhood is non-trivial, bounded, and one value
    val reach = rows.map(_.getAs[Long]("descent_reach")).distinct
    assert(reach.length === 1 && reach.head > 12L && reach.head <= n,
      s"descent_reach ${reach.toSeq}")
  }

  test("h17 drift monitor: clean half quiet, shifted half alarms, monotone") {
    // measured margins first (also what you read when this test fails)
    val (clean, drift) =
      graft.harmony.HarmonyQueries.serveDriftTvs(spark, sfDir)
    info(f"clean TV $clean%.4f (alarm 0.15), drifted TV $drift%.4f (floor 0.30)")
    val r = run("h17_serve_drift_monitor").head()
    assert(r.getAs[Boolean]("clean_below_alarm"),
      f"the held-out half tripped the drift alarm (TV $clean%.4f)")
    assert(r.getAs[Boolean]("drifted_above_alarm"),
      f"a constant embedding shift went unnoticed (TV $drift%.4f)")
    assert(r.getAs[Boolean]("monitor_monotone"))
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    assert(r.getAs[Long]("n_monitored") ===
      emb.filter(col("vec_id") % 2 === 1).count())
    assert(clean < 0.15 / 1.5, f"clean TV $clean%.4f margin too thin")
    assert(drift > 0.30 * 1.5, f"drifted TV $drift%.4f margin too thin")
  }

  test("h18 drift attribution: site fires, batch stays quiet, margins wide") {
    val (clean, drift) =
      graft.harmony.HarmonyQueries.serveDriftAttribution(spark, sfDir)
    info(f"clean  batch ${clean("batch")}%.4f site ${clean("site")}%.4f (alarm 0.20)")
    info(f"drift  batch ${drift("batch")}%.4f site ${drift("site")}%.4f")
    val rows = run("h18_serve_drift_attribution").collect()
    assert(rows.map(_.getAs[String]("covariate")).sorted.toSeq ===
      Seq("batch", "site"))
    rows.foreach { r =>
      assert(r.getAs[Boolean]("clean_quiet"), r.getAs[String]("covariate"))
      assert(r.getAs[Boolean]("drift_as_expected"), r.getAs[String]("covariate"))
      assert(r.getAs[Boolean]("attribution_exact"))
      assert(r.getAs[Boolean]("monitor_monotone"))
    }
    val byC = rows.map(r => r.getAs[String]("covariate") -> r).toMap
    assert(byC("site").getAs[Boolean]("drift_planted"))
    assert(!byC("batch").getAs[Boolean]("drift_planted"))
    // margin pins (the h17 discipline): quiet side clears the alarm by
    // 1.5x, the planted side by 1.5x the other way
    assert(clean.values.forall(_ < 0.20 / 1.5),
      s"clean TVs too close to the alarm: $clean")
    assert(drift("batch") < 0.20 / 1.5,
      f"unplanted covariate TV ${drift("batch")}%.4f margin too thin")
    assert(drift("site") > 0.20 * 1.5,
      f"planted covariate TV ${drift("site")}%.4f margin too thin")
    // train-once: the 2-covariate model is cached (the FrozenFitCache
    // discipline)
    run("h18_serve_drift_attribution").count()
    assert(graft.harmony.HarmonyQueries.TwoCovFitCache.buildCount.get() === 1L)
  }

  test("h16 serve unseen policy: fail fast, skip+quarantine, interceptOnly") {
    val r = run("h16_serve_unseen_policy").head()
    Seq("fail_fails_fast", "skip_serves_seen_exactly",
      "quarantine_reported_exactly", "intercept_only_seen_exact",
      "intercept_only_novel_passthrough", "r_column_stochastic").foreach { c =>
      assert(r.getAs[Boolean](c), s"$c is false")
    }
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    assert(r.getAs[Long]("n_quarantined") ===
      emb.filter(col("vec_id") % 10 === 1).count())
    assert(r.getAs[Long]("n_seen") ===
      emb.filter(col("vec_id") % 2 === 1 && col("vec_id") % 10 =!= 1).count())
    // an invalid policy is rejected up front
    val st = graft.harmony.HarmonyQueries.FrozenFitCache.model(spark, sfDir).state
    val cells = graft.harmony.HarmonyQueries.plantedCells(spark, sfDir)
    intercept[IllegalArgumentException] {
      graft.harmony.Harmony.serveModel(st, cells, Seq("batch"),
        serveUnseen = "bogus")
    }
    // NULL covariate values: serveModel keys them "batch=null" (unseen
    // here) and skip drops them; serveQuarantined must REPORT them too —
    // a bare isin() over NULL yields NULL and used to undercount
    val withNull = cells.withColumn("batch",
      when(col("cell_id") % 7 === 0, lit(null: String))
        .otherwise(col("batch")))
    val nNull = withNull.filter(col("batch").isNull).count()
    assert(nNull > 0, "fixture produced no NULL covariates")
    val served = graft.harmony.Harmony.serveModel(
      st, withNull, Seq("batch"), serveUnseen = "skip")
    val quarantined = graft.harmony.Harmony.serveQuarantined(
      st, withNull, Seq("batch"))
    assert(served.count() === withNull.count() - nNull)
    assert(quarantined.count() === nNull)
    assert(quarantined.select(explode(col("unseen_levels"))).collect()
      .forall(_.getString(0) == "batch=null"))
  }

  test("q79 funnel: step counts monotone, rates bounded and consistent") {
    val rows = run("q79_funnel_analysis").collect()
      .sortBy(_.getAs[Long]("step_order"))
    assert(rows.map(_.getAs[String]("step")).toSeq ===
      Seq("view", "click", "purchase"))
    val ns = rows.map(_.getAs[Long]("n_users"))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2), s"funnel widened: ${ns.toSeq}")
    rows.foreach { r =>
      val p = r.getAs[Double]("conv_from_prev")
      val t = r.getAs[Double]("conv_from_top")
      assert(p >= 0.0 && p <= 1.0 && t >= 0.0 && t <= 1.0 && t <= p + 1e-9)
    }
    // strict-after gating: a user cannot reach purchase without a click
    // first (counts alone prove it: n3 <= n2 <= n1, asserted above) and
    // the top-rate of step k is the product of the step rates
    val prodRates = rows.map(_.getAs[Double]("conv_from_prev"))
    val topRate = rows.last.getAs[Double]("conv_from_top")
    assert(math.abs(prodRates.product - topRate) < 1e-4,
      s"rate composition broke: ${prodRates.toSeq} vs $topRate")
  }

  test("s40 vamana prune: recall >= full NSW at strictly lower degree") {
    val rows = run("s40_vamana_prune").collect()
    assert(rows.length === 2)
    val byM = rows.map(r => r.getAs[String]("method") -> r).toMap
    val p = byM("vamana_pruned"); val f = byM("nsw_full")
    // the RobustPrune payoffs, all recomputed facts (measured 20 vs 17
    // hits at degree 7.12 vs 11.86 at sf0.001; 20 vs 19 at 7.76 vs 11.98
    // at sf0.1)
    assert(p.getAs[Long]("top1_cluster_hits") >= f.getAs[Long]("top1_cluster_hits"))
    assert(p.getAs[Double]("mean_degree") < f.getAs[Double]("mean_degree"))
    assert(p.getAs[Long]("max_degree") <= 8L, "RobustPrune degree bound violated")
    assert(rows.forall(_.getAs[Boolean]("pruned_recall_ge_full")))
    assert(rows.forall(_.getAs[Boolean]("pruned_degree_lower")))
    assert(rows.forall(_.getAs[Boolean]("degree_bound_holds")))
    assert(p.getAs[Long]("top1_cluster_hits") >= 15L,
      s"pruned-graph recall collapsed: ${p.getAs[Long]("top1_cluster_hits")}/20")
  }

  test("s34 hnsw: recall >= s30 at strictly fewer scored candidates") {
    def hits(rs: Array[org.apache.spark.sql.Row]): Int =
      rs.filter(_.getAs[Long]("rnk") == 1L).count { r =>
        r.getAs[Long]("neighbor_id") % 50 ==
          (r.getAs[Long]("query_id") * 7) % 50
      }
    val hnswRows = run("s34_hnsw_search").collect()
    val flatRows = run("s30_graph_ann_search").collect()
    // structural: 20 queries x 3 ranks, ascending distances
    assert(hnswRows.map(_.getAs[Long]("query_id")).distinct.length === 20)
    hnswRows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, g) =>
      val byRank = g.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("dist_sq"))
      assert(byRank.length === 3 && (byRank, byRank.tail).zipped.forall(_ <= _))
    }
    // the point of the hierarchy: a good entry buys >= the flat walk's
    // planted-cluster recall...
    val (hH, hF) = (hits(hnswRows), hits(flatRows))
    assert(hH >= hF, s"hnsw top-1 cluster hits $hH < s30's $hF")
    assert(hH >= 17, s"hnsw top-1 cluster hits $hH below the s30 floor")
    // ...at strictly less distance-computation work (3 layer-0 hops from
    // a near-query entry + tiny routing walks vs 5 hops from node 0)
    import scala.collection.mutable
    val sparkS = spark
    operators.Similarity.withConstraintPropagationOff(sparkS) {
      val bufH = mutable.Buffer.empty[org.apache.spark.sql.DataFrame]
      operators.Similarity.hnswSearch(sparkS, sfDir, bufH).collect()
      val bufF = mutable.Buffer.empty[org.apache.spark.sql.DataFrame]
      operators.Similarity.nswBeamSearch(sparkS, sfDir,
        operators.Similarity.GraphIndexCache.graph(sparkS, sfDir)
          .localCheckpoint(true), scoredOut = bufF).collect()
      val (wH, wF) = (bufH.map(_.count()).sum, bufF.map(_.count()).sum)
      assert(wH < wF,
        s"hnsw scored $wH candidate distances, not fewer than s30's $wF")
    }
  }

  test("s35 rrf: rank arithmetic exact, both lanes contribute, bounds hold") {
    val rows = run("s35_rrf_hybrid").collect()
    // 3 queries x fused top-10, ranks 1..10, scores non-increasing
    assert(rows.map(_.getAs[Long]("query_id")).distinct.sorted === Array(0L, 1L, 2L))
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, g) =>
      assert(g.map(_.getAs[Long]("rnk")).sorted === (1L to 10L).toArray)
      val byRank = g.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("rrf_score"))
      assert((byRank, byRank.tail).zipped.forall(_ >= _))
    }
    // RRF bounds: one lane gives at most 1/61, two lanes at most 2/61;
    // every fused doc was retrieved by at least one lane (score >= 1/80,
    // the worst single-lane rank at k=20)
    rows.foreach { r =>
      val sc = r.getAs[Double]("rrf_score")
      assert(sc <= math.rint(2.0 / 61 * 1e6) / 1e6 + 1e-9)
      assert(sc >= math.rint(1.0 / 80 * 1e6) / 1e6 - 1e-9)
    }
    // both lanes matter: some fused doc must score above the single-lane
    // ceiling (i.e. appears in BOTH rank lists) for at least one query —
    // the panel queries are corpus members, so their near-dups match both
    // lexically and in embedding space
    assert(rows.exists(_.getAs[Double]("rrf_score") > 1.0 / 61 + 1e-9),
      "no document was retrieved by both lanes — fusion is degenerate")
    // determinism: a second run is row-identical (the ordered BM25 fold)
    val again = run("s35_rrf_hybrid").collect()
    assert(rows.map(_.toString).sorted === again.map(_.toString).sorted)
  }

  test("t35 readability: formulas exact on a worked example, grades sane") {
    val rows = run("t35_readability").collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    assert(rows.length === docs.select("source").distinct().count().toInt)
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_easy_docs") <= r.getAs[Long]("n_docs"))
      // template prose lands in a plausible band, not at the formula rails
      assert(r.getAs[Double]("avg_fk_grade") > -15.0 &&
        r.getAs[Double]("avg_fk_grade") < 50.0)
    }
    // worked example: "the cat sat." -> 1 sentence, 3 words, 3 syllables
    // FRE = 206.835 - 1.015*3 - 84.6*1 = 119.19; FKGL = 0.39*3 + 11.8 - 15.59
    assert(math.abs((206.835 - 1.015 * 3 - 84.6 * 1.0) - 119.19) < 1e-9)
    assert(math.abs((0.39 * 3 + 11.8 * 1.0 - 15.59) - (-2.62)) < 1e-9)
    // vowel-group syllable heuristic: "reading" -> ea + i = 2 groups
    assert("reading".replaceAll("[aeiouy]+", "V").replaceAll("[^V]", "").length === 2)
  }

  test("t41 rouge/bleu: pairing exact, metrics in [0,1], clipping binds") {
    val rows = run("t41_rouge_bleu").collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val perSource = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.length === perSource.size)
    rows.foreach { r =>
      // lead() pairing: every doc but the last of each source is a candidate
      assert(r.getAs[Long]("n_pairs") === perSource(r.getAs[String]("source")) - 1)
      val r1 = r.getAs[Double]("avg_rouge1_f1")
      val r2 = r.getAs[Double]("avg_rouge2_f1")
      val b2 = r.getAs[Double]("avg_bleu2")
      assert(r1 >= 0.0 && r1 <= 1.0)
      assert(r2 >= 0.0 && r2 <= 1.0)
      assert(b2 >= 0.0 && b2 <= 1.0)
      // same-source docs share template vocabulary: unigram overlap binds
      assert(r1 > 0.0, s"source ${r.getString(0)} has zero unigram overlap")
      // clipped F1 is monotone in n-gram order on template-ish text
      assert(r1 >= r2 - 1e-9)
    }
    // worked BLEU+1 example (Lin & Och '04 smoothing): cand = ref, 4 tokens
    // -> o1 = 4, o2 = 3, p1 = 5/5, p2 = 4/4, BP = 1 -> BLEU-2 = 1
    assert(math.abs(math.min(1.0, math.exp(1.0 - 4.0 / 4.0))
      * math.sqrt(((4 + 1.0) / (4 + 1.0)) * ((3 + 1.0) / (3 + 1.0))) - 1.0) < 1e-12)
  }

  test("t40 kneser-ney: position accounting exact, probs in (0,1), held-out only") {
    val rows = run("t40_kneser_ney").collect()
    // scores exactly the odd-doc_id half, one row per held-out doc
    assert(rows.forall(_.getAs[Long]("doc_id") % 2 == 1))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 2 === 1)
    assert(rows.length === docs.count().toInt)
    // n_scored is EXACTLY the doc's bigram count (tokens - 1, floored at 0)
    val expected = docs
      .select(col("doc_id"),
        greatest(size(split(col("text"), " ")) - 1, lit(0)).cast("long").as("nb"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_scored") === expected(id),
        s"doc $id scored ${r.getAs[Long]("n_scored")} of ${expected(id)} bigrams")
      assert(r.getAs[Long]("n_backoff") <= r.getAs[Long]("n_scored"))
      // every per-position P_KN is in (0,1): discounted seen mass < 1 and
      // the smoothed continuation floor > 0, so the per-doc mean log10 < 0
      if (r.getAs[Long]("n_scored") > 0)
        assert(r.getAs[Double]("avg_kn_logprob10") < 0.0)
      else assert(r.isNullAt(r.fieldIndex("avg_kn_logprob10")))
    }
    // the model discriminates: held-out docs do not all share one score
    assert(rows.filter(!_.isNullAt(3)).map(_.getAs[Double]("avg_kn_logprob10"))
      .distinct.length > 10)
  }

  test("s36 pq graph serve: quantized walk still lands the cluster, ranks exact") {
    val rows = run("s36_pq_graph_search").collect()
    assert(rows.map(_.getAs[Long]("query_id")).distinct.length === 20)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, g) =>
      val byRank = g.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("dist_sq"))
      assert(byRank.length === 3 && (byRank, byRank.tail).zipped.forall(_ <= _))
    }
    // the quantization tradeoff, bounded: the ADC-scored walk may lose a
    // couple of top-1 cluster hits vs s30's exact-distance walk (measured
    // 15/20 here vs s30's 17/20) but must stay well above chance (20 x
    // 1/50 = 0.4 expected hits for a random walk)
    val hits = rows.filter(_.getAs[Long]("rnk") == 1L).count { r =>
      r.getAs[Long]("neighbor_id") % 50 == (r.getAs[Long]("query_id") * 7) % 50
    }
    assert(hits >= 13, s"pq-walk top-1 cluster hits $hits below floor 13")
    // rerank is EXACT: each reported dist_sq is the true distance of that
    // (query, node) pair, not the ADC approximation
    val sparkS = spark
    import graft.functions.VectorExpressions.l2DistSq
    val emb = operators.Similarity.nndPlantedVecs(sparkS, sfDir)
      .select(col("vec_id").as("neighbor_id"), col("embedding"))
    val panel = operators.Similarity.s30QueriesFor(sparkS)
    val recomputed = operators.Similarity.withConstraintPropagationOff(sparkS) {
      run("s36_pq_graph_search")
        .join(emb, Seq("neighbor_id"))
        .join(panel, Seq("query_id"))
        .select(col("query_id"), col("neighbor_id"), col("dist_sq"),
          round(l2DistSq(col("embedding"), col("q_emb")), 6).as("truth"))
        .collect()
    }
    recomputed.foreach { r =>
      assert(r.getAs[Double]("dist_sq") === r.getAs[Double]("truth"))
    }
  }

  test("s37 graph recall eval: exact walk dominates quantized, floors hold") {
    val rows = run("s37_graph_recall_eval").collect()
    assert(rows.map(_.getAs[String]("method")).sorted === Array("flat_nsw", "pq_adc"))
    val byM = rows.map(r => r.getAs[String]("method") ->
      (r.getAs[Long]("hits"), r.getAs[Double]("recall_at_3"))).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_truth") === 60L)
      assert(r.getAs[Long]("hits") <= 60L)
      assert(math.abs(r.getAs[Double]("recall_at_3") -
        r.getAs[Long]("hits").toDouble / 60) < 1e-5)
    }
    // the exact-distance walk can only beat the 2x16-codeword ADC walk
    // (measured: flat 0.80/0.80/0.53 vs pq 0.47/0.47/0.05 at the three
    // SFs — the eval exists to make that quantization cost visible)
    assert(byM("flat_nsw")._1 >= byM("pq_adc")._1)
    assert(byM("flat_nsw")._2 >= 0.4,
      s"flat walk recall ${byM("flat_nsw")._2} below floor")
  }

  test("t38 char entropy: planted ab-floods at exactly 1 bit, organics clean") {
    val rows = run("t38_char_entropy").collect()
    val (planted, organic) = rows.partition(_.getAs[Long]("doc_id") >= 1000000L)
    assert(planted.length === 20)
    planted.foreach { r =>
      assert(r.getAs[Double]("entropy_bits") === 1.0)
      assert(r.getAs[Long]("n_chars_counted") === 200L)
      assert(r.getAs[Long]("n_distinct_chars") === 2L)
      assert(r.getAs[Boolean]("low_entropy"))
    }
    organic.foreach { r =>
      val h = r.getAs[Double]("entropy_bits")
      assert(h > 3.0 && h < 6.0, s"organic doc entropy $h out of prose range")
      assert(!r.getAs[Boolean]("low_entropy"))
    }
  }
}
