package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.sources.Tables

/** The COMPOSED end-to-end curation pipeline (VERDICT r9 Missing #3): every
  * stage exists as its own oracle-green gate entry, but a real pretraining
  * run chains them — and inter-stage schema/semantics interop (does stage
  * N+1 accept and correctly interpret stage N's output?) is exactly what
  * per-stage unit gates cannot test. One entry runs the chain
  *
  *   quality filter (t12 verdict formulas)
  *     → corpus line dedup (d19 core: block df model, template strip)
  *     → near-dup keep-one (d06 MinHash banding + exact-Jaccard verify,
  *       d09 connected components, min-id canonical)
  *     → decontamination (d16 8-gram overlap vs a held-out eval set)
  *     → sequence packing (t10 distributed prefix sum, budget 256)
  *     → stratified hash split (t25 80/10/10)
  *
  * over a corpus with BOTH canonical plants (the d19 boilerplate template
  * on even ids; d09's 80%-prefix near-dup twins on every 10th id) so every
  * stage demonstrably does work, and the DuckDB oracle mirrors the WHOLE
  * chain CTE-for-CTE — built from the same factored SQL (kmSqlPrefix /
  * kmSqlVerifyTail, the d19 CTE shapes, the d09 recursive-CTE components,
  * the t10 window prefix sum) the per-stage oracles use, so the two
  * engines' pipelines cannot drift stage-by-stage OR end-to-end.
  *
  * Conservation is asserted as REAL cross-engine columns, not constants:
  * per-stage cardinalities (n_input … n_after_decontam) are computed
  * independently by both engines and hash-compared, `rows_monotone` and
  * `tokens_conserved` (Σ tokens into packing == the final pack cursor) are
  * genuine comparisons on both sides.
  *
  * Scale shape: each stage keeps its own audited posture — the filter is
  * two grouped aggregates; line dedup shuffles 8-byte block hashes;
  * near-dup candidates come from banding (never doc×doc) with exact verify
  * on candidates only; CC runs on the (tiny) verified-edge set; decontam
  * broadcasts the eval-gram side; packing is the two-pass prefix sum with
  * driver state = #partitions offsets; the split is row-local hash math.
  * Five .count() actions materialize stage cardinalities — each reads a
  * persisted stage output, none collects rows.
  */
object Curation {

  private def toks: Column = split(col("text"), " ")

  /** The pipeline's stage frames (each persisted) + cardinalities; p04
    * packs/splits the survivors, p05 audits every input doc's outcome.
    * Call `release()` after materializing an output. */
  private final case class Stages(
      corpus: DataFrame, filtered: DataFrame, cleaned: DataFrame,
      kept3: DataFrame, kept4: DataFrame,
      nInput: Long, nAfterFilter: Long, nAfterLineDedup: Long,
      nAfterNearDup: Long, nAfterDecontam: Long) {
    def release(): Unit =
      Seq(corpus, filtered, cleaned, kept3, kept4).foreach(_.unpersist(false))
  }

  private def runStages(s: org.apache.spark.sql.SparkSession, dir: String): Stages = {
      val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      // ---- stage 0: corpus with near-dup twins + boilerplate plant.
      // The gate runs the chain on a deterministic THIRD of the corpus —
      // composition/interop is what this entry tests (each stage's scale
      // posture is its own entry's + SCALE.md's job), and the subset keeps
      // the 6-stage chain from dominating the bench; both plants survive
      // the subset (evens for the template, %30 ids for the twins)
      val base = Tables.documents(s, dir).select(
          graft.functions.CrossEngine.guardedId(col("doc_id"), 10000000L, "p04").as("doc_id"),
          col("text"))
        .filter(col("doc_id") % 3 === 0)
      val g1 = base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"),
          array_join(slice(toks, lit(1),
            greatest((size(toks) * 0.8).cast("int"), lit(1))), " ").as("text"))
      val corpus = Dedup.d19Corpus(base.unionByName(g1)).persist(mem)
      val nInput = corpus.count()

      // ---- stage 1: quality verdict (t12 formulas; bounds widened for
      // the +20-token template and the 80% twins)
      val cnts = corpus.select(col("doc_id"), explode(toks).as("token"))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("cnt"))
      val stats = cnts.groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_tokens"), max(col("cnt")).as("top_cnt"))
      val filtered = corpus.join(stats, Seq("doc_id"))
        .filter(col("n_tokens").between(30, 130) &&
          round(col("top_cnt").cast("double") / col("n_tokens"), 4) <= 0.2)
        .select(col("doc_id"), col("text"))
        .persist(mem)
      val nAfterFilter = filtered.count()

      // ---- stage 2: corpus line dedup (d19 core); fully-stripped docs drop
      val cleaned = Dedup.lineDedup(filtered, blockTokens = 10, maxDf = 50)
        .filter(col("text_clean") =!= "")
        .select(col("doc_id"), col("text_clean").as("text"), col("n_removed"))
        .persist(mem)
      val nAfterLineDedup = cleaned.count()

      // ---- stage 3: near-dup keep-one (d06 banding + verify, d09 CC)
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
      val kept3 = cleaned.join(
          labels.filter(col("node") =!= col("label"))
            .select(col("node").as("doc_id")),
          Seq("doc_id"), "left_anti")
        .persist(mem)
      val nAfterNearDup = kept3.count()
      sets.unpersist(false)

      // ---- stage 4: decontamination (d16 core, 8-grams; eval = the
      // 20-token passages of every 97th KEPT doc — the self-overlap plant)
      val evalGrams = kept3.filter(col("doc_id") % 97 === 0)
        .select(concat_ws(" ", slice(toks, 3, 20)).as("text"))
        .select(split(col("text"), " ").as("tk"))
        .select(explode(Dedup.wordNgrams(8)).as("g")).distinct()
      val contaminated = kept3.select(col("doc_id"), toks.as("tk"))
        .select(col("doc_id"), explode(Dedup.wordNgrams(8)).as("g"))
        .join(broadcast(evalGrams), Seq("g"))
        .select(col("doc_id")).distinct()
      val kept4 = kept3.join(contaminated, Seq("doc_id"), "left_anti")
        .persist(mem)
      val nAfterDecontam = kept4.count()
      Stages(corpus, filtered, cleaned, kept3, kept4,
        nInput, nAfterFilter, nAfterLineDedup, nAfterNearDup, nAfterDecontam)
  }

  private val p04 = Q(
    "p04_curation_pipeline",
    (s, dir) => {
      val st = runStages(s, dir)
      import st._

      // ---- stage 5: sequence packing (t10 core), budget 256 tokens
      val counted = kept4.select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"), col("n_removed"))
      val packed = TextAnalysis.packSequences(
        counted.select(col("doc_id"), col("n_tokens")), budget = 256L)
      val totalTokens = counted
        .agg(coalesce(sum(col("n_tokens")), lit(0L))).head().getLong(0)
      val packEnd = packed
        .agg(coalesce(max(col("seq_id") * 256L + col("seq_offset") + col("n_tokens")),
          lit(0L))).head().getLong(0)

      // ---- stage 6: stratified hash split (t25 slots) + final assembly
      val out = packed
        .join(counted.select(col("doc_id"), col("n_removed")), Seq("doc_id"))
        .withColumn("slot",
          pmod(graft.functions.CrossEngine.md5Hash60(col("doc_id")), lit(10L)))
        .select(col("doc_id"), col("n_tokens"),
          col("n_removed").cast("long").as("n_removed_blocks"),
          col("seq_id"), col("seq_offset"),
          when(col("slot") < 8, "train").when(col("slot") === 8, "val")
            .otherwise("test").as("split"),
          lit(nInput).as("n_input"),
          lit(nAfterFilter).as("n_after_filter"),
          lit(nAfterLineDedup).as("n_after_linededup"),
          lit(nAfterNearDup).as("n_after_neardup"),
          lit(nAfterDecontam).as("n_after_decontam"),
          lit(nInput >= nAfterFilter && nAfterFilter >= nAfterLineDedup &&
            nAfterLineDedup >= nAfterNearDup && nAfterNearDup >= nAfterDecontam)
            .as("rows_monotone"),
          lit(totalTokens == packEnd).as("tokens_conserved"))
        .localCheckpoint(true)
      st.release()
      out
    },
    p04Oracle)
  /** The oracle's stage CTE chain (through kept4), shared by p04 and p05
    * so the two gates cannot drift. */
  private def stagesSql: String = {
      val kmCtes = Dedup.kmSqlPrefix("SELECT doc_id, text FROM cleaned")
        .stripPrefix("WITH ")
      s"""WITH RECURSIVE g1base AS (
        SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        WHERE doc_id % 3 = 0 AND doc_id % 10 = 0),
      corpus AS MATERIALIZED (
        SELECT doc_id,
          CASE WHEN doc_id % 2 = 0 THEN '${Dedup.d19Template}' || ' ' || text
            ELSE text END AS text
        FROM (
          SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
          UNION ALL
          SELECT doc_id + 10000000,
            array_to_string(tk[1:greatest(CAST(floor(len(tk) * 0.8) AS INT), 1)], ' ')
          FROM g1base) u),
      cnts AS (SELECT doc_id, token, count(*) AS cnt FROM
        (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM corpus) t
        GROUP BY 1, 2),
      stats AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
        max(cnt) AS top_cnt FROM cnts GROUP BY 1),
      filtered AS MATERIALIZED (
        SELECT c.doc_id, c.text FROM corpus c JOIN stats s USING (doc_id)
        WHERE s.n_tokens BETWEEN 30 AND 130
          AND round(CAST(s.top_cnt AS DOUBLE) / s.n_tokens, 4) <= 0.2),
      blocks AS (
        SELECT doc_id, i AS pos,
          array_to_string(tk[(i * 10 + 1) : (i * 10 + 10)], ' ') AS blk
        FROM (SELECT doc_id, tk,
            unnest(range(0, CAST(ceil(len(tk) / 10.0) AS BIGINT))) AS i
          FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM filtered) t) u),
      hashed AS MATERIALIZED (
        SELECT doc_id, pos, blk,
          CAST(concat('0x', substring(md5(blk), 1, 15)) AS BIGINT) AS h
        FROM blocks),
      hot AS (
        SELECT h FROM hashed GROUP BY h HAVING count(DISTINCT doc_id) >= 50),
      keptb AS (
        SELECT doc_id, count(*) AS n_kept,
          string_agg(blk, ' ' ORDER BY pos) AS text_clean
        FROM hashed WHERE h NOT IN (SELECT h FROM hot)
        GROUP BY doc_id),
      totalsb AS (SELECT doc_id, count(*) AS n_blocks FROM hashed GROUP BY doc_id),
      cleaned AS MATERIALIZED (
        SELECT t.doc_id, coalesce(k.text_clean, '') AS text,
          t.n_blocks - coalesce(k.n_kept, 0) AS n_removed
        FROM totalsb t LEFT JOIN keptb k USING (doc_id)
        WHERE coalesce(k.text_clean, '') <> ''),
      $kmCtes,
      cand AS MATERIALIZED (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
      verified AS MATERIALIZED (${Dedup.kmSqlVerifyTail}),
      und AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM verified
        UNION ALL SELECT doc_b, doc_a FROM verified),
      reach(a, b) AS (
        SELECT src, dst FROM und
        UNION
        SELECT r.a, u.dst FROM reach r JOIN und u ON r.b = u.src),
      cclabels AS MATERIALIZED (
        SELECT a AS node, least(a, min(b)) AS cluster_id FROM reach GROUP BY a),
      kept3 AS MATERIALIZED (
        SELECT c.* FROM cleaned c LEFT JOIN cclabels l ON c.doc_id = l.node
        WHERE l.node IS NULL OR l.node = l.cluster_id),
      evalg AS MATERIALIZED (
        SELECT DISTINCT array_to_string(tk[i : i + 7], ' ') AS g FROM (
          SELECT tk, unnest(range(1, CAST(greatest(len(tk) - 7, 0) AS BIGINT) + 1)) AS i
          FROM (SELECT string_split(array_to_string(string_split(text, ' ')[3:22], ' '), ' ') AS tk
            FROM kept3 WHERE doc_id % 97 = 0) t) u),
      traing AS MATERIALIZED (
        SELECT doc_id, array_to_string(tk[i : i + 7], ' ') AS g FROM (
          SELECT doc_id, tk,
            unnest(range(1, CAST(greatest(len(tk) - 7, 0) AS BIGINT) + 1)) AS i
          FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM kept3) t) u),
      contaminated AS MATERIALIZED (
        SELECT DISTINCT t.doc_id FROM traing t JOIN evalg e ON t.g = e.g),
      kept4 AS MATERIALIZED (
        SELECT * FROM kept3
        WHERE doc_id NOT IN (SELECT doc_id FROM contaminated))"""
  }

  private def p04OracleSql: String = s"""$stagesSql,
      counted AS MATERIALIZED (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
          n_removed
        FROM kept4),
      packedc AS MATERIALIZED (
        SELECT doc_id, n_tokens, n_removed,
          sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum_end
        FROM counted),
      sc AS MATERIALIZED (SELECT
        (SELECT count(*) FROM corpus) AS n_input,
        (SELECT count(*) FROM filtered) AS n_after_filter,
        (SELECT count(*) FROM cleaned) AS n_after_linededup,
        (SELECT count(*) FROM kept3) AS n_after_neardup,
        (SELECT count(*) FROM kept4) AS n_after_decontam)
      SELECT p.doc_id, p.n_tokens, CAST(p.n_removed AS BIGINT) AS n_removed_blocks,
        CAST((p.cum_end - p.n_tokens) // 256 AS BIGINT) AS seq_id,
        CAST((p.cum_end - p.n_tokens) % 256 AS BIGINT) AS seq_offset,
        CASE WHEN p.slot < 8 THEN 'train' WHEN p.slot = 8 THEN 'val'
          ELSE 'test' END AS split,
        CAST(sc.n_input AS BIGINT) AS n_input,
        CAST(sc.n_after_filter AS BIGINT) AS n_after_filter,
        CAST(sc.n_after_linededup AS BIGINT) AS n_after_linededup,
        CAST(sc.n_after_neardup AS BIGINT) AS n_after_neardup,
        CAST(sc.n_after_decontam AS BIGINT) AS n_after_decontam,
        (sc.n_input >= sc.n_after_filter
          AND sc.n_after_filter >= sc.n_after_linededup
          AND sc.n_after_linededup >= sc.n_after_neardup
          AND sc.n_after_neardup >= sc.n_after_decontam) AS rows_monotone,
        ((SELECT coalesce(sum(n_tokens), 0) FROM counted)
          = (SELECT coalesce(max(cum_end), 0) FROM packedc)) AS tokens_conserved
      FROM (SELECT *,
          CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 AS slot
        FROM packedc) p, sc"""

  private def p04Oracle = Some(p04OracleSql)

  // ---------------------------------------------------------------- p05
  /** CURATION AUDIT / ROW-LEVEL LINEAGE — the operational question behind
    * every curation pipeline: "why is my document not in the training
    * set?" p04 emits the survivors; p05 emits a verdict for EVERY input
    * document — which stage dropped it and why (quality filter, fully-
    * boilerplate strip, near-dup collapse, decontamination) or `kept` —
    * the audit/appeals table a data-governance process works from, and
    * the per-stage attrition report in one shape. Built by left-marking
    * the corpus against each stage's survivor set (broadcast-sized id
    * projections at gate scale; at 100 TB these are id-keyed anti-joins —
    * no stage output is ever collected); runs the SAME factored stage
    * chain and the SAME factored oracle CTEs as p04, so the audit cannot
    * drift from the pipeline it audits. */
  private val p05 = Q(
    "p05_curation_audit",
    (s, dir) => {
      val st = runStages(s, dir)
      def mark(df: DataFrame, name: String): DataFrame =
        df.select(col("doc_id"), lit(true).as(name))
      val out = st.corpus.select(col("doc_id"))
        .join(mark(st.filtered, "f"), Seq("doc_id"), "left")
        .join(mark(st.cleaned, "c"), Seq("doc_id"), "left")
        .join(mark(st.kept3, "k3"), Seq("doc_id"), "left")
        .join(mark(st.kept4, "k4"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("f").isNull, "filtered_out")
            .when(col("c").isNull, "fully_boilerplate")
            .when(col("k3").isNull, "near_dup")
            .when(col("k4").isNull, "contaminated")
            .otherwise("kept").as("outcome"))
        .localCheckpoint(true)
      st.release()
      out
    },
    Some(s"""$stagesSql
      SELECT c.doc_id,
        CASE WHEN f.doc_id IS NULL THEN 'filtered_out'
          WHEN cl.doc_id IS NULL THEN 'fully_boilerplate'
          WHEN k3.doc_id IS NULL THEN 'near_dup'
          WHEN k4.doc_id IS NULL THEN 'contaminated'
          ELSE 'kept' END AS outcome
      FROM corpus c
      LEFT JOIN filtered f ON f.doc_id = c.doc_id
      LEFT JOIN cleaned cl ON cl.doc_id = c.doc_id
      LEFT JOIN kept3 k3 ON k3.doc_id = c.doc_id
      LEFT JOIN kept4 k4 ON k4.doc_id = c.doc_id"""))

  /** ROW-LOCAL ADMISSION VERDICT under FROZEN models (the st29 streaming
    * lane's kernel — VERDICT r10 next-4): the production direction of the
    * p04 chain, where models are trained batch-side and each ARRIVING doc
    * is judged statelessly — quality verdict (the t12/p04 stage-1
    * formulas recomputed with array HOFs inside the row), d19 hot-block
    * strip against the frozen template-hash set, and d16 decontamination
    * against the frozen eval-gram hash set. Everything is a codegen'd
    * expression over one row: no explode, no regroup, no state store —
    * which is exactly what lets the SAME frame run unchanged under a
    * streaming source in append mode.
    *
    * Model-size contract: both frozen sets ride into the plan as single
    * array literals. Hot-template sets are tiny by construction (blocks
    * with df >= maxDf are boilerplate); eval-benchmark gram sets are
    * bounded (a finite benchmark suite). If an eval set outgrew literal
    * scale, the lane switches to st11/st16's stream-static broadcast-join
    * form with drain-side reassembly — the documented alternative, at the
    * cost of the verdict no longer being single-row. */
  private[graft] def admissionVerdict(docs: DataFrame, hotHashes: Seq[Long],
      evalGramHashes: Seq[Long]): DataFrame = {
    val hotLit = typedlit(hotHashes)
    def h60(c: Column): Column =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long") // = CrossEngine.md5Hash60
    docs
      .withColumn("tk", split(col("text"), " "))
      .withColumn("n_tokens", size(col("tk")).cast("long"))
      .withColumn("top_cnt", array_max(transform(array_distinct(col("tk")),
        t => size(filter(col("tk"), x => x === t)))).cast("long"))
      .withColumn("quality_ok", col("n_tokens").between(30, 130) &&
        (round(col("top_cnt").cast("double") / col("n_tokens"), 4) <= 0.2))
      .withColumn("blks", expr(
        """transform(sequence(0, CAST(ceil(size(tk) / 10.0) AS INT) - 1),
           i -> array_join(slice(tk, i * 10 + 1, 10), ' '))"""))
      .withColumn("keptb", filter(col("blks"), b => !array_contains(hotLit, h60(b))))
      .withColumn("n_removed", (size(col("blks")) - size(col("keptb"))).cast("long"))
      .withColumn("text_clean", array_join(col("keptb"), " "))
      .withColumn("stripped_empty", col("text_clean") === "")
      .withColumn("ctk", split(col("text_clean"), " "))
      .withColumn("grams", expr(
        """filter(transform(sequence(1, greatest(size(ctk) - 7, 1)),
           i -> concat_ws(' ', slice(ctk, i, 8))), g -> size(ctk) >= 8)"""))
      // contamination via the codegen'd binary-search overlap: the eval
      // set GROWS with the benchmark suite (134k grams at the 1M-doc
      // rehearsal) and the exists+array_contains HOF form scans the whole
      // literal per gram interpreted — measured as a hang at that scale
      .withColumn("gram_hashes", transform(col("grams"), g => h60(g)))
      .withColumn("contaminated", graft.functions.VectorExpressions
        .sortedSetOverlap(col("gram_hashes"), evalGramHashes.toArray.sorted))
      .select(col("doc_id"), col("n_tokens"), col("quality_ok"), col("n_removed"),
        col("stripped_empty"), col("contaminated"),
        (col("quality_ok") && !col("stripped_empty") && !col("contaminated"))
          .as("admitted"))
  }

  /** The frozen models the st29 admission lane serves: (hot-block hashes,
    * eval-gram hashes), both batch-derived from the d19 template corpus —
    * train-then-serve, the production direction. */
  private[graft] def frozenAdmissionModels(corpus: DataFrame): (Seq[Long], Seq[Long]) = {
    val sp = corpus.sparkSession
    import sp.implicits._
    val hot = Dedup.hotBlocks(corpus, blockTokens = 10, maxDf = 50)
      .as[Long].collect().sorted.toSeq // bounded: boilerplate templates
    val cleaned = Dedup.lineDedup(corpus, blockTokens = 10, maxDf = 50)
      .filter(col("text_clean") =!= "")
      .select(col("doc_id"), col("text_clean").as("text"))
    val evalGrams = cleaned.filter(col("doc_id") % 97 === 0)
      .select(split(concat_ws(" ", slice(split(col("text"), " "), 3, 20)), " ").as("tk"))
      .select(explode(Dedup.wordNgrams(8)).as("g")).distinct()
      .select(graft.functions.CrossEngine.md5Hash60(col("g")))
      .as[Long].collect().sorted.toSeq // bounded: the eval benchmark
    (hot, evalGrams)
  }

  // ---------------------------------------------------------------- p09
  /** CORPUS-EXPORT SHARD WRITER (VERDICT r15 #7 — the curation pipeline's
    * last mile: p04 ends at packed/split rows; a training run wants the
    * corpus ON DISK as deterministic, token-balanced, seeded-order
    * shards plus a manifest the loader trusts). Composition of two
    * audited kernels:
    *
    *   - ORDER: the q83 epoch permutation gives every doc its seeded
    *     global position (partition-parallel bucket windows, driver
    *     state 2^bucketBits longs);
    *   - BALANCE: the t10 two-pass prefix sum runs over the PERMUTED
    *     order (positions as the sort key), and shard_id = token-start
    *     div ceil(T/S) — greedy contiguous token splits, so shard token
    *     counts deviate from T/S by at most one document.
    *
    * Each shard is written as ONE parquet file whose ROW ORDER is the
    * epoch order (repartition on the shard column, sort within by pos,
    * partitionBy writes each task's single shard in iteration order),
    * and the manifest pins per-shard accounting: doc count, exact token
    * count, position range, and an ORDER-SENSITIVE checksum
    * (md5(doc)-weighted by within-shard rank). The gate returns the
    * PERSISTED manifest; DuckDB recomputes every column from the
    * permutation + prefix-sum arithmetic, so a shard writer that
    * misorders, drops, or rebalances one doc reds on values. Read-back
    * witnesses: one file per shard, and each file's PHYSICAL row order
    * reproduces the manifest checksum (rank = read order).
    *
    * Scale shape: everything rides the q83/t10 decompositions (no
    * global sort, driver state = bucket counts + partition offsets);
    * the write is one shuffle on shard_id; S manifest rows. At 100 TB,
    * S scales with corpus/shard-size and the manifest stays KB. */
  private val p09 = Q(
    "p09_corpus_export_shards",
    (s, dir) => {
      val out = java.nio.file.Files.createTempDirectory("graft_p09_").toString
      try {
        val nShards = 8
        val counted = Tables.documents(s, dir).select(col("doc_id"),
          size(toks).cast("long").as("n_tokens"))
        val manifest = exportShards(counted, "epoch1", nShards,
          s"$out/shards", s"$out/manifest")
        // read-back witnesses over the persisted files
        val shardDirs = (0 until nShards).map(i => s"$out/shards/shard_id=$i")
        val onePerShard = shardDirs.forall(d =>
          Option(new java.io.File(d).listFiles()).getOrElse(Array.empty)
            .count(_.getName.endsWith(".parquet")) == 1)
        val want = manifest.select(col("shard_id"), col("order_checksum"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val readOrderOk = (0 until nShards).forall { i =>
          val reread = s.read.parquet(shardDirs(i))
            .select(col("doc_id")).rdd.zipWithIndex()
            .map { case (r, idx) => (r.getLong(0), idx + 1L) }
          val ck = s.createDataFrame(reread).toDF("doc_id", "rk")
            .select(sum(expr("""CAST(conv(substring(md5(CAST(doc_id AS STRING)),
              1, 10), 16, 10) AS BIGINT) % 1048576""") * col("rk")))
            .head().getLong(0)
          ck == want(i.toLong)
        }
        graft.functions.CrossEngine.materializeLocal(s,
          s.read.parquet(s"$out/manifest")
            .withColumn("one_file_per_shard", lit(onePerShard))
            .withColumn("readback_order_matches", lit(readOrderOk)))
      } finally {
        graft.functions.CrossEngine.deleteRecursive(
          java.nio.file.Paths.get(out))
      }
    },
    Some("""WITH posd AS (
        SELECT doc_id, row_number() OVER (ORDER BY
          CAST(concat('0x', substring(md5(concat('epoch1:',
            CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT), doc_id) - 1
          AS pos,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents),
      pre AS (
        SELECT doc_id, pos, n_tokens,
          sum(n_tokens) OVER (ORDER BY pos ROWS UNBOUNDED PRECEDING)
            - n_tokens AS tok_start
        FROM posd),
      tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM posd),
      sh AS (
        SELECT p.doc_id, p.pos, p.n_tokens,
          least(p.tok_start // ((tot.t + 7) // 8), 7) AS shard_id
        FROM pre p CROSS JOIN tot),
      rk AS (
        SELECT doc_id, pos, n_tokens, shard_id,
          row_number() OVER (PARTITION BY shard_id ORDER BY pos) AS r
        FROM sh)
      SELECT CAST(shard_id AS BIGINT) AS shard_id,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
        CAST(min(pos) AS BIGINT) AS first_pos,
        CAST(max(pos) AS BIGINT) AS last_pos,
        CAST(sum((CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)),
          1, 10)) AS BIGINT) % 1048576) * r) AS BIGINT) AS order_checksum,
        true AS one_file_per_shard, true AS readback_order_matches
      FROM rk GROUP BY 1"""))

  /** The exporter core (shared with
    * `graft.tools.ShardExportRehearsal`): permute `counted`
    * (doc_id, n_tokens) with the epoch seed, split into `nShards` greedy
    * contiguous token-balanced shards, write one ordered parquet file
    * per shard under `dest` plus the manifest parquet at `manifestDest`
    * (an explicit path — inferring it from `dest` silently corrupted
    * the shard listing for any dest not named ".../shards"; ADVICE
    * r16). Returns the manifest frame. */
  private[graft] def exportShards(counted: DataFrame, seed: String,
      nShards: Int, dest: String, manifestDest: String): DataFrame = {
    val s = counted.sparkSession
    val positions = Relational.epochShufflePositions(
      counted.select(col("doc_id")), seed)
    // lazy checkpoint: the `total` aggregate right below materializes it
    val ordered = counted.join(positions, Seq("doc_id"))
      .localCheckpoint(false)
    val total = ordered.agg(coalesce(sum(col("n_tokens")), lit(0L)))
      .head().getLong(0)
    val target = (total + nShards - 1) / nShards
    // the t10 prefix sum over the PERMUTED order: feed pos as the sort
    // key, budget = the shard token target => seq_id IS the shard
    val packed = TextAnalysis.packSequences(
      ordered.select(col("pos").as("doc_id"), col("n_tokens")),
      budget = target)
      .select(col("doc_id").as("pos"),
        least(col("seq_id"), lit(nShards - 1L)).as("shard_id"))
    val rows = ordered.join(packed, Seq("pos"))
      .select(col("shard_id"), col("pos"), col("doc_id"), col("n_tokens"))
    // sort by (shard_id, pos): the dynamic-partition writer requires an
    // ordering on the partition column and would otherwise insert its own
    // NON-STABLE sort on shard_id alone, scrambling pos order within a
    // file once rows spill (caught at 1M docs by ShardExportRehearsal) —
    // pre-satisfying the requirement makes the writer skip that sort
    rows.repartition(col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("pos"))
      .write.mode("overwrite").partitionBy("shard_id").parquet(dest)
    val wr = Window.partitionBy(col("shard_id")).orderBy(col("pos"))
    val manifest = rows
      .withColumn("r", row_number().over(wr).cast("long"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("shard_tokens"),
        min(col("pos")).as("first_pos"), max(col("pos")).as("last_pos"),
        sum((expr("""CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 10),
          16, 10) AS BIGINT) % 1048576""") * col("r")).cast("long"))
          .as("order_checksum"))
    manifest.coalesce(1).write.mode("overwrite").parquet(manifestDest)
    // return the JUST-WRITTEN manifest (longs roundtrip parquet exactly):
    // callers that materialize it again (p11's checkpoint, p09's collect)
    // then read S tiny rows back instead of re-running the window+agg plan
    counted.sparkSession.read.parquet(manifestDest)
  }

  // ---------------------------------------------------------------- p10
  /** TOKEN-BUDGET SELECTION (the data-mixing primitive: given a quality
    * signal and a token budget, keep the BEST docs whose cumulative
    * token count fits — every "train on the top-X tokens of the corpus"
    * recipe is this op). Selection = the maximal prefix of the
    * (grade DESC, doc_id) order with running token sum <= budget, so
    * it needs a global prefix sum over a quality order — done with the
    * q83 decomposition: the grade IS an order-contiguous bucket (ties
    * broken by doc_id inside), per-grade token totals prefix-sum on the
    * driver (<= 10 longs), within-grade running sums ride windows
    * PARTITIONED by grade. No global sort, no global window.
    *
    * The quality signal is the p04 repetition ratio (top term count /
    * n_tokens) folded to a decile grade — exact integer/double
    * arithmetic both engines compute identically. The gate emits
    * per-grade accounting (docs, selected, selected tokens) plus the
    * budget facts; booleans recompute PREFIX MAXIMALITY: every selected
    * doc's running end <= budget < every rejected doc's — the selection
    * is exactly the budget-maximal quality prefix, not merely "some
    * subset under budget". */
  /** PREFIX MAXIMALITY of a budgeted selection: every selected doc's
    * running end fits the budget AND the best rejected doc's does not.
    * Both aggregate witnesses are nullable — `maxSelEnd` is None when
    * nothing fits (the first doc alone exceeds the budget; the empty
    * prefix is still the maximal one — ADVICE r16: the unguarded
    * `getLong` NPE'd here), `minRejEnd` is None when everything fits. */
  private[graft] def prefixMaximal(maxSelEnd: Option[Long],
      minRejEnd: Option[Long], budget: Long): Boolean =
    minRejEnd.forall(_ > budget) && maxSelEnd.forall(_ <= budget)

  /** The ONE token-budget selection kernel (p10's decomposition), shared
    * by p10, p11 and CurationRehearsal so the grade formula, the driver
    * prefix sum and the tie-break order cannot drift between them:
    * repetition-ratio decile grade over the corpus text, per-grade token
    * totals prefix-summed on the driver (≤ 10 longs), within-grade
    * running ends on windows PARTITIONED by grade, budget = T/2. No
    * global sort, no global window. */
  private[graft] final case class BudgetSelection(graded: DataFrame,
      cum: DataFrame, selected: DataFrame, tokensIn: Long, budget: Long) {
    /** Release the checkpointed frames — only after every consumer of
      * [[cum]]/[[selected]] has MATERIALIZED its result (p10 and p11
      * both materialize their small per-grade/manifest outputs and then
      * release; a lazily returned frame over these must not call this). */
    def release(): Unit =
      Seq(graded, cum, selected).foreach(_.unpersist(false))
  }

  private[graft] def tokenBudgetSelect(docs: DataFrame): BudgetSelection = {
    val s = docs.sparkSession
    import s.implicits._
    val cnts = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("cnt"))
    // graded/cum checkpoints are LAZY — the perGrade collect materializes
    // graded and the eager `selected` checkpoint materializes cum, so the
    // kernel runs 2 jobs instead of 4 (r19: the curation composites are
    // scheduling-bound; guide §1.2 step 1)
    val graded = cnts.groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_tokens"), max(col("cnt")).as("top_cnt"))
      .withColumn("grade", floor((lit(1.0) -
        col("top_cnt").cast("double") / col("n_tokens").cast("double"))
        * 10).cast("long"))
      .localCheckpoint(false)
    // driver prefix-sum over the grade buckets in DESC order
    val perGrade = graded.groupBy(col("grade"))
      .agg(sum(col("n_tokens")).as("tot"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(-_._1)
    val tokensIn = perGrade.map(_._2).sum
    val budget = tokensIn / 2
    val offsets = {
      var acc = 0L
      perGrade.map { case (g, tot) => val off = acc; acc += tot; g -> off }
    }
    val offDf = broadcast(offsets.toSeq.toDF("grade", "off"))
    val w = Window.partitionBy(col("grade")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = graded.join(offDf, Seq("grade"))
      .withColumn("cum_end", col("off") + sum(col("n_tokens")).over(w))
      .withColumn("selected", col("cum_end") <= budget)
      .localCheckpoint(false)
    val selected = cum.filter(col("selected"))
      .select(col("doc_id"), col("n_tokens")).localCheckpoint(true)
    BudgetSelection(graded, cum, selected, tokensIn, budget)
  }

  private val p10 = Q(
    "p10_token_budget_select",
    (s, dir) => {
      val sel = tokenBudgetSelect(
        Tables.documents(s, dir).select(col("doc_id"), col("text")))
      val budget = sel.budget
      val cum = sel.cum
      val facts = cum.agg(
        max(when(col("selected"), col("cum_end"))).as("max_sel_end"),
        min(when(!col("selected"), col("cum_end"))).as("min_rej_end"),
        sum(when(col("selected"), col("n_tokens")).otherwise(0L))
          .as("sel_tokens")).head()
      // sum(when(..)) over an empty frame is NULL, not 0 (ADVICE r17):
      // an all-filtered corpus reports zero selected tokens, not an NPE
      val selTokens = if (facts.isNullAt(2)) 0L else facts.getLong(2)
      val withinBudget = selTokens <= budget
      val maximal = prefixMaximal(
        if (facts.isNullAt(0)) None else Some(facts.getLong(0)),
        if (facts.isNullAt(1)) None else Some(facts.getLong(1)), budget)
      val out = graft.functions.CrossEngine.materializeLocal(s,
        cum.groupBy(col("grade"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("selected"), 1L).otherwise(0L)).as("n_selected"),
          sum(when(col("selected"), col("n_tokens")).otherwise(0L))
            .as("tokens_selected"))
        .withColumn("budget", lit(budget))
        .withColumn("total_tokens", lit(sel.tokensIn))
        .withColumn("within_budget", lit(withinBudget))
        .withColumn("prefix_maximal", lit(maximal)))
      // the per-grade result (≤ 11 rows) is materialized above, so the
      // checkpointed frames can be freed here — the old lazy return
      // leaked one checkpointed frame per run (ADVICE r17)
      sel.release()
      out
    },
    Some("""WITH cnts AS (
        SELECT doc_id, token, count(*) AS cnt
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
              FROM documents) t
        GROUP BY doc_id, token),
      graded AS (
        SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
          CAST(floor((1.0 - CAST(max(cnt) AS DOUBLE)
            / CAST(sum(cnt) AS DOUBLE)) * 10) AS BIGINT) AS grade
        FROM cnts GROUP BY doc_id),
      tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM graded),
      cum AS (
        SELECT g.doc_id, g.n_tokens, g.grade,
          sum(g.n_tokens) OVER (ORDER BY g.grade DESC, g.doc_id
            ROWS UNBOUNDED PRECEDING) AS cum_end,
          tot.t // 2 AS budget, tot.t AS total_tokens
        FROM graded g CROSS JOIN tot)
      SELECT grade, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(CASE WHEN cum_end <= budget THEN 1 ELSE 0 END) AS BIGINT)
          AS n_selected,
        CAST(sum(CASE WHEN cum_end <= budget THEN n_tokens ELSE 0 END)
          AS BIGINT) AS tokens_selected,
        CAST(any_value(budget) AS BIGINT) AS budget,
        CAST(any_value(total_tokens) AS BIGINT) AS total_tokens,
        true AS within_budget, true AS prefix_maximal
      FROM cum GROUP BY grade"""))

  // ---------------------------------------------------------------- p11
  /** THE TRAINING-DATA LAST MILE, COMPOSED (VERDICT r16 #3): p04 curates,
    * p10 selects under a token budget, q83 orders the epoch, p09 writes
    * shards — a real pretraining run chains all four, and the interop
    * seams (does selection read the CURATED text? do the shards hold
    * exactly the selected docs in the seeded order?) are what the
    * per-stage gates cannot see. One entry runs
    *
    *   p04 stages 0-4 (quality → line dedup → near-dup → decontam)
    *     → p10 token-budget selection (quality-decile prefix, budget T/2)
    *     → q83 epoch permutation over the SELECTED docs (seed epoch1)
    *     → p09 token-balanced ordered shard export (4 shards + manifest)
    *
    * and returns the manifest with CONSERVATION facts computed
    * independently by both engines: docs in == Σ per-outcome lineage
    * counts (every input doc lands in exactly one of filtered_out /
    * fully_boilerplate / near_dup / contaminated / budget_rejected /
    * exported), tokens into selection == selected + rejected, and the
    * shard totals == the selected totals. The row-level lineage audit
    * (the p05 pattern, extended by the two new outcomes) is compressed
    * into `lineage_checksum` — Σ (md5(doc_id) mod 2²⁰) · outcome_code
    * over EVERY input doc — so one document in the wrong class reds the
    * gate on a value, not just a count. The DuckDB oracle mirrors the
    * whole chain CTE-for-CTE on the SAME factored stage SQL as p04/p05.
    *
    * Scale shape: each stage keeps its own audited posture (see p04,
    * p10, q83, p09); the composition adds one broadcast-joined lineage
    * marking and one manifest aggregation. Driver state stays
    * bucket/grade-sized. The 1M-doc composed rehearsal is
    * `graft.tools.CurationRehearsal`'s export leg (SCALE.md). */
  private val p11 = Q(
    "p11_corpus_train_export",
    (s, dir) => {
      val out = java.nio.file.Files.createTempDirectory("graft_p11_").toString
      try {
        val st = runStages(s, dir)
        // p10's kernel on the CURATED text (the shared tokenBudgetSelect
        // — one implementation for p10/p11/the rehearsal)
        val sel = tokenBudgetSelect(
          st.kept4.select(col("doc_id"), col("text")))
        val tokensIn = sel.tokensIn
        val budget = sel.budget
        val selected = sel.selected
        val tokRow = sel.cum.agg(
          sum(when(col("selected"), col("n_tokens")).otherwise(0L)),
          sum(when(!col("selected"), col("n_tokens")).otherwise(0L))).head()
        // NULL on an all-filtered corpus — zeros, not an NPE (ADVICE r17)
        val tokensSelected = if (tokRow.isNullAt(0)) 0L else tokRow.getLong(0)
        val tokensRejected = if (tokRow.isNullAt(1)) 0L else tokRow.getLong(1)
        // q83 epoch order x t10 balance x p09 writer, over the selection
        val nShards = 4
        val manifest = exportShards(selected, "epoch1", nShards,
          s"$out/shards", s"$out/manifest").localCheckpoint(true)
        val manTot = manifest
          .agg(sum(col("n_docs")), sum(col("shard_tokens"))).head()
        val onePerShard = (0 until nShards).forall { i =>
          Option(new java.io.File(s"$out/shards/shard_id=$i").listFiles())
            .getOrElse(Array.empty)
            .count(_.getName.endsWith(".parquet")) == 1
        }
        // row-level lineage, the p05 pattern + the two last-mile outcomes
        def mark(df: DataFrame, name: String): DataFrame =
          df.select(col("doc_id"), lit(true).as(name))
        val lin = st.corpus.select(col("doc_id"))
          .join(mark(st.filtered, "f"), Seq("doc_id"), "left")
          .join(mark(st.cleaned, "c"), Seq("doc_id"), "left")
          .join(mark(st.kept3, "k3"), Seq("doc_id"), "left")
          .join(mark(st.kept4, "k4"), Seq("doc_id"), "left")
          .join(mark(selected, "sel"), Seq("doc_id"), "left")
          .withColumn("code",
            when(col("f").isNull, 1L).when(col("c").isNull, 2L)
              .when(col("k3").isNull, 3L).when(col("k4").isNull, 4L)
              .when(col("sel").isNull, 5L).otherwise(6L))
        def nOf(k: Long): Column =
          sum(when(col("code") === k, 1L).otherwise(0L))
        val fr = lin.agg(count(lit(1)), nOf(1L), nOf(2L), nOf(3L), nOf(4L),
          nOf(5L), nOf(6L),
          sum((pmod(graft.functions.CrossEngine.md5Hash60(col("doc_id")),
            lit(1048576L))) * col("code"))).head()
        val (nInput, nFiltered, nBoiler, nNearDup, nContam, nBudgetRej,
          nExported) = (fr.getLong(0), fr.getLong(1), fr.getLong(2),
          fr.getLong(3), fr.getLong(4), fr.getLong(5), fr.getLong(6))
        val lineageChecksum = fr.getLong(7)
        val docsConserved = nInput == nFiltered + nBoiler + nNearDup +
          nContam + nBudgetRej + nExported
        val tokensConserved = tokensIn == tokensSelected + tokensRejected
        val shardTotalsMatch = manTot.getLong(0) == nExported &&
          manTot.getLong(1) == tokensSelected
        st.release()
        val outDf = graft.functions.CrossEngine.materializeLocal(s, manifest
          .withColumn("n_input", lit(nInput))
          .withColumn("n_filtered_out", lit(nFiltered))
          .withColumn("n_fully_boilerplate", lit(nBoiler))
          .withColumn("n_near_dup", lit(nNearDup))
          .withColumn("n_contaminated", lit(nContam))
          .withColumn("n_budget_rejected", lit(nBudgetRej))
          .withColumn("n_exported", lit(nExported))
          .withColumn("lineage_checksum", lit(lineageChecksum))
          .withColumn("tokens_in", lit(tokensIn))
          .withColumn("tokens_selected", lit(tokensSelected))
          .withColumn("tokens_rejected", lit(tokensRejected))
          .withColumn("budget", lit(budget))
          .withColumn("docs_conserved", lit(docsConserved))
          .withColumn("tokens_conserved", lit(tokensConserved))
          .withColumn("shard_totals_match", lit(shardTotalsMatch))
          .withColumn("one_file_per_shard", lit(onePerShard)))
        // everything above is materialized — free the checkpointed
        // selection and manifest blocks (the p04/p05 release discipline)
        sel.release()
        manifest.unpersist(false)
        outDf
      } finally {
        graft.functions.CrossEngine.deleteRecursive(
          java.nio.file.Paths.get(out))
      }
    },
    Some(s"""$stagesSql,
      cnts2 AS (
        SELECT doc_id, token, count(*) AS cnt
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
              FROM kept4) t
        GROUP BY 1, 2),
      graded AS MATERIALIZED (
        SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
          CAST(floor((1.0 - CAST(max(cnt) AS DOUBLE)
            / CAST(sum(cnt) AS DOUBLE)) * 10) AS BIGINT) AS grade
        FROM cnts2 GROUP BY doc_id),
      tot2 AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM graded),
      cum AS MATERIALIZED (
        SELECT g.doc_id, g.n_tokens, g.grade,
          sum(g.n_tokens) OVER (ORDER BY g.grade DESC, g.doc_id
            ROWS UNBOUNDED PRECEDING) AS cum_end,
          tot2.t // 2 AS budget, tot2.t AS tokens_in
        FROM graded g CROSS JOIN tot2),
      sel AS MATERIALIZED (
        SELECT doc_id, n_tokens FROM cum WHERE cum_end <= budget),
      posd AS (
        SELECT doc_id, row_number() OVER (ORDER BY
          CAST(concat('0x', substring(md5(concat('epoch1:',
            CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT), doc_id) - 1
          AS pos, n_tokens
        FROM sel),
      pre AS (
        SELECT doc_id, pos, n_tokens,
          sum(n_tokens) OVER (ORDER BY pos ROWS UNBOUNDED PRECEDING)
            - n_tokens AS tok_start
        FROM posd),
      tots AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM posd),
      sh AS (
        SELECT p.doc_id, p.pos, p.n_tokens,
          least(p.tok_start // ((tots.t + 3) // 4), 3) AS shard_id
        FROM pre p CROSS JOIN tots),
      rk AS (
        SELECT doc_id, pos, n_tokens, shard_id,
          row_number() OVER (PARTITION BY shard_id ORDER BY pos) AS r
        FROM sh),
      man AS MATERIALIZED (
        SELECT CAST(shard_id AS BIGINT) AS shard_id,
          CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
          CAST(min(pos) AS BIGINT) AS first_pos,
          CAST(max(pos) AS BIGINT) AS last_pos,
          CAST(sum((CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)),
            1, 10)) AS BIGINT) % 1048576) * r) AS BIGINT) AS order_checksum
        FROM rk GROUP BY 1),
      lin AS MATERIALIZED (
        SELECT c.doc_id,
          CASE WHEN f.doc_id IS NULL THEN 1 WHEN cl.doc_id IS NULL THEN 2
            WHEN k3.doc_id IS NULL THEN 3 WHEN k4.doc_id IS NULL THEN 4
            WHEN s.doc_id IS NULL THEN 5 ELSE 6 END AS code
        FROM corpus c
        LEFT JOIN filtered f ON f.doc_id = c.doc_id
        LEFT JOIN cleaned cl ON cl.doc_id = c.doc_id
        LEFT JOIN kept3 k3 ON k3.doc_id = c.doc_id
        LEFT JOIN kept4 k4 ON k4.doc_id = c.doc_id
        LEFT JOIN sel s ON s.doc_id = c.doc_id),
      facts AS MATERIALIZED (
        SELECT CAST(count(*) AS BIGINT) AS n_input,
          CAST(sum(CASE WHEN code = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_filtered_out,
          CAST(sum(CASE WHEN code = 2 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_fully_boilerplate,
          CAST(sum(CASE WHEN code = 3 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_near_dup,
          CAST(sum(CASE WHEN code = 4 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_contaminated,
          CAST(sum(CASE WHEN code = 5 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_budget_rejected,
          CAST(sum(CASE WHEN code = 6 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_exported,
          CAST(sum((CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)),
            1, 15)) AS BIGINT) % 1048576) * code) AS BIGINT)
            AS lineage_checksum
        FROM lin),
      tok AS MATERIALIZED (
        SELECT CAST(any_value(tokens_in) AS BIGINT) AS tokens_in,
          CAST(any_value(budget) AS BIGINT) AS budget,
          CAST(coalesce(sum(CASE WHEN cum_end <= budget THEN n_tokens
            ELSE 0 END), 0) AS BIGINT) AS tokens_selected,
          CAST(coalesce(sum(CASE WHEN cum_end > budget THEN n_tokens
            ELSE 0 END), 0) AS BIGINT) AS tokens_rejected
        FROM cum)
      SELECT m.shard_id, m.n_docs, m.shard_tokens, m.first_pos, m.last_pos,
        m.order_checksum,
        f.n_input, f.n_filtered_out, f.n_fully_boilerplate, f.n_near_dup,
        f.n_contaminated, f.n_budget_rejected, f.n_exported,
        f.lineage_checksum,
        tok.tokens_in, tok.tokens_selected, tok.tokens_rejected, tok.budget,
        (f.n_input = f.n_filtered_out + f.n_fully_boilerplate + f.n_near_dup
          + f.n_contaminated + f.n_budget_rejected + f.n_exported)
          AS docs_conserved,
        (tok.tokens_in = tok.tokens_selected + tok.tokens_rejected)
          AS tokens_conserved,
        ((SELECT sum(n_docs) FROM man) = f.n_exported
          AND (SELECT sum(shard_tokens) FROM man) = tok.tokens_selected)
          AS shard_totals_match,
        true AS one_file_per_shard
      FROM man m, facts f, tok"""))

  val all: Seq[Q] = Seq(p04, p05, p09, p10, p11)
}
