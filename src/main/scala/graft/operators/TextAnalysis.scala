package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.sources.Tables

/** Text-analysis operators for LLM training-data pipelines (builder brief):
  * token counting, quality scoring, document fingerprinting, language ID.
  * All row-local — embarrassingly parallel, no shuffle, codegen-friendly
  * (built-in string/array functions and higher-order functions only).
  */
object TextAnalysis {

  /** Small function-word profiles per language for n-gram/stopword language
    * ID. Deterministic heuristic — scores each language by the fraction of a
    * doc's tokens that are that language's function words.
    */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "de"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "人"))

  private def toks: Column = split(col("text"), " ")

  // ---------------------------------------------------------------- tokens
  /** Whitespace token counting + distinct tokens (op family: tokenize). */
  private val tTokens = Q(
    "t01_token_counts",
    (s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct_tokens"),
        col("n_chars"))
    },
    Some("""SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
      n_chars FROM documents"""))

  // ---------------------------------------------------------------- word freq
  /** Corpus-level token frequency (explode + grouped count). At 100 TB this
    * is the canonical map-side-combine aggregation: the explode is pipelined
    * into a partial hash agg, only (token, partial_count) shuffles. */
  private val tWordFreq = Q(
    "t02_word_freq",
    (s, dir) => {
      Tables.documents(s, dir)
        .select(explode(toks).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
    },
    Some("""SELECT token, count(*) AS n FROM (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
      GROUP BY token"""))

  // ---------------------------------------------------------------- quality
  /** Quality scoring: token stats, non-alpha density, stopword ratio.
    * Row-local; ratios rounded to absorb double formatting differences. */
  private val tQuality = Q(
    "t03_quality_score",
    (s, dir) => {
      val nTok = size(toks)
      val stop = Seq("the", "a")
      Tables.documents(s, dir).select(
        col("doc_id"),
        col("lang"),
        nTok.cast("long").as("n_tokens"),
        round(length(col("text")).cast("double") / nTok, 4).as("chars_per_token"),
        length(regexp_replace(col("text"), "[a-z ]", "")).cast("long").as("n_nonalpha"),
        round(size(filter(toks, t => t.isin(stop: _*))).cast("double") / nTok, 4)
          .as("stopword_ratio"))
    },
    Some("""SELECT doc_id, lang,
      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      round(CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')), 4) AS chars_per_token,
      CAST(length(regexp_replace(text, '[a-z ]', '', 'g')) AS BIGINT) AS n_nonalpha,
      round(CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS DOUBLE)
        / len(string_split(text, ' ')), 4) AS stopword_ratio
      FROM documents"""))

  // ---------------------------------------------------------------- fingerprint
  /** Document fingerprinting via md5 (content hash) — dedup-key primitive. */
  private val tFingerprint = Q(
    "t04_fingerprint",
    (s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"),
        md5(col("text")).as("fp"),
        substring(md5(col("text")), 1, 8).as("fp_short"))
    },
    Some("""SELECT doc_id, md5(text) AS fp, substring(md5(text), 1, 8) AS fp_short
      FROM documents"""))

  // ---------------------------------------------------------------- lang id
  /** Heuristic language ID: argmax over per-language function-word hit
    * ratios (stopword-profile n-gram heuristic). Oracle-checked: both
    * sides compute hits/n_tokens as exact-int-over-int IEEE division, so
    * the scores are bit-equal; Spark's `greatest` over (score, lang)
    * structs breaks ties on the LARGEST language code, reproduced in SQL
    * by testing languages in descending order. The SQL is generated from
    * the same `langProfiles` map as the engine query.
    */
  private val t05OracleSql: String = {
    val langsAsc = langProfiles.keys.toSeq.sorted
    def hits(words: Seq[String]): String =
      s"CAST(len(list_filter(string_split(text, ' '), t -> t IN (${
        words.map(w => s"'$w'").mkString(", ")}))) AS DOUBLE) / len(string_split(text, ' '))"
    val scoreDefs = langsAsc
      .map(l => s"${hits(langProfiles(l))} AS score_$l").mkString(",\n        ")
    val m = langsAsc.map(l => s"score_$l").mkString("greatest(", ", ", ")")
    val tieCase = langsAsc.reverse
      .map(l => s"WHEN score_$l = m THEN '$l'").mkString("CASE ", " ", " END")
    s"""SELECT doc_id, true_lang, $tieCase AS pred_lang, round(m, 4) AS pred_score
      FROM (SELECT doc_id, lang AS true_lang, $m AS m,
        score_${langsAsc.mkString(", score_")}
      FROM (SELECT doc_id, lang, text,
        $scoreDefs
      FROM documents) s) t"""
  }

  private val tLangId = Q(
    "t05_lang_id",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val scored = langProfiles.foldLeft(docs) { case (df, (lang, words)) =>
        df.withColumn(s"score_$lang",
          size(filter(toks, t => t.isin(words: _*))).cast("double") / size(toks))
      }
      val langs = langProfiles.keys.toSeq.sorted
      val best = langs.map(l => struct(col(s"score_$l").as("score"), lit(l).as("lang")))
      scored.select(
        col("doc_id"),
        col("lang").as("true_lang"),
        greatest(best: _*).getField("lang").as("pred_lang"),
        round(greatest(best: _*).getField("score"), 4).as("pred_score"))
    },
    Some(t05OracleSql))

  // ---------------------------------------------------------------- scale COO
  /** The reference's `scaleRows_dgc` / `scaleData` operator (SURVEY op 27,
    * /root/reference/src/utils.cpp:112-155) re-expressed relationally: the
    * token x doc count matrix lives as a sparse COO frame; each token row is
    * standardized (mean 0, sd 1 over ALL docs incl. implicit zeros, sample
    * sd) and clipped to ±10. Inputs are integer counts, so every derived
    * double is bit-identical across engines (integer sums are exact).
    */
  private val tScaleCoo = Q(
    "t06_scale_coo",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val coo = docs
        .select(col("doc_id"), explode(toks).as("token"))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("cnt"))
      val nDocs = docs.select(countDistinct(col("doc_id")).as("n_docs"))
      val stats = coo.groupBy(col("token"))
        .agg(sum(col("cnt")).as("s1"), sum(col("cnt") * col("cnt")).as("s2"))
        .crossJoin(broadcast(nDocs))
        .select(col("token"),
          (col("s1").cast("double") / col("n_docs")).as("mean"),
          sqrt((col("s2") - col("s1") * col("s1") / col("n_docs")) / (col("n_docs") - 1)).as("sd"))
      coo.join(broadcast(stats), Seq("token"))
        .select(col("doc_id"), col("token"),
          greatest(least((col("cnt") - col("mean")) / col("sd"), lit(10.0)), lit(-10.0))
            .as("scaled"))
    },
    Some("""WITH coo AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      cnts AS (
        SELECT doc_id, token, count(*) AS cnt FROM coo GROUP BY doc_id, token),
      nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
      stats AS (
        SELECT token,
          CAST(sum(cnt) AS DOUBLE) / (SELECT n_docs FROM nd) AS mean,
          sqrt((sum(cnt*cnt) - CAST(sum(cnt) AS DOUBLE)*sum(cnt) / (SELECT n_docs FROM nd))
            / ((SELECT n_docs FROM nd) - 1)) AS sd
        FROM cnts GROUP BY token)
      SELECT c.doc_id, c.token,
        greatest(least((c.cnt - s.mean) / s.sd, 10.0), -10.0) AS scaled
      FROM cnts c JOIN stats s ON c.token = s.token"""))

  // ---------------------------------------------------------------- tf-idf
  /** TF-IDF per (doc, token) with the smoothed idf `ln((N+1)/(df+1)) + 1`:
    * the §2.13 text-vectorization primitive, oracle-checked. Scale shape:
    * explode pipelines into a map-side-combined (doc, token) count; the
    * small df table broadcast-joins back; N is a driver-computed scalar —
    * one shuffle of (token, partial-count) pairs total. */
  private val tTfIdf = Q(
    "t07_tfidf",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val n = docs.count()
      val tf = docs.select(col("doc_id"), explode(toks).as("token"))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      tf.join(broadcast(df), "token")
        .select(col("doc_id"), col("token"), col("tf"), col("df"),
          round(col("tf") * (log((lit(n) + 1.0) / (col("df") + 1.0)) + 1.0), 6)
            .as("tfidf"))
    },
    Some("""WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
      df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT count(*) AS n FROM documents)
      SELECT tf.doc_id, tf.token, tf.tf, df.df,
        round(tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0), 6) AS tfidf
      FROM tf JOIN df USING (token) CROSS JOIN n"""))

  // ---------------------------------------------------------------- repetition
  /** Repetition-based quality signals (the Gopher-rule family adapted to
    * whitespace tokens): top-token fraction and duplicate-bigram fraction —
    * high values flag boilerplate/spam documents in a training corpus.
    *
    * Scale shape: the token-mode stats ride the same map-side-combined
    * (doc, token) count as t06/t07 (never an O(distinct x n) per-row HOF
    * scan, which would go quadratic on long documents); bigram stats are
    * row-local (`transform` over a once-projected token array, d06's
    * lesson); the final doc-keyed equi-join is between two doc-bounded
    * frames. */
  private val tRepetition = Q(
    "t08_repetition",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val cnts = docs.select(col("doc_id"), explode(toks).as("token"))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("cnt"))
      val perDoc = cnts.groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_tokens"),
          max(col("cnt")).as("top_cnt"),
          count(lit(1)).as("n_distinct_tokens"))
      val biStats = docs
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"), expr(
          """transform(sequence(1, greatest(size(tk) - 1, 1)),
             i -> concat_ws(' ', slice(tk, i, 2)))""").as("bg"))
        .select(col("doc_id"),
          size(col("bg")).cast("long").as("n_bigrams"),
          size(array_distinct(col("bg"))).cast("long").as("n_distinct_bigrams"))
      perDoc.join(biStats, "doc_id")
        .select(col("doc_id"), col("n_tokens"), col("n_distinct_tokens"),
          round(col("top_cnt").cast("double") / col("n_tokens"), 4)
            .as("top_token_frac"),
          round(lit(1.0) - col("n_distinct_bigrams").cast("double") / col("n_bigrams"), 4)
            .as("dup_bigram_frac"))
    },
    Some("""WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      cnts AS (SELECT doc_id, token, count(*) AS cnt FROM tok GROUP BY 1, 2),
      perdoc AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
        max(cnt) AS top_cnt, count(*) AS n_distinct_tokens FROM cnts GROUP BY 1),
      bi AS (SELECT doc_id, list_transform(
          range(1, greatest(len(string_split(text, ' ')) - 1, 1) + 1),
          i -> array_to_string(string_split(text, ' ')[i:i+1], ' ')) AS bg
        FROM documents),
      bistat AS (SELECT doc_id, len(bg) AS n_bigrams,
        len(list_distinct(bg)) AS n_distinct_bigrams FROM bi)
      SELECT p.doc_id, p.n_tokens, p.n_distinct_tokens,
        round(CAST(p.top_cnt AS DOUBLE) / p.n_tokens, 4) AS top_token_frac,
        round(1 - CAST(b.n_distinct_bigrams AS DOUBLE) / b.n_bigrams, 4) AS dup_bigram_frac
      FROM perdoc p JOIN bistat b ON p.doc_id = b.doc_id"""))

  // ---------------------------------------------------------------- pii
  /** PII detection + redaction (regex email/phone scrub — a standard
    * training-data hygiene pass). The synthetic corpus contains no PII, so
    * the query plants deterministic emails (every 7th doc) and phone
    * numbers (every 11th) inside the query itself — the d06 planted-dup
    * pattern — and the scrub must find and redact exactly those. Row-local,
    * no shuffle; patterns are restricted to syntax Java regex and RE2
    * evaluate identically. */
  private val tPii = Q(
    "t09_pii_redact",
    (s, dir) => {
      val emailRe = "[a-z0-9._]+@[a-z0-9.]+"
      val phoneRe = "555-[0-9]{4}"
      val aug0 = when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com"))).otherwise(col("text"))
      val aug = when(col("doc_id") % 11 === 0,
        concat(aug0, lit(" call 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).otherwise(aug0)
      Tables.documents(s, dir)
        .select(col("doc_id"), aug.as("aug"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("aug"), lit(emailRe), lit(0)))
            .cast("long").as("n_emails"),
          size(regexp_extract_all(col("aug"), lit(phoneRe), lit(0)))
            .cast("long").as("n_phones"),
          regexp_replace(regexp_replace(col("aug"), emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>").as("redacted"))
    },
    Some("""WITH aug AS (SELECT doc_id,
        CASE WHEN doc_id % 11 = 0
          THEN base || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
          ELSE base END AS aug
        FROM (SELECT doc_id,
          CASE WHEN doc_id % 7 = 0
            THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
            ELSE text END AS base FROM documents) b)
      SELECT doc_id,
        CAST(len(regexp_extract_all(aug, '[a-z0-9._]+@[a-z0-9.]+')) AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(aug, '555-[0-9]{4}')) AS BIGINT) AS n_phones,
        regexp_replace(regexp_replace(aug, '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>', 'g'),
          '555-[0-9]{4}', '<PHONE>', 'g') AS redacted
      FROM aug"""))

  // ---------------------------------------------------------------- packing
  /** SEQUENCE PACKING — the step between a cleaned corpus and a training
    * run: concatenate documents into fixed-token-budget training sequences
    * and report, per doc, which sequence it lands in and at what token
    * offset. This is greedy CONTIGUOUS packing in a deterministic global
    * order (doc_id): bin boundaries fall out of a running token sum, so the
    * whole operator is one window cumulative sum — no shuffle beyond the
    * sort, no driver state, and at 100 TB the same plan packs per-partition
    * ranges independently (the running sum distributes as a prefix-sum).
    * Docs longer than the budget get a sequence to themselves (and would be
    * chunked by t11 first in a real pipeline).
    *
    * seq_id = floor((cum_tokens_before) / budget) of the doc's START token:
    * a doc straddling a boundary stays with the sequence it started in —
    * the simple deterministic variant of first-fit packing.
    *
    * The cumulative sum is computed as a DISTRIBUTED prefix sum, not a
    * global single-partition window: range-partition + in-partition sort by
    * doc_id (ONE exchange of the counted rows), aggregate per-partition
    * token totals (#partitions rows to the driver — bounded), prefix-sum
    * those offsets on the driver, and stream each partition once adding its
    * offset to a running sum. No second exchange, no data-sized window
    * state. The result is boundary-independent: any range split of a
    * unique sort key yields the same global running sum, so the plan
    * scales to however many partitions the corpus needs (this is the
    * classic two-pass scan/add prefix-sum over partition ranges). */
  /** The distributed prefix-sum packer itself, shared by t10 and
    * `graft.tools.PackRehearsal` (one implementation, measured at 100M
    * docs): input is any (doc_id, n_tokens) frame; output adds
    * (seq_id, seq_offset) under the token budget.
    *
    * pid is BAKED INTO the cached rows — spark_partition_id() evaluates
    * while the cache is built, before any later coalesce can remap task
    * partition ids (a downstream coalesce(1) runs every cached partition
    * inside task 0, so TaskContext.getPartitionId() is NOT a reliable
    * partition key here). */
  def packSequences(counted0: DataFrame, budget: Long): DataFrame = {
    val s = counted0.sparkSession
    import s.implicits._
    val counted = counted0
      .select(col("doc_id"), col("n_tokens"))
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .as[(Long, Long, Int)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass 1: per-partition totals (#partitions rows — driver-bounded),
    // prefix-summed on the driver
    val partTotals = counted.groupBy(col("pid"))
      .agg(sum(col("n_tokens")).as("tot"))
      .collect()
      .map(r => (r.getAs[Int]("pid"), r.getAs[Long]("tot")))
      .sortBy(_._1)
    val offsets: Map[Int, Long] = {
      var acc = 0L
      partTotals.map { case (pid, tot) =>
        val off = acc; acc += tot; pid -> off
      }.toMap
    }
    // pass 2: one narrow sweep with a running sum, re-seeded from the
    // broadcast offset table whenever the row's source partition changes
    val packed = counted.mapPartitions { it =>
      var curPid = -1
      var cum = 0L
      it.map { case (docId, n, pid) =>
        if (pid != curPid) { curPid = pid; cum = offsets(pid) }
        val start = cum
        cum += n
        (docId, n, start / budget, start % budget)
      }
    }.toDF("doc_id", "n_tokens", "seq_id", "seq_offset")
      // eager truncation makes the result self-contained so the pass-1/2
      // cache can be RELEASED here instead of leaking for the session
      // lifetime (library entry point — callers invoke this repeatedly).
      // The checkpoint blocks are 4 longs/row, strictly smaller than the
      // `counted` cache they replace; correctness also stops depending on
      // the cached pid assignment surviving eviction.
      .localCheckpoint(true)
    counted.unpersist(false)
    packed
  }

  private val tPack = Q(
    "t10_pack_sequences",
    (s, dir) => {
      packSequences(
        Tables.documents(s, dir)
          .select(col("doc_id"), size(toks).cast("long").as("n_tokens")),
        budget = 2048L)
    },
    Some("""WITH c AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
          sum(CAST(len(string_split(text, ' ')) AS BIGINT))
            OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum_end
        FROM documents)
      SELECT doc_id, n_tokens,
        CAST((cum_end - n_tokens) // 2048 AS BIGINT) AS seq_id,
        CAST((cum_end - n_tokens) % 2048 AS BIGINT) AS seq_offset
      FROM c"""))

  // ---------------------------------------------------------------- chunking
  /** TOKEN-WINDOW CHUNKING with overlap — splits each document into
    * fixed-size token chunks (size 64, stride 48, i.e. 16-token overlap),
    * the pretraining/RAG chunker. Pure per-row explode: sequence() +
    * slice() stay inside whole-stage codegen, rows out = ceil(n/stride)
    * per doc, no shuffle at all. Chunk text itself is emitted (the
    * downstream embedder's input), fingerprinted here to keep the gate
    * payload scalar-sortable. */
  private val tChunk = Q(
    "t11_chunk_windows",
    (s, dir) => {
      val size0 = 64
      val stride = 48
      Tables.documents(s, dir)
        .select(col("doc_id"), toks.as("tk"))
        .select(col("doc_id"), size(col("tk")).cast("long").as("n_tokens"),
          posexplode(expr(
            s"transform(sequence(0, cast(greatest(ceil((size(tk) - $size0) / $stride.0), 0) as int)), " +
            s"i -> concat_ws(' ', slice(tk, i * $stride + 1, $size0)))")))
        .select(col("doc_id"), col("n_tokens"),
          col("pos").cast("long").as("chunk_no"),
          (col("pos") * stride).cast("long").as("tok_start"),
          size(split(col("col"), " ")).cast("long").as("chunk_tokens"),
          md5(col("col")).as("chunk_md5"))
    },
    Some(s"""WITH tk AS (
        SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      ch AS (
        SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
          unnest(range(0, CAST(greatest(ceil((len(tk) - 64) / 48.0), 0) AS BIGINT) + 1)) AS chunk_no,
          tk
        FROM tk)
      SELECT doc_id, n_tokens, chunk_no,
        chunk_no * 48 AS tok_start,
        CAST(len(tk[chunk_no * 48 + 1 : chunk_no * 48 + 64]) AS BIGINT) AS chunk_tokens,
        md5(array_to_string(tk[chunk_no * 48 + 1 : chunk_no * 48 + 64], ' ')) AS chunk_md5
      FROM ch"""))

  // ---------------------------------------------------------------- filter
  /** END-TO-END CLEANING DECISION — the composite C4/Gopher-style keep/drop
    * verdict every training-data pipeline ends with, as ONE declarative
    * query: length bounds + repetition signals (t08's formulas) + exact
    * dedup survivorship (d01's min-id rule), evaluated per doc. Exact
    * copies of every 13th doc are planted (id + 3e7) so the dedup leg has
    * work to do. Plan shape: the repetition legs are map-side-combined
    * aggs, the dedup leg shuffles 16-byte hashes; everything joins back on
    * doc_id. All thresholds compare ROUNDED values so the booleans are
    * bit-stable across engines. */
  private val tFilter = Q(
    "t12_filter_verdict",
    (s, dir) => {
      val base = Tables.documents(s, dir).select(
        graft.functions.CrossEngine.guardedId(col("doc_id"), 30000000L, "t12").as("doc_id"),
        col("text"))
      val docs = base.unionByName(
          base.filter(col("doc_id") % 13 === 0)
            .select((col("doc_id") + 30000000L).as("doc_id"), col("text")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cnts = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("cnt"))
      val perDoc = cnts.groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_tokens"), max(col("cnt")).as("top_cnt"))
      val biStats = docs
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"), expr(
          """transform(sequence(1, greatest(size(tk) - 1, 1)),
             i -> concat_ws(' ', slice(tk, i, 2)))""").as("bg"))
        .select(col("doc_id"),
          size(col("bg")).cast("long").as("n_bigrams"),
          size(array_distinct(col("bg"))).cast("long").as("n_distinct_bigrams"))
      val canon = docs.groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("keep_id"))
      val joined = docs.select(col("doc_id"), md5(col("text")).as("h"))
        .join(canon, Seq("h"))
        .join(perDoc, Seq("doc_id"))
        .join(biStats, Seq("doc_id"))
        .select(col("doc_id"), col("n_tokens"),
          round(col("top_cnt").cast("double") / col("n_tokens"), 4).as("top_token_frac"),
          round(lit(1.0) - col("n_distinct_bigrams").cast("double") / col("n_bigrams"), 4)
            .as("dup_bigram_frac"),
          (col("doc_id") === col("keep_id")).as("is_canonical"))
      val out = joined.withColumn("keep",
        col("n_tokens").between(30, 90) &&
          col("top_token_frac") <= 0.2 && col("dup_bigram_frac") <= 0.2 &&
          col("is_canonical"))
        // materialize, then release the shared-session cache (leak-class
        // hygiene: Verify runs 111 bodies in one session)
        .localCheckpoint(true)
      docs.unpersist(false)
      out
    },
    Some("""WITH docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 30000000, text FROM documents WHERE doc_id % 13 = 0),
      cnts AS (SELECT doc_id, token, count(*) AS cnt FROM
        (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM docs) t
        GROUP BY 1, 2),
      perdoc AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
        max(cnt) AS top_cnt FROM cnts GROUP BY 1),
      bi AS (SELECT doc_id,
          list_transform(range(1, greatest(len(string_split(text, ' ')) - 1, 1) + 1),
            i -> array_to_string(string_split(text, ' ')[i:i+1], ' ')) AS bg
        FROM docs),
      bistat AS (SELECT doc_id, len(bg) AS n_bigrams,
        len(list_distinct(bg)) AS n_distinct_bigrams FROM bi),
      canon AS (SELECT md5(text) AS h, min(doc_id) AS keep_id FROM docs GROUP BY 1),
      joined AS (
        SELECT d.doc_id, p.n_tokens,
          round(CAST(p.top_cnt AS DOUBLE) / p.n_tokens, 4) AS top_token_frac,
          round(1 - CAST(b.n_distinct_bigrams AS DOUBLE) / b.n_bigrams, 4) AS dup_bigram_frac,
          d.doc_id = c.keep_id AS is_canonical
        FROM docs d
        JOIN canon c ON md5(d.text) = c.h
        JOIN perdoc p ON p.doc_id = d.doc_id
        JOIN bistat b ON b.doc_id = d.doc_id)
      SELECT doc_id, n_tokens, top_token_frac, dup_bigram_frac, is_canonical,
        (n_tokens BETWEEN 30 AND 90) AND top_token_frac <= 0.2
          AND dup_bigram_frac <= 0.2 AND is_canonical AS keep
      FROM joined"""))

  // ---------------------------------------------------------------- regex tokens
  /** BPE-ish REGEX token counting — the second tokenizer the pipeline needs
    * beside whitespace splitting (t01): a GPT-2-style pre-tokenizer pattern
    * (letter runs, digit runs, single punctuation marks, each with optional
    * leading space) restricted to syntax Java regex and RE2 evaluate
    * identically. Emits both counts so the ratio exposes
    * punctuation-heavy/odd-segmentation docs; row-local, no shuffle. */
  private val tRegexTokens = Q(
    "t13_regex_tokens",
    (s, dir) => {
      val pat = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"
      Tables.documents(s, dir).select(
        col("doc_id"),
        size(toks).cast("long").as("n_ws_tokens"),
        expr(s"CAST(size(regexp_extract_all(text, '$pat', 0)) AS LONG)").as("n_bpe_tokens"),
        round(expr(s"size(regexp_extract_all(text, '$pat', 0))").cast("double") /
          size(toks), 4).as("bpe_per_ws"))
    },
    Some("""SELECT doc_id,
      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
      CAST(len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+')) AS BIGINT) AS n_bpe_tokens,
      round(CAST(len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+')) AS DOUBLE)
        / len(string_split(text, ' ')), 4) AS bpe_per_ws
      FROM documents"""))

  // ---------------------------------------------------------------- mixing
  /** DATASET MIXING — the per-source sampling step that turns a cleaned
    * corpus into a training mix with chosen proportions (e.g. upweight
    * curated sources, cap web crawl). Deterministic stratified sampling:
    * within each source, docs rank by an md5 hash (uniform, engine-shared)
    * and the top floor(frac * source_count) survive — reproducible across
    * runs AND engines, no RNG state. The rank window runs per source
    * (bounded partitions), source counts broadcast back. Fractions here:
    * even sources get 60%, odd get 20% — the two-tier mix shape. */
  private val tSourceMix = Q(
    "t14_source_mix",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          graft.functions.CrossEngine.md5Hash60(col("doc_id")).as("h"))
      // trailing-digit parse; a source with no trailing digits falls to the
      // low tier on BOTH engines. Under ANSI mode (Spark 4.1 default, and
      // GraftSession keeps it) a plain cast of regexp_extract's '' no-match
      // result would THROW, so try_cast is required to yield the NULL that
      // the oracle's TRY_CAST produces (NULL % 2 = 0 is NULL -> ELSE tier).
      val frac = when(
        expr("try_cast(regexp_extract(source, '([0-9]+)$', 1) AS int)") % 2 === 0,
        lit(0.6)).otherwise(lit(0.2))
      // n_src shares the rk window's per-source partitioning — one scan,
      // no separate groupBy + broadcast join
      val wSrc = Window.partitionBy(col("source"))
      val w = wSrc.orderBy(col("h"), col("doc_id"))
      docs
        .withColumn("n_src", count(lit(1)).over(wSrc))
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("target", floor(frac * col("n_src")).cast("long"))
        .filter(col("rk") <= col("target"))
        .select(col("doc_id"), col("source"), col("rk"), col("target").as("n_kept_target"))
    },
    Some("""WITH docs AS (
        SELECT doc_id, source,
          CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        FROM documents),
      ranked AS (
        SELECT doc_id, source,
          count(*) OVER (PARTITION BY source) AS n_src,
          row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
        FROM docs),
      tiered AS (
        SELECT doc_id, source, CAST(rk AS BIGINT) AS rk,
          CAST(floor(CASE WHEN TRY_CAST(regexp_extract(source, '([0-9]+)$', 1) AS INT) % 2 = 0
            THEN 0.6 ELSE 0.2 END * n_src) AS BIGINT) AS target
        FROM ranked)
      SELECT doc_id, source, rk, target AS n_kept_target
      FROM tiered WHERE rk <= target"""))

  // ---------------------------------------------------------------- t15
  /** UNIGRAM LANGUAGE-MODEL SCORING — the perplexity-proxy quality signal
    * data pipelines filter on (docs whose tokens are collectively rare in
    * the corpus score low): per-doc mean log10 unigram probability under
    * the corpus's own empirical distribution. Cross-engine determinism via
    * the cents trick applied to logs: each token's log-probability is
    * scaled to integer MICRO-UNITS before summation, so the per-doc sum is
    * exact long arithmetic (order-independent) in both engines — a double
    * sum of logs would differ in the last ulp by partial-aggregation
    * order. Honest caveat: unlike the md5 lanes, the per-token micro value
    * still assumes Java's Math.log10 and DuckDB's libm agree after *1e6
    * rounding — true for every token at both gate scales, but a token
    * landing within ~1 ulp of a .5 micro boundary could round apart; the
    * failure mode is a loud hash mismatch, not silent error. Plan: one
    * explode + grouped count (map-side combined), the corpus total as a
    * broadcast scalar join, one join back on token, one grouped long-sum
    * per doc. */
  private val tUnigramLp = Q(
    "t15_unigram_logprob",
    (s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      val total = counts.agg(sum(col("cnt")).as("total"))
      val micro = counts.crossJoin(broadcast(total))
        .select(col("token"),
          round(log10(col("cnt").cast("double") / col("total")) * 1e6)
            .cast("long").as("lp_micro"))
      toks.join(micro, Seq("token"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("lp_micro")).as("s"))
        .select(col("doc_id"), col("n_tokens"),
          round(col("s").cast("double") / col("n_tokens") / 1e6, 6)
            .as("avg_logprob10"))
    },
    Some("""WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      counts AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
      micro AS (
        SELECT token, CAST(round(log10(CAST(cnt AS DOUBLE) /
          (SELECT sum(cnt) FROM counts)) * 1e6) AS BIGINT) AS lp_micro
        FROM counts)
      SELECT t.doc_id, count(*) AS n_tokens,
        round(CAST(sum(m.lp_micro) AS DOUBLE) / count(*) / 1e6, 6) AS avg_logprob10
      FROM toks t JOIN micro m ON t.token = m.token
      GROUP BY t.doc_id"""))

  // ---------------------------------------------------------------- t16
  /** BPE MERGE-TABLE LEARNING (VERDICT r5 stretch #8 — the one text-pipeline
    * stage that had no engine answer): learn the first N byte-pair-encoding
    * merges of the corpus, Sennrich et al. 2016 style, simplified to
    * within-word merges with no end-of-word marker. The algorithm is run
    * exactly the way production tokenizer trainers run it: ONCE over the
    * corpus to build the word-frequency table, then every merge round
    * operates on the VOCAB table only — one adjacent-pair grouped count
    * (map-side combined; shuffles pair keys, weights summed by word
    * frequency), a 1-row argmax collect with deterministic (count desc,
    * pair asc) tie-break, and one map applying the merge greedily
    * left-to-right. At 100 TB the corpus is touched once; the 30k-merge
    * production loop costs 30k cheap aggs over a ~1e7-row vocab, never
    * re-reading documents. State is localCheckpoint-truncated per round so
    * the fold plan stays flat (the harmony-sweep lesson).
    *
    * Greedy merge application is a string fold over the space-joined
    * symbol sequence: the accumulator ends with the merge's left symbol
    * exactly when its LAST symbol is `l` (space-delimited), and appending
    * `r` bare turns that last symbol into `l+r` — one CASE per element,
    * identical in Spark `aggregate` and DuckDB `list_reduce`, so the whole
    * N-round derivation runs under the hash gate.
    *
    * Depth 24 (up from 6, VERDICT r7 stretch #8): deep enough that merge
    * INTERACTIONS occur on the gate corpus — multi-char symbols produced
    * by earlier rounds are themselves the best pair of later rounds — so
    * the gate exercises the re-pairing path production 30k-merge training
    * lives in, not just first-order character pairs. */
  private[graft] val nBpeMerges = 24

  /** Per-word initial BPE state shared by the t16 learner and the t17
    * encoder: (word, corpus frequency, space-joined character symbols).
    * Char split via substr (split-on-empty-regex edge cases differ
    * across engines; positional substring is unambiguous in both). */
  private[graft] def bpeState0(docs: DataFrame): DataFrame = {
    val vocab = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    vocab.select(col("w"), col("cnt"),
      array_join(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))), " ").as("s"))
  }

  /** The t16 learning loop, factored so t17's encoder trains with the SAME
    * derivation: returns (learned merges, final vocab state). The final
    * state is a live localCheckpoint the caller must unpersist; the t17
    * apply-equals-learn spec compares it against a chained
    * [[bpeApplyMerge]] fold over [[bpeState0]]. */
  /** Spark/DuckDB string ordering for the argmax tie-break: unsigned
    * byte-wise comparison of the UTF-8 encodings (UTF8String.compareTo) —
    * Java's String.compareTo orders by UTF-16 code unit and diverges on
    * supplementary characters. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val m = math.min(x.length, y.length)
    var i = 0
    while (i < m) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** Row-local twin of [[bpeApplyMerge]] (same greedy left-to-right fold,
    * same non-overlap rule) for the learner's RDD loop; property-tested
    * against the expression form in OperatorsSpec. */
  private[graft] def applyMergeLocal(s: String, l: String, r: String): String = {
    var acc = ""
    s.split(" ").foreach { x =>
      acc =
        if (acc.isEmpty) x
        else if ((acc == l || acc.endsWith(" " + l)) && x == r) acc + x
        else acc + " " + x
    }
    acc
  }

  private[graft] def bpeLearnMerges(docs: DataFrame, n: Int)
      : (Seq[(Long, String, String, Long)], DataFrame) = {
    // The learning loop is inherently sequential (merge k+1's pair counts
    // depend on merge k), so the old per-round DataFrame form paid full
    // Catalyst planning + an AQE shuffle query + an eager localCheckpoint
    // per round — t33 profiled at 113 jobs with half its wall BETWEEN jobs
    // (guide §1.2 step 1). Each round is now ONE single-stage RDD job:
    // per-partition pair-count maps (exact Long sums) merged on the
    // driver, argmax under the same (wt DESC, l, r) order with UTF-8
    // byte-wise string comparison (= Spark's and DuckDB's collation), and
    // the merges applied lazily in one map closure over the persisted
    // base state — vocab-scale work per round, no plan growth.
    val sp = docs.sparkSession
    import sp.implicits._
    val base = bpeState0(docs).select(col("w"), col("cnt"), col("s"))
      .as[(String, Long, String)].rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    def stateRdd = {
      val ms = merges.toList.map { case (_, l, r, _) => (l, r) }
      base.map { case (w, c, s) =>
        (w, c, ms.foldLeft(s) { case (acc, (l, r)) => applyMergeLocal(acc, l, r) })
      }
    }
    var step = 1
    var exhausted = false
    while (step <= n && !exhausted) {
      val partials = stateRdd.mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[(String, String), Long]
        it.foreach { case (_, cnt, s) =>
          val syms = s.split(" ")
          var i = 0
          while (i < syms.length - 1) {
            val k = (syms(i), syms(i + 1))
            m.update(k, m.getOrElse(k, 0L) + cnt)
            i += 1
          }
        }
        Iterator.single(m)
      }.collect() // bounded: distinct adjacent symbol pairs of the vocab
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      partials.foreach(_.foreach { case (k, v) =>
        counts.update(k, counts.getOrElse(k, 0L) + v)
      })
      if (counts.isEmpty) {
        // every word is down to one symbol: nothing left to merge. The
        // oracle's matching round has an empty best-CTE, so IT emits no
        // row for this or later steps either — both engines stop at
        // the same merge count instead of failing differently.
        exhausted = true
      } else {
        var best: ((String, String), Long) = null
        counts.foreach { case e @ ((l, r), wt) =>
          if (best == null || wt > best._2 ||
              (wt == best._2 && (utf8Lt(l, best._1._1) ||
                (l == best._1._1 && utf8Lt(r, best._1._2)))))
            best = e
        }
        merges += ((step.toLong, best._1._1, best._1._2, best._2))
        step += 1
      }
    }
    // final vocab state as the contract's live localCheckpoint (callers
    // join/compare against it and unpersist when done)
    val state = stateRdd.toDF("w", "cnt", "s").localCheckpoint(true)
    base.unpersist(false)
    (merges.toSeq, state)
  }

  private val tBpe = Q(
    "t16_bpe_merges",
    (s, dir) => {
      import s.implicits._
      val (merges, state) = bpeLearnMerges(Tables.documents(s, dir), nBpeMerges)
      state.unpersist(false)
      merges.toDF("step", "lhs", "rhs", "pair_count")
    },
    Some(bpeOracleSql(nBpeMerges)))

  /** Greedy left-to-right application of merge (l, r) to a space-joined
    * symbol string, as one `aggregate` fold: the accumulator's LAST symbol
    * equals `l` exactly when the accumulator is `l` itself or ends with
    * " l" (space-delimited), and appending `r` bare turns that last symbol
    * into `l+r`. Non-overlapping by construction: a just-merged symbol is
    * `l+r`, which can never equal `l` again (r is nonempty). Property-
    * tested against a list-fold reference in OperatorsSpec. */
  private[graft] def bpeApplyMerge(s: Column, l: String, r: String): Column =
    aggregate(split(s, " "), lit(""),
      (acc, x) => when(acc === "", x)
        .when((acc === l || acc.endsWith(lit(" " + l))) && x === r,
          concat(acc, x))
        .otherwise(concat(acc, lit(" "), x)))

  /** DuckDB mirror of the t16 loop: N chained CTE rounds, each an adjacent-
    * pair count + ORDER BY/LIMIT argmax + `list_reduce` merge application
    * (same fold as the Spark `aggregate`). Generated so both engines'
    * round structure derives from one template (the kmSqlPrefix pattern). */
  /** One t16/t17 oracle merge round (pairs/best/state CTE triple) — shared
    * so the learn and apply oracles derive merges from ONE template.
    * `state`/`best` are MATERIALIZED: each round references the previous
    * state twice (pair counting + merge application), so inlined CTEs
    * would double the scan tree per round — 2^N scans of documents at
    * depth N. Materialization makes the chain linear, the DuckDB twin of
    * the Spark loop's per-round localCheckpoint. */
  private def bpeOracleRound(i: Int): String = {
    val prev = s"state${i - 1}"
    s"""pairs$i AS (
        SELECT p.l AS l, p.r AS r, sum(cnt) AS wt FROM (
          SELECT cnt, unnest(list_transform(range(1, len(syms)),
            k -> struct_pack(l := syms[k], r := syms[k + 1]))) AS p
          FROM (SELECT cnt, string_split(s, ' ') AS syms FROM $prev))
        GROUP BY p.l, p.r),
      best$i AS MATERIALIZED (SELECT l, r, wt FROM pairs$i ORDER BY wt DESC, l, r LIMIT 1),
      state$i AS MATERIALIZED (
        SELECT w, cnt, list_reduce(string_split(s, ' '), (acc, x) ->
          CASE WHEN (acc = b.l OR ends_with(acc, ' ' || b.l)) AND x = b.r
               THEN acc || x ELSE acc || ' ' || x END) AS s
        FROM $prev, best$i b)"""
  }

  private def bpeOracleSql(n: Int): String = {
    val rounds = (1 to n).map(bpeOracleRound).mkString(",\n      ")
    val out = (1 to n).map(i =>
      s"SELECT CAST($i AS BIGINT) AS step, l AS lhs, r AS rhs, CAST(wt AS BIGINT) AS pair_count FROM best$i")
      .mkString("\n      UNION ALL ")
    s"""WITH vocab AS (
        SELECT w, count(*) AS cnt FROM (
          SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
        WHERE w <> '' GROUP BY w),
      state0 AS MATERIALIZED (
        SELECT w, cnt, array_to_string(list_transform(range(1, len(w) + 1),
          i -> w[i:i]), ' ') AS s FROM vocab),
      $rounds
      $out"""
  }

  // ---------------------------------------------------------------- t17
  /** BPE APPLY (VERDICT r6 missing #1) — encode the corpus into token ids
    * with t16's LEARNED merge table, the artifact a trained-tokenizer
    * pipeline actually ships. Train/serve are separated the s13 way: the
    * learner persists the merge table as a small parquet, and the encode
    * phase reads it back (nBpeMerges rows — bounded collect) before
    * touching the corpus. Tokenization is computed ONCE PER DISTINCT WORD
    * (the vocab table), never per occurrence: the corpus-scale work is one
    * join of (doc, word) against the tokenized vocab. The token
    * vocabulary is globally bounded — |alphabet| + nMerges symbols, since
    * each merge creates exactly one new symbol — so its dense-rank id
    * assignment (row_number over symbol order) is a single-partition
    * window over a structurally tiny frame, and the id lookup broadcasts.
    * Output: (doc_id, n_tokens, token_ids) with token_ids the
    * space-joined id sequence in document order, reassembled by an
    * array_sort over (word_pos, token_pos) — positions are 0-based in
    * Spark and 1-based in the oracle, which is irrelevant because they
    * only ever order. Oracle replays the SAME merge derivation through
    * the t16 chained CTEs and applies stateN via list joins; both engines
    * assume the gate corpus does not exhaust merges before nBpeMerges
    * (t16 proves it emits all 6). */
  private val tBpeApply = Q(
    "t17_bpe_apply",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val out = java.nio.file.Files.createTempDirectory("graft_t17_").toString
      try {
        // train phase: learn + PERSIST the merge table (s13 model pattern)
        val (learned, learnedState) = bpeLearnMerges(docs, nBpeMerges)
        learnedState.unpersist(false)
        learned.toDF("step", "lhs", "rhs", "pair_count")
          .write.mode("overwrite").parquet(s"$out/merges")
        // apply phase: everything below uses only the RELOADED table
        val merges = s.read.parquet(s"$out/merges").orderBy(col("step"))
          .collect().map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs")))
        bpeEncodeCorpus(docs, merges.toSeq)
      } finally {
        graft.functions.CrossEngine.deleteRecursive(java.nio.file.Paths.get(out))
      }
    },
    Some(bpeApplyOracleSql(nBpeMerges)))

  /** The t17 APPLY stage, reusable by the entry and the scale rehearsal:
    * tokenize the DISTINCT-word vocab once (chained merge folds), assign
    * bounded token-vocab ids, and precompute EACH WORD'S id-sequence
    * string at vocab scale — the per-token explode and the token-id join
    * never touch the corpus. Corpus-scale work is exactly one join on the
    * word key plus one grouped concat bounded by document length (measured
    * in BpeRehearsal: the corpus-explode formulation was ~5× slower at 1M
    * docs / 191M tokens because every token paid the doc-group shuffle). */
  /** Vocab-scale word → BPE-token-array table, shared by
    * [[bpeEncodeCorpus]] and the t27 fertility eval. The whole merge
    * table applies in ONE codegen'd expression
    * ([[graft.functions.BpeApply.applyAllMerges]], VERDICT r17 #2) —
    * the per-merge `withColumn` fold this replaces stacked ~n_merges
    * nested higher-order-function projections that every consuming plan
    * branch re-evaluated. */
  private[graft] def bpeWordToks(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame =
    bpeState0(docs)
      .select(col("w"),
        graft.functions.BpeApply.applyAllMerges(col("s"), merges).as("s"))
      .withColumn("toks", split(col("s"), " ")).select(col("w"), col("toks"))

  private[graft] def bpeEncodeCorpus(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val wordToks = bpeWordToks(docs, merges)
    val tokVocab = wordToks.select(explode(col("toks")).as("sym")).distinct()
      .withColumn("token_id",
        row_number().over(Window.orderBy(col("sym"))).cast("long"))
    // vocab-scale: one row per (distinct word, token) -> per-word id string
    val wordIds = wordToks
      .select(col("w"), posexplode(col("toks")).as(Seq("tp", "sym")))
      .join(broadcast(tokVocab), Seq("sym"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("w_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("tp"), col("token_id")))),
          x => x.getField("token_id").cast("string")), " ").as("w_ids"))
    // corpus-scale: join each word occurrence to its precomputed ids and
    // reassemble the document in word order
    docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("wp", "w")))
      .filter(col("w") =!= "")
      .join(wordIds, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(sum(col("w_tokens")).as("n_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("wp"), col("w_ids")))),
          x => x.getField("w_ids")), " ").as("token_ids"))
  }

  /** DuckDB mirror of t17: the t16 round CTEs re-derive the merge table,
    * stateN IS the tokenized vocab, and the doc-order id sequence is a
    * string_agg ordered by (word_pos, token_pos). */
  /** Shared CTE prefix: merge-table re-derivation + tokenized vocab +
    * per-occurrence word/token position tables (used by t17's encode
    * oracle and t27's fertility oracle). */
  private def bpeApplyOracleCtes(n: Int): String = {
    val rounds = (1 to n).map(bpeOracleRound).mkString(",\n      ")
    s"""WITH vocab AS (
        SELECT w, count(*) AS cnt FROM (
          SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
        WHERE w <> '' GROUP BY w),
      state0 AS MATERIALIZED (
        SELECT w, cnt, array_to_string(list_transform(range(1, len(w) + 1),
          i -> w[i:i]), ' ') AS s FROM vocab),
      $rounds,
      tokvocab AS (
        SELECT sym, CAST(row_number() OVER (ORDER BY sym) AS BIGINT) AS token_id
        FROM (SELECT DISTINCT unnest(string_split(s, ' ')) AS sym FROM state$n) t),
      words AS (
        SELECT doc_id, p.wp AS wp, p.w AS w FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(ws) + 1),
            i -> struct_pack(wp := i, w := ws[i]))) AS p
          FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) t0) t1
        WHERE p.w <> ''),
      wordtoks AS (
        SELECT w, p.tp AS tp, p.sym AS sym FROM (
          SELECT w, unnest(list_transform(range(1, len(ts) + 1),
            i -> struct_pack(tp := i, sym := ts[i]))) AS p
          FROM (SELECT w, string_split(s, ' ') AS ts FROM state$n) t0) t1)"""
  }

  private def bpeApplyOracleSql(n: Int): String =
    s"""${bpeApplyOracleCtes(n)}
      SELECT d.doc_id, count(*) AS n_tokens,
        string_agg(CAST(v.token_id AS VARCHAR), ' ' ORDER BY d.wp, wt.tp) AS token_ids
      FROM words d
      JOIN wordtoks wt ON d.w = wt.w
      JOIN tokvocab v ON wt.sym = v.sym
      GROUP BY d.doc_id"""

  /** Gopher-style quality rules (Rae et al. 2021 §A.1.1, the standard
    * LLM-corpus pre-filter; public): word-count bounds, mean-word-length
    * bounds, symbol-to-word ratio ('#' and '...'), fraction of words with
    * an alphabetic character, and a minimum number of DISTINCT function
    * words — composed into one keep verdict. Complements t03 (ratio stats)
    * and t12 (repetition + dedup survivorship): these are the
    * document-shape rules neither computes. Row-local over the token
    * array — no shuffle, all built-in HOFs, fully codegen'd. Thresholds
    * compare ROUNDED values (t12 precedent) so the verdict is bit-stable
    * across engines. */
  private val tGopher = Q(
    "t18_gopher_rules",
    (s, dir) => {
      val tk = toks
      val nW = size(tk).cast("long")
      val meanLen = round(
        aggregate(tk, lit(0L), (a, x) => a + length(x).cast("long")).cast("double") / nW, 4)
      val alphaFrac = round(
        size(filter(tk, t => t.rlike("[a-z]"))).cast("double") / nW, 4)
      val hashCnt = length(col("text")) - length(regexp_replace(col("text"), "#", ""))
      val ellipsisCnt = (length(col("text")) -
        length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3
      val symbolRatio = round((hashCnt + ellipsisCnt).cast("double") / nW, 4)
      // Gopher's rule is a DISTINCT-function-word floor; the paper's word
      // set is English-prose-specific, so the engine uses its own English
      // function-word profile (the langProfiles map the language-ID op is
      // built from) — same rule, corpus-appropriate set
      val stops = langProfiles("en")
      val stopHits = size(filter(array_distinct(tk), t => t.isin(stops: _*))).cast("long")
      Tables.documents(s, dir).select(
        col("doc_id"),
        nW.as("n_words"),
        meanLen.as("mean_word_len"),
        symbolRatio.as("symbol_ratio"),
        alphaFrac.as("alpha_word_frac"),
        stopHits.as("stop_hits"))
        .withColumn("keep",
          col("n_words").between(50L, 100000L) &&
            col("mean_word_len").between(3.0, 10.0) &&
            col("symbol_ratio") <= 0.1 &&
            col("alpha_word_frac") >= 0.8 &&
            col("stop_hits") >= 2L)
    },
    Some(s"""WITH st AS (
        SELECT doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
          round(CAST(list_sum(list_transform(string_split(text, ' '),
            w -> length(w))) AS DOUBLE)
            / len(string_split(text, ' ')), 4) AS mean_word_len,
          round(CAST((length(text) - length(replace(text, '#', '')))
            + (length(text) - length(replace(text, '...', ''))) // 3 AS DOUBLE)
            / len(string_split(text, ' ')), 4) AS symbol_ratio,
          round(CAST(len(list_filter(string_split(text, ' '),
            t -> regexp_matches(t, '[a-z]'))) AS DOUBLE)
            / len(string_split(text, ' ')), 4) AS alpha_word_frac,
          CAST(len(list_filter(list_distinct(string_split(text, ' ')),
            t -> t IN (${langProfiles("en").map(w => s"'$w'").mkString(", ")})))
            AS BIGINT) AS stop_hits
        FROM documents)
      SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_word_frac,
        stop_hits,
        (n_words BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3.0 AND 10.0
         AND symbol_ratio <= 0.1 AND alpha_word_frac >= 0.8
         AND stop_hits >= 2) AS keep
      FROM st"""))

  /** TEMPERATURE-WEIGHTED SOURCE SAMPLING (the multinomial mixture
    * reweighting of XLM-R / T5 / LLaMA data recipes, public): sample
    * source s with p_s ∝ n_s^α, α = 0.5 — small sources are UPSAMPLED
    * (docs repeat across epochs), large ones downsampled, unlike t14's
    * fixed per-source fractions. Determinism: the float part is exactly
    * one correctly-rounded IEEE sqrt per source, floored to integer
    * MICROS (the t15 trick) so the normalization and per-source targets
    * are pure BIGINT arithmetic — no cross-engine float-sum ordering can
    * flip a floor. Each doc's copy count is closed-form from its md5 rank:
    * full epochs target/n_src for everyone, plus one extra for the
    * target%n_src lowest-ranked docs. Scale shape: per-source stats are
    * #sources-sized → computed driver-side (BigInt, overflow-safe) and
    * broadcast back; the corpus pays one window rank per source and no
    * other shuffle. */
  private val tTemperature = Q(
    "t19_temperature_mix",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      // the corpus generator emits UNIFORM sources (25 docs each), under
      // which any temperature flattens to the identity — so the entry
      // plants a deterministic per-source skew (keep rate 2/10..10/10 by
      // trailing source number, t14's parse) to give the reweighting real
      // work: small sources must come out upsampled (n_copies > 1)
      // NB the corpus assigns source = doc_id % 20, so the within-source
      // index is doc_id DIV 20 — the keep rule must key on THAT (doc_id %
      // 10 is fully correlated with the source and skews all-or-nothing)
      val srcNum = expr("try_cast(regexp_extract(source, '([0-9]+)$', 1) AS int)")
      val docs = Tables.documents(s, dir)
        .filter(pmod(expr("doc_id DIV 20"), lit(10)) <
          lit(2) + pmod(coalesce(srcNum, lit(0)), lit(9)))
        .select(col("doc_id"), col("source"),
          graft.functions.CrossEngine.md5Hash60(col("doc_id")).as("h"))
      // bounded collect: one row per distinct source
      val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
      val total = counts.map(_._2).sum
      val wMicro = counts.map { case (src, n) =>
        src -> math.floor(math.sqrt(n.toDouble) * 1e6).toLong }
      val sumMicro = wMicro.map(_._2).sum
      val targets = wMicro.map { case (src, w) =>
        (src, (BigInt(total) * BigInt(w) / BigInt(sumMicro)).toLong, w) }
      val targetDf = broadcast(
        targets.toSeq.toDF("source", "target_docs", "w_micro"))
      val rk = row_number()
        .over(Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id")))
      docs
        .withColumn("n_src", count(lit(1)).over(Window.partitionBy(col("source"))))
        .withColumn("rk", rk.cast("long"))
        .join(targetDf, Seq("source"))
        .select(col("doc_id"), col("source"), col("n_src"), col("w_micro"),
          col("target_docs"), col("rk"),
          (expr("target_docs DIV n_src") +
            when(col("rk") <= col("target_docs") % col("n_src"), 1L).otherwise(0L))
            .cast("long").as("n_copies"))
    },
    Some("""WITH docs AS (
        SELECT doc_id, source,
          CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        FROM documents
        WHERE (doc_id // 20) % 10 <
          2 + coalesce(TRY_CAST(regexp_extract(source, '([0-9]+)$', 1) AS INT), 0) % 9),
      counts AS (SELECT source, count(*) AS n_src FROM docs GROUP BY source),
      w AS (
        SELECT source, n_src,
          CAST(floor(sqrt(CAST(n_src AS DOUBLE)) * 1000000) AS BIGINT) AS w_micro
        FROM counts),
      tot AS (SELECT sum(n_src) AS total, sum(w_micro) AS sum_micro FROM w),
      tgt AS (
        SELECT source, n_src, w_micro,
          CAST((SELECT total FROM tot) * w_micro
            // (SELECT sum_micro FROM tot) AS BIGINT) AS target_docs
        FROM w),
      ranked AS (
        SELECT doc_id, source,
          CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS BIGINT) AS rk
        FROM docs)
      SELECT r.doc_id, r.source, t.n_src, t.w_micro, t.target_docs, r.rk,
        CAST(t.target_docs // t.n_src
          + CASE WHEN r.rk <= t.target_docs % t.n_src THEN 1 ELSE 0 END AS BIGINT)
          AS n_copies
      FROM ranked r JOIN tgt t ON r.source = t.source"""))

  // ---------------------------------------------------------------- t20
  /** GOPHER REPETITION RULES (Rae '21 §A.1.1 — the n-gram half; t18 covers
    * the document-shape half, t08 the count-based top-token/dup-bigram
    * signals): per doc, the CHARACTER-fraction repetition statistics Gopher
    * filters on, over word n-grams (the corpus is single-line, so the
    * line/paragraph rules are n/a by data shape):
    *   - top-{2,3,4}-gram fraction: characters covered by occurrences of
    *     the most frequent n-gram, thresholds 0.20 / 0.18 / 0.16;
    *   - duplicate-{5..10}-gram fraction: characters covered by ALL
    *     n-grams occurring more than once, thresholds 0.15 … 0.10.
    * Both families use COVERAGE semantics: characters are counted over
    * DISTINCT token positions, so overlapping occurrences never
    * double-count a character (Gopher's "fraction of characters
    * contained within" reading) and every fraction is a true ratio in
    * [0, 1] — the occurrence-weighted approximation exceeds 1.0 on
    * self-overlapping grams ("z z z z": top-2-gram mass 3×2 over 4
    * chars), which the spec pins at exactly 1.0 here.
    * Character mass is summed TOKEN lengths, spaces excluded from both
    * numerator and denominator (the gram separator is an artifact of the
    * join, not content). All masses are exact integers; each fraction is
    * one int/int IEEE division, rounded to 4 decimals, and the pass
    * verdict derives from the ROUNDED fractions — bit-stable across
    * engines. Top-gram tie-break: (count, gram char length, gram)
    * lexicographic max, mirrored in SQL by ORDER BY cnt/len/gram DESC.
    *
    * Plan shape: ONE explode produces (doc, n, start, gram) for all nine
    * gram sizes; a window count per (doc, n, gram) marks duplicates; the
    * coverage expansion explodes duplicated occurrences to token
    * positions and distincts them. Every key carries doc_id, so all
    * shuffles are doc-bounded — a 1000-executor run partitions by doc
    * with no cross-doc traffic, and per-doc work is O(len × 9). */
  private[graft] def gopherRepetition(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"),
      split(col("text"), " ").as("tk"))
    val grams = base
      .select(col("doc_id"), col("tk"),
        explode(array((2 to 10).map(lit(_)): _*)).as("n"))
      .filter(size(col("tk")) >= col("n"))
      .select(col("doc_id"), col("n"), explode(expr(
        """transform(sequence(1, size(tk) - n + 1),
           i -> struct(i AS start, concat_ws(' ', slice(tk, i, n)) AS gram))"""))
        .as("g"))
      .select(col("doc_id"), col("n"), col("g.start").as("start"),
        col("g.gram").as("gram"))
    val withCnt = grams.withColumn("cnt",
      count(lit(1)).over(Window.partitionBy(col("doc_id"), col("n"), col("gram"))))
    // the most frequent n-gram per (doc, n), n = 2..4; tie-break
    // (count, gram token-chars, gram) lexicographic max
    val glen = length(col("gram")) - (col("n") - 1)
    val winners = grams.filter(col("n") <= 4)
      .groupBy(col("doc_id"), col("n"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("doc_id"), col("n"),
        struct(col("cnt"), glen.as("glen"), col("gram")).as("t"))
      .groupBy(col("doc_id"), col("n"))
      .agg(max(col("t")).as("t"))
      .select(col("doc_id"), col("n"), col("t.gram").as("gram"))
    // occurrences whose characters count: the top gram's (n <= 4) and
    // every duplicated gram's (n >= 5); ONE coverage expansion serves both
    val marked = withCnt.filter(col("n") >= 5 && col("cnt") > 1)
      .select(col("doc_id"), col("n"), col("start"))
      .unionByName(grams.filter(col("n") <= 4)
        .join(winners, Seq("doc_id", "n", "gram"))
        .select(col("doc_id"), col("n"), col("start")))
    val covered = marked
      .select(col("doc_id"), col("n"),
        explode(sequence(col("start"), col("start") + col("n") - 1)).as("pos"))
      .distinct()
    val tokLens = base
      .select(col("doc_id"), posexplode(col("tk")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"),
        length(col("tok")).as("toklen"))
    val charSum = covered.join(tokLens, Seq("doc_id", "pos"))
      .groupBy(col("doc_id"), col("n"))
      .agg(sum(col("toklen")).as("chars"))
    val topChars = charSum.filter(col("n") <= 4)
    val dupChars = charSum.filter(col("n") >= 5)
    val totals = base.select(col("doc_id"),
      greatest(length(regexp_replace(col("text"), " ", "")), lit(1))
        .as("tok_chars"))  // floor 1: an empty doc has no grams either,
                           // so 0/0-NaN never reaches the verdicts
    def pivotChars(df: DataFrame, ks: Seq[Int], pre: String) = {
      val aggs = ks.map(k =>
        max(when(col("n") === k, col("chars"))).as(s"$pre$k"))
      df.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    }
    val thresholds = Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16, 5 -> 0.15,
      6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)
    def frac(pre: String, k: Int) =
      round(coalesce(col(s"$pre$k"), lit(0L)).cast("double") / col("tok_chars"), 4)
    val out = totals
      .join(pivotChars(topChars, 2 to 4, "top"), Seq("doc_id"), "left")
      .join(pivotChars(dupChars, 5 to 10, "dup"), Seq("doc_id"), "left")
    val fracCols =
      (2 to 4).map(k => frac("top", k).as(s"top${k}_frac")) ++
        (5 to 10).map(k => frac("dup", k).as(s"dup${k}_frac"))
    val pass = ((2 to 4).map(k => frac("top", k) <= thresholds(k)) ++
      (5 to 10).map(k => frac("dup", k) <= thresholds(k)))
      .reduce(_ && _)
    out.select(col("doc_id") +: fracCols :+ pass.as("gopher_rep_pass"): _*)
  }

  private val t20OracleSql: String = """WITH base AS (
        SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents),
      grams AS (
        SELECT doc_id, n, g.start AS start, g.gram AS gram FROM (
          SELECT doc_id, n, unnest(list_transform(range(1, len(tk) - n + 2),
            i -> struct_pack(start := i,
              gram := array_to_string(tk[i:i+n-1], ' ')))) AS g
          FROM base, (SELECT unnest([2,3,4,5,6,7,8,9,10]) AS n) ns
          WHERE len(tk) >= n)),
      cnts AS (
        SELECT doc_id, n, gram, count(*) AS cnt
        FROM grams GROUP BY doc_id, n, gram),
      winners AS (
        SELECT doc_id, n, gram FROM (
          SELECT doc_id, n, gram, row_number() OVER (
            PARTITION BY doc_id, n
            ORDER BY cnt DESC, length(gram) - (n - 1) DESC, gram DESC) AS rk
          FROM cnts WHERE n <= 4)
        WHERE rk = 1),
      marked AS (
        SELECT g.doc_id, g.n, g.start
        FROM grams g JOIN cnts c
          ON g.doc_id = c.doc_id AND g.n = c.n AND g.gram = c.gram
        WHERE g.n >= 5 AND c.cnt > 1
        UNION ALL
        SELECT g.doc_id, g.n, g.start
        FROM grams g JOIN winners w
          ON g.doc_id = w.doc_id AND g.n = w.n AND g.gram = w.gram),
      covered AS (
        SELECT DISTINCT doc_id, n, pos FROM (
          SELECT doc_id, n, unnest(range(start, start + n)) AS pos
          FROM marked)),
      toklens AS (
        SELECT doc_id, p.pos AS pos, p.l AS toklen FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(tk) + 1),
            i -> struct_pack(pos := i, l := length(tk[i])))) AS p
          FROM base)),
      charsum AS (
        SELECT c.doc_id, c.n, sum(t.toklen) AS chars
        FROM covered c JOIN toklens t ON c.doc_id = t.doc_id AND c.pos = t.pos
        GROUP BY c.doc_id, c.n),
      totals AS (
        SELECT doc_id, greatest(length(replace(text, ' ', '')), 1) AS tok_chars
        FROM base),
      topp AS (
        SELECT doc_id,
          max(CASE WHEN n = 2 THEN chars END) AS top2,
          max(CASE WHEN n = 3 THEN chars END) AS top3,
          max(CASE WHEN n = 4 THEN chars END) AS top4
        FROM charsum WHERE n <= 4 GROUP BY doc_id),
      dupp AS (
        SELECT doc_id,
          max(CASE WHEN n = 5 THEN chars END) AS dup5,
          max(CASE WHEN n = 6 THEN chars END) AS dup6,
          max(CASE WHEN n = 7 THEN chars END) AS dup7,
          max(CASE WHEN n = 8 THEN chars END) AS dup8,
          max(CASE WHEN n = 9 THEN chars END) AS dup9,
          max(CASE WHEN n = 10 THEN chars END) AS dup10
        FROM charsum WHERE n >= 5 GROUP BY doc_id),
      fr AS (
        SELECT t.doc_id,
          round(CAST(coalesce(p.top2, 0) AS DOUBLE) / t.tok_chars, 4) AS top2_frac,
          round(CAST(coalesce(p.top3, 0) AS DOUBLE) / t.tok_chars, 4) AS top3_frac,
          round(CAST(coalesce(p.top4, 0) AS DOUBLE) / t.tok_chars, 4) AS top4_frac,
          round(CAST(coalesce(d.dup5, 0) AS DOUBLE) / t.tok_chars, 4) AS dup5_frac,
          round(CAST(coalesce(d.dup6, 0) AS DOUBLE) / t.tok_chars, 4) AS dup6_frac,
          round(CAST(coalesce(d.dup7, 0) AS DOUBLE) / t.tok_chars, 4) AS dup7_frac,
          round(CAST(coalesce(d.dup8, 0) AS DOUBLE) / t.tok_chars, 4) AS dup8_frac,
          round(CAST(coalesce(d.dup9, 0) AS DOUBLE) / t.tok_chars, 4) AS dup9_frac,
          round(CAST(coalesce(d.dup10, 0) AS DOUBLE) / t.tok_chars, 4) AS dup10_frac
        FROM totals t
        LEFT JOIN topp p ON t.doc_id = p.doc_id
        LEFT JOIN dupp d ON t.doc_id = d.doc_id)
      SELECT doc_id, top2_frac, top3_frac, top4_frac, dup5_frac, dup6_frac,
        dup7_frac, dup8_frac, dup9_frac, dup10_frac,
        (top2_frac <= 0.20 AND top3_frac <= 0.18 AND top4_frac <= 0.16
         AND dup5_frac <= 0.15 AND dup6_frac <= 0.14 AND dup7_frac <= 0.13
         AND dup8_frac <= 0.12 AND dup9_frac <= 0.11 AND dup10_frac <= 0.10)
          AS gopher_rep_pass
      FROM fr"""

  private val tGopherRep = Q(
    "t20_gopher_repetition",
    (s, dir) => gopherRepetition(Tables.documents(s, dir)),
    Some(t20OracleSql))

  // ---------------------------------------------------------------- t21
  /** BIGRAM LANGUAGE-MODEL PERPLEXITY SCORING (the CCNet signal — Wenzek
    * et al. 2020, arXiv:1911.00359 §4.3 score documents by LM perplexity
    * and filter the tail; public) — the t15 unigram lane's next order:
    * P(w2|w1) = (c(w1,w2) + 0.5) / (c(w1) + 0.5·V) — add-½ smoothing over
    * the corpus's OWN vocabulary V — and a document scores the mean log10
    * of its bigram probabilities. Low-probability documents are gibberish
    * or boilerplate-OOV; CCNet keeps the low-perplexity head.
    *
    * Cross-engine determinism is t15's micro-units trick one level up:
    * each bigram's log10 P is rounded to integer MICRO-units once, so the
    * per-doc mean is exact long arithmetic in both engines regardless of
    * aggregation order (the same libm caveat as t15, documented there).
    *
    * Scale shape: bigram extraction is row-local (one transform over the
    * token array, no self-join, no window); the model is two grouped
    * counts with map-side combine (bigram table ~ corpus tokens, unigram
    * table ~ vocab); scoring is one shuffle join of the corpus's bigram
    * occurrences against the model keyed by the bigram, then a per-doc
    * long-sum. V and the smoothing ride a broadcast scalar. Docs with
    * fewer than 2 tokens have no bigrams: n_bigrams = 0, score NULL in
    * both engines. */
  /** t21's per-doc scorer, shared with the t22 bucketing lane: (doc_id,
    * n_bigrams, avg_bigram_logprob10), score NULL when a doc has no
    * bigrams. */
  private def bigramScored(s: SparkSession, dir: String): DataFrame = {
      // total over any doc length (the wordNgrams lesson): zip of the two
      // length-(n-1) slices — no index arithmetic to run past the array
      // end under ANSI mode; 0/1-token docs zip to empty and explode away
      val big = Tables.documents(s, dir)
        .select(col("doc_id"), toks.as("tk"))
        .select(col("doc_id"),
          slice(col("tk"), lit(1), greatest(size(col("tk")) - 1, lit(0))).as("aa"),
          slice(col("tk"), lit(2), greatest(size(col("tk")) - 1, lit(0))).as("bb"))
        .select(col("doc_id"), explode(arrays_zip(col("aa"), col("bb"))).as("bg"))
        .select(col("doc_id"), col("bg.aa").as("w1"), col("bg.bb").as("w2"))
      val uni = Tables.documents(s, dir)
        .select(explode(toks).as("w1"))
        .groupBy(col("w1")).agg(count(lit(1)).as("cu"))
      val vocab = uni.agg(count(lit(1)).as("v"))
      val bigCounts = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
      val micro = bigCounts.join(uni, Seq("w1")).crossJoin(broadcast(vocab))
        .select(col("w1"), col("w2"),
          round(log10((col("cb") + 0.5) / (col("cu") + col("v") * 0.5)) * 1e6)
            .cast("long").as("lp_micro"))
      val scored = big.join(micro, Seq("w1", "w2"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_micro")).as("sm"))
        .select(col("doc_id"), col("n_bigrams"),
          round(col("sm").cast("double") / col("n_bigrams") / 1e6, 6)
            .as("avg_bigram_logprob10"))
      Tables.documents(s, dir).select(col("doc_id"))
        .join(scored, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          col("avg_bigram_logprob10"))
  }

  private val tBigramLp = Q(
    "t21_bigram_logprob",
    (s, dir) => bigramScored(s, dir),
    Some("""WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      big AS (
        SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2 FROM (
          SELECT doc_id, tk,
            unnest(range(1, CAST(greatest(len(tk) - 1, 0) AS BIGINT) + 1)) AS i
          FROM toks) t),
      uni AS (
        SELECT w1, count(*) AS cu FROM (
          SELECT unnest(tk) AS w1 FROM toks) u GROUP BY w1),
      micro AS (
        SELECT b.w1, b.w2, CAST(round(log10(
            (count(*) + 0.5) / (any_value(u.cu) + 0.5 * (SELECT count(*) FROM uni))
          ) * 1e6) AS BIGINT) AS lp_micro
        FROM big b JOIN uni u ON b.w1 = u.w1 GROUP BY b.w1, b.w2),
      scored AS (
        SELECT b.doc_id, count(*) AS n_bigrams,
          round(CAST(sum(m.lp_micro) AS DOUBLE) / count(*) / 1e6, 6) AS avg_bigram_logprob10
        FROM big b JOIN micro m ON b.w1 = m.w1 AND b.w2 = m.w2
        GROUP BY b.doc_id)
      SELECT d.doc_id,
        CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        s.avg_bigram_logprob10
      FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id"""))

  // ---------------------------------------------------------------- t22
  /** CCNET PERPLEXITY BUCKETING (Wenzek et al. 2020, arXiv:1911.00359
    * §4.3; public) — the decision CCNet actually ships on top of the t21
    * signal: per LANGUAGE, documents split into head / middle / tail by
    * perplexity terciles, and downstream training keeps the head (or
    * head+middle). Higher mean bigram log-probability = lower perplexity
    * = head.
    *
    * The cutoffs are the per-language interpolated tercile values of the
    * (already micro-exact, 6-dp-rounded) t21 score — Spark `percentile` ==
    * DuckDB `percentile_cont`, the q40 cross-engine precedent — rounded to
    * 6 dp themselves, so bucket assignment is a deterministic comparison
    * of two identical doubles in both engines. Scoreless docs (no
    * bigrams) are excluded, as CCNet drops them.
    *
    * Scale shape: assignment is ROW-LOCAL against a broadcast cutoff
    * table (one row per language) — no per-language sort, no window over
    * the corpus (an ntile() formulation would single-task each language's
    * full sort at 100 TB). The cutoff aggregation here is the exact
    * `percentile` (buffers one double per doc within each language
    * group) for oracle exactness; the production swap at corpus scale is
    * the q53 `HistogramSketch` cutoffs — bounded mergeable buffers — with
    * this same assignment join unchanged (the q49 sampled-quantiles
    * framing: the gate pins the verifiable cousin of the sketch path). */
  private val tCcnetBuckets = Q(
    "t22_ccnet_buckets",
    (s, dir) => {
      val scored = bigramScored(s, dir).filter(col("n_bigrams") > 0)
      val withLang = scored
        .join(Tables.documents(s, dir).select(col("doc_id"), col("lang")), Seq("doc_id"))
      val cuts = withLang.groupBy(col("lang")).agg(
        round(expr("percentile(avg_bigram_logprob10, 2.0/3)"), 6).as("c_head"),
        round(expr("percentile(avg_bigram_logprob10, 1.0/3)"), 6).as("c_mid"))
      withLang.join(broadcast(cuts), Seq("lang"))
        .select(col("doc_id"), col("lang"), col("avg_bigram_logprob10"),
          when(col("avg_bigram_logprob10") >= col("c_head"), "head")
            .when(col("avg_bigram_logprob10") >= col("c_mid"), "middle")
            .otherwise("tail").as("bucket"))
    },
    Some("""WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      big AS (
        SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2 FROM (
          SELECT doc_id, tk,
            unnest(range(1, CAST(greatest(len(tk) - 1, 0) AS BIGINT) + 1)) AS i
          FROM toks) t),
      uni AS (
        SELECT w1, count(*) AS cu FROM (
          SELECT unnest(tk) AS w1 FROM toks) u GROUP BY w1),
      micro AS (
        SELECT b.w1, b.w2, CAST(round(log10(
            (count(*) + 0.5) / (any_value(u.cu) + 0.5 * (SELECT count(*) FROM uni))
          ) * 1e6) AS BIGINT) AS lp_micro
        FROM big b JOIN uni u ON b.w1 = u.w1 GROUP BY b.w1, b.w2),
      scored AS (
        SELECT b.doc_id, count(*) AS n_bigrams,
          round(CAST(sum(m.lp_micro) AS DOUBLE) / count(*) / 1e6, 6) AS avg_bigram_logprob10
        FROM big b JOIN micro m ON b.w1 = m.w1 AND b.w2 = m.w2
        GROUP BY b.doc_id),
      langed AS (
        SELECT s.doc_id, d.lang, s.avg_bigram_logprob10
        FROM scored s JOIN documents d ON s.doc_id = d.doc_id),
      cuts AS (
        SELECT lang,
          round(percentile_cont(2.0/3) WITHIN GROUP (ORDER BY avg_bigram_logprob10), 6) AS c_head,
          round(percentile_cont(1.0/3) WITHIN GROUP (ORDER BY avg_bigram_logprob10), 6) AS c_mid
        FROM langed GROUP BY lang)
      SELECT l.doc_id, l.lang, l.avg_bigram_logprob10,
        CASE WHEN l.avg_bigram_logprob10 >= c.c_head THEN 'head'
          WHEN l.avg_bigram_logprob10 >= c.c_mid THEN 'middle'
          ELSE 'tail' END AS bucket
      FROM langed l JOIN cuts c ON l.lang = c.lang"""))

  // ---------------------------------------------------------------- t23
  /** DSIR IMPORTANCE WEIGHTS (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling", arXiv:2302.03169 §3;
    * public) — the data-selection signal behind DoReMi-era pretraining
    * mixes: score every raw document by how much it resembles a TARGET
    * corpus (here: the `lang = 'en'` slice, DSIR's "select web data that
    * looks like Wikipedia" setup) under two hashed-n-gram bag models.
    * Features are unigrams ∪ bigrams hashed into B = 10,000 buckets
    * (Xie's exact featurization); the per-doc weight is the mean per-gram
    * log10 importance ratio log(p_target(b)/p_raw(b)) with add-½
    * smoothing over the bucket space. Positive ⇒ looks like the target;
    * the resampling step downstream is t14/t19's weighted mixing.
    *
    * Cross-engine determinism: the ratio is ONE double quotient (products
    * first — IEEE-identical in both engines) through one log10, rounded
    * to integer micro-units per BUCKET, so per-doc means are exact long
    * arithmetic (the t15/t21 pattern; same libm caveat, documented at
    * t15).
    *
    * Scale shape: gram extraction is row-local; both bag models are ONE
    * grouped count each over bucket ids — the shuffle carries ≤ B keys
    * per partition after map-side combine, and the finished model is
    * B = 10k rows ⇒ BROADCAST to the scoring join, which therefore
    * shuffles nothing but the final per-doc aggregation. The target pass
    * is a pushed-down filter on the same scan. At 100 TB the model cost
    * is two map-side-combined counts; scoring is embarrassingly parallel. */
  private val tDsir = Q(
    "t23_dsir_weights",
    (s, dir) => {
      val B = 10000L
      val docs = Tables.documents(s, dir)
      val uni = docs.select(col("doc_id"), col("lang"), explode(toks).as("g"))
      val big = docs
        .select(col("doc_id"), col("lang"), toks.as("tk"))
        .select(col("doc_id"), col("lang"),
          slice(col("tk"), lit(1), greatest(size(col("tk")) - 1, lit(0))).as("aa"),
          slice(col("tk"), lit(2), greatest(size(col("tk")) - 1, lit(0))).as("bb"))
        .select(col("doc_id"), col("lang"),
          explode(arrays_zip(col("aa"), col("bb"))).as("bg"))
        .select(col("doc_id"), col("lang"),
          concat(col("bg.aa"), lit(" "), col("bg.bb")).as("g"))
      val grams = uni.unionByName(big).select(col("doc_id"), col("lang"),
        pmod(graft.functions.CrossEngine.md5Hash60(col("g")), lit(B)).as("b"))
      // ONE grouped pass serves both bag models (the target count is a
      // conditional sum) and, summed, both normalizers — no second corpus
      // scan, no second shuffle
      val counts = grams.groupBy(col("b")).agg(count(lit(1)).as("craw"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ctgt"))
      val tot = counts.agg(sum(col("craw")).as("nraw"), sum(col("ctgt")).as("ntgt"))
      val model = counts.crossJoin(broadcast(tot))
        .select(col("b"),
          round(log10(((col("ctgt") + 0.5) * (col("nraw") + B / 2.0)) /
            ((col("craw") + 0.5) * (col("ntgt") + B / 2.0))) * 1e6)
            .cast("long").as("lr_micro"))
      val scored = grams.join(broadcast(model), Seq("b"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"), sum(col("lr_micro")).as("sm"))
        .select(col("doc_id"), col("n_grams"),
          round(col("sm").cast("double") / col("n_grams") / 1e6, 6)
            .as("dsir_logratio"))
      docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          col("dsir_logratio"))
    },
    Some("""WITH toks AS (
        SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
      uni AS (SELECT doc_id, lang, unnest(tk) AS g FROM toks),
      big AS (
        SELECT doc_id, lang, tk[i] || ' ' || tk[i + 1] AS g FROM (
          SELECT doc_id, lang, tk,
            unnest(range(1, CAST(greatest(len(tk) - 1, 0) AS BIGINT) + 1)) AS i
          FROM toks) t),
      grams AS (
        SELECT doc_id, lang,
          CAST(concat('0x', substring(md5(g), 1, 15)) AS BIGINT) % 10000 AS b
        FROM (SELECT * FROM uni UNION ALL SELECT * FROM big) u),
      raw AS (SELECT b, count(*) AS craw FROM grams GROUP BY b),
      tgt AS (SELECT b, count(*) AS ctgt FROM grams WHERE lang = 'en' GROUP BY b),
      tot AS (SELECT
        (SELECT count(*) FROM grams) AS nraw,
        (SELECT count(*) FROM grams WHERE lang = 'en') AS ntgt),
      model AS (
        SELECT r.b, CAST(round(log10(
            ((coalesce(t.ctgt, 0) + 0.5) * (nraw + 5000.0)) /
            ((r.craw + 0.5) * (ntgt + 5000.0))) * 1e6) AS BIGINT) AS lr_micro
        FROM raw r LEFT JOIN tgt t ON r.b = t.b CROSS JOIN tot),
      scored AS (
        SELECT g.doc_id, count(*) AS n_grams,
          round(CAST(sum(m.lr_micro) AS DOUBLE) / count(*) / 1e6, 6) AS dsir_logratio
        FROM grams g JOIN model m ON g.b = m.b GROUP BY g.doc_id)
      SELECT d.doc_id, CAST(coalesce(s.n_grams, 0) AS BIGINT) AS n_grams,
        s.dsir_logratio
      FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id"""))

  // ---------------------------------------------------------------- t24
  /** TRIGRAM STUPID-BACKOFF SCORING (Brants et al. 2007, "Large Language
    * Models in Machine Translation", EMNLP, §4; public) — the web-scale LM
    * that deliberately skips discounting: S(w₃|w₁w₂) = c₃/c₂(w₁w₂) when
    * the trigram was seen, else 0.4·c₂(w₂w₃)/c₁(w₂), else
    * 0.4²·(c₁(w₃)+½)/(N+½V) (a smoothed unigram floor so OOV scores are
    * finite — Brants leaves the base case open). Backoff only fires on
    * UNSEEN grams, so the model trains on the even-doc_id half of the
    * corpus and scores the held-out odd half — every tier is exercised.
    *
    * Cross-engine determinism: each tier is left-associated double
    * arithmetic on exact integer counts (IEEE-identical in both engines)
    * through one log10, micro-rounded per position (the t15/t21 pattern).
    *
    * Scale shape: three grouped counts over the training half (map-side
    * combine; pushed-down `doc_id % 2 = 0` filter), then the held-out
    * trigram table left-joins the count tables on gram keys — every join
    * is keyed by the gram (uniform md5-distributed after hashing; hot
    * grams are absorbed by the grouped counts, the join fan-out is linear
    * in corpus positions), and the scalar (N, V) rides a broadcast. No
    * window, no self-join; per-doc mean is one aggregation. */
  private val tStupidBackoff = Q(
    "t24_stupid_backoff",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      def ngrams(df: DataFrame, n: Int): DataFrame = {
        val named = Seq("w1", "w2", "w3").take(n)
        val sliced = (0 until n).map(i =>
          slice(col("tk"), lit(i + 1), greatest(size(col("tk")) - (n - 1), lit(0)))
            .as(s"s$i"))
        df.select((col("doc_id") +: sliced): _*)
          .select(col("doc_id"),
            explode(arrays_zip((0 until n).map(i => col(s"s$i")): _*)).as("g"))
          .select((col("doc_id") +: named.zipWithIndex.map { case (nm, i) =>
            col(s"g.s$i").as(nm) }): _*)
      }
      val train = docs.filter(col("doc_id") % 2 === 0).select(col("doc_id"), toks.as("tk"))
      val test = docs.filter(col("doc_id") % 2 === 1).select(col("doc_id"), toks.as("tk"))
      val c3 = ngrams(train, 3).groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3"))
      val c2 = ngrams(train, 2).groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      val c1 = ngrams(train, 1).groupBy("w1").agg(count(lit(1)).as("c1"))
      val tot = c1.agg(sum(col("c1")).as("n_tok"), count(lit(1)).as("v"))
      val scored = ngrams(test, 3)
        .join(c3, Seq("w1", "w2", "w3"), "left")
        .join(c2.withColumnRenamed("c2", "c2ctx"), Seq("w1", "w2"), "left")
        .join(c2.select(col("w1").as("w2"), col("w2").as("w3"), col("c2").as("c2hist")),
          Seq("w2", "w3"), "left")
        .join(c1.select(col("w1").as("w2"), col("c1").as("c1w2")), Seq("w2"), "left")
        .join(c1.select(col("w1").as("w3"), col("c1").as("c1w3")), Seq("w3"), "left")
        .crossJoin(broadcast(tot))
        .select(col("doc_id"),
          round(log10(
            when(col("c3").isNotNull, col("c3").cast("double") / col("c2ctx"))
              .when(col("c2hist").isNotNull,
                lit(0.4) * col("c2hist") / col("c1w2"))
              .otherwise(lit(0.16) * (coalesce(col("c1w3"), lit(0L)) + 0.5) /
                (col("n_tok") + lit(0.5) * col("v")))) * 1e6)
            .cast("long").as("lp_micro"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_scored"), sum(col("lp_micro")).as("sm"))
        .select(col("doc_id"), col("n_scored"),
          round(col("sm").cast("double") / col("n_scored") / 1e6, 6)
            .as("avg_sbo_logprob10"))
      test.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_scored"), lit(0L)).as("n_scored"),
          col("avg_sbo_logprob10"))
    },
    Some("""WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      tri3 AS (
        SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2, tk[i + 2] AS w3 FROM (
          SELECT doc_id, tk,
            unnest(range(1, CAST(greatest(len(tk) - 2, 0) AS BIGINT) + 1)) AS i
          FROM toks) t),
      bi2 AS (
        SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2 FROM (
          SELECT doc_id, tk,
            unnest(range(1, CAST(greatest(len(tk) - 1, 0) AS BIGINT) + 1)) AS i
          FROM toks) t),
      c3 AS (SELECT w1, w2, w3, count(*) AS c3 FROM tri3
        WHERE doc_id % 2 = 0 GROUP BY w1, w2, w3),
      c2 AS (SELECT w1, w2, count(*) AS c2 FROM bi2
        WHERE doc_id % 2 = 0 GROUP BY w1, w2),
      c1 AS (SELECT w1, count(*) AS c1 FROM (
          SELECT doc_id, unnest(tk) AS w1 FROM toks) u
        WHERE doc_id % 2 = 0 GROUP BY w1),
      tot AS (SELECT sum(c1) AS n_tok, count(*) AS v FROM c1),
      pos AS (
        SELECT t.doc_id, CAST(round(log10(
            CASE WHEN g3.c3 IS NOT NULL THEN CAST(g3.c3 AS DOUBLE) / gctx.c2
              WHEN ghist.c2 IS NOT NULL THEN 0.4 * ghist.c2 / gw2.c1
              ELSE 0.16 * (coalesce(gw3.c1, 0) + 0.5) / (n_tok + 0.5 * v)
            END) * 1e6) AS BIGINT) AS lp_micro
        FROM tri3 t
        LEFT JOIN c3 g3 ON t.w1 = g3.w1 AND t.w2 = g3.w2 AND t.w3 = g3.w3
        LEFT JOIN c2 gctx ON t.w1 = gctx.w1 AND t.w2 = gctx.w2
        LEFT JOIN c2 ghist ON t.w2 = ghist.w1 AND t.w3 = ghist.w2
        LEFT JOIN c1 gw2 ON t.w2 = gw2.w1
        LEFT JOIN c1 gw3 ON t.w3 = gw3.w1
        CROSS JOIN tot
        WHERE t.doc_id % 2 = 1),
      scored AS (
        SELECT doc_id, count(*) AS n_scored,
          round(CAST(sum(lp_micro) AS DOUBLE) / count(*) / 1e6, 6) AS avg_sbo_logprob10
        FROM pos GROUP BY doc_id)
      SELECT d.doc_id, CAST(coalesce(s.n_scored, 0) AS BIGINT) AS n_scored,
        s.avg_sbo_logprob10
      FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
      WHERE d.doc_id % 2 = 1"""))

  // ---------------------------------------------------------------- t25
  /** DETERMINISTIC STRATIFIED TRAIN/VAL/TEST SPLIT — the eval-hygiene
    * primitive every pipeline runs before training: assign each document
    * to train/val/test by a HASH of its id (80/10/10), never by position
    * or randomness. Hash assignment is row-local (no shuffle, no state,
    * no sort — a rank-exact split would sort each stratum, which at
    * 100 TB single-tasks the biggest language), reproducible across runs
    * and machines, and stable under corpus growth: adding documents never
    * moves an existing one between splits (the property that keeps
    * yesterday's test set untouchable — d16's decontamination guards the
    * content side, this guards the identity side). Proportions are
    * binomial-approximate per stratum; the gate emits per-language
    * realized fractions and the spec bounds their deviation.
    *
    * The output aggregation is per (lang, split) counts with a fraction
    * against the language total — one grouped count + a broadcast join
    * of 5 language totals. */
  private val tSplit = Q(
    "t25_stratified_split",
    (s, dir) => {
      val assigned = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
        pmod(graft.functions.CrossEngine.md5Hash60(col("doc_id")), lit(10L)).as("slot"))
        .select(col("doc_id"), col("lang"),
          when(col("slot") < 8, "train").when(col("slot") === 8, "val")
            .otherwise("test").as("split"))
      val totals = assigned.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
      assigned.groupBy(col("lang"), col("split")).agg(count(lit(1)).as("n_docs"))
        .join(broadcast(totals), Seq("lang"))
        .select(col("lang"), col("split"), col("n_docs"),
          round(col("n_docs").cast("double") / col("n_lang"), 6).as("frac"))
    },
    Some("""WITH assigned AS (
        SELECT doc_id, lang,
          CASE WHEN slot < 8 THEN 'train' WHEN slot = 8 THEN 'val'
            ELSE 'test' END AS split
        FROM (SELECT doc_id, lang,
          CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 AS slot
          FROM documents) t),
      totals AS (SELECT lang, count(*) AS n_lang FROM assigned GROUP BY lang)
      SELECT a.lang, a.split, count(*) AS n_docs,
        round(CAST(count(*) AS DOUBLE) / any_value(t.n_lang), 6) AS frac
      FROM assigned a JOIN totals t ON a.lang = t.lang
      GROUP BY a.lang, a.split"""))

  // ---------------------------------------------------------------- t26
  /** MULTINOMIAL NAIVE BAYES CLASSIFIER (train AND apply — the fastText/
    * CCNet-style linear quality classifier every curation pipeline runs at
    * scale; McCallum & Nigam '98, public). The labeled signal is PLANTED
    * (the d16/d19 harness pattern — the corpus's own lang/source fields
    * carry no lexical signal in this synthetic data): every doc_id % 3 ==
    * 0 doc gets a promo template prepended and the label 'promo', the
    * rest are 'organic'. Trained on the even-doc half with add-one
    * smoothing, applied to the held-out odd half — where the learned
    * marker-token weights must recover the plant (spec asserts held-out
    * accuracy; organic docs win too, because the promo class's larger
    * token total depresses every non-marker likelihood). All log terms
    * are integer micros (the t15/t21 contract), so per-doc class scores
    * are exact long sums and the argmax is bit-stable across engines.
    *
    * Scale shape: training is ONE grouped count over exploded train
    * tokens (map-side combined); the model is the (class × vocab) term
    * grid — C is small, so the grid is C×|V| rows, the natural broadcast-
    * or-join model table. Scoring joins test tokens to the grid on the
    * TOKEN key (C rows per occurrence), one grouped long-sum per (doc,
    * class), and the per-doc argmax is a map-side partial
    * `min(struct(-score, label))` — never a per-doc window. Unseen-in-
    * train tokens drop out identically in both engines (closed-vocab
    * scoring, the standard NB treatment). */
  private[graft] val nbPromoTemplate =
    "buy cheap sale now limited offer click here exclusive deal"

  private val tNaiveBayes = Q(
    "t26_naive_bayes",
    (s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"),
        when(col("doc_id") % 3 === 0, lit("promo")).otherwise(lit("organic"))
          .as("label"),
        when(col("doc_id") % 3 === 0,
            concat(lit(nbPromoTemplate), lit(" "), col("text")))
          .otherwise(col("text")).as("text"))
      val train = docs.filter(col("doc_id") % 2 === 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val toksTr = train
        .select(col("label"), explode(split(col("text"), " ")).as("token"))
      val nwc = toksTr.groupBy(col("label"), col("token"))
        .agg(count(lit(1)).as("nwc"))
      val nc = toksTr.groupBy(col("label")).agg(count(lit(1)).as("nc"))
      val vocab = toksTr.select(col("token")).distinct()
      val vsize = broadcast(vocab.agg(count(lit(1)).as("v")))
      val grid = nc.crossJoin(vocab)
        .join(nwc, Seq("label", "token"), "left")
        .na.fill(0L, Seq("nwc"))
        .crossJoin(vsize)
        .select(col("label"), col("token"),
          round(log10((col("nwc") + 1).cast("double") / (col("nc") + col("v")))
            * 1e6).cast("long").as("lp_micro"))
      val nd = train.groupBy(col("label")).agg(count(lit(1)).as("nd"))
      val prior = nd.crossJoin(broadcast(nd.agg(sum(col("nd")).as("ndt"))))
        .select(col("label"),
          round(log10(col("nd").cast("double") / col("ndt")) * 1e6)
            .cast("long").as("prior_micro"))
      val toksTe = docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      val scored = toksTe.join(grid, Seq("token"))
        .groupBy(col("doc_id"), col("label"))
        .agg(sum(col("lp_micro")).as("s"))
        .join(prior, Seq("label"))
        .select(col("doc_id"), col("label"),
          (col("s") + col("prior_micro")).as("score"))
      val out = scored.groupBy(col("doc_id"))
        .agg(min(struct((-col("score")).as("neg"), col("label"))).as("m"))
        .select(col("doc_id"), col("m.label").as("pred_label"),
          (-col("m.neg")).as("score_micro"))
        .localCheckpoint(true)
      train.unpersist(false)
      out
    },
    Some(s"""WITH labeled AS (
        SELECT doc_id,
          CASE WHEN doc_id % 3 = 0 THEN 'promo' ELSE 'organic' END AS label,
          CASE WHEN doc_id % 3 = 0 THEN '$nbPromoTemplate' || ' ' || text
            ELSE text END AS text
        FROM documents),
      train AS (SELECT * FROM labeled WHERE doc_id % 2 = 0),
      tok_tr AS (
        SELECT label, unnest(string_split(text, ' ')) AS token FROM train),
      nwc AS (SELECT label, token, count(*) AS nwc FROM tok_tr GROUP BY 1, 2),
      nc AS (SELECT label, count(*) AS nc FROM tok_tr GROUP BY 1),
      vocab AS (SELECT DISTINCT token FROM tok_tr),
      grid AS (
        SELECT c.label, vo.token,
          CAST(round(log10(CAST(coalesce(w.nwc, 0) + 1 AS DOUBLE) /
            (c.nc + (SELECT count(*) FROM vocab))) * 1e6) AS BIGINT) AS lp_micro
        FROM nc c CROSS JOIN vocab vo
        LEFT JOIN nwc w ON w.label = c.label AND w.token = vo.token),
      nd AS (SELECT label, count(*) AS nd FROM train GROUP BY 1),
      prior AS (
        SELECT label, CAST(round(log10(CAST(nd AS DOUBLE) /
          (SELECT sum(nd) FROM nd)) * 1e6) AS BIGINT) AS prior_micro
        FROM nd),
      tok_te AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM labeled WHERE doc_id % 2 = 1),
      sc AS (
        SELECT t.doc_id, g.label,
          CAST(sum(g.lp_micro) AS BIGINT) + p.prior_micro AS score
        FROM tok_te t JOIN grid g ON t.token = g.token
        JOIN prior p ON p.label = g.label
        GROUP BY t.doc_id, g.label, p.prior_micro)
      SELECT doc_id, label AS pred_label, score AS score_micro FROM (
        SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY score DESC, label) AS rn FROM sc)
      WHERE rn = 1"""))

  // ------------------------------------------------------------ t28/t29
  /** UNIGRAM-LM (SentencePiece-style) TOKENIZER — Kudo '18, the other
    * half of the production tokenizer space next to t16/t17 BPE (VERDICT
    * r10 next-2): pieces carry probabilities and a word's tokenization is
    * the max-likelihood segmentation (Viterbi), trained by hard
    * (Viterbi-) EM over a seeded candidate vocabulary.
    *
    * Spark shape — the t16 lesson applied: the corpus is touched ONCE to
    * build the distinct-word frequency table; seeding is one substring
    * explode + grouped Long sum + a bounded top-cap TakeOrdered; every EM
    * round maps the WORD table under a broadcast piece-prob model (the
    * per-row bounded DP is a pure executor kernel, the LocalKMeans
    * precedent) and folds Long piece counts map-side. At 100 TB that is
    * one corpus pass + EM over a ~1e7-row vocab with a ~50k-entry
    * broadcast — no shuffle ever carries more than (piece, count) pairs.
    * Counts stay in exact Longs, so the trained model is bit-identical
    * under any partitioning; only the reported log-likelihood sums
    * doubles (tolerance-gated).
    *
    * Gate strategy (NOTES.md backlog; Viterbi-in-SQL is not expressible
    * in ANSI): a PLANTED-STRUCTURE corpus — every 5th doc gains the word
    * "zxzxzx", over letters absent from the corpus. The whole-word piece
    * dominates any split under the count-ratio argument (its 3x-more-
    * frequent "zx" sub-piece still loses: 3·log(3c/T) < log(c/T) for all
    * T > 5.2c, and T/c ≈ the corpus-to-plant mass ratio ≫ 6), so
    * training MUST learn the whole morpheme and segment it as one piece —
    * recomputed booleans under a constant-true oracle, alongside
    * SQL-recomputable corpus counts that keep the hash non-trivial. */
  private[graft] val ugMaxPieceLen = 6
  /** Seed breadth: how many candidate multi-char substrings enter EM.
    * Must be wider than the final cap — Kudo '18 seeds "a reasonably big"
    * candidate set precisely so that coherent-but-rarer morphemes (the
    * planted 100-freq word against ~900-freq natural substrings here)
    * are not cut before likelihood gets to judge them. Bounded driver
    * collect either way (TakeOrdered). */
  private[graft] val ugSeedCap = 600
  private[graft] val ugVocabCap = 80 // multi-char pieces; single chars always kept
  private[graft] val ugRounds = 4

  /** documents text with the planted morpheme appended to every 5th doc. */
  private[graft] def ugCorpus(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"),
      when(col("doc_id") % 5 === 0, concat(col("text"), lit(" zxzxzx")))
        .otherwise(col("text")).as("text"))

  /** (word, corpus frequency) — the unit every training stage iterates on. */
  private[graft] def ugWords(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** Max-likelihood segmentation of `w` under piece log-probs: bounded DP
    * over positions (pieces <= ugMaxPieceLen chars). Deterministic: ties
    * resolve to the LONGEST final piece (j ascending + strict >). Returns
    * (pieces, score) or None when some character lacks a vocab entry. */
  private[graft] def ugViterbi(w: String,
      lp: scala.collection.Map[String, Double]): Option[(List[String], Double)] = {
    val n = w.length
    val NEG = Double.NegativeInfinity
    val best = Array.fill(n + 1)(NEG)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - ugMaxPieceLen)
      while (j < i) {
        if (best(j) != NEG) {
          lp.get(w.substring(j, i)) match {
            case Some(p) =>
              val sc = best(j) + p
              if (sc > best(i)) { best(i) = sc; back(i) = j }
            case None =>
          }
        }
        j += 1
      }
      i += 1
    }
    if (n == 0 || back(n) < 0) None
    else {
      var pieces = List.empty[String]
      var k = n
      while (k > 0) { pieces = w.substring(back(k), k) :: pieces; k = back(k) }
      Some((pieces, best(n)))
    }
  }

  /** Forward-backward over the segmentation lattice of `w` (the FULL-EM
    * E-step, Kudo '18 §3.2): returns the per-piece EXPECTED counts under
    * the model's posterior over ALL segmentations, plus the log evidence
    * (marginal likelihood). Log-space alpha/beta with log-sum-exp (a
    * 30-char word's path probabilities underflow linear doubles), fixed
    * iteration order so the result is deterministic. None when some
    * character has no vocab entry. */
  private[graft] def ugForwardBackward(w: String,
      lp: scala.collection.Map[String, Double]): Option[(List[(String, Double)], Double)] = {
    val n = w.length
    if (n == 0) return None
    val NEG = Double.NegativeInfinity
    def lse(a: Double, b: Double): Double =
      if (a == NEG) b else if (b == NEG) a
      else { val m = math.max(a, b); m + math.log(math.exp(a - m) + math.exp(b - m)) }
    val alpha = Array.fill(n + 1)(NEG); alpha(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - ugMaxPieceLen)
      while (j < i) {
        if (alpha(j) != NEG) lp.get(w.substring(j, i)).foreach { p =>
          alpha(i) = lse(alpha(i), alpha(j) + p) }
        j += 1
      }
      i += 1
    }
    if (alpha(n) == NEG) return None
    val beta = Array.fill(n + 1)(NEG); beta(n) = 0.0
    var j2 = n - 1
    while (j2 >= 0) {
      var i2 = j2 + 1
      val iMax = math.min(n, j2 + ugMaxPieceLen)
      while (i2 <= iMax) {
        if (beta(i2) != NEG) lp.get(w.substring(j2, i2)).foreach { p =>
          beta(j2) = lse(beta(j2), p + beta(i2)) }
        i2 += 1
      }
      j2 -= 1
    }
    // expected count of lattice edge (j, i) = exp(α(j) + lp + β(i) − α(n));
    // same-piece edges within the word accumulate in fixed (j, i) order
    val acc = scala.collection.mutable.LinkedHashMap[String, Double]()
    var j3 = 0
    while (j3 < n) {
      if (alpha(j3) != NEG) {
        var i3 = j3 + 1
        val iMax = math.min(n, j3 + ugMaxPieceLen)
        while (i3 <= iMax) {
          val piece = w.substring(j3, i3)
          lp.get(piece).foreach { p =>
            if (beta(i3) != NEG) {
              val post = math.exp(alpha(j3) + p + beta(i3) - alpha(n))
              acc.update(piece, acc.getOrElse(piece, 0.0) + post)
            }
          }
          i3 += 1
        }
      }
      j3 += 1
    }
    Some((acc.toList, alpha(n)))
  }

  /** Unigram trainer over a (w, cnt) word table — hard (Viterbi-) EM by
    * default, FULL EM (forward-backward expected counts) with
    * `soft = true`. Returns the final piece log-prob model and the
    * per-round corpus negative log-likelihood trace (round 0 = seed
    * model; Viterbi max-path likelihood in hard mode, marginal evidence
    * in soft mode — comparable within a mode, not across). Counts ride
    * in exact MICRO-units (round(expected x 1e6) per word, Long-summed),
    * so both modes stay bit-identical under any partitioning — the soft
    * posteriors are deterministic per word and the only cross-partition
    * reduction is integer addition. */
  private[graft] def unigramTrain(words: DataFrame, soft: Boolean = false,
      seedCap: Int = ugSeedCap, vocabCap: Int = ugVocabCap,
      rounds: Int = ugRounds): (Map[String, Double], Seq[Double]) = {
    val sp = words.sparkSession
    import sp.implicits._
    val wcnt = words.select(col("w"), col("cnt")).as[(String, Long)].rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // seed: every substring up to ugMaxPieceLen, weighted by word freq x
    // occurrence count — one explode + grouped Long sum
    val subs = words.select(col("cnt"), explode(expr(
        s"""flatten(transform(sequence(1, length(w)),
           i -> transform(sequence(1, least($ugMaxPieceLen, length(w) - i + 1)),
           l -> substring(w, i, l))))""")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("f"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val singles = subs.filter(length(col("piece")) === 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)) // bounded: alphabet
    val top = subs.filter(length(col("piece")) > 1)
      .orderBy(col("f").desc, col("piece")).limit(seedCap)
      .collect().map(r => r.getString(0) -> r.getLong(1)) // bounded: the cap
    subs.unpersist(false)
    def toLogProbs(counts: Seq[(String, Long)]): Map[String, Double] = {
      val total = counts.map(_._2).sum
      counts.map { case (p, c) => p -> math.log(c.toDouble / total) }.toMap
    }
    var model = toLogProbs((singles ++ top).toSeq)
    val lls = scala.collection.mutable.ArrayBuffer[Double]()
    // one single-stage RDD job per EM round: the E-step's per-word exact
    // micro-counts fold into a per-partition map ALONGSIDE the loss sum,
    // so the old per-round (persist + reduce job + planned groupBy query)
    // triple collapses into one collect of #partitions (map, loss) pairs
    // (guide §1.2 step 1 — the trainer's wall was per-round planning, not
    // data). Counts are Long sums — bit-identical under any partitioning
    // and merge order; the loss trace sums doubles on the driver in
    // partition-index order (the old RDD.reduce merged in task-completion
    // order, so the trace was only tolerance-stable, as documented).
    for (round <- 0 to rounds) {
      val bc = sp.sparkContext.broadcast(model)
      val partials = wcnt.mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[String, Long]
        var loss = 0.0
        it.foreach { case (w, c) =>
          if (soft) ugForwardBackward(w, bc.value) match {
            case Some((edges, logEv)) =>
              edges.foreach { case (p, e) =>
                m.update(p, m.getOrElse(p, 0L) + math.round(e * c * 1e6)) }
              loss += -logEv * c
            case None =>
          }
          else ugViterbi(w, bc.value) match {
            case Some((pieces, score)) =>
              pieces.foreach(p => m.update(p, m.getOrElse(p, 0L) + c * 1000000L))
              loss += -score * c
            case None =>
          }
        }
        Iterator.single((m, loss))
      }.collect() // bounded: #partitions x vocab size
      lls += partials.map(_._2).sum
      if (round < rounds) {
        val counts = scala.collection.mutable.HashMap.empty[String, Long]
        partials.foreach(_._1.foreach { case (p, c) =>
          counts.update(p, counts.getOrElse(p, 0L) + c)
        })
        // M-step + prune: keep the top-cap multi-char pieces by (count
        // desc, piece asc); single chars always survive (coverage floor
        // of one micro-unit)
        val multi = counts.toArray.filter(_._1.length > 1)
          .sortBy { case (p, c) => (-c, p) }.take(vocabCap)
        val singleKept = singles.map { case (p, _) =>
          p -> math.max(1000000L, counts.getOrElse(p, 0L)) }
        model = toLogProbs((singleKept ++ multi).toSeq)
      }
      bc.destroy()
    }
    wcnt.unpersist(false)
    (model, lls.toSeq)
  }

  /** Per-distinct-word tokenization table under a frozen model — the t17
    * lesson: tokenize each distinct word ONCE, join corpus words against
    * it (at 100 TB the corpus pays one word-keyed join, never per-doc
    * segmentation). Columns: w, n_pieces, lossless, segmentable. */
  private[graft] def ugWordTokens(words: DataFrame,
      model: Map[String, Double]): DataFrame = {
    val sp = words.sparkSession
    import sp.implicits._
    val bc = sp.sparkContext.broadcast(model)
    words.select(col("w")).as[String].mapPartitions { it =>
      it.map { w =>
        ugViterbi(w, bc.value) match {
          case Some((pieces, _)) =>
            (w, pieces.length.toLong, pieces.mkString("") == w, true,
              pieces.contains("zxzxzx"))
          case None => (w, 0L, false, false, false)
        }
      }
    }.toDF("w", "n_pieces", "lossless", "segmentable", "has_planted_piece")
  }

  private val tUgTrain = Q(
    "t28_unigram_train",
    (s, dir) => {
      val words = ugWords(ugCorpus(s, dir)).localCheckpoint(true)
      val (model, lls) = unigramTrain(words)
      val sp = s
      import sp.implicits._
      // recomputed gate booleans (constant-true oracle): coverage, the
      // planted morpheme learned AND segmented whole, every word
      // segmentable, training improved the corpus likelihood, cap held
      val perWord = ugWordTokens(words, model)
        .agg(min(col("segmentable")).as("all_segmentable"),
          min(col("lossless")).as("all_lossless"))
      val corpusChars = words.select(explode(expr(
          "transform(sequence(1, length(w)), i -> substring(w, i, 1))")).as("ch"))
        .distinct().as[String].collect() // bounded: alphabet
      val flags = Seq(
        corpusChars.forall(model.contains),                 // coverage
        model.contains("zxzxzx"),                           // morpheme learned
        ugViterbi("zxzxzx", model).exists(_._1 == List("zxzxzx")),
        lls.last <= lls.head + 1e-6,                        // likelihood improved
        model.keys.count(_.length > 1) <= ugVocabCap)       // cap held
      words.select(count(lit(1)).as("n_distinct_words"),
          sum(col("cnt")).as("n_word_occurrences"))
        .crossJoin(perWord)
        .select(col("n_distinct_words"), col("n_word_occurrences"),
          col("all_segmentable"), col("all_lossless"),
          lit(flags(0)).as("single_char_coverage"),
          lit(flags(1)).as("planted_piece_learned"),
          lit(flags(2)).as("planted_segments_whole"),
          lit(flags(3)).as("loglik_improved"),
          lit(flags(4)).as("vocab_cap_held"))
    },
    Some("""WITH aug AS (
        SELECT CASE WHEN doc_id % 5 = 0 THEN text || ' zxzxzx' ELSE text END AS text
        FROM documents),
      w AS (
        SELECT w, count(*) AS c FROM (
          SELECT unnest(string_split(text, ' ')) AS w FROM aug) t
        WHERE w <> '' GROUP BY w)
      SELECT CAST(count(*) AS BIGINT) AS n_distinct_words,
        CAST(sum(c) AS BIGINT) AS n_word_occurrences,
        true AS all_segmentable, true AS all_lossless,
        true AS single_char_coverage, true AS planted_piece_learned,
        true AS planted_segments_whole, true AS loglik_improved,
        true AS vocab_cap_held
      FROM w"""))

  private val tUgApply = Q(
    "t29_unigram_apply",
    (s, dir) => {
      val docs = ugCorpus(s, dir)
      val words = ugWords(docs).localCheckpoint(true)
      val (model, _) = unigramTrain(words)
      val wtoks = ugWordTokens(words, model).localCheckpoint(true)
      docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .join(wtoks, Seq("w"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          sum(length(col("w"))).cast("long").as("n_chars"),
          sum(col("n_pieces")).as("n_tokens"),
          min(col("lossless")).as("lossless"),
          max(col("has_planted_piece")).as("has_planted_token"))
        .select(col("doc_id"), col("n_words"), col("n_chars"),
          // n_tokens itself is model-specific; the gate pins its provable
          // bounds and keeps the raw count out of the hash
          (col("n_tokens") >= col("n_words") && col("n_tokens") <= col("n_chars"))
            .as("fertility_bounded"),
          col("lossless"), col("has_planted_token"))
    },
    Some("""WITH aug AS (
        SELECT doc_id,
          CASE WHEN doc_id % 5 = 0 THEN text || ' zxzxzx' ELSE text END AS text
        FROM documents),
      words AS (
        SELECT doc_id, w FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM aug) t
        WHERE w <> '')
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        CAST(sum(len(w)) AS BIGINT) AS n_chars,
        true AS fertility_bounded, true AS lossless,
        (doc_id % 5 = 0) AS has_planted_token
      FROM words GROUP BY doc_id"""))

  /** t30: the FULL-EM (soft) trainer under the same planted-structure
    * gate as t28 — forward-backward expected counts instead of Viterbi
    * path counts, the estimator SentencePiece actually ships. The planted
    * dominance argument is strictly stronger here: the whole-word piece
    * takes essentially ALL of the posterior mass (every split path costs
    * ≥ one extra factor ≪ 1), so its expected count ≈ the word count and
    * it must survive pruning and win the Viterbi decode. */
  private val tUgSoft = Q(
    "t30_unigram_soft_em",
    (s, dir) => {
      val words = ugWords(ugCorpus(s, dir)).localCheckpoint(true)
      val (model, lls) = unigramTrain(words, soft = true)
      val perWord = ugWordTokens(words, model)
        .agg(min(col("segmentable")).as("all_segmentable"),
          min(col("lossless")).as("all_lossless"))
      val sp = s
      import sp.implicits._
      val corpusChars = words.select(explode(expr(
          "transform(sequence(1, length(w)), i -> substring(w, i, 1))")).as("ch"))
        .distinct().as[String].collect() // bounded: alphabet
      val flags = Seq(
        corpusChars.forall(model.contains),
        model.contains("zxzxzx"),
        ugViterbi("zxzxzx", model).exists(_._1 == List("zxzxzx")),
        lls.last <= lls.head + 1e-6, // marginal evidence improved
        model.keys.count(_.length > 1) <= ugVocabCap)
      words.select(count(lit(1)).as("n_distinct_words"),
          sum(col("cnt")).as("n_word_occurrences"))
        .crossJoin(perWord)
        .select(col("n_distinct_words"), col("n_word_occurrences"),
          col("all_segmentable"), col("all_lossless"),
          lit(flags(0)).as("single_char_coverage"),
          lit(flags(1)).as("planted_piece_learned"),
          lit(flags(2)).as("planted_segments_whole"),
          lit(flags(3)).as("loglik_improved"),
          lit(flags(4)).as("vocab_cap_held"))
    },
    Some("""WITH aug AS (
        SELECT CASE WHEN doc_id % 5 = 0 THEN text || ' zxzxzx' ELSE text END AS text
        FROM documents),
      w AS (
        SELECT w, count(*) AS c FROM (
          SELECT unnest(string_split(text, ' ')) AS w FROM aug) t
        WHERE w <> '' GROUP BY w)
      SELECT CAST(count(*) AS BIGINT) AS n_distinct_words,
        CAST(sum(c) AS BIGINT) AS n_word_occurrences,
        true AS all_segmentable, true AS all_lossless,
        true AS single_char_coverage, true AS planted_piece_learned,
        true AS planted_segments_whole, true AS loglik_improved,
        true AS vocab_cap_held
      FROM w"""))

  // ---------------------------------------------------------------- t31
  /** TRAINABLE QUALITY CLASSIFIER — logistic regression over hashed
    * bag-of-words features, the fastText-style linear filter production
    * pipelines train on good/bad exemplars (CCNet, GPT-3's WebText
    * classifier; public). Naive Bayes (t26) is the closed-form-counts
    * classifier; this adds the ITERATIVE-OPTIMIZATION operator class:
    * full-batch gradient descent where each step is one map over the
    * feature table under the broadcast weight vector, folding per-bucket
    * gradient contributions map-side.
    *
    * Scale shape: features are built ONCE (explode → grouped count →
    * per-doc sorted sparse arrays, the shuffle carrying (doc, bucket)
    * pairs); each GD step shuffles only (bucket, grad) pairs — the model
    * dimension, not the corpus — and the weight vector (buckets + bias)
    * broadcasts at a few KB. Gradient contributions are micro-quantized
    * to exact Longs per doc (the t30 device), so the trained weights are
    * bit-identical under any partitioning; only the reported loss trace
    * sums doubles (tolerance-gated). At 100 TB: one corpus featurize
    * pass, then iterations over a (docs x avg-sparsity) table with
    * model-sized shuffles.
    *
    * Gate: planted linearly-separable structure (marker tokens per
    * class) that training MUST separate perfectly — recomputed booleans
    * under a constant-true oracle next to SQL-recomputable class counts
    * (the t28 pattern). */
  private[graft] val lrBuckets = 1024

  /** (doc_id, label, bks sorted bucket ids, vls tf values) — the sparse
    * hashed feature table, built once. */
  private[graft] def lrFeatures(docs: DataFrame, nBuckets: Int = lrBuckets): DataFrame = {
    val toks = docs.select(col("doc_id"), col("label"),
        explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    val cnts = toks.groupBy(col("doc_id"), col("label"),
        pmod(xxhash64(col("token")), lit(nBuckets.toLong)).cast("int").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    cnts.groupBy(col("doc_id"), col("label"))
      .agg(sort_array(collect_list(struct(col("bucket"), col("cnt")))).as("sp"))
      .select(col("doc_id"), col("label"),
        expr("transform(sp, x -> x.bucket)").as("bks"),
        // binary presence features (the fastText-style hashed BOW): a
        // marker token contributes a full 1.0 regardless of doc length —
        // tf-scaled features put the signal at ~1/doc_len and the
        // optimizer crawled (measured via tools/LrScratch)
        expr("transform(sp, x -> 1.0d)").as("vls"))
  }

  /** Full-batch GD with per-coordinate AdaGrad scaling (Duchi et al. '11
    * — the standard remedy for sparse hashed features, where a global
    * rate either crawls on small-tf coordinates or oscillates once
    * raised): G_k accumulates squared gradients, each step is
    * rate x g_k / sqrt(G_k). Returns (weights incl. bias at index
    * lrBuckets, loss trace). Deterministic: per-doc gradient
    * contributions quantize to micro-Longs before the cross-partition
    * sum; the AdaGrad state is driver-side arithmetic over those exact
    * sums. */
  private[graft] def lrTrain(feats: DataFrame, iters: Int, rate: Double,
      nBuckets: Int = lrBuckets): (Array[Double], Seq[Double]) = {
    val sp = feats.sparkSession
    import sp.implicits._
    // each GD step is ONE single-stage RDD job: per-partition gradient
    // arrays (exact micro-Longs) folded locally, merged on the driver —
    // the (bucket, grad) shuffle + per-step Catalyst planning of the old
    // DataFrame form were 2 planned queries per step, and the trainer's
    // wall was dominated by that per-step scheduling/planning floor
    // (guide §1.2 step 1: t31 profiled 71 jobs / 4.9 s wall with 2.4 s in
    // jobs). Long sums are associative, so the weights stay bit-identical
    // under any partitioning, like the old groupBy-sum.
    val rows = feats.select(col("label").cast("double"), col("bks"), col("vls"))
      .as[(Double, Seq[Int], Seq[Double])].rdd
      .map { case (y, bks, vls) => (y, bks.toArray, vls.toArray) }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = rows.count().toDouble
    var w = new Array[Double](nBuckets + 1)
    val gsq = new Array[Double](nBuckets + 1) // AdaGrad accumulators
    val losses = scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to iters) {
      val bc = sp.sparkContext.broadcast(w)
      // acc slots: 0..nBuckets = per-bucket + bias gradient micro-units,
      // nBuckets+1 = loss micro-units (the old -1 key)
      val parts = rows.mapPartitions { it =>
        val wv = bc.value
        val acc = new Array[Long](wv.length + 1)
        it.foreach { case (y, bks, vls) =>
          var z = wv(wv.length - 1)
          var k = 0
          while (k < bks.length) { z += vls(k) * wv(bks(k)); k += 1 }
          val p = 1.0 / (1.0 + math.exp(-z))
          val err = p - y
          val eps = 1e-12
          val loss = -(y * math.log(p + eps) + (1 - y) * math.log(1 - p + eps))
          var k2 = 0
          while (k2 < bks.length) {
            acc(bks(k2)) += math.round(err * vls(k2) * 1e6); k2 += 1
          }
          acc(wv.length - 1) += math.round(err * 1e6)
          acc(wv.length) += math.round(loss * 1e6)
        }
        Iterator.single(acc)
      }.collect() // bounded: #partitions x model dimension
      val tot = new Array[Long](nBuckets + 2)
      parts.foreach { a =>
        var k = 0
        while (k < tot.length) { tot(k) += a(k); k += 1 }
      }
      losses += tot(nBuckets + 1) / 1e6
      var k = 0
      while (k <= nBuckets) {
        val g = (tot(k) / 1e6) / nDocs
        gsq(k) += g * g
        if (gsq(k) > 0) w(k) -= rate * g / math.sqrt(gsq(k))
        k += 1
      }
      bc.destroy()
    }
    rows.unpersist(false)
    (w, losses.toSeq)
  }

  /** Per-doc predictions under frozen weights. */
  private[graft] def lrPredict(feats: DataFrame, w: Array[Double]): DataFrame = {
    // bias rides at w.length - 1, so the same predictor serves any bucket width
    val sp = feats.sparkSession
    import sp.implicits._
    val bc = sp.sparkContext.broadcast(w)
    feats.select(col("doc_id"), col("label").cast("double"), col("bks"), col("vls"))
      .as[(Long, Double, Seq[Int], Seq[Double])]
      .mapPartitions { it =>
        it.map { case (id, y, bks, vls) =>
          val wv = bc.value
          var z = wv(wv.length - 1)
          var k = 0
          while (k < bks.length) { z += vls(k) * wv(bks(k)); k += 1 }
          (id, y.toLong, if (z >= 0) 1L else 0L)
        }
      }.toDF("doc_id", "label", "pred")
  }

  /** ROW-LOCAL scoring under frozen weights — the serving form (st30):
    * binary presence features mean the whole dot product is "sum the
    * weights of the doc's distinct buckets", computable inside one row
    * with no explode/groupBy — which is what lets the SAME frame score a
    * STREAMING source statelessly. Bit-identical to [[lrPredict]]: both
    * sum doubles over the SORTED distinct bucket list starting from the
    * bias, so the addition order — and therefore every prediction —
    * matches the batch path exactly. */
  private[graft] def lrScoreRowLocal(docs: DataFrame, w: Array[Double]): DataFrame = {
    val nBuckets = w.length - 1
    val wLit = typedlit(w.toSeq)
    val buckets = sort_array(array_distinct(transform(
      filter(split(col("text"), " "), t => t =!= ""),
      t => pmod(xxhash64(t), lit(nBuckets.toLong)).cast("int"))))
    docs.withColumn("z",
        aggregate(buckets, lit(w(nBuckets)),
          (acc, b) => acc + element_at(wLit, b + 1)))
      .withColumn("pred", when(col("z") >= 0, 1L).otherwise(0L))
  }

  private val tLrQuality = Q(
    "t31_quality_classifier",
    (s, dir) => {
      // planted separable structure: spam markers on the positive class,
      // an organic marker on the negative (both classes gain tokens, so
      // length alone cannot separate)
      val docs = Tables.documents(s, dir).select(col("doc_id"),
        when(col("doc_id") % 3 === 0, lit(1L)).otherwise(lit(0L)).as("label"),
        when(col("doc_id") % 3 === 0,
            concat(col("text"), lit(" clickspam buynow clickspam")))
          .otherwise(concat(col("text"), lit(" organiccontent"))).as("text"))
      val feats = lrFeatures(docs).localCheckpoint(true)
      val (w, losses) = lrTrain(feats, iters = 30, rate = 0.3)
      val acc = lrPredict(feats, w)
        .agg((max(when(col("pred") =!= col("label"), 1).otherwise(0)) === 0)
          .as("all_train_correct"))
      feats.agg(count(lit(1)).as("n_docs"),
          sum(col("label")).as("n_pos"))
        .crossJoin(acc)
        .select(col("n_docs"), col("n_pos"), col("all_train_correct"),
          lit(losses.last < losses.head).as("loss_decreased"),
          lit(w.forall(v => !v.isNaN && !v.isInfinite)).as("weights_finite"))
    },
    Some("""SELECT CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        true AS all_train_correct, true AS loss_decreased,
        true AS weights_finite
      FROM documents"""))

  // ---------------------------------------------------------------- t33
  /** TOKENIZER MODEL PERSISTENCE (the s13 persisted-index contract
    * applied to the tokenizer family): a production tokenizer is an
    * ARTIFACT — trained once, written, versioned, and served by workers
    * that never see the training corpus. The gate trains BOTH model
    * families, persists each as a plain parquet table (BPE: the ordered
    * merge list; unigram: the piece log-prob table — doubles roundtrip
    * parquet bit-exactly), reloads them, and proves the RELOADED models
    * tokenize identically to the in-memory ones: the BPE merge fold
    * refolds from bpeState0 under the reloaded table and must land on the
    * learner's own final vocab state word-for-word (the t17
    * apply-equals-learn contract, now THROUGH DISK), and the reloaded
    * unigram model must Viterbi-segment every distinct word identically.
    * At 100 TB the artifact stays KB-sized metadata while the corpus
    * never moves. */
  private val tTokPersist = Q(
    "t33_tokenizer_persist",
    (s, dir) => {
      val out = java.nio.file.Files.createTempDirectory("graft_t33_").toString
      try {
        val sp = s
        import sp.implicits._
        val docs = Tables.documents(s, dir)
        // ---- BPE: learn -> persist merge table -> reload -> refold
        val (merges, learnedState) = bpeLearnMerges(docs, nBpeMerges)
        merges.toDF("step", "l", "r", "wt")
          .write.mode("overwrite").parquet(s"$out/bpe_merges")
        val reloaded = s.read.parquet(s"$out/bpe_merges")
          .orderBy(col("step"))
          .collect().map(r => (r.getAs[String]("l"), r.getAs[String]("r")))
        val refolded = bpeState0(docs).withColumnRenamed("s", "s2")
          .withColumn("s2", graft.functions.BpeApply
            .applyAllMerges(col("s2"), reloaded.toSeq))
        val bpeMatch = learnedState.join(refolded.select(col("w"), col("s2")), Seq("w"))
          .agg((coalesce(max(when(col("s") =!= col("s2"), 1).otherwise(0)), lit(0)) === 0)
            .as("bpe_roundtrip_identical"),
            count(lit(1)).as("n_distinct_words"))
        // ---- unigram: train -> persist piece table -> reload -> re-segment
        val words = ugWords(ugCorpus(s, dir)).localCheckpoint(true)
        val (model, _) = unigramTrain(words)
        model.toSeq.sortBy(_._1).toDF("piece", "logp")
          .write.mode("overwrite").parquet(s"$out/unigram")
        val reModel = s.read.parquet(s"$out/unigram")
          .collect().map(r => r.getAs[String]("piece") -> r.getAs[Double]("logp")).toMap
        val ugMatch = ugWordTokens(words, model).select(col("w"),
            col("n_pieces").as("a"), col("lossless").as("la"))
          .join(ugWordTokens(words, reModel).select(col("w"),
            col("n_pieces").as("b"), col("lossless").as("lb")), Seq("w"))
          .agg(
            (coalesce(max(when(col("a") =!= col("b") || col("la") =!= col("lb"), 1)
              .otherwise(0)), lit(0)) === 0).as("unigram_roundtrip_identical"))
        val outDf = bpeMatch.crossJoin(ugMatch)
          .select(col("n_distinct_words"),
            lit(merges.length == nBpeMerges).as("n_merges_expected"),
            col("bpe_roundtrip_identical"), col("unigram_roundtrip_identical"),
            lit(reModel == model).as("unigram_table_bit_exact"))
        val materialized = graft.functions.CrossEngine.materializeLocal(s, outDf)
        learnedState.unpersist(false)
        materialized
      } finally {
        graft.functions.CrossEngine.deleteRecursive(java.nio.file.Paths.get(out))
      }
    },
    Some("""SELECT CAST(count(DISTINCT w) AS BIGINT) AS n_distinct_words,
        true AS n_merges_expected, true AS bpe_roundtrip_identical,
        true AS unigram_roundtrip_identical, true AS unigram_table_bit_exact
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
      WHERE w <> ''"""))

  // ---------------------------------------------------------------- t34
  /** CLASSIFIER MODEL PERSISTENCE (t33's contract for the quality
    * model): the trained weight vector persists as a (index, weight)
    * parquet artifact — doubles roundtrip bit-exactly — and the RELOADED
    * model must score every doc identically: the batch predictor under
    * the in-memory weights against the row-local serving scorer under
    * the reloaded weights, crossing BOTH the disk hop and the
    * batch/serving formulation boundary in one equality. */
  private val tLrPersist = Q(
    "t34_classifier_persist",
    (s, dir) => {
      val out = java.nio.file.Files.createTempDirectory("graft_t34_").toString
      try {
        val sp = s
        import sp.implicits._
        val docs = Tables.documents(s, dir).select(col("doc_id"),
          when(col("doc_id") % 3 === 0, lit(1L)).otherwise(lit(0L)).as("label"),
          when(col("doc_id") % 3 === 0,
              concat(col("text"), lit(" clickspam buynow clickspam")))
            .otherwise(concat(col("text"), lit(" organiccontent"))).as("text"))
        val feats = lrFeatures(docs).localCheckpoint(true)
        val (w, _) = lrTrain(feats, iters = 30, rate = 0.3)
        w.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
          .toDF("idx", "weight").write.mode("overwrite").parquet(s"$out/lr")
        val reW = new Array[Double](w.length)
        s.read.parquet(s"$out/lr").collect()
          .foreach(r => reW(r.getAs[Int]("idx")) = r.getAs[Double]("weight"))
        val parity = lrPredict(feats, w)
          .select(col("doc_id"), col("pred").as("mem_pred"))
          .join(lrScoreRowLocal(docs, reW)
            .select(col("doc_id"), col("pred").as("disk_pred")), Seq("doc_id"))
          .agg(count(lit(1)).as("n_docs"),
            (coalesce(max(when(col("mem_pred") =!= col("disk_pred"), 1)
              .otherwise(0)), lit(0)) === 0).as("reload_scores_identical"))
        val outDf = parity.select(col("n_docs"), col("reload_scores_identical"),
          lit(java.util.Arrays.equals(w, reW)).as("weights_bit_exact"))
        graft.functions.CrossEngine.materializeLocal(s, outDf)
      } finally {
        graft.functions.CrossEngine.deleteRecursive(java.nio.file.Paths.get(out))
      }
    },
    Some("""SELECT CAST(count(*) AS BIGINT) AS n_docs,
        true AS reload_scores_identical, true AS weights_bit_exact
      FROM documents"""))

  // ---------------------------------------------------------------- t32
  /** CLASSIFIER ROC-AUC EVAL (completing the eval family: s21 ANN, d21
    * dedup, t27 tokenizer — this is the metric every quality-filter
    * deployment watches; public): binned AUC over B score-histogram bins,
    * the scale-honest shape — exact AUC needs a global rank, O(N log N)
    * with a full sort, while the binned estimator is ONE grouped count
    * over (bin, label) plus a driver pass over B rows, exact whenever no
    * bin mixes classes (true for any separated classifier, and the
    * fixture's margins are wide). AUC from bin counts is the
    * trapezoid-free step form of Mann-Whitney U: walking bins in
    * ascending-score order, every positive in bin b beats all negatives
    * in strictly lower bins and ties half of its own bin's negatives. */
  private[graft] def binnedAuc(scored: DataFrame, scoreCol: String,
      labelCol: String, nBins: Int = 1024): Double = {
    val r = scored.agg(min(col(scoreCol)), max(col(scoreCol))).head()
    val (lo, hi) = (r.getDouble(0), r.getDouble(1))
    val width = if (hi > lo) hi - lo else 1.0
    val counts = scored.select(
        least(lit(nBins - 1), floor((col(scoreCol) - lit(lo)) / lit(width) * nBins))
          .cast("int").as("bin"),
        col(labelCol).cast("long").as("y"))
      .groupBy(col("bin"))
      .agg(sum(col("y")).as("np"), sum(lit(1L) - col("y")).as("nn"))
      .collect().map(row => row.getInt(0) -> (row.getLong(1), row.getLong(2)))
      .toMap // bounded: nBins rows
    var negBelow = 0L
    var u = 0.0
    var (nPos, nNeg) = (0L, 0L)
    for (b <- 0 until nBins) {
      val (np, nn) = counts.getOrElse(b, (0L, 0L))
      u += np.toDouble * negBelow + 0.5 * np.toDouble * nn
      negBelow += nn
      nPos += np; nNeg += nn
    }
    if (nPos == 0 || nNeg == 0) 0.5 else u / (nPos.toDouble * nNeg.toDouble)
  }

  private val tLrAuc = Q(
    "t32_classifier_auc",
    (s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"),
        when(col("doc_id") % 3 === 0, lit(1L)).otherwise(lit(0L)).as("label"),
        when(col("doc_id") % 3 === 0,
            concat(col("text"), lit(" clickspam buynow clickspam")))
          .otherwise(concat(col("text"), lit(" organiccontent"))).as("text"))
      val feats = lrFeatures(docs).localCheckpoint(true)
      // train on even ids, EVALUATE on the held-out odd ids — the eval's
      // whole point is generalization, not training-set fit
      val (w, _) = lrTrain(feats.filter(col("doc_id") % 2 === 0),
        iters = 30, rate = 0.3)
      val held = lrScoreRowLocal(docs.filter(col("doc_id") % 2 === 1), w)
        .localCheckpoint(true)
      val auc = binnedAuc(held, "z", "label")
      held.agg(count(lit(1)).as("n_eval_docs"),
          sum(col("label")).as("n_pos"))
        .select(col("n_eval_docs"), col("n_pos"),
          lit(auc >= 0.999).as("auc_is_one"),
          lit(auc <= 1.0 + 1e-9).as("auc_bounded"))
    },
    Some("""SELECT CAST(count(*) AS BIGINT) AS n_eval_docs,
        CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        true AS auc_is_one, true AS auc_bounded
      FROM documents WHERE doc_id % 2 = 1"""))

  // ---------------------------------------------------------------- t27
  /** TOKENIZER EFFICIENCY EVAL (compression rate + fertility — the
    * chars-per-token and tokens-per-word metrics every tokenizer paper
    * reports (e.g. mBERT/XLM fertility studies) and every pipeline
    * watches per SOURCE, because token budget IS training cost; public).
    * Completes the engine's eval-harness trio: s21 measures the ANN lane,
    * d21 the dedup lane, t27 the tokenizer lane — each eval itself
    * hash-gated. Ratios are integer micros (`div`), zero float division.
    *
    * Scale shape: the merge fold and the word→token-count table live at
    * VOCAB scale (the t17 lesson); the corpus pays one word-keyed join
    * and one per-source conditional-count agg — no per-doc state at all,
    * so the eval runs casually on the full corpus at any scale. */
  private val tFertility = Q(
    "t27_tokenizer_eval",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      // the learner's final state IS the fully-merged vocab (column s) —
      // reuse it instead of refolding all 24 merges from scratch
      val (_, learnedState) = bpeLearnMerges(docs, nBpeMerges)
      val wtc = learnedState
        .select(col("w"),
          size(split(col("s"), " ")).cast("long").as("w_tokens"),
          length(col("w")).cast("long").as("w_chars"))
        .localCheckpoint(true)
      learnedState.unpersist(false)
      // r11: the unigram-LM challenger on the SAME corpus — its per-word
      // token counts join in next to BPE's, and the duel reduces to
      // recomputed booleans (raw unigram counts are model-specific; the
      // oracle pins the comparison, not the numbers)
      val uwords = ugWords(docs).localCheckpoint(true)
      val (ugModel, _) = unigramTrain(uwords)
      val uwt = ugWordTokens(uwords, ugModel)
        .select(col("w"), col("n_pieces").as("u_tokens"), col("lossless"))
        .localCheckpoint(true)
      docs
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .join(wtc, Seq("w"))
        .join(uwt, Seq("w"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("w_chars")).as("n_chars"),
          sum(col("w_tokens")).as("n_tokens"),
          sum(col("u_tokens")).as("u_tokens"),
          min(col("lossless")).as("unigram_lossless"))
        .select(col("source"), col("n_words"), col("n_chars"), col("n_tokens"),
          expr("n_chars * 1000000 div n_tokens").as("chars_per_token_micro"),
          expr("n_tokens * 1000000 div n_words").as("fertility_micro"),
          (col("u_tokens") <= col("n_tokens")).as("unigram_fertility_le_bpe"),
          col("unigram_lossless"))
    },
    Some(s"""${bpeApplyOracleCtes(nBpeMerges)},
      src AS (SELECT doc_id, source FROM documents),
      wtc AS (SELECT w, CAST(count(*) AS BIGINT) AS w_tokens FROM wordtoks GROUP BY w),
      agg AS (
        SELECT s.source,
          CAST(count(*) AS BIGINT) AS n_words,
          CAST(sum(len(d.w)) AS BIGINT) AS n_chars,
          CAST(sum(wtc.w_tokens) AS BIGINT) AS n_tokens
        FROM words d
        JOIN src s ON d.doc_id = s.doc_id
        JOIN wtc ON d.w = wtc.w
        GROUP BY s.source)
      SELECT source, n_words, n_chars, n_tokens,
        n_chars * 1000000 // n_tokens AS chars_per_token_micro,
        n_tokens * 1000000 // n_words AS fertility_micro,
        true AS unigram_fertility_le_bpe, true AS unigram_lossless
      FROM agg"""))

  // ---------------------------------------------------------------- t36
  /** Platt scaling fit (Platt '99, public): a 2-parameter logistic
    * recalibration p = sigma(a*z + b) maximum-likelihood-fit by Newton
    * iterations over BINNED (z, label) counts — the corpus collapses to
    * <= nBins rows before anything reaches the driver (the binnedAuc
    * contract), so the fit is deterministic and bounded at any scale. */
  private[graft] def plattFit(scored: DataFrame, scoreCol: String,
      labelCol: String, nBins: Int = 256): (Double, Double) = {
    val r = scored.agg(min(col(scoreCol)), max(col(scoreCol))).head()
    val (lo, hi) = (r.getDouble(0), r.getDouble(1))
    val width = if (hi > lo) hi - lo else 1.0
    val bins = scored.select(
        least(lit(nBins - 1), floor((col(scoreCol) - lit(lo)) / lit(width) * nBins))
          .cast("int").as("bin"),
        col(labelCol).cast("long").as("y"))
      .groupBy(col("bin"))
      .agg(sum(col("y")).as("np"), sum(lit(1L) - col("y")).as("nn"))
      .collect()
      .map(row => (lo + (row.getInt(0) + 0.5) * width / nBins,
        row.getLong(1), row.getLong(2)))
    var (a, b) = (1.0, 0.0)
    for (_ <- 1 to 50) {
      var (ga, gb, haa, hab, hbb) = (0.0, 0.0, 0.0, 0.0, 0.0)
      bins.foreach { case (z, np, nn) =>
        val p = 1.0 / (1.0 + math.exp(-(a * z + b)))
        val w = (np + nn) * p * (1.0 - p)
        val g = np - (np + nn) * p // d(loglik)/d(az+b) summed over the bin
        ga += g * z; gb += g
        haa += w * z * z; hab += w * z; hbb += w
      }
      // Newton step with a tiny ridge so a separable fit stays finite
      val (raa, rbb) = (haa + 1e-9, hbb + 1e-9)
      val det = raa * rbb - hab * hab
      if (math.abs(det) > 1e-18) {
        a += (rbb * ga - hab * gb) / det
        b += (raa * gb - hab * ga) / det
      }
    }
    (a, b)
  }

  /** Expected Calibration Error over 10 equal-width probability bins:
    * sum_b (n_b/N) * |mean confidence_b - accuracy_b|. The corpus
    * collapses to 10 grouped rows; exact given the binning. */
  private[graft] def eceOf(scored: DataFrame, probCol: String,
      labelCol: String): Double = {
    val rows = scored.select(
        least(lit(9), floor(col(probCol) * 10)).cast("int").as("bin"),
        col(probCol).as("p"), col(labelCol).cast("long").as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("p")).as("sp"), sum(col("y")).as("sy"))
      .collect()
    val total = rows.map(_.getAs[Long]("n")).sum.toDouble
    rows.map { r =>
      val n = r.getAs[Long]("n").toDouble
      (n / total) * math.abs(r.getAs[Double]("sp") / n - r.getAs[Long]("sy") / n)
    }.sum
  }

  /** CLASSIFIER CALIBRATION EVAL + PLATT RECALIBRATION (t36 — the third
    * member of the classifier eval suite after held-out accuracy (t31)
    * and ROC-AUC (t32); Guo '17 made ECE the standard report, Platt '99
    * the standard fix): the model trains on CLEAN separable annotations
    * (the curator's pristine labels), but the deployment labels carry
    * 20% disagreement (every 5th doc's observed label flipped) — so the
    * confident raw sigmoid provably overstates observed accuracy
    * (measured ECE ~ 0.12 at every sf), the train-clean/deploy-noisy
    * miscalibration Guo '17 documents. NOTE a logistic model trained ON
    * the noisy labels is self-calibrated (measured: Platt fits the
    * identity, ECE unchanged) — the miscalibration must come from the
    * train/deploy label shift, which is why the harness trains clean.
    * Platt scaling fit on a held-out CALIBRATION split (Newton over
    * binned counts, driver cost O(bins)) softens the scores toward the
    * disagreement rate (fitted a ~ 0.55-0.60, measured), and ECE on the
    * DISJOINT test split must drop by >= 25% (measured margins: 0.12 ->
    * 0.056/0.007/0.041 at sf0.001/0.01/0.1). Splits: train = even ids,
    * calib = %4==1, test = %4==3 — the fit never sees its report card.
    *
    * Scale shape: scoring is row-local (st30's sorted-bucket dot
    * product); everything driver-side is bin-bounded (256 fit bins, 10
    * reliability bins). Oracle recomputes the split sizes and observed-
    * label counts; the calibration verdicts are recomputed booleans (the
    * t32 pattern — weights are engine-trained). */
  private val tCalibration = Q(
    "t36_classifier_calibration",
    (s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"),
        // clean annotation the trainer sees...
        when(col("doc_id") % 3 === 0, lit(1L)).otherwise(lit(0L))
          .as("train_label"),
        // ...and the noisy observed label deployment is judged against
        (when(col("doc_id") % 3 === 0, lit(1L)).otherwise(lit(0L)) +
          when(col("doc_id") % 5 === 0, lit(1L)).otherwise(lit(0L))).mod(2)
          .as("label"),
        when(col("doc_id") % 3 === 0,
            concat(col("text"), lit(" clickspam buynow clickspam")))
          .otherwise(concat(col("text"), lit(" organiccontent"))).as("text"))
      val feats = lrFeatures(docs.withColumn("label", col("train_label")))
        .localCheckpoint(true)
      val (w, _) = lrTrain(feats.filter(col("doc_id") % 2 === 0),
        iters = 30, rate = 0.3)
      def scored(part: Column): DataFrame =
        lrScoreRowLocal(docs.filter(part), w)
          .withColumn("p_raw", expr("1.0 / (1.0 + exp(-z))"))
          .localCheckpoint(true)
      val calib = scored(col("doc_id") % 4 === 1)
      val test = scored(col("doc_id") % 4 === 3)
      val (a, b) = plattFit(calib, "z", "label")
      val testCal = test.withColumn("p_cal",
        expr(s"1.0 / (1.0 + exp(-($a * z + $b)))"))
      val eceBefore = eceOf(testCal, "p_raw", "label")
      val eceAfter = eceOf(testCal, "p_cal", "label")
      testCal.agg(count(lit(1)).as("n_test_docs"),
          sum(col("label")).as("n_pos_observed"))
        .select(col("n_test_docs"), col("n_pos_observed"),
          lit(eceBefore >= 0.05).as("raw_overconfident"),
          lit(eceAfter <= 0.75 * eceBefore).as("platt_improves_ece"),
          lit(a > 0.0 && a < 1.0).as("platt_shrinks_scores"))
    },
    Some("""SELECT CAST(count(*) AS BIGINT) AS n_test_docs,
        CAST(sum(CASE WHEN (CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
          + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) % 2 = 1
          THEN 1 ELSE 0 END) AS BIGINT) AS n_pos_observed,
        true AS raw_overconfident, true AS platt_improves_ece,
        true AS platt_shrinks_scores
      FROM documents WHERE doc_id % 4 = 3"""))

  // ---------------------------------------------------------------- distinct-n
  /** CORPUS-LEVEL DISTINCT-N DIVERSITY (Li et al. '16's distinct-1/-2,
    * applied per source slice — the standard collapse detector for
    * synthetic/generated training data): t08 measures repetition WITHIN a
    * document; a generator that emits perfectly varied documents drawn
    * from a tiny template pool sails through t08 and only this
    * cross-document ratio catches it — distinct n-grams ACROSS the whole
    * slice over total n-grams emitted. Low distinct-2 with healthy
    * per-doc stats is the signature of mode collapse / template farms
    * (the d19 plant, seen through an eval lens).
    *
    * Scale shape: two map-side-combined grouped aggregations — explode to
    * (source, gram), partial-aggregate to distinct pairs, count — the
    * exchange carries distinct grams per source, never raw token
    * instances; no windows, no driver state. Vocabulary growth is
    * sublinear in corpus size (Heaps' law), so the distinct side shrinks
    * relative to the scan as the corpus grows. */
  private val tDistinctN = Q(
    "t37_distinct_n_eval",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val uni = docs.select(col("source"), explode(toks).as("g"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_tokens"),
          countDistinct(col("g")).as("n_distinct_unigrams"))
      val bi = docs.select(col("source"), split(col("text"), " ").as("tk"))
        .filter(size(col("tk")) >= 2)
        .select(col("source"), explode(expr(
          """transform(sequence(1, size(tk) - 1),
             i -> concat_ws(' ', slice(tk, i, 2)))""")).as("g"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_bigrams"),
          countDistinct(col("g")).as("n_distinct_bigrams"))
      uni.join(bi, "source")
        .select(col("source"), col("n_tokens"), col("n_distinct_unigrams"),
          round(col("n_distinct_unigrams").cast("double") / col("n_tokens"), 6)
            .as("distinct_1"),
          col("n_bigrams"), col("n_distinct_bigrams"),
          round(col("n_distinct_bigrams").cast("double") / col("n_bigrams"), 6)
            .as("distinct_2"))
    },
    Some("""WITH uni AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
          CAST(count(DISTINCT g) AS BIGINT) AS n_distinct_unigrams
        FROM (SELECT source, unnest(string_split(text, ' ')) AS g FROM documents) t
        GROUP BY source),
      bi AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_bigrams,
          CAST(count(DISTINCT g) AS BIGINT) AS n_distinct_bigrams
        FROM (
          SELECT source, unnest(list_transform(
            range(1, len(string_split(text, ' ')) - 1 + 1),
            i -> array_to_string(string_split(text, ' ')[i:i+1], ' '))) AS g
          FROM documents WHERE len(string_split(text, ' ')) >= 2) t
        GROUP BY source)
      SELECT u.source, u.n_tokens, u.n_distinct_unigrams,
        round(CAST(u.n_distinct_unigrams AS DOUBLE) / u.n_tokens, 6) AS distinct_1,
        b.n_bigrams, b.n_distinct_bigrams,
        round(CAST(b.n_distinct_bigrams AS DOUBLE) / b.n_bigrams, 6) AS distinct_2
      FROM uni u JOIN bi b ON u.source = b.source"""))

  // ---------------------------------------------------------------- entropy
  /** CHARACTER-ENTROPY QUALITY SIGNAL (Shannon entropy of the per-doc
    * character distribution — the standard gibberish / binary-junk /
    * key-mash detector next to the structural t03/t18 rules: natural
    * prose sits near the language's ~4-bit character entropy, while
    * repeated-pattern spam, base64-free binary residue and single-char
    * floods collapse toward 0-2 bits; the cheap proxy for the
    * compression-ratio filter production stacks run, without needing a
    * codec): H = log2(n) - (1/n)*sum(cnt*log2(cnt)) over the doc's char
    * histogram. Cross-engine determinism: each histogram cell's
    * cnt*log2(cnt) is rounded to integer micro-units before the grouped
    * sum (the t15 micro-log trick), so per-doc sums are exact long
    * arithmetic and order-independent; the verdict compares the
    * 6-rounded entropy both engines computed identically. Planted
    * `repeat('ab', 100)` docs land at exactly 1.0 bits and must flag;
    * organic docs must not.
    *
    * Scale shape: one explode to (doc, char) with a map-side-combined
    * grouped count (distinct (doc,char) pairs bound the exchange — at
    * most alphabet-size rows per doc, NOT text length), then one grouped
    * fold per doc. No windows, no joins. */
  private val tCharEntropy = Q(
    "t38_char_entropy",
    (s, dir) => {
      val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val planted = base.filter(col("doc_id") < 20)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          repeat(lit("ab"), 100).as("text"))
      val chars = base.unionByName(planted)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, length(text)), i -> substring(text, i, 1))"))
          .as("ch"))
      val counts = chars.groupBy(col("doc_id"), col("ch"))
        .agg(count(lit(1)).as("cnt"))
      counts.groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n"),
          count(lit(1)).as("n_distinct_chars"),
          sum(round(col("cnt").cast("double") * log2(col("cnt").cast("double"))
            * 1e6).cast("long")).as("s_micro"))
        .select(col("doc_id"), col("n").as("n_chars_counted"),
          col("n_distinct_chars"),
          round(log2(col("n").cast("double"))
            - col("s_micro").cast("double") / 1e6 / col("n"), 6)
            .as("entropy_bits"))
        .withColumn("low_entropy", col("entropy_bits") < 3.0)
    },
    Some("""WITH docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, repeat('ab', 100) FROM documents WHERE doc_id < 20),
      chars AS (
        SELECT doc_id, unnest(list_transform(range(1, length(text) + 1),
          i -> substring(text, i, 1))) AS ch
        FROM docs),
      counts AS (SELECT doc_id, ch, count(*) AS cnt FROM chars GROUP BY 1, 2),
      ent AS (
        SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_chars_counted,
          CAST(count(*) AS BIGINT) AS n_distinct_chars,
          round(log2(CAST(sum(cnt) AS DOUBLE))
            - CAST(sum(CAST(round(CAST(cnt AS DOUBLE) * log2(CAST(cnt AS DOUBLE))
                * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 / sum(cnt), 6) AS entropy_bits
        FROM counts GROUP BY doc_id)
      SELECT doc_id, n_chars_counted, n_distinct_chars, entropy_bits,
        (entropy_bits < 3.0) AS low_entropy
      FROM ent"""))

  // ---------------------------------------------------------------- zipf
  /** ZIPF RANK-FREQUENCY FIT (the corpus-health power-law diagnostic:
    * natural language follows freq ~ rank^s with s near -1; template
    * farms, boilerplate floods and synthetic collapse bend the curve —
    * the corpus-level cousin of t37's distinct-n): least-squares fit of
    * log10(freq) against log10(rank) over the top-1000 ranks, plus R^2.
    * Cross-engine determinism: each rank's (log10 rank, log10 freq) pair
    * is rounded to integer micro-units (the t15 trick), the five
    * regression sums are exact long arithmetic, and the closed-form
    * slope/intercept/R^2 are identical scalar double expressions on
    * those exact longs, rounded to 6.
    *
    * Scale shape: one grouped count (map-side combined; the exchange
    * carries distinct tokens, Heaps-sublinear in corpus size), a top-1000
    * by freq on the native TopKPairs bounded heap (rank-after-count is
    * the same shape as knnJoin's rank-after-distance: every partition
    * keeps a 1000-pair heap, the exchange carries one heap buffer per
    * partition, posexplode position IS the rank) and one scalar
    * aggregate. No window, no vocabulary-wide sort anywhere: at 10^8-10^9
    * distinct words only the per-partition heaps and one merged 1000-row
    * panel ever exist. Tie ORDER among equal counts is irrelevant to the
    * fit — tied ranks carry identical y = log10(cnt), so the regression
    * sums (and the boundary-tie choice at rank 1000) are order-free; the
    * heap's payload is only a deterministic tiebreak token.
    *
    * On the gate corpus the verdict is honestly NEGATIVE: the synthetic
    * documents table draws from a 31-word template pool near-uniformly
    * (measured slope -0.16, R^2 0.05, zipf_like=false at sf0.1) — i.e.
    * the detector FLAGS the driver's own fixture as template-generated,
    * which is true. The spec plants a freq ~ 3000/rank corpus and pins
    * that the fit recovers the exponent. */
  /** t39's fit, factored for the spec's planted-exponent recovery check:
    * `counts(w, cnt)` -> one-row (n, vocab, slope, intercept, r2,
    * zipf_like). */
  private[graft] def zipfFit(counts: DataFrame): DataFrame = {
      val vocab = counts.agg(count(lit(1)).as("v")).head().getLong(0)
      val top = counts
        .groupBy(lit(0).as("__g"))
        .agg(graft.functions.TopK.topKPairs(
          col("cnt").cast("long"), xxhash64(col("w")), 1000).as("__top"))
        .select(posexplode(col("__top")).as(Seq("__pos", "__p")))
        .select(
          round(log10((col("__pos") + 1).cast("double")) * 1e6).cast("long")
            .as("x"),
          round(log10(col("__p.sort_key").cast("double")) * 1e6).cast("long")
            .as("y"))
      val sums = top.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      // the cross terms (n*sxy, sx*sy ~ 8.6e18 on a 250k-token corpus) sit
      // at the BIGINT overflow edge and grow past it with the corpus —
      // every product is computed in double (identically ordered in both
      // engines), only the SUMS are exact longs
      def d(c: Column): Column = c.cast("double")
      sums.select(col("n"), lit(vocab).as("vocab"),
          ((d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
            (d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))))
            .as("b"),
          ((d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) *
            (d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
            ((d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
             (d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy")))))
            .as("r2raw"),
          (d(col("sy")) / col("n") / 1e6).as("my"),
          (d(col("sx")) / col("n") / 1e6).as("mx"))
        .select(col("n"), col("vocab"),
          round(col("b"), 6).as("slope"),
          round(col("my") - col("b") * col("mx"), 6).as("intercept"),
          round(col("r2raw"), 6).as("r2"))
        .withColumn("zipf_like", col("slope") < -0.3 && col("slope") > -2.0)
  }

  private val tZipf = Q(
    "t39_zipf_fit",
    (s, dir) =>
      zipfFit(Tables.documents(s, dir)
        .select(explode(toks).as("w")).filter(col("w") =!= "")
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))),
    Some("""WITH counts AS (
        SELECT w, count(*) AS cnt FROM (
          SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
        WHERE w <> '' GROUP BY w),
      vocab AS (SELECT count(*) AS v FROM counts),
      top AS (
        SELECT CAST(round(log10(CAST(rnk AS DOUBLE)) * 1e6) AS BIGINT) AS x,
          CAST(round(log10(CAST(cnt AS DOUBLE)) * 1e6) AS BIGINT) AS y
        FROM (
          SELECT cnt, row_number() OVER (ORDER BY cnt DESC, w) AS rnk
          FROM counts) t
        WHERE rnk <= 1000),
      sums AS (
        SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
          CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * x) AS BIGINT) AS sxx,
          CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(y * y) AS BIGINT) AS syy
        FROM top),
      fit AS (
        SELECT n, (SELECT v FROM vocab) AS vocab,
          (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
            (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
          (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) *
          (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
            ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
             (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r2raw,
          CAST(sy AS DOUBLE) / n / 1e6 AS my,
          CAST(sx AS DOUBLE) / n / 1e6 AS mx
        FROM sums)
      SELECT n, CAST(vocab AS BIGINT) AS vocab, round(b, 6) AS slope,
        round(my - b * mx, 6) AS intercept, round(r2raw, 6) AS r2,
        (round(b, 6) < -0.3 AND round(b, 6) > -2.0) AS zipf_like
      FROM fit"""))

  // ---------------------------------------------------------------- t40
  /** INTERPOLATED KNESER-NEY BIGRAM LM (Kneser & Ney '95; Chen & Goodman
    * '99 §2.7, the empirically-best classical smoother and the one KenLM
    * ships as its default) — the discount-and-continuation counterpart to
    * t24's stupid backoff:
    *
    *   P_KN(w2|w1) = max(c(w1 w2) − D, 0)/c(w1·)
    *               + D·N1+(w1 ·)/c(w1·) · Pcont(w2),
    *   Pcont(w2)   = (N1+(· w2) + ½) / (N1+(· ·) + ½·V)
    *
    * with D = 0.75 and the ½-smoothed continuation floor keeping unseen
    * test words finite (the same open-base-case treatment as t24);
    * positions whose CONTEXT is unseen fall back to Pcont alone. The key
    * Kneser-Ney idea is visible in the counts: the unigram-level
    * probability is how many distinct contexts a word FOLLOWS (N1+(·w2)),
    * not how often it occurs — "Francisco" is frequent but follows only
    * "San", so its continuation mass is tiny.
    *
    * Trains on the even-doc_id half, scores the held-out odd half.
    * Cross-engine determinism: every tier is left-associated double
    * arithmetic on exact integer counts through one log10, micro-rounded
    * per position and summed as exact longs (the t15/t21/t24 pattern —
    * aggregation order cannot move a bit).
    *
    * Scale shape: one grouped bigram count over the training half (c1,
    * N1+fwd, N1+rev all derive from c2 by further map-side-combined
    * GROUPed aggregations — no second corpus pass); the held-out bigram
    * table left-joins the count tables on gram keys; the (N1+tot, V)
    * scalars ride a broadcast. No window, no self-join. */
  private val tKneserNey = Q(
    "t40_kneser_ney",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      def bigrams(df: DataFrame): DataFrame = df
        .select(col("doc_id"), toks.as("tk"))
        .select(col("doc_id"),
          slice(col("tk"), lit(1), greatest(size(col("tk")) - 1, lit(0))).as("s0"),
          slice(col("tk"), lit(2), greatest(size(col("tk")) - 1, lit(0))).as("s1"))
        .select(col("doc_id"), explode(arrays_zip(col("s0"), col("s1"))).as("g"))
        .select(col("doc_id"), col("g.s0").as("w1"), col("g.s1").as("w2"))
      val train = docs.filter(col("doc_id") % 2 === 0)
      val test = docs.filter(col("doc_id") % 2 === 1)
      val c2 = bigrams(train).groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      val ctx = c2.groupBy("w1")
        .agg(sum(col("c2")).as("c1"), count(lit(1)).as("n1fwd"))
      val rev = c2.groupBy("w2").agg(count(lit(1)).as("n1rev"))
      val tot = c2.agg(count(lit(1)).as("n1tot")).crossJoin(
        train.select(explode(toks).as("w")).distinct()
          .agg(count(lit(1)).as("v")))
      val pcont = (coalesce(col("n1rev"), lit(0L)) + lit(0.5)) /
        (col("n1tot") + lit(0.5) * col("v"))
      val scored = bigrams(test)
        .join(c2, Seq("w1", "w2"), "left")
        .join(ctx, Seq("w1"), "left")
        .join(rev, Seq("w2"), "left")
        .crossJoin(broadcast(tot))
        .select(col("doc_id"),
          round(log10(
            when(col("c1").isNotNull,
              greatest(coalesce(col("c2"), lit(0L)) - lit(0.75), lit(0.0)) / col("c1")
                + lit(0.75) * col("n1fwd") / col("c1") * pcont)
              .otherwise(pcont)) * 1e6)
            .cast("long").as("lp_micro"),
          when(col("c1").isNull, lit(1L)).otherwise(lit(0L)).as("bo"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_scored"), sum(col("lp_micro")).as("sm"),
          sum(col("bo")).as("n_backoff"))
        .select(col("doc_id"), col("n_scored"), col("n_backoff"),
          round(col("sm").cast("double") / col("n_scored") / 1e6, 6)
            .as("avg_kn_logprob10"))
      test.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_scored"), lit(0L)).as("n_scored"),
          coalesce(col("n_backoff"), lit(0L)).as("n_backoff"),
          col("avg_kn_logprob10"))
    },
    Some("""WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      bi2 AS (
        SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2 FROM (
          SELECT doc_id, tk,
            unnest(range(1, CAST(greatest(len(tk) - 1, 0) AS BIGINT) + 1)) AS i
          FROM toks) t),
      c2 AS (SELECT w1, w2, count(*) AS c2 FROM bi2
        WHERE doc_id % 2 = 0 GROUP BY w1, w2),
      ctx AS (SELECT w1, sum(c2) AS c1, count(*) AS n1fwd FROM c2 GROUP BY w1),
      rev AS (SELECT w2, count(*) AS n1rev FROM c2 GROUP BY w2),
      tot AS (SELECT (SELECT count(*) FROM c2) AS n1tot,
        (SELECT count(DISTINCT w) FROM (
          SELECT unnest(tk) AS w FROM toks WHERE doc_id % 2 = 0)) AS v),
      pos AS (
        SELECT b.doc_id, CAST(round(log10(
            CASE WHEN k.c1 IS NOT NULL THEN
              greatest(coalesce(g.c2, 0) - CAST(0.75 AS DOUBLE), CAST(0.0 AS DOUBLE)) / k.c1
                + CAST(0.75 AS DOUBLE) * k.n1fwd / k.c1
                  * ((coalesce(r.n1rev, 0) + CAST(0.5 AS DOUBLE)) / (t.n1tot + CAST(0.5 AS DOUBLE) * t.v))
            ELSE (coalesce(r.n1rev, 0) + CAST(0.5 AS DOUBLE)) / (t.n1tot + CAST(0.5 AS DOUBLE) * t.v)
            END) * 1e6) AS BIGINT) AS lp_micro,
          CASE WHEN k.c1 IS NULL THEN 1 ELSE 0 END AS bo
        FROM bi2 b
        LEFT JOIN c2 g ON b.w1 = g.w1 AND b.w2 = g.w2
        LEFT JOIN ctx k ON b.w1 = k.w1
        LEFT JOIN rev r ON b.w2 = r.w2
        CROSS JOIN tot t
        WHERE b.doc_id % 2 = 1),
      scored AS (
        SELECT doc_id, count(*) AS n_scored, CAST(sum(bo) AS BIGINT) AS n_backoff,
          round(CAST(sum(lp_micro) AS DOUBLE) / count(*) / 1e6, 6) AS avg_kn_logprob10
        FROM pos GROUP BY doc_id)
      SELECT d.doc_id, CAST(coalesce(s.n_scored, 0) AS BIGINT) AS n_scored,
        CAST(coalesce(s.n_backoff, 0) AS BIGINT) AS n_backoff,
        s.avg_kn_logprob10
      FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
      WHERE d.doc_id % 2 = 1"""))

  // ---------------------------------------------------------------- t35
  /** READABILITY SCORING (Flesch 1948 reading ease; Kincaid 1975 grade
    * level — the classic text-quality features corpus filters and
    * difficulty-bucketing pipelines compute; backfills the t35 slot the
    * r12 numbering skipped): per doc, sentences = terminal-punctuation
    * count ([.!?], floored at 1), words = whitespace tokens, syllables =
    * vowel-group count over the lowercased text (the standard heuristic —
    * consecutive [aeiouy] runs collapse to one nucleus); then
    * FRE = 206.835 − 1.015·(W/S) − 84.6·(Syl/W) and
    * FKGL = 0.39·(W/S) + 11.8·(Syl/W) − 15.59, aggregated per source.
    *
    * All row-local regex/arith (codegen-friendly, no shuffle before the
    * per-source agg); the per-doc scores are pure rational arithmetic on
    * integer counts — bit-identical cross-engine — and land as exact
    * ×1e6 Longs so the per-source means are order-independent. */
  private val tReadability = Q(
    "t35_readability",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val nSent = greatest(
        length(regexp_replace(col("text"), "[^.!?]", "")), lit(1))
      val nWords = size(toks)
      val nSyl = length(regexp_replace(
        regexp_replace(lower(col("text")), "[aeiouy]+", "V"), "[^V]", ""))
      def micro(c: Column) = round(c * 1e6).cast("long")
      val scored = docs.select(col("source"),
        micro(lit(206.835)
          - lit(1.015) * nWords.cast("double") / nSent.cast("double")
          - lit(84.6) * nSyl.cast("double") / nWords.cast("double"))
          .as("fre_m"),
        micro(lit(0.39) * nWords.cast("double") / nSent.cast("double")
          + lit(11.8) * nSyl.cast("double") / nWords.cast("double")
          - lit(15.59)).as("fkgl_m"),
        when(lit(206.835)
          - lit(1.015) * nWords.cast("double") / nSent.cast("double")
          - lit(84.6) * nSyl.cast("double") / nWords.cast("double") > 60.0,
          1L).otherwise(0L).as("easy"))
      scored.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        round(sum(col("fre_m")).cast("double") / count(lit(1)) / 1e6, 6)
          .as("avg_flesch_ease"),
        round(sum(col("fkgl_m")).cast("double") / count(lit(1)) / 1e6, 6)
          .as("avg_fk_grade"),
        sum(col("easy")).as("n_easy_docs"))
    },
    Some("""WITH d AS (
        SELECT source,
          greatest(length(regexp_replace(text, '[^.!?]', '', 'g')), 1) AS ns,
          len(string_split(text, ' ')) AS nw,
          length(regexp_replace(
            regexp_replace(lower(text), '[aeiouy]+', 'V', 'g'),
            '[^V]', '', 'g')) AS nsyl
        FROM documents),
      sc AS (SELECT source,
          CAST(round((206.835 - 1.015 * CAST(nw AS DOUBLE) / ns
            - 84.6 * CAST(nsyl AS DOUBLE) / nw) * 1e6) AS BIGINT) AS fre_m,
          CAST(round((0.39 * CAST(nw AS DOUBLE) / ns
            + 11.8 * CAST(nsyl AS DOUBLE) / nw - 15.59) * 1e6) AS BIGINT)
            AS fkgl_m,
          CASE WHEN 206.835 - 1.015 * CAST(nw AS DOUBLE) / ns
            - 84.6 * CAST(nsyl AS DOUBLE) / nw > 60.0 THEN 1 ELSE 0 END
            AS easy
        FROM d)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        round(CAST(sum(fre_m) AS DOUBLE) / count(*) / 1e6, 6)
          AS avg_flesch_ease,
        round(CAST(sum(fkgl_m) AS DOUBLE) / count(*) / 1e6, 6)
          AS avg_fk_grade,
        CAST(sum(easy) AS BIGINT) AS n_easy_docs
      FROM sc GROUP BY source"""))

  // ---------------------------------------------------------------- t41
  /** ROUGE-N + BLEU REFERENCE-OVERLAP EVAL (Lin 2004 "ROUGE"; Papineni et
    * al. 2002 "BLEU"; Lin & Och 2004 for the +1 smoothing — all public):
    * the n-gram-overlap metric family every generation eval harness and
    * many decontamination scorers run. Each document is scored as the
    * CANDIDATE against the next document of the same source as the
    * REFERENCE (a deterministic pairing with real shared vocabulary —
    * same-source docs share templates). Per pair: clipped n-gram overlap
    * o_n = Σ_g min(cnt_cand(g), cnt_ref(g)) for n = 1, 2; ROUGE-N F1
    * = 2·o_n / (len_c + len_r); BLEU-2 = BP · √(p1·p2) with +1-smoothed
    * precisions p_n = (o_n+1)/(len_cn+1) and brevity penalty
    * BP = min(1, e^(1−len_r/len_c)).
    *
    * Scale shape: per-doc n-gram count tables (one explode + grouped
    * count each), then the clipped overlap is TWO equi-joins — pair keys
    * fan candidate counts onto reference counts and a grouped sum takes
    * the min — never a per-pair cross of token lists; at 100 TB the
    * count tables partition by doc and the joins co-partition on the
    * pair key. Per-pair metrics land as exact fixed-point Longs (the t40
    * discipline: ×1e6 for the rational ROUGE values, ×1e4 for BLEU whose
    * exp/sqrt carry last-ulp cross-engine risk) so the per-source means
    * are order-independent bit-exact across engines. */
  private val tRougeBleu = Q(
    "t41_rouge_bleu",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), toks.as("tk"))
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      val pairs = docs
        .withColumn("rid", lead(col("doc_id"), 1).over(w))
        .filter(col("rid").isNotNull)
        .select(col("source"), col("doc_id").as("cid"), col("rid"))
      def uniCounts(df: DataFrame): DataFrame = df
        .select(col("doc_id"), explode(col("tk")).as("t"))
        .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
      def bigCounts(df: DataFrame): DataFrame = df
        .select(col("doc_id"),
          slice(col("tk"), lit(1), greatest(size(col("tk")) - 1, lit(0))).as("s0"),
          slice(col("tk"), lit(2), greatest(size(col("tk")) - 1, lit(0))).as("s1"))
        .select(col("doc_id"), explode(arrays_zip(col("s0"), col("s1"))).as("g"))
        .select(col("doc_id"),
          concat_ws(" ", col("g.s0"), col("g.s1")).as("t"))
        .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
      def clipped(cnt: DataFrame): DataFrame = pairs
        .join(cnt.toDF("cid", "t", "cc"), Seq("cid"))
        .join(cnt.toDF("rid", "t", "rc"), Seq("rid", "t"))
        .groupBy(col("cid")).agg(sum(least(col("cc"), col("rc"))).as("o"))
      val lens = docs.select(col("doc_id"),
        size(col("tk")).cast("long").as("l1"),
        greatest(size(col("tk")) - 1, lit(0)).cast("long").as("l2"))
      val pj = pairs
        .join(lens.toDF("cid", "lc1", "lc2"), Seq("cid"))
        .join(lens.toDF("rid", "lr1", "lr2"), Seq("rid"))
        .join(clipped(uniCounts(docs)).toDF("cid", "o1"), Seq("cid"), "left")
        .join(clipped(bigCounts(docs)).toDF("cid", "o2"), Seq("cid"), "left")
        .select(col("source"),
          coalesce(col("o1"), lit(0L)).as("o1"),
          coalesce(col("o2"), lit(0L)).as("o2"),
          col("lc1"), col("lc2"), col("lr1"), col("lr2"))
      def micro(c: org.apache.spark.sql.Column) =
        round(c * 1e6).cast("long")
      val scored = pj.select(col("source"),
        micro(lit(2.0) * col("o1") / (col("lc1") + col("lr1"))).as("r1m"),
        micro(when(col("lc2") + col("lr2") > 0,
          lit(2.0) * col("o2") / (col("lc2") + col("lr2")))
          .otherwise(lit(0.0))).as("r2m"),
        // BLEU carries exp+sqrt — the one cross-engine ulp hazard here —
        // so its per-row grid is 1e4, coarse enough that a last-ulp
        // difference cannot straddle a rounding boundary (measured: the
        // 1e6 grid DID hit one at sf0.001); the rational ROUGE values
        // are bit-identical across engines and keep the 1e6 grid
        round(least(lit(1.0),
            exp(lit(1.0) - col("lr1").cast("double") / col("lc1")))
          * sqrt(((col("o1") + lit(1.0)) / (col("lc1") + lit(1.0)))
            * ((col("o2") + lit(1.0)) / (col("lc2") + lit(1.0)))) * 1e4)
          .cast("long").as("b2m"))
      scored.groupBy(col("source")).agg(
        count(lit(1)).as("n_pairs"),
        round(sum(col("r1m")).cast("double") / count(lit(1)) / 1e6, 6)
          .as("avg_rouge1_f1"),
        round(sum(col("r2m")).cast("double") / count(lit(1)) / 1e6, 6)
          .as("avg_rouge2_f1"),
        round(sum(col("b2m")).cast("double") / count(lit(1)) / 1e4, 6)
          .as("avg_bleu2"))
    },
    Some("""WITH d AS (
        SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents),
      p AS (SELECT * FROM (
          SELECT source, doc_id AS cid,
            lead(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS rid
          FROM d) x WHERE rid IS NOT NULL),
      u AS (SELECT doc_id, t, count(*) AS c FROM (
          SELECT doc_id, unnest(tk) AS t FROM d) x GROUP BY doc_id, t),
      b AS (SELECT doc_id, t, count(*) AS c FROM (
          SELECT doc_id, tk[i] || ' ' || tk[i + 1] AS t FROM (
            SELECT doc_id, tk,
              unnest(range(1, CAST(greatest(len(tk) - 1, 0) AS BIGINT) + 1)) AS i
            FROM d) y) x GROUP BY doc_id, t),
      l AS (SELECT doc_id, len(tk) AS l1,
          greatest(len(tk) - 1, 0) AS l2 FROM d),
      o1 AS (SELECT p.cid, sum(least(cu.c, ru.c)) AS o FROM p
        JOIN u cu ON cu.doc_id = p.cid
        JOIN u ru ON ru.doc_id = p.rid AND ru.t = cu.t
        GROUP BY p.cid),
      o2 AS (SELECT p.cid, sum(least(cb.c, rb.c)) AS o FROM p
        JOIN b cb ON cb.doc_id = p.cid
        JOIN b rb ON rb.doc_id = p.rid AND rb.t = cb.t
        GROUP BY p.cid),
      sc AS (SELECT p.source,
          CAST(round(2.0 * coalesce(o1.o, 0) / (lc.l1 + lr.l1) * 1e6) AS BIGINT)
            AS r1m,
          CAST(round(CASE WHEN lc.l2 + lr.l2 > 0
            THEN 2.0 * coalesce(o2.o, 0) / (lc.l2 + lr.l2) ELSE 0.0 END * 1e6)
            AS BIGINT) AS r2m,
          CAST(round(least(1.0, exp(1.0 - CAST(lr.l1 AS DOUBLE) / lc.l1))
            * sqrt(((coalesce(o1.o, 0) + 1.0) / (lc.l1 + 1.0))
              * ((coalesce(o2.o, 0) + 1.0) / (lc.l2 + 1.0))) * 1e4) AS BIGINT)
            AS b2m
        FROM p
        JOIN l lc ON lc.doc_id = p.cid
        JOIN l lr ON lr.doc_id = p.rid
        LEFT JOIN o1 ON o1.cid = p.cid
        LEFT JOIN o2 ON o2.cid = p.cid)
      SELECT source, CAST(count(*) AS BIGINT) AS n_pairs,
        round(CAST(sum(r1m) AS DOUBLE) / count(*) / 1e6, 6) AS avg_rouge1_f1,
        round(CAST(sum(r2m) AS DOUBLE) / count(*) / 1e6, 6) AS avg_rouge2_f1,
        round(CAST(sum(b2m) AS DOUBLE) / count(*) / 1e4, 6) AS avg_bleu2
      FROM sc GROUP BY source"""))

  // ---------------------------------------------------------------- t42
  /** WORDPIECE MERGE-TABLE LEARNING (Schuster & Nakajima 2012; the BERT
    * tokenizer's trainer — completing the tokenizer-family triad next to
    * BPE (t16, frequency-greedy) and unigram-LM (t28/t29, prune-by-
    * likelihood)): same corpus-once-then-vocab-only loop as t16, but each
    * round merges the pair maximizing the LIKELIHOOD ratio
    * score(a,b) = count(ab) / (count(a)·count(b)) instead of the raw
    * pair count — WordPiece prefers merging symbols that almost always
    * co-occur even when rare, where BPE chases frequency (the spec plants
    * a vocabulary where the two demonstrably pick different first
    * merges). Per round: the t16 adjacent-pair count PLUS one symbol
    * occurrence count, two broadcast-sized joins, a 1-row argmax with
    * (score desc, l, r) tie-break, and the SAME greedy fold
    * ([[bpeApplyMerge]]) applying the merge.
    *
    * Cross-engine exactness: pair and symbol counts are exact longs; the
    * score is ONE division of exact-integer-derived doubles —
    * `wt / CAST(wl*wr AS DOUBLE)` with the product taken in exact long
    * space first (<= (corpus tokens)^2 << 2^63) — and IEEE division is
    * correctly rounded in both engines, so the argmax keys are
    * bit-identical and ties fall to the identical (l, r) order. Rounds
    * mirrored CTE-for-CTE (the t16 template with a scored best-CTE).
    *
    * Scale shape: identical to t16 — the corpus is read once into the
    * word-frequency table; each of the production run's 30k rounds costs
    * two map-side-combined aggs over the vocab plus two joins against a
    * symbol table bounded by |alphabet| + round count. */
  private[graft] val nWordpieceMerges = 16

  private[graft] def wordpieceLearn(docs: DataFrame, n: Int)
      : Seq[(Long, String, String, Long, Long, Long)] = {
    var state = bpeState0(docs).localCheckpoint(true)
    val merges =
      scala.collection.mutable.ArrayBuffer[(Long, String, String, Long, Long, Long)]()
    var step = 1
    var exhausted = false
    while (step <= n && !exhausted) {
      val syms = split(col("s"), " ")
      val symCounts = state
        .select(col("cnt"), explode(syms).as("x"))
        .groupBy(col("x")).agg(sum(col("cnt")).as("swt"))
      val pairs = state
        .filter(size(syms) > 1)
        .select(col("cnt"), explode(transform(sequence(lit(1), size(syms) - 1),
          i => struct(element_at(syms, i).as("l"),
            element_at(syms, i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("wt"))
      val scored = pairs
        .join(symCounts.select(col("x").as("l"), col("swt").as("wl")), Seq("l"))
        .join(symCounts.select(col("x").as("r"), col("swt").as("wr")), Seq("r"))
        .withColumn("score",
          col("wt").cast("double") / (col("wl") * col("wr")).cast("double"))
      scored.orderBy(col("score").desc, col("l"), col("r")).limit(1)
        .collect().headOption match {
        case None => exhausted = true
        case Some(best) =>
          val (l, r) = (best.getAs[String]("l"), best.getAs[String]("r"))
          merges += ((step.toLong, l, r, best.getAs[Long]("wt"),
            best.getAs[Long]("wl"), best.getAs[Long]("wr")))
          val prev = state
          state = state.withColumn("s", bpeApplyMerge(col("s"), l, r))
            .localCheckpoint(true)
          prev.unpersist(false)
          step += 1
      }
    }
    state.unpersist(false)
    merges.toSeq
  }

  private def wordpieceOracleRound(i: Int): String = {
    val prev = s"wstate${i - 1}"
    s"""wsym$i AS (
        SELECT x, CAST(sum(cnt) AS BIGINT) AS swt FROM (
          SELECT cnt, unnest(string_split(s, ' ')) AS x FROM $prev)
        GROUP BY x),
      wpairs$i AS (
        SELECT p.l AS l, p.r AS r, CAST(sum(cnt) AS BIGINT) AS wt FROM (
          SELECT cnt, unnest(list_transform(range(1, len(syms)),
            k -> struct_pack(l := syms[k], r := syms[k + 1]))) AS p
          FROM (SELECT cnt, string_split(s, ' ') AS syms FROM $prev))
        GROUP BY p.l, p.r),
      wbest$i AS MATERIALIZED (
        SELECT p.l, p.r, p.wt, a.swt AS wl, b.swt AS wr
        FROM wpairs$i p JOIN wsym$i a ON a.x = p.l JOIN wsym$i b ON b.x = p.r
        ORDER BY CAST(p.wt AS DOUBLE) / CAST(a.swt * b.swt AS DOUBLE) DESC,
          p.l, p.r
        LIMIT 1),
      wstate$i AS MATERIALIZED (
        SELECT w, cnt, list_reduce(string_split(s, ' '), (acc, x) ->
          CASE WHEN (acc = b.l OR ends_with(acc, ' ' || b.l)) AND x = b.r
               THEN acc || x ELSE acc || ' ' || x END) AS s
        FROM $prev, wbest$i b)"""
  }

  private val tWordpiece = Q(
    "t42_wordpiece_merges",
    (s, dir) => {
      import s.implicits._
      wordpieceLearn(Tables.documents(s, dir), nWordpieceMerges)
        .toDF("step", "lhs", "rhs", "pair_count", "lhs_count", "rhs_count")
    },
    Some {
      val rounds =
        (1 to nWordpieceMerges).map(wordpieceOracleRound).mkString(",\n      ")
      val out = (1 to nWordpieceMerges).map(i =>
        s"""SELECT CAST($i AS BIGINT) AS step, l AS lhs, r AS rhs,
          wt AS pair_count, wl AS lhs_count, wr AS rhs_count FROM wbest$i""")
        .mkString("\n      UNION ALL ")
      s"""WITH vocab AS (
        SELECT w, count(*) AS cnt FROM (
          SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
        WHERE w <> '' GROUP BY w),
      wstate0 AS MATERIALIZED (
        SELECT w, cnt, array_to_string(list_transform(range(1, len(w) + 1),
          i -> w[i:i]), ' ') AS s FROM vocab),
      $rounds
      $out"""
    })

  val all: Seq[Q] =
    Seq(tTokens, tWordFreq, tQuality, tFingerprint, tLangId, tScaleCoo, tTfIdf,
      tRepetition, tPii, tPack, tChunk, tFilter, tRegexTokens, tSourceMix,
      tUnigramLp, tBpe, tBpeApply, tGopher, tTemperature, tGopherRep, tBigramLp,
      tCcnetBuckets, tDsir, tStupidBackoff, tSplit, tNaiveBayes, tFertility,
      tUgTrain, tUgApply, tUgSoft, tLrQuality, tLrAuc, tTokPersist, tLrPersist,
      tCalibration, tDistinctN, tCharEntropy, tZipf, tKneserNey, tRougeBleu,
      tReadability, tWordpiece)
}
