package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  val all: Seq[Q] =
    Seq(tTokens, tWordFreq, tQuality, tFingerprint, tLangId, tScaleCoo, tTfIdf)
}
