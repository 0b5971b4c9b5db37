package graft.operators

import graft.{QueryModule, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` — the training-data-pipeline
  * extension tier (BASELINE.json north_star): token counting, quality
  * scoring, language-ID heuristic, document fingerprinting.
  *
  * All are single-pass, shuffle-free map operations over the scan (verify
  * with .explain: one WholeStageCodegen over the parquet scan, no
  * Exchange) — exactly the shape that scales to 100 TB: cost is O(bytes
  * scanned), embarrassingly parallel, no skew sensitivity.
  *
  * Fingerprints use md5 (bit-stable across engines) rather than engine
  * hashes, so they are oracle-verifiable; the MinHash pipeline in
  * Dedup.scala uses xxhash64 where cross-engine stability isn't needed.
  */
object TextAnalysis extends QueryModule {

  private val stopwords = Seq("the", "a")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // token + char counting
    "t_tokens" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_tokens"),
          length(col("text")).cast("long").as("len_chars"),
          col("n_chars"))
        .orderBy("doc_id")),

    // quality scoring: word stats + stopword ratio
    "t_quality" -> ((s, d) => {
      val toks = tokens(col("text"))
      val nTok = size(toks).cast("long")
      val stops = size(filter(toks, t => t.isin(stopwords: _*))).cast("long")
      Tables.documents(s, d)
        .select(col("doc_id"),
          nTok.as("n_tokens"),
          stops.as("n_stopwords"),
          (stops.cast("double") / nTok).as("stopword_ratio"),
          ((length(col("text")).cast("long") - (nTok - 1)).cast("double") / nTok)
            .as("avg_word_len"))
        .orderBy("doc_id")
    }),

    // language-ID heuristic: stopword-hit based n-gram scoring
    "t_langid" -> ((s, d) => {
      val toks = tokens(col("text"))
      val hits = size(filter(toks, t => t.isin(stopwords: _*))).cast("long")
      val nTok = size(toks).cast("long")
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), hits.as("en_hits"),
          when(hits * 20 >= nTok, "en")
            .when(hits > 0, "en_low")
            .otherwise("unk").as("lang_guess"))
        .orderBy("doc_id")
    }),

    // BPE-ish regex tokenization (robust to punctuation/whitespace runs)
    "t_tokens_bpe" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(tokensWs(col("text"))).cast("long").as("n_tokens_ws"),
          size(array_distinct(tokensWs(col("text")))).cast("long")
            .as("n_unique_ws"))
        .orderBy("doc_id")),

    // winnowing-style rolling-hash fingerprint (native RollingMinHash
    // expression; shift-stable local fingerprint). Rows-only: the
    // Karp-Rabin constants are engine-internal; TextSpec pins semantics.
    "t_fingerprint_roll" -> ((s, d) => {
      import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
      Tables.documents(s, d)
        .select(col("doc_id"),
          column(graft.functions.RollingMinHash(expression(col("text")), 16))
            .as("fp_roll16"))
        .orderBy("doc_id")
    }),

    // document fingerprinting: whole-doc, prefix, and min-word-hash
    // (md5-based so the oracle can reproduce it bit-for-bit)
    "t_fingerprint" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(col("text")).as("fp_doc"),
          md5(substring(col("text"), 1, 64)).as("fp_prefix"),
          array_min(transform(tokens(col("text")), w => md5(w)))
            .as("fp_minword"))
        .orderBy("doc_id")))

  private val stopList = stopwords.map(s => s"'$s'").mkString("[", ",", "]")

  def oracles: Map[String, String] = Map(
    "t_tokens" ->
      """SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |  CAST(length(text) AS BIGINT) AS len_chars, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t_quality" ->
      s"""WITH t AS (SELECT doc_id,
         |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
         |  CAST(len(list_filter(string_split(text,' '),
         |    x -> list_contains($stopList, x))) AS BIGINT) AS n_stopwords,
         |  CAST(length(text) AS BIGINT) AS n_ch
         |FROM documents)
         |SELECT doc_id, n_tokens, n_stopwords,
         |  CAST(n_stopwords AS DOUBLE) / n_tokens AS stopword_ratio,
         |  CAST(n_ch - (n_tokens - 1) AS DOUBLE) / n_tokens AS avg_word_len
         |FROM t ORDER BY doc_id""".stripMargin,
    "t_langid" ->
      s"""WITH t AS (SELECT doc_id, lang,
         |  CAST(len(list_filter(string_split(text,' '),
         |    x -> list_contains($stopList, x))) AS BIGINT) AS en_hits,
         |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens
         |FROM documents)
         |SELECT doc_id, lang, en_hits,
         |  CASE WHEN en_hits * 20 >= n_tokens THEN 'en'
         |       WHEN en_hits > 0 THEN 'en_low' ELSE 'unk' END AS lang_guess
         |FROM t ORDER BY doc_id""".stripMargin,
    "t_tokens_bpe" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(text, '\W+'),
        |    x -> len(x) > 0)) AS BIGINT) AS n_tokens_ws,
        |  CAST(len(list_distinct(list_filter(string_split_regex(text, '\W+'),
        |    x -> len(x) > 0))) AS BIGINT) AS n_unique_ws
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp_doc,
        |  md5(substr(text, 1, 64)) AS fp_prefix,
        |  list_min(list_transform(string_split(text,' '), w -> md5(w)))
        |    AS fp_minword
        |FROM documents ORDER BY doc_id""".stripMargin)
}
