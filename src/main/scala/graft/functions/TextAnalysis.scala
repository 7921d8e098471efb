package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.IO

/** Text-analysis operators over the `documents` table: token counting,
  * quality scoring, language identification, and document fingerprinting.
  * Everything is built from codegen'd Catalyst expressions (split/filter/
  * transform/aggregate, xxhash64/md5) — no UDFs in the hot path, so the
  * whole stage stays inside WholeStageCodegen and scales linearly with
  * input splits.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def wsTokens(text: Column): Column = split(text, "\\s+")

  /** BPE-ish subword-ish tokens: maximal runs of letters/digits plus single
    * punctuation marks (a regex stand-in for a real byte-pair vocabulary).
    */
  def regexTokens(text: Column): Column =
    expr(s"regexp_extract_all(${text.toString}, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\\\s]', 0)")

  /** Token counting: whitespace tokens and regex tokens side by side. */
  def tokenCounts(spark: SparkSession, sfDir: String): DataFrame =
    IO.table(spark, sfDir, "documents")
      .select(
        col("doc_id"),
        size(wsTokens(col("text"))).cast("long").as("n_ws_tokens"),
        size(expr("regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\\\s]', 0)"))
          .cast("long").as("n_regex_tokens"),
        col("n_chars"))
      .orderBy("doc_id")

  private val StopwordsEn = Seq(
    "the", "a", "of", "and", "to", "in", "is", "it", "for", "on", "with")

  /** Quality scoring: mean token length, stopword ratio, alphabetic ratio,
    * and a blended [0,1] quality score (long-token-heavy, stopword-poor
    * text scores low — the usual cheap pretraining-corpus heuristics).
    */
  def qualityScores(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = col("toks")
    val nTok = size(toks).cast("double")
    val stopHits = size(filter(toks,
      t => t.isInCollection(StopwordsEn))).cast("double")
    val alphaChars = length(regexp_replace(col("text"), "[^a-zA-Z]", ""))
      .cast("double")
    IO.table(spark, sfDir, "documents")
      .withColumn("toks", wsTokens(col("text")))
      .select(
        col("doc_id"),
        (col("n_chars").cast("double") / nTok).as("mean_token_len"),
        (stopHits / nTok).as("stopword_ratio"),
        (alphaChars / col("n_chars").cast("double")).as("alpha_ratio"),
        least(
          lit(1.0),
          (stopHits / nTok) * 2.0
            + when(col("n_chars") >= 100 && col("n_chars") <= 10000, 0.5)
              .otherwise(0.0)).as("quality_score"))
      .orderBy("doc_id")
  }

  /** Tiny per-language stopword lists for the n-gram/stopword-overlap
    * language-ID heuristic.
    */
  private val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "pour"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "para"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  /** Language ID: argmax over per-language stopword hit counts; ties and
    * zero-evidence documents fall back to "und" (undetermined). Returns the
    * prediction next to the table's labelled lang for eyeballing accuracy.
    */
  def languageId(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = col("toks")
    val scored = LangStopwords.map { case (lang, words) =>
      struct(size(filter(toks, t => t.isInCollection(words))).as("hits"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    IO.table(spark, sfDir, "documents")
      .withColumn("toks", wsTokens(lower(col("text"))))
      .select(
        col("doc_id"),
        when(best.getField("hits") > 0, best.getField("lang"))
          .otherwise(lit("und")).as("predicted_lang"),
        col("lang").as("labelled_lang"))
      .orderBy("doc_id")
  }

  /** Document fingerprints: a cryptographic content id (md5), a cheap
    * 64-bit content id (xxhash64), and a winnowing-style robust fingerprint
    * (min xxhash64 over 5-word rolling shingles — stable under small edits
    * outside the minimal shingle).
    */
  def fingerprints(spark: SparkSession, sfDir: String): DataFrame =
    IO.table(spark, sfDir, "documents")
      .withColumn("toks", wsTokens(col("text")))
      .select(
        col("doc_id"),
        md5(col("text").cast("binary")).as("fp_md5"),
        xxhash64(col("text")).as("fp_xx64"),
        expr("""array_min(transform(
                  sequence(0, greatest(size(toks) - 5, 0)),
                  i -> xxhash64(concat_ws(' ', slice(toks, i + 1, 5)))))""")
          .as("fp_rolling_min"))
      .orderBy("doc_id")
}
