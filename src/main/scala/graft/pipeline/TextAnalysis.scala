package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: token counting,
  * quality scoring, language-ID heuristics, and content fingerprinting.
  * All pure Catalyst column expressions — no UDFs, fully codegen'd, and
  * reproducible in the DuckDB oracle.
  */
object TextAnalysis {

  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that")

  def tokens(text: Column): Column = split(text, " ")

  /** Token/char counts + a BPE-ish subword estimate (≈ chars/4 is the
    * standard heuristic for byte-pair encodings). */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      length(col("text")).as("n_chars"),
      size(tokens(col("text"))).as("n_tokens"),
      size(array_distinct(tokens(col("text")))).as("n_distinct_tokens"),
      (length(col("text")) / lit(4)).cast("long").as("est_bpe_tokens"))

  /** Quality score: mean token length, type-token ratio, stopword
    * ratio, repetition (1 - distinct/total). Deterministic rational
    * arithmetic + one rounded double. */
  def qualityScores(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks, t => t.isInCollection(stopwords))).cast("double")
    val nDistinct = size(array_distinct(toks)).cast("double")
    docs.select(col("doc_id"),
      round(length(col("text")).cast("double") / nTok, 4).as("mean_token_len"),
      round(nDistinct / nTok, 4).as("type_token_ratio"),
      round(nStop / nTok, 4).as("stopword_ratio"),
      round(lit(1.0) - nDistinct / nTok, 4).as("repetition"))
  }

  /** Language-ID heuristic: score = stopword-list hit fraction per
    * language profile; predict the best-scoring profile (n-gram-free
    * variant of the classic stopword profile method). With one profile
    * this is an is-English score. */
  def langId(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val enScore = size(filter(toks, t => t.isInCollection(stopwords)))
      .cast("double") / size(toks)
    docs.select(col("doc_id"), col("lang").as("declared_lang"),
      round(enScore, 4).as("en_score"),
      when(enScore >= 0.05, "en").otherwise("other").as("predicted_lang"))
  }

  /** Content fingerprint: md5 over the sorted distinct token bag —
    * word-order-insensitive near-dup key (cheap complement to MinHash). */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      md5(concat_ws(" ", array_sort(array_distinct(tokens(col("text"))))))
        .as("bag_fingerprint"),
      md5(col("text")).as("exact_fingerprint"))
}
