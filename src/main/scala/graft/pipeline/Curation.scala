package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for large-scale training-data pipelines:
  * per-source caps, deterministic split assignment, and sequence
  * packing. All pure Catalyst column/window expressions — codegen'd,
  * reproducible in the DuckDB oracle, and shaped so every shuffle is a
  * bounded hash partition (no global sorts, no driver state).
  */
object Curation {

  /** Cap the number of documents kept per source/domain — the standard
    * anti-dominance guard in web-corpus curation (one crawl-happy domain
    * must not become 40% of the corpus). Deterministic: keeps the
    * `maxPerSource` lowest `orderCol` values per source.
    *
    * Scale shape: one hash shuffle on `source` + a bounded row_number —
    * no global sort. A pathologically hot source is exactly the case the
    * cap exists for; AQE skew-split handles the transient partition.
    */
  def sourceCap(docs: DataFrame, maxPerSource: Int,
      orderCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy("source").orderBy(col(orderCol))
    docs.withColumn("source_rank", row_number().over(w))
      .filter(col("source_rank") <= maxPerSource)
  }

  /** Deterministic train/val/test assignment by content-independent
    * hash of the document id: u = first-8-hex-chars(md5("split:" ++ id))
    * / 2^32 — uniform in [0,1), stable across runs and machines, and
    * reproducible in any engine with md5 (the salt keeps the stream
    * independent of other md5-derived keys in this pipeline).
    *
    * Scale shape: narrow one-pass projection, no shuffle at all.
    */
  def splitAssign(docs: DataFrame, trainFrac: Double = 0.9,
      valFrac: Double = 0.05, idCol: String = "doc_id"): DataFrame = {
    val u = conv(substring(md5(concat(lit("split:"),
      col(idCol).cast("string"))), 1, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)
    docs.withColumn("split_u", round(u, 8))
      .withColumn("split",
        when(u < trainFrac, "train")
          .when(u < trainFrac + valFrac, "val")
          .otherwise("test"))
  }

  /** Concat-and-chunk sequence packing: documents are concatenated in
    * `orderCol` order within a (lang, shard) group and sliced into
    * fixed-`budget`-token training sequences; each document is assigned
    * the chunk index and offset where its first token lands. This is
    * the packing layout LLM data loaders use (concatenate, then split
    * every `budget` tokens) — computing it ahead of time makes the
    * loader a pure seek.
    *
    * Sharding is part of the contract, not an optimization: packing
    * needs a total order, and a single global order would serialize the
    * window. `nShards` bounds each group so the per-group running sum
    * parallelizes (at 100 TB, shard ≈ input file); the shuffle is one
    * hash exchange on (lang, shard).
    */
  def packSequences(docs: DataFrame, budget: Int, nShards: Int = 8,
      orderCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col("lang"), col("shard"))
      .orderBy(col(orderCol))
    docs
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .withColumn("shard", pmod(col(orderCol), lit(nShards)))
      // exclusive running sum = first-token position in the shard stream
      .withColumn("start_tok",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("chunk", (col("start_tok") / budget).cast("long"))
      .withColumn("chunk_offset", col("start_tok") % budget)
      .select(col(orderCol), col("lang"), col("shard"), col("n_tokens"),
        col("start_tok"), col("chunk"), col("chunk_offset"))
  }
}
