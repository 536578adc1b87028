package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.model.EventView
import graft.operators.{Combine, Index, Streams, Windows}
import graft.operators.Streams.EventOps
import graft.functions.Folds
import graft.pipeline.{Curation, Dedup, Similarity, TextAnalysis}

/** Shared inputs + derivations for the split driver-contract files
  * ([[SparkEntry]] assembles [[EntryStreams]] ++ [[EntryPipeline]];
  * oracle SQL lives in [[EntryOracle]]). */
private[graft] object EntryShared {
  val D = DecimalType(18, 6)
  def ev(s: SparkSession, dir: String): DataFrame = EventView(s, dir)
  /** Shared input for the product/quotient UDAF gates: 5-event batches
    * per host, metric mapped to small integers (incl. zeros and
    * negatives) so products stay exact at the rounded precision. */
  def foldBatches(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("host").orderBy("time_s", "event_id")
    ev(s, dir).filter(col("metric").isNotNull)
      .withColumn("ord", row_number().over(w).cast("long"))
      .withColumn("vi", (floor(abs(col("metric"))) % 7 - 3).cast("double"))
      .withColumn("batch_id", expr("(ord - 1) div 5"))
  }
  def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  /** Boilerplate text stamped onto half the corpus by the skew probes
    * — long enough to span several 10-word segments. */
  val skewBoiler = "common header line repeated across half " +
    "of the corpus with exactly twenty five words of boilerplate " +
    "filler so it spans multiple ten word segments"
  /** The skew-stress corpus: every even doc_id gets the SAME text —
    * one dominant segment for line dedup, one dominant LSH bucket for
    * minhash. Oracles apply the identical CASE substitution. */
  def skewedDocs(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).withColumn("text",
      when(col("doc_id") % 2 === 0, lit(skewBoiler)).otherwise(col("text")))
  def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Derived description for the sink-payload oracles: periodic nulls
    * (the nil-rendering paths) + slack-escapable characters. */
  def withDerivedDesc(df: DataFrame): DataFrame =
    df.withColumn("description",
      when(col("event_id") % 5 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("d&<>"), col("event_id").cast("string"))))
}
