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

  /** Scale-adaptive fix for unsplittable inputs (optimization guide
    * §2.5 "input skew: one huge unsplittable file … repartition
    * immediately after the read", §6): the driver's test tables are
    * single-row-group parquet files, so every scan yields ONE split and
    * all narrow per-row work above it — sink renderers, codec
    * round-trips, shingle/minhash/normalize/media kernels, map-side
    * partial aggregation — serializes on one core while the other
    * `cores−1` idle (r21 profile: q_slack_message ran 10 000 renders in
    * 1 task, taskSec ≈ wall ≈ 1.3 s at local[32]).
    *
    * When the physical scan yields fewer splits than half the session
    * parallelism, add ONE explicit round-robin exchange right above the
    * read. Scale-adaptive by construction: at 100 TB a table scan
    * yields thousands of splits and the condition never fires, so no
    * exchange is added — this is not a local-mode constant, it is "the
    * input cannot feed the cluster" detection. Explicit numPartitions
    * so AQE cannot coalesce the tiny exchange back to one partition;
    * sort-before-repartition (default on) keeps the row→partition map
    * deterministic under retries. Result sets are unchanged: every
    * declared query orders its output (or aggregates
    * order-independently), and no query path uses partition-dependent
    * expressions (verified: no monotonically_increasing_id /
    * spark_partition_id / input_file_name / rand in graft).
    *
    * HASH partitioning on the table's unique id, not round-robin:
    * round-robin pays a map-side sort of the full rows
    * (spark.sql.execution.sortBeforeRepartition, needed for its retry
    * determinism — measured 0.75 s single-task on the events table,
    * eating most of the win), while hash-of-id is retry-deterministic
    * by construction and sorts nothing (guide §2.5's "derive the
    * synthetic key deterministically" rule). Unique ids hash uniformly,
    * so no partition skew.
    *
    * r22: implementation hoisted to [[graft.pipeline.Spread]] so
    * pipeline internals can use it too; this remains the entry-layer
    * name. */
  private[graft] def spread(df: DataFrame, key: Column): DataFrame =
    graft.pipeline.Spread.spread(df, key)

  def ev(s: SparkSession, dir: String): DataFrame = EventView(s, dir)

  /** [[spread]]-applied event view — for the queries whose dominant
    * cost is per-row compute ABOVE the read (sink renderers, wire-codec
    * round-trips): there the exchange buys a `cores`-way parallel
    * render. Filters / windows / folds keep the plain [[ev]]: their
    * narrow pre-exchange work is trivial, so the extra exchange would
    * be pure cost (measured: ~+0.1-0.2 s on sub-0.3 s queries at
    * local[32], vs 2-3× wins on the renderer/codec family). */
  def evs(s: SparkSession, dir: String): DataFrame =
    // r22: spread the RAW read, derive the view ABOVE the exchange —
    // with the spread outside the whole view, the per-row derivation
    // (the props JSON parse above all) sat BELOW the exchange in the
    // one-split scan task (q_protobuf_roundtrip job log: 0.65 s
    // single-task map stage feeding the spread)
    EventView.derive(spread(EventView.events(s, dir), col("event_id")))
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

  /** [[spread]]-applied documents — for the kernel-heavy consumers
    * (media codecs, shingle/minhash/winnow/tokenizer kernels, the
    * funnel) where the per-document work above the read dominates;
    * cheap per-doc passes (md5 exact-dedup, split-count planners) keep
    * the plain read. */
  def docsS(s: SparkSession, dir: String): DataFrame =
    spread(s.read.parquet(s"$dir/documents.parquet"), col("doc_id"))
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
