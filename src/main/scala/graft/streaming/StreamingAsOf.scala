package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Streaming face of [[graft.operators.Temporal.asOfJoin]]: enrich a
  * live event stream with the most recent STATIC reference record
  * at-or-before each event's timestamp (per key) — "what config /
  * deploy / quota was live when this event happened", answered on the
  * firehose.
  *
  * STATELESS by design, like [[StreamingCrossCorpus]]: the reference
  * is fixed for the run, so instead of a state store the static side
  * is converted ONCE into disjoint validity intervals — each record
  * is live from its own timestamp until the key's next record, capped
  * at `maxValiditySeconds` (the as-of tolerance; also what bounds the
  * bin explosion). Each micro-batch then stream-static LEFT-joins on
  * (keys, time-bin) with the containment residual — the
  * [[graft.operators.Temporal.rangeJoin]] shape — so events keep
  * flowing (null payload) when nothing was live. No state store,
  * no watermark requirement, restart-safe for free; intervals are
  * disjoint per key by construction, so each event matches at most
  * one record and no dedup pass is needed.
  *
  * Scale shape: at 100 TB the interval relation is a bucketed table
  * on (keys, bin) refreshed on reference releases; each micro-batch
  * hash-joins against it without reshuffling the reference.
  *
  * PERSIST the derived interval relation before streaming with it:
  * Spark re-executes the static subtree of a stream-static join in
  * every micro-batch (scan + the window derivation here), so an
  * unpersisted relation pays that per trigger. The config surface
  * does this automatically ([[graft.config.ConfigFile]] `cachedStatic`,
  * ~5× per-batch in the r18 A/B); direct callers should
  * `.persist()` the [[validityIntervals]]/[[intervalsOf]] result. */
object StreamingAsOf {

  /** Build the static side once per reference release: one row per
    * (keys, [asof_start, asof_end)) with the payload struct. Rows at
    * the same (keys, time) reduce to the lexicographically largest
    * payload — the same deterministic pick as the batch asOfJoin. */
  def validityIntervals(right: DataFrame, keys: Seq[String],
      timeCol: String, payloadCols: Seq[String],
      maxValiditySeconds: Long): DataFrame = {
    require(maxValiditySeconds > 0, "maxValiditySeconds must be positive")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(timeCol))
    right.groupBy((keys :+ timeCol).map(col): _*)
      .agg(max(struct(payloadCols.map(col): _*)).as("asof_payload"))
      // half-open [start, end): the cap is start + maxV + 1 so an event
      // at EXACTLY start + maxV still matches — the batch asOfJoin's
      // tolerance is inclusive (t − rt <= tol), and the two faces must
      // agree at the boundary (StreamingAsOfSpec pins the parity)
      // Spark's `least` SKIPS null operands (returns null only when
      // ALL are null), so the last record per key — whose lead() is
      // null — already resolves to the cap; no coalesce needed
      .select(keys.map(col) :+ col(timeCol).as("asof_start") :+
        least(lead(col(timeCol), 1).over(w),
          col(timeCol) + maxValiditySeconds + 1).as("asof_end") :+
        col("asof_payload"): _*)
  }

  /** Normalize an ARBITRARY static interval table — maintenance
    * windows, deploy freezes, oncall shifts: anything with explicit
    * [start, end) second columns — into [[enrich]]'s shape. The
    * general face [[validityIntervals]] is the derived special case
    * of. Degenerate (empty) intervals drop; intervals MAY overlap, in
    * which case an event matches each covering interval (one output
    * row per match — the rangeJoin contract); feed disjoint intervals
    * for strict enrichment. */
  def intervalsOf(static: DataFrame, keys: Seq[String], startCol: String,
      endCol: String, payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "intervalsOf needs payload columns")
    static.filter(col(endCol) > col(startCol))
      .select(keys.map(col) :+
        col(startCol).cast("long").as("asof_start") :+
        col(endCol).cast("long").as("asof_end") :+
        struct(payloadCols.map(col): _*).as("asof_payload"): _*)
  }

  /** Enrich the stream: every input event survives, carrying
    * `asof_<timeCol>` and `asof_<field>` columns from the record live
    * at its timestamp (nulls when none). `binSeconds` must divide the
    * interval relation the same way on both sides — pick it near the
    * typical record spacing, and <= maxValiditySeconds. */
  def enrich(stream: DataFrame, intervals: DataFrame, keys: Seq[String],
      timeCol: String, binSeconds: Long): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive, got $binSeconds")
    val payloadFields = intervals.schema("asof_payload").dataType
      .asInstanceOf[StructType].fieldNames.toSeq
    val ib = intervals.withColumn("asof_bin", explode(sequence(
      expr(s"asof_start div $binSeconds"),
      expr(s"(asof_end - 1) div $binSeconds"))))
    val keyEq = keys.map(k => col(s"s.$k") === col(s"i.$k"))
      .reduce(_ && _)
    stream.withColumn("asof_bin", expr(s"$timeCol div $binSeconds"))
      .as("s")
      .join(ib.as("i"), keyEq &&
        col("s.asof_bin") === col("i.asof_bin") &&
        col(s"s.$timeCol") >= col("i.asof_start") &&
        col(s"s.$timeCol") < col("i.asof_end"), "left_outer")
      .select(stream.columns.toSeq.map(c => col(s"s.$c").as(c)) ++
        (col("i.asof_start").as(s"asof_$timeCol") +:
          payloadFields.map(f =>
            col(s"i.asof_payload.$f").as(s"asof_$f"))): _*)
  }
}
