package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Temporal joins and sessionization — the three classic time-series
  * operators Spark has no single built-in node for, each in its
  * scalable shape:
  *
  *   - [[asOfJoin]]: enrich each left row with the most recent right
  *     row at-or-before its timestamp (per key) — ONE union + ONE
  *     keyed window pass, never a per-row range probe. The shape
  *     every "what config/deploy/quota was live when this event
  *     happened" question takes.
  *   - [[rangeJoin]]: event-to-interval join via time-bin bucketing —
  *     an equi-join on (keys, bin) with a residual filter, never the
  *     quadratic theta-join Spark would otherwise plan (and PlanSpec
  *     pins the absence of CartesianProduct / the presence of the
  *     hash join).
  *   - [[sessionize]]: gap-based session windows over Spark's native
  *     `session_window`, identical in batch and streaming.
  *
  * The reference has no timeseries-join primitives (riemann joins
  * streams by `project`/`coalesce` over the live index); these cover
  * what its users do OUTSIDE riemann with the exported events — and
  * what a 100 TB event archive needs done in one shuffle.
  */
object Temporal {

  /** As-of join: for each left row, the latest right row with
    * `right.timeCol <= left.timeCol` on the same `keys`, within
    * `toleranceSeconds` (rows outside tolerance keep the left side
    * and null payload — left rows are never dropped).
    *
    * Right rows are first reduced to one per (keys, time) — the
    * lexicographically largest payload tuple wins, so the pick is
    * deterministic under concurrent writes at the same timestamp.
    * Then both sides union into one relation ordered by (time, side)
    * with right rows first at equal times ("at or before" includes
    * ties), and a running `last(payload, ignoreNulls)` resolves every
    * left row's match in a single window pass.
    *
    * Scale shape: one hash exchange on `keys` shared by the window
    * sort; no broadcast of either side, no per-row probe — both sides
    * can be 100 TB. Output: every left column, plus the matched
    * `asof_<timeCol>` and `asof_<payload>` columns (null when no
    * match in tolerance). */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, payloadCols: Seq[String],
      toleranceSeconds: Long = Long.MaxValue): DataFrame = {
    require(keys.nonEmpty && payloadCols.nonEmpty,
      "asOfJoin needs keys and payload columns")
    val rightU = right.groupBy((keys :+ timeCol).map(col): _*)
      .agg(max(struct(payloadCols.map(col): _*)).as("asof_payload"))
    val leftCols = left.columns.toSeq
    val lrowType = StructType(left.schema.fields)
    val u = left.select((keys :+ timeCol).map(col) ++ Seq(
        lit(1).as("asof_side"),
        lit(null).cast(rightU.schema("asof_payload").dataType)
          .as("asof_payload"),
        struct(leftCols.map(col): _*).as("asof_lrow")): _*)
      .unionByName(rightU.select((keys :+ timeCol).map(col) ++ Seq(
        lit(0).as("asof_side"),
        col("asof_payload"),
        lit(null).cast(lrowType).as("asof_lrow")): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol), col("asof_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u
      .withColumn("asof_m", last(col("asof_payload"), ignoreNulls = true)
        .over(w))
      .withColumn("asof_mt", last(
        when(col("asof_side") === 0, col(timeCol)), ignoreNulls = true)
        .over(w))
    val inTol = col("asof_mt").isNotNull &&
      col(timeCol) - col("asof_mt") <= toleranceSeconds
    matched.filter(col("asof_side") === 1)
      .select(leftCols.map(c => col(s"asof_lrow.$c").as(c)) ++
        (when(inTol, col("asof_mt")).as(s"asof_$timeCol") +:
          payloadCols.map(c =>
            when(inTol, col(s"asof_m.$c")).as(s"asof_$c"))): _*)
  }

  /** Range (interval) join: left rows matched to every interval row
    * whose `[startCol, endCol)` contains `timeCol`, on the same
    * `keys`. Implemented as the bin-bucketed equi-join: intervals
    * explode into the fixed-width time bins they overlap, events
    * carry their own bin, and the join is a plain hash equi-join on
    * (keys, bin) with the containment filter as residual — each event
    * matches an interval through exactly one bin (its own), so no
    * dedup pass is needed.
    *
    * `binSeconds` trades explosion factor against join selectivity:
    * pick it near the TYPICAL interval length, so each interval lands
    * in O(1) bins while a bin pairs only co-located rows. Degenerate
    * (empty) intervals are dropped up front. */
  def rangeJoin(left: DataFrame, intervals: DataFrame, keys: Seq[String],
      timeCol: String, startCol: String, endCol: String,
      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive, got $binSeconds")
    val ibins = intervals.filter(col(endCol) > col(startCol))
      .withColumn("asof_bin", explode(sequence(
        expr(s"$startCol div $binSeconds"),
        expr(s"($endCol - 1) div $binSeconds"))))
    left.withColumn("asof_bin", expr(s"$timeCol div $binSeconds"))
      .join(ibins, keys :+ "asof_bin")
      .filter(col(timeCol) >= col(startCol) && col(timeCol) < col(endCol))
      .drop("asof_bin")
  }

  /** Gap-based sessionization over Spark's native `session_window`:
    * events on the same `keys` whose successive gaps are <= `gap`
    * merge into one session (TOUCHING windows merge — an event at
    * exactly prev + gap extends the session); the session ends `gap`
    * after its last event (the session_window contract). Works
    * identically on a
    * batch frame and a watermarked stream — the streaming form is the
    * same expression (TemporalSpec pins batch/stream parity).
    * Output: (keys, session_start_s, session_end_s, n_events). */
  def sessionize(df: DataFrame, keys: Seq[String], timeCol: String,
      gap: String): DataFrame =
    df.groupBy(keys.map(col) :+ session_window(col(timeCol), gap): _*)
      .agg(count(lit(1)).as("n_events"))
      .select(keys.map(col) ++ Seq(
        unix_seconds(col("session_window.start")).as("session_start_s"),
        unix_seconds(col("session_window.end")).as("session_end_s"),
        col("n_events")): _*)
}
