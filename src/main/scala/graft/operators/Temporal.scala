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
      toleranceSeconds: Long = Long.MaxValue,
      bucketSeconds: Long = 0): DataFrame = {
    require(keys.nonEmpty && payloadCols.nonEmpty,
      "asOfJoin needs keys and payload columns")
    val rightU = right.groupBy((keys :+ timeCol).map(col): _*)
      .agg(max(struct(payloadCols.map(col): _*)).as("asof_payload"))
    val leftCols = left.columns.toSeq
    val lrowType = StructType(left.schema.fields)
    val payloadType = rightU.schema("asof_payload").dataType
    val leftU = left.select((keys :+ timeCol).map(col) ++ Seq(
      lit(1).as("asof_side"),
      lit(null).cast(payloadType).as("asof_payload"),
      struct(leftCols.map(col): _*).as("asof_lrow")): _*)
    val u =
      if (bucketSeconds <= 0)
        leftU.unionByName(rightU.select((keys :+ timeCol).map(col) ++ Seq(
          lit(0).as("asof_side"),
          col("asof_payload"),
          lit(null).cast(lrowType).as("asof_lrow")): _*))
      else {
        // Two-level time-bucketed form: the single-window pass above
        // puts EVERY row of a key in one window partition — a hot key
        // (one service emitting half the corpus, the normal monitoring
        // shape) serializes onto one task, and AQE cannot split window
        // partitions. Here the window partitions on (keys, bucket)
        // instead, so no task ever sorts more than one time bucket of
        // one key; the hot key's rows spread across buckets.
        //
        // What makes it exact: a left row's match is either in its own
        // bucket (found by the in-bucket window pass) or it is the
        // latest right row of some EARLIER bucket — precomputed as one
        // "carry" pseudo-row per (keys, bucket). The carry chain is a
        // window over BUCKET-LEVEL aggregates only (≤ time-range /
        // bucketSeconds rows per key, independent of data volume), and
        // the per-bucket reduction is a hash aggregate with map-side
        // partial combine — both skew-immune. SkewSpec pins the task
        // spread and the exact parity with the single-window form.
        val bin = expr(s"$timeCol div $bucketSeconds").as("asof_bucket")
        val rb = rightU.select((keys :+ timeCol).map(col) ++
          Seq(col("asof_payload"), bin): _*)
        // per (keys, bucket): the latest right row (max time, then the
        // lexicographically largest payload — same pick as rightU's)
        val rbuck = rb.groupBy((keys :+ "asof_bucket").map(col): _*)
          .agg(max(struct(col(timeCol).as("t"),
            col("asof_payload").as("p"))).as("asof_lastr"))
        // every (keys, bucket) a carry could be consumed in or ride
        // through: buckets present on either side. ONE distinct over
        // the union — r22: the former per-side distinct before the
        // union paid an extra exchange of the left bucket relation for
        // nothing (the outer distinct already dedups; map-side partial
        // aggregation bounds what the remaining exchange carries)
        val allb = left
          .select(keys.map(col) :+ bin: _*)
          .unionByName(
            rbuck.select((keys :+ "asof_bucket").map(col): _*))
          .distinct()
        val wb = Window.partitionBy(keys.map(col): _*)
          .orderBy(col("asof_bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)
        // carry(B) = latest right row of any bucket strictly before B;
        // its ORIGINAL time (< B's start) is kept, so it sorts before
        // every in-bucket row and the tolerance check stays exact
        val carry = allb.join(rbuck, keys :+ "asof_bucket", "left")
          .withColumn("asof_carry",
            last(col("asof_lastr"), ignoreNulls = true).over(wb))
          .filter(col("asof_carry").isNotNull)
          .select(keys.map(col) ++ Seq(col("asof_bucket"),
            col("asof_carry.t").as(timeCol),
            lit(0).as("asof_side"),
            col("asof_carry.p").as("asof_payload"),
            lit(null).cast(lrowType).as("asof_lrow")): _*)
        leftU.withColumn("asof_bucket",
            expr(s"$timeCol div $bucketSeconds"))
          .unionByName(rb.select((keys :+ timeCol).map(col) ++ Seq(
            lit(0).as("asof_side"), col("asof_payload"),
            lit(null).cast(lrowType).as("asof_lrow"),
            col("asof_bucket")): _*))
          .unionByName(carry)
      }
    val wKeys = if (bucketSeconds <= 0) keys else keys :+ "asof_bucket"
    val w = Window.partitionBy(wKeys.map(col): _*)
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

  /** Skew-hardened batch sessionization, exactly equal to [[sessionize]]
    * (TOUCHING sessions merge; end = last event + gap) but never putting
    * more than one time chunk of one key in a single task.
    *
    * Spark's batch `session_window` plan sorts each key's FULL event
    * set inside one partition — a hot key (one service = half the
    * corpus) serializes onto one task. This form decomposes into:
    *
    *   1. sessions WITHIN each (keys, chunk) — window partitioned on
    *      (keys, chunk), so the hot key's rows spread across chunks;
    *   2. a cross-chunk merge over the chunk-level session rows. A
    *      chunk holds at most `chunkSeconds / gapSeconds + 1` sessions
    *      no matter how many events it has, so level 2 sees
    *      ≤ time-range / gapSeconds rows per key — bounded by the
    *      clock, not the data. Session ends are monotone per key
    *      (later sessions end later), so the lag-chain merge is exact.
    *
    * `timeCol` is a timestamp (as in [[sessionize]]); output schema is
    * identical: (keys, session_start_s, session_end_s, n_events).
    * SkewSpec pins both the task spread and the parity. */
  def sessionizeBucketed(df: DataFrame, keys: Seq[String],
      timeCol: String, gapSeconds: Long, chunkSeconds: Long): DataFrame = {
    require(gapSeconds > 0 && chunkSeconds > 0,
      s"gapSeconds/chunkSeconds must be positive: $gapSeconds/$chunkSeconds")
    // all session arithmetic in MICROSECONDS so sub-second spacings
    // split/merge exactly like session_window's full-precision compare
    val gapUs = gapSeconds * 1000000L
    val chunkUs = chunkSeconds * 1000000L
    val base = df.select(keys.map(col) :+
        unix_micros(col(timeCol)).as("sess_t"): _*)
      .withColumn("sess_chunk", expr(s"sess_t div ${chunkUs}L"))
    val wc = Window.partitionBy((keys :+ "sess_chunk").map(col): _*)
      .orderBy(col("sess_t"))
    val chunkSessions = base
      .withColumn("sess_new",
        when(col("sess_t") - lag(col("sess_t"), 1).over(wc) <= gapUs,
          0).otherwise(1))
      .withColumn("sess_id", sum(col("sess_new")).over(
        wc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy((keys ++ Seq("sess_chunk", "sess_id")).map(col): _*)
      .agg(min(col("sess_t")).as("sess_start"),
        (max(col("sess_t")) + gapUs).as("sess_end"),
        count(lit(1)).as("sess_n"))
    // chunk-level merge: a session joins its predecessor when it starts
    // at-or-before the predecessor's end (touch merges — the
    // session_window contract); ends are monotone so lag(1) suffices
    val wk = Window.partitionBy(keys.map(col): _*).orderBy(col("sess_start"))
    chunkSessions
      .withColumn("sess_new2",
        when(col("sess_start") <= lag(col("sess_end"), 1).over(wk), 0)
          .otherwise(1))
      .withColumn("sess_island", sum(col("sess_new2")).over(
        wk.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy((keys :+ "sess_island").map(col): _*)
      .agg(min(col("sess_start")).as("sess_start_us"),
        max(col("sess_end")).as("sess_end_us"),
        sum(col("sess_n")).as("n_events"))
      .select(keys.map(col) ++ Seq(
        // FLOOR-div back to whole seconds, matching
        // unix_seconds(session_window.start/end) in [[sessionize]].
        // `div` truncates toward zero, so pre-epoch (negative)
        // microseconds need the explicit floor correction — Spark's
        // % keeps the dividend's sign, so a negative remainder means
        // truncation rounded up and we step one second back.
        expr("sess_start_us div 1000000 + " +
          "(case when sess_start_us % 1000000 < 0 then -1 else 0 end)")
          .as("session_start_s"),
        expr("sess_end_us div 1000000 + " +
          "(case when sess_end_us % 1000000 < 0 then -1 else 0 end)")
          .as("session_end_s"),
        col("n_events")): _*)
  }
}
