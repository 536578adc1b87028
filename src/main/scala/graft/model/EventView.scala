package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession, types}
import org.apache.spark.sql.functions._

/** Maps the driver's `events` parquet table (event_id, ts, user_id,
  * event_type, value, props) onto the riemann Event shape, with a
  * deterministic derivation so the DuckDB oracle can reproduce it
  * bit-for-bit (see [[EventView.oracleCte]]).
  *
  * The driver's `ts` column has shipped as both parquet
  * TIMESTAMP(NANOS) (rounds 1-8) and TIMESTAMP(MICROS) (round 9+), so
  * the derivation is schema-adaptive. NANOS is rejected by Spark 4.x at
  * scan time unless `spark.sql.legacy.parquet.nanosAsLong` is set — we
  * set that conf defensively (it is runtime-settable), and `ts` then
  * arrives as a LONG of epoch nanoseconds, where `time_s = ts div 1e9`
  * uses *integer* division: epoch-ns magnitudes (~1.7e18) exceed
  * double's 53-bit mantissa, so a floating-point path could mis-floor
  * at second boundaries. MICROS arrives as a genuine TimestampType and
  * `unix_seconds` (truncating) gives the identical epoch-seconds value.
  *
  * Derived columns:
  *   - host    = user_id as string
  *   - service = event_type
  *   - state   = 'critical' for errors, 'warning' when value>150, else 'ok'
  *   - metric  = value
  *   - tags    = [service] plus 'big' when value>100
  *   - time_s  = epoch seconds (bigint)
  *   - time    = time_s as a real timestamp (for streaming watermarks)
  *   - ttl     = 60 + (user_id % 10) * 30 seconds
  *   - attributes = parsed props JSON as map<string,string>
  */
object EventView {

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
  }

  /** Pin the session timezone to UTC only for the duration of `f` —
    * Dataset construction analyzes eagerly, so a cast built under the
    * pin keeps its UTC zone after restore. A reader must not overwrite
    * global session state as a side effect: a caller relying on a
    * non-UTC session timezone for unrelated queries would be silently
    * flipped. */
  private def withUtc[T](spark: SparkSession, needed: Boolean)(f: => T): T =
    if (!needed) f
    else {
      val prev = spark.conf.getOption("spark.sql.session.timeZone")
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      try f
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.session.timeZone", v)
        case None => spark.conf.unset("spark.sql.session.timeZone")
      }
    }

  /** The riemann-shaped event relation. Keeps event_id for deterministic
    * ordering. */
  def apply(spark: SparkSession, sfDir: String): DataFrame =
    derive(events(spark, sfDir))

  /** The riemann-shaped derivation over an already-read raw events
    * relation (r22: split out so the entry layer's input spread can sit
    * BETWEEN the raw scan and the derivation — the per-row view work
    * (the props JSON parse above all) then runs at the exchange's width
    * instead of inside the one-split scan task). */
  private[graft] def derive(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val tsType = df.schema("ts").dataType
    val timeS = tsType match {
      case types.LongType => expr("ts div 1000000000") // epoch-ns as long
      // TIMESTAMP or TIMESTAMP_NTZ: the NTZ→LTZ cast interprets the
      // naive value in the session timezone — pinned to UTC around the
      // (eager) analysis below, so the epoch derivation cannot shift by
      // a UTC offset even in a session that runs non-UTC
      case _ => unix_seconds(col("ts").cast(types.TimestampType))
    }
    withUtc(spark, needed = tsType == types.TimestampNTZType) {
    df.select(
      col("event_id"),
      col("user_id").cast("string").as("host"),
      col("event_type").as("service"),
      when(col("event_type") === "error", "critical")
        .when(col("value") > 150, "warning")
        .otherwise("ok").as("state"),
      col("value").as("metric"),
      when(col("value") > 100, array(col("event_type"), lit("big")))
        .otherwise(array(col("event_type"))).as("tags"),
      timeS.as("time_s"),
      timestamp_seconds(timeS).as("time"),
      (lit(60) + (col("user_id") % 10) * 30).cast("double").as("ttl"),
      from_json(col("props"), types.MapType(types.StringType, types.StringType))
        .as("attributes"))
    }
  }

  /** DuckDB CTE producing the identical relation from the raw parquet
    * `events` table — prefix for every event-based oracle query.
    * `epoch_ns // 1e9` is integer arithmetic for the same reason as the
    * Spark side (double can't represent epoch-ns exactly). */
  val oracleCte: String =
    """WITH ev AS (SELECT event_id, CAST(user_id AS VARCHAR) AS host,
      | event_type AS service,
      | CASE WHEN event_type='error' THEN 'critical'
      |      WHEN value>150 THEN 'warning' ELSE 'ok' END AS state,
      | value AS metric,
      | CASE WHEN value>100 THEN [event_type,'big'] ELSE [event_type] END AS tags,
      | epoch_ns(ts) // 1000000000 AS time_s,
      | CAST(60 + (user_id%10)*30 AS DOUBLE) AS ttl
      | FROM events)""".stripMargin.replace("\n", "")

  /** [[oracleCte]] with extra derived columns appended (e.g. a props
    * attribute) — oracles needing more than the standard event shape
    * extend the ONE parity-critical derivation instead of copying it. */
  def oracleCteWith(extraCols: String): String =
    oracleCte.replace(" FROM events)", s", $extraCols FROM events)")
}
