package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maps the driver's `events` parquet table (event_id, ts, user_id,
  * event_type, value, props) onto the riemann Event shape, with a
  * deterministic derivation so the DuckDB oracle can reproduce it
  * bit-for-bit (see [[EventView.oracleCte]]).
  *
  * Derived columns:
  *   - host    = user_id as string
  *   - service = event_type
  *   - state   = 'critical' for errors, 'warning' when value>150, else 'ok'
  *   - metric  = value
  *   - tags    = [service] plus 'big' when value>100
  *   - time_s  = floor(unix seconds of ts)  (bigint; ns-safe vs DuckDB)
  *   - ttl     = 60 + (user_id % 10) * 30 seconds
  *
  * `time_s` (not the raw timestamp) is what oracle-checked queries expose:
  * Spark truncates parquet ns-timestamps to micros while DuckDB keeps ns,
  * so raw timestamps would never hash-match.
  */
object EventView {

  def events(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/events.parquet")

  /** The riemann-shaped event relation. Keeps event_id for deterministic
    * ordering and `time` (timestamp) for streaming/watermark use. */
  def apply(spark: SparkSession, sfDir: String): DataFrame = {
    val df = events(spark, sfDir)
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
      unix_timestamp(col("ts")).as("time_s"),
      col("ts").as("time"),
      (lit(60) + (col("user_id") % 10) * 30).cast("double").as("ttl"),
      col("props"))
  }

  /** DuckDB CTE producing the identical relation from the raw parquet
    * `events` table — prefix for every event-based oracle query. */
  val oracleCte: String =
    """WITH ev AS (SELECT event_id, CAST(user_id AS VARCHAR) AS host,
      | event_type AS service,
      | CASE WHEN event_type='error' THEN 'critical'
      |      WHEN value>150 THEN 'warning' ELSE 'ok' END AS state,
      | value AS metric,
      | CASE WHEN value>100 THEN [event_type,'big'] ELSE [event_type] END AS tags,
      | CAST(FLOOR(epoch(ts)) AS BIGINT) AS time_s,
      | CAST(60 + (user_id%10)*30 AS DOUBLE) AS ttl,
      | props FROM events)""".stripMargin.replace("\n", "")
}
