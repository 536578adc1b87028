package graft.model

import org.apache.spark.sql.types._

/** The canonical riemann-style Event.
  *
  * Mirrors the reference's record semantics (reference:
  * src/riemann/transport/opentsdb.clj:71 restates the field list;
  * pkey = [host, service] per src/riemann/common.clj:114-117) but as a
  * typed Spark row: `tags` is an array, open custom attributes live in a
  * string map, and `time` is an event-time timestamp so Structured
  * Streaming watermarks apply directly.
  */
case class Event(
    host: String,
    service: String,
    state: String,
    description: String,
    metric: Option[Double],
    tags: Seq[String],
    time: java.sql.Timestamp,
    ttl: Option[Double],
    attributes: Map[String, String])

object Event {
  /** Spark schema for a dynamic (DataFrame) event relation. */
  val schema: StructType = StructType(Seq(
    StructField("host", StringType),
    StructField("service", StringType),
    StructField("state", StringType),
    StructField("description", StringType),
    StructField("metric", DoubleType),
    StructField("tags", ArrayType(StringType)),
    StructField("time", TimestampType),
    StructField("ttl", DoubleType),
    StructField("attributes", MapType(StringType, StringType))
  ))

  /** Canonical field names; anything else is a custom attribute
    * (reference: src/riemann/common.clj:270-274 `custom-attributes`). */
  val canonicalFields: Set[String] =
    Set("host", "service", "state", "description", "metric", "tags",
      "time", "ttl", "attributes")
}
