package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Event

/** Streaming source assembly: riemann's servers map to line-shaped
  * streaming reads + the pure-column decoders in [[LineProtocols]].
  * (The TCP/UDP protobuf transports, reference
  * src/riemann/transport/tcp.clj:246-296 / udp.clj:147-181, are a
  * custom framed-binary MicroBatchStream — out of scope here; the
  * graphite/opentsdb/kafka paths below cover the text transports.) */
object Sources {

  /** `graphite-server` (transport/graphite.clj:37-160): socket text
    * lines → events. */
  def graphiteServer(spark: SparkSession, host: String, port: Int): DataFrame =
    LineProtocols.decodeGraphite(
      spark.readStream.format("socket")
        .option("host", host).option("port", port).load()
        .withColumnRenamed("value", "line"))

  /** `opentsdb-server` (transport/opentsdb.clj:24-145): socket `put`
    * lines → events. */
  def opentsdbServer(spark: SparkSession, host: String, port: Int): DataFrame =
    LineProtocols.decodeOpenTsdb(
      spark.readStream.format("socket")
        .option("host", host).option("port", port).load()
        .withColumnRenamed("value", "line"))

  /** `kafka-consumer` (kafka.clj:50-119): JSON events from Kafka —
    * native in Spark; value is decoded against the canonical Event
    * schema with default-time assignment. */
  def kafkaEvents(spark: SparkSession, bootstrap: String,
      topics: String): DataFrame =
    withDefaultTime(
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topics).load()
        .select(from_json(col("value").cast("string"),
          Event.schema).as("e"))
        .select(col("e.*")))

  /** Decode-time default assignment (common.clj:86-89,132-137): events
    * without a time get the processing clock. */
  def withDefaultTime(events: DataFrame): DataFrame =
    events.withColumn("time",
      coalesce(col("time"), current_timestamp()))

  /** The same default for the epoch-seconds representation. */
  def defaultTimeS(timeS: Column): Column =
    coalesce(timeS, unix_timestamp(current_timestamp()))
}
