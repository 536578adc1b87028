package graft.sinks

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.sources.LineProtocols

/** Sink layer: riemann's ~40 integrations share one shape — `(sink
  * opts) → stream fn` called per event/batch (reference
  * src/riemann/config.clj:7-63 imports; graphite sink
  * src/riemann/graphite.clj:116-174; kafka producer kafka.clj:11-48;
  * `append`/`register` accumulator streams.clj:1243-1253). The Spark
  * reading: a sink is a foreachBatch consumer; transports (HTTP/TCP
  * clients) plug in as a `String => Unit` / `Iterator[Row] => Unit`
  * so the Spark-side batching, ordering, and formatting are real and
  * testable while network IO stays injectable. */
object Sinks {

  /** A batch sink: receives each micro-batch (or batch write). */
  trait EventSink extends Serializable {
    def write(batch: DataFrame, batchId: Long): Unit
  }

  /** `to_json` matching cheshire's null rendering: the reference's JSON
    * sinks serialize nil fields as explicit `null` values, while Spark's
    * default (`ignoreNullFields=true`) drops the key entirely. The
    * payload-exact sink encoders use this instead of bare `to_json`. */
  def cheshireJson(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.to_json(c,
      Map("ignoreNullFields" -> "false"))

  /** Attach a sink to a streaming Dataset via foreachBatch — the
    * canonical integration point (SURVEY §2.2). */
  def attach[T](ds: Dataset[T], sink: EventSink): DataStreamWriter[T] =
    ds.writeStream.foreachBatch { (batch: Dataset[T], id: Long) =>
      sink.write(batch.toDF(), id)
    }

  /** `append` / `register` (streams.clj:1243-1253): accumulate events
    * into a driver-side buffer — the reference's test harness, and ours.
    * Driver-local by design (collect per batch); for tests and
    * low-volume alert streams only. */
  class MemorySink extends EventSink {
    val rows = new ConcurrentLinkedQueue[Row]()
    override def write(batch: DataFrame, batchId: Long): Unit =
      batch.collect().foreach(rows.add)
    def size: Int = rows.size()
  }

  /** Graphite plaintext sink (graphite.clj:116-174): formats
    * `service metric time` lines and hands each partition's lines to
    * `transport` (a TCP/UDP client in production; a collector in test).
    * Formatting and per-partition batching run distributed; only the
    * transport side-effect is injected. */
  class GraphiteSink(transport: Iterator[String] => Unit) extends EventSink {
    override def write(batch: DataFrame, batchId: Long): Unit =
      LineProtocols.encodeGraphite(batch)
        .select("line").toDF("line")
        .foreachPartition { (rows: Iterator[Row]) =>
          transport(rows.map(_.getString(0)))
        }
  }

  /** `exception-stream` / dead-letter (streams.clj:81-121): the
    * reference isolates child failures per event and routes the
    * exception AS an event to a handler stream. The Spark analog
    * isolates per BATCH (task retry handles row-level transients):
    * a failing sink's batch is handed to the dead-letter sink along
    * with a riemann-style error event descriptor. */
  class Guarded(primary: EventSink, deadLetter: EventSink) extends EventSink {
    override def write(batch: DataFrame, batchId: Long): Unit =
      try primary.write(batch, batchId)
      catch {
        case err: Exception =>
          deadLetter.write(batch, batchId)
          val spark = batch.sparkSession
          import org.apache.spark.sql.functions._
          // the "riemann exception" event (streams.clj:93-106)
          deadLetter.write(
            spark.range(1).select(
              lit("exception").as("service"),
              lit(err.getClass.getName + ": " + String.valueOf(err.getMessage))
                .as("description"),
              lit(batchId).as("batch_id")),
            batchId)
      }
  }

  /** Pubsub registry (reference src/riemann/pubsub.clj:35-109): named
    * channels fan out each published batch to subscribers; a
    * query-filtered subscription reproduces the websocket/SSE
    * subscribe-to-index path (transport/websockets.clj:66-81). */
  class Pubsub extends Serializable {
    private val subs =
      new scala.collection.concurrent.TrieMap[String, Vector[(Option[String], EventSink)]]()
    def subscribe(channel: String, sink: EventSink): Unit =
      subs.updateWith(channel)(v => Some(v.getOrElse(Vector.empty) :+ ((None, sink))))
    def subscribeQuery(channel: String, query: String, sink: EventSink): Unit =
      subs.updateWith(channel)(v => Some(v.getOrElse(Vector.empty) :+ ((Some(query), sink))))
    /** `unsubscribe!` (pubsub.clj:78-87): remove a sink (by identity)
      * from a channel — transports detach on client disconnect. */
    def unsubscribe(channel: String, sink: EventSink): Unit =
      subs.updateWith(channel)(v => v.map(_.filterNot(_._2 eq sink)))
    def publish(channel: String, batch: DataFrame, batchId: Long = 0L): Unit =
      subs.getOrElse(channel, Vector.empty).foreach { case (q, sink) =>
        // per-sink isolation: one failing subscriber (bad query, dead
        // transport) must not abort delivery to the others or crash
        // the publishing (streaming) thread — mirrors the reference's
        // per-handler rescue
        try {
          val routed = q match {
            case Some(query) => batch.filter(
              graft.query.QueryLanguage.predicate(query, batch.schema))
            case None => batch
          }
          sink.write(routed, batchId)
        } catch {
          case scala.util.control.NonFatal(e) =>
            org.slf4j.LoggerFactory.getLogger(getClass)
              .warn(s"pubsub '$channel': subscriber failed, skipping", e)
        }
      }
  }

  /** Elasticsearch bulk sink (reference src/riemann/elasticsearch.clj:
    * 37-190): formats each partition as an NDJSON `_bulk` body —
    * `{"index":{}}` action line + event document — and hands the bodies
    * to the injected HTTP transport. Formatting and batching run
    * distributed; one transport call per partition (the bulk POST). */
  class ElasticsearchBulkSink(index: String, transport: String => Unit)
      extends EventSink {
    override def write(batch: DataFrame, batchId: Long): Unit = {
      import org.apache.spark.sql.functions._
      val idx = index
      batch
        .select(to_json(struct(batch.columns.toIndexedSeq.map(col): _*)).as("doc"))
        .foreachPartition { (rows: Iterator[Row]) =>
          val body = rows.map(r =>
            s"""{"index":{"_index":"$idx"}}""" + "\n" + r.getString(0))
            .mkString("", "\n", "\n")
          if (body.trim.nonEmpty) transport(body)
        }
    }
  }

  /** Webhook/alerting sink (the slack/pagerduty family, e.g.
    * src/riemann/slack.clj:71, pagerduty.clj:91): each event rendered
    * as a JSON alert payload, posted one-per-event through the injected
    * transport — the shape all ~40 reference HTTP integrations share. */
  class WebhookSink(transport: String => Unit) extends EventSink {
    override def write(batch: DataFrame, batchId: Long): Unit = {
      import org.apache.spark.sql.functions._
      batch
        .select(to_json(struct(batch.columns.toIndexedSeq.map(col): _*)).as("payload"))
        .foreachPartition { (rows: Iterator[Row]) =>
          rows.foreach(r => transport(r.getString(0)))
        }
    }
  }

  /** slack-escape (slack.clj:8-11): &, <, > to HTML entities — & first
    * so already-escaped entities aren't double-escaped. */
  private def slackEscape(c: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.functions._
    regexp_replace(regexp_replace(regexp_replace(
      c, "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
  }

  /** Slack incoming-webhook message body (slack.clj:25-39
    * default-formatter + the :username/:channel/:icon merge at :71):
    * one attachment, fallback line + a "Riemann Event" field; nil
    * fields render "-", tags render as the Clojure vector literal
    * (`["a" "b"]`). Pure codegen'd columns under one to_json. */
  def slackMessage(username: String, channel: String,
      icon: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    def orDash(c: org.apache.spark.sql.Column) =
      coalesce(c.cast("string"), lit("-"))
    val tagsVec = concat(lit("["), array_join(transform(
      coalesce(col("tags"), array().cast("array<string>")),
      t => concat(lit("\""), t, lit("\""))), " "), lit("]"))
    val fallback = slackEscape(concat(
      lit("*Host:* "), orDash(col("host")),
      lit(" *Service:* "), orDash(col("service")),
      lit(" *State:* "), orDash(col("state")),
      lit(" *Description:* "), orDash(col("description")),
      lit(" *Metric:* "), orDash(col("metric"))))
    val fieldValue = slackEscape(concat(
      lit("Host:   "), orDash(col("host")), lit("\n"),
      lit("Service:   "), orDash(col("service")), lit("\n"),
      lit("State:   "), orDash(col("state")), lit("\n"),
      lit("Description:   "), orDash(col("description")), lit("\n"),
      lit("Metric:   "), orDash(col("metric")), lit("\n"),
      lit("Tags:   "), tagsVec, lit("\n")))
    to_json(struct(
      lit(username).as("username"),
      lit(channel).as("channel"),
      lit(icon).as("icon_emoji"),
      array(struct(
        fallback.as("fallback"),
        array(struct(
          lit("Riemann Event").as("title"),
          fieldValue.as("value"),
          lit(true).as("short"))).as("fields"))).as("attachments")))
  }

  /** Slack sink (slack.clj:71-120): each event posted as one
    * incoming-webhook message through the injected transport. */
  class SlackSink(username: String, channel: String, icon: String,
      post: String => Unit) extends EventSink {
    override def write(batch: DataFrame, batchId: Long): Unit =
      batch.select(slackMessage(username, channel, icon).as("msg"))
        .foreachPartition { (rows: Iterator[Row]) =>
          rows.foreach(r => post(r.getString(0)))
        }
  }

  /** PagerDuty v2 events-API body (pagerduty.clj:39-63
    * request-body-v2/format-event-v2): summary "host - service is
    * state (metric)" with Clojure's nil→"" string semantics, source =
    * host, severity = state, dedup_key from the event's `dedup-key`
    * custom attribute when present. Reproduced quirk: the reference
    * feeds the event's UNIX SECONDS to coerce/from-long, which reads
    * MILLIS — timestamps render as 1970-era ISO8601; kept bit-faithful
    * rather than silently corrected. */
  def pagerdutyV2Body(routingKey: String,
      action: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    def orEmpty(c: org.apache.spark.sql.Column) =
      coalesce(c.cast("string"), lit(""))
    val summary = concat(
      orEmpty(col("host")), lit(" - "), orEmpty(col("service")),
      lit(" is "), orEmpty(col("state")),
      lit(" ("), orEmpty(col("metric")), lit(")"))
    val payload = struct(
      summary.as("summary"),
      col("host").as("source"),
      col("state").as("severity"),
      date_format(timestamp_millis(col("time_s")),
        "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").as("timestamp"),
      to_json(struct(col("host"), col("service"), col("state"),
        col("metric"), col("time_s"))).as("custom_details"))
    to_json(struct(
      lit(routingKey).as("routing_key"),
      lit(action).as("event_action"),
      payload.as("payload"),
      element_at(coalesce(col("attributes"),
        map().cast("map<string,string>")), "dedup-key").as("dedup_key")))
  }

  /** PagerDuty v1 body (pagerduty.clj:29-37, 65-72): incident key
    * "host service", description "host service is state (metric)". */
  def pagerdutyV1Body(serviceKey: String,
      eventType: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    def orEmpty(c: org.apache.spark.sql.Column) =
      coalesce(c.cast("string"), lit(""))
    to_json(struct(
      lit(serviceKey).as("service_key"),
      lit(eventType).as("event_type"),
      concat(orEmpty(col("host")), lit(" "), orEmpty(col("service")))
        .as("incident_key"),
      concat(orEmpty(col("host")), lit(" "), orEmpty(col("service")),
        lit(" is "), orEmpty(col("state")),
        lit(" ("), orEmpty(col("metric")), lit(")")).as("description"),
      to_json(struct(col("host"), col("service"), col("state"),
        col("metric"), col("time_s"))).as("details")))
  }

  /** PagerDuty adapter (pagerduty.clj:91-140 `pagerduty`): the
    * reference returns {:trigger :acknowledge :resolve} closures; here
    * each is a sink — compose with `changed-state` + `where` exactly
    * like the reference example. `v2 = false` selects the v1 API. */
  class PagerdutySink(routingKey: String, action: String,
      post: String => Unit, v2: Boolean = true) extends EventSink {
    override def write(batch: DataFrame, batchId: Long): Unit =
      batch.select((if (v2) pagerdutyV2Body(routingKey, action)
        else pagerdutyV1Body(routingKey, action)).as("body"))
        .foreachPartition { (rows: Iterator[Row]) =>
          rows.foreach(r => post(r.getString(0)))
        }
  }

  /** `forward` (streams.clj:1255-1261): riemann→riemann forwarding —
    * events re-encoded to framed protobuf Msg payloads per partition,
    * handed to the injected TCP transport. */
  class ForwardSink(transport: Iterator[Array[Byte]] => Unit,
      batchSize: Int = 100) extends EventSink {
    override def write(batch: DataFrame, batchId: Long): Unit = {
      import graft.sources.RiemannProtobuf
      val spark = batch.sparkSession
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val n = batchSize
      batch.select(
        col("host").cast("string"), col("service").cast("string"),
        col("state").cast("string"), col("metric").cast("double"),
        col("time_s").cast("long"), col("ttl").cast("double"))
        .as[(String, String, String, Option[Double], Option[Long], Option[Double])]
        .foreachPartition {
          (rows: Iterator[(String, String, String, Option[Double], Option[Long], Option[Double])]) =>
            transport(rows.grouped(n).map { g =>
              RiemannProtobuf.frame(RiemannProtobuf.encodeMsg(g.map {
                case (h, s, st, m, t, ttl) =>
                  RiemannProtobuf.PEvent(h, s, st, null, m, Seq(), t, ttl, Map())
              }.toSeq))
            })
        }
    }
  }

  /** InfluxDB line-protocol point for one event —
    * `measurement,host=<host> value=<metric> <time_ns>` with
    * line-protocol escaping (measurement escapes commas/spaces; tag
    * values also equals). Pure codegen'd column, shared by the sink
    * and the oracle gate. */
  def influxLine: org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val meas = regexp_replace(col("service"), "([, ])", "\\\\$1")
    val hostTag = regexp_replace(col("host"), "([,= ])", "\\\\$1")
    concat(
      meas, lit(",host="), hostTag,
      lit(" value="), col("metric").cast("double").cast("string"),
      lit(" "), (col("time_s").cast("long") * 1000000000L).cast("string"))
  }

  /** Prometheus Pushgateway datapoint for one event (reference
    * src/riemann/prometheus.clj:13-48): `name{labels} value` — the
    * metric name is the service with disallowed chars collapsed to
    * single underscores; labels are host, state, and the custom
    * attributes (null-valued labels dropped, keys sanitized like the
    * name, values raw); the value renders as a FLOAT (the reference's
    * `(float metric)`). Label order is sorted by key — the reference
    * inherits nondeterministic map order; sorted is the deterministic
    * distributed reading. Pure codegen'd column. */
  def prometheusLine: org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    def sanitize(c: org.apache.spark.sql.Column) =
      regexp_replace(regexp_replace(c, "[^a-zA-Z0-9_]", "_"), "_{2,}", "_")
    val fixed = array(
      when(col("host").isNotNull, concat(lit("host="), col("host"))),
      when(col("state").isNotNull, concat(lit("state="), col("state"))))
    val attrLabels = expr(
      "transform(sort_array(map_entries(coalesce(attributes, " +
        "cast(map() as map<string,string>)))), " +
        "e -> concat(regexp_replace(regexp_replace(e.key, " +
        "'[^a-zA-Z0-9_]', '_'), '_{2,}', '_'), '=', e.value))")
    val labels = array_join(
      sort_array(filter(concat(fixed, attrLabels), c => c.isNotNull)), ",")
    concat(sanitize(col("service")), lit("{"), labels, lit("} "),
      col("metric").cast("float").cast("string"))
  }

  /** Prometheus Pushgateway sink (prometheus.clj:50-120): datapoints
    * formatted distributed via [[prometheusLine]], handed per partition
    * to the injected POST transport. Events without metric or service
    * are dropped (generate-datapoint's guard). */
  class PrometheusSink(transport: Iterator[String] => Unit) extends EventSink {
    override def write(batch: DataFrame, batchId: Long): Unit = {
      import org.apache.spark.sql.functions._
      batch.filter(col("metric").isNotNull && col("service").isNotNull)
        .select(concat(prometheusLine, lit("\n")).as("line"))
        .foreachPartition { (rows: Iterator[Row]) =>
          transport(rows.map(_.getString(0)))
        }
    }
  }

  /** OpenTSDB telnet put line for one event (reference
    * src/riemann/opentsdb.clj:38-110): `put <dotted-service> <time>
    * <float-metric> host=<host>` — the service's spaces become dots
    * (opentsdb-metric-name), the default tag map is just the host
    * (opentsdb-tags; dropped when null), the value renders as a FLOAT.
    * The inverse of LineProtocols.decodeOpenTsdb's put parsing. */
  def opentsdbLine: org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    concat_ws(" ",
      lit("put"),
      array_join(split(col("service"), " "), "."),
      col("time_s").cast("long").cast("string"),
      col("metric").cast("float").cast("string"),
      when(col("host").isNotNull, concat(lit("host="), col("host"))))
  }

  /** Datadog series entry for one event (reference
    * src/riemann/datadog.clj:9-33 generate-event): `{"metric":
    * <dotted service>, "type": "gauge", "host": ..., "tags": [...],
    * "points": [[time, metric]]}`. Hand-built JSON (not to_json) so a
    * heterogeneous [long, double] point renders like the reference's
    * and the DuckDB oracle reproduces every byte; strings escape
    * backslash and quote (control chars assumed absent from
    * service/host — document, don't silently corrupt). */
  def datadogEvent: org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    def esc(c: org.apache.spark.sql.Column) =
      regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"), "\"", "\\\\\"")
    val name = array_join(split(col("service"), " "), ".")
    val hostJson = when(col("host").isNull, lit("null"))
      .otherwise(concat(lit("\""), esc(col("host")), lit("\"")))
    val tagsJson = when(col("tags").isNull, lit("null"))
      .when(size(col("tags")) === 0, lit("[]"))
      .otherwise(concat(lit("[\""),
        array_join(transform(col("tags"), t => esc(t)), "\",\""), lit("\"]")))
    concat(
      lit("{\"metric\":\""), esc(name),
      lit("\",\"type\":\"gauge\",\"host\":"), hostJson,
      lit(",\"tags\":"), tagsJson,
      lit(",\"points\":[["), col("time_s").cast("long").cast("string"),
      lit(","), col("metric").cast("string"), lit("]]}"))
  }

  /** Datadog sink (datadog.clj:21-36 post-datapoint): the batch's
    * events render distributed via [[datadogEvent]]; each partition's
    * entries are joined into one `{"series": [...]}` POST body for the
    * injected HTTP transport (the reference recommends batching for
    * exactly this reason). */
  class DatadogSink(transport: String => Unit) extends EventSink {
    override def write(batch: DataFrame, batchId: Long): Unit = {
      import org.apache.spark.sql.functions._
      batch.filter(col("metric").isNotNull && col("service").isNotNull)
        .select(datadogEvent.as("entry"))
        .foreachPartition { (rows: Iterator[Row]) =>
          val entries = rows.map(_.getString(0)).mkString(",")
          if (entries.nonEmpty) transport(s"""{"series":[$entries]}""")
        }
    }
  }

  /** Librato safe-name (reference src/riemann/librato.clj:9-17):
    * spaces become periods, only `A-Za-z0-9.:-_` survive, cut to 255
    * chars. */
  def libratoSafeName(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    substring(regexp_replace(regexp_replace(c, " ", "."),
      "[^-.:_A-Za-z0-9]", ""), 1, 255)
  }

  /** Librato gauge for one event (librato.clj:19-27 event->gauge):
    * `{"name": safe(service), "source": safe(host), "value": metric,
    * "measure_time": time}` — JSON hand-built like [[datadogEvent]] so
    * the number rendering is reproducible. Events without a metric are
    * rejected by the reference (error log) — callers filter. */
  def libratoGauge: org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val sourceJson = when(col("host").isNull, lit("null"))
      .otherwise(concat(lit("\""), libratoSafeName(col("host")), lit("\"")))
    concat(
      lit("{\"name\":\""), libratoSafeName(col("service")),
      lit("\",\"source\":"), sourceJson,
      lit(",\"value\":"), col("metric").cast("string"),
      lit(",\"measure_time\":"), col("time_s").cast("long").cast("string"),
      lit("}"))
  }

  /** Librato sink (librato.clj:44-120 librato-metrics :gauge): each
    * partition's gauges collate into one `{"gauges":[...]}` POST for
    * the injected client. */
  class LibratoSink(post: String => Unit) extends EventSink {
    override def write(batch: DataFrame, batchId: Long): Unit = {
      import org.apache.spark.sql.functions._
      batch.filter(col("metric").isNotNull)
        .select(libratoGauge.as("entry"))
        .foreachPartition { (rows: Iterator[Row]) =>
          val entries = rows.map(_.getString(0)).mkString(",")
          if (entries.nonEmpty) post(s"""{"gauges":[$entries]}""")
        }
    }
  }

  /** OpenTSDB sink (opentsdb.clj:52-110): put lines formatted
    * distributed, handed per partition to the injected telnet
    * transport. Events without metric or service are dropped (the
    * reference's when-guards). */
  class OpenTsdbSink(transport: Iterator[String] => Unit) extends EventSink {
    override def write(batch: DataFrame, batchId: Long): Unit = {
      import org.apache.spark.sql.functions._
      batch.filter(col("metric").isNotNull && col("service").isNotNull)
        .select(concat(opentsdbLine, lit("\n")).as("line"))
        .foreachPartition { (rows: Iterator[Row]) =>
          transport(rows.map(_.getString(0)))
        }
    }
  }

  /** KairosDB telnet metric for one event (reference
    * src/riemann/kairosdb.clj:25-36 metric->telnet + :153-158
    * make-metric): like OpenTSDB's put line but with a MILLISECOND
    * timestamp — `put <dotted-service> <time_ms> <float-metric>
    * host=<host>`. */
  def kairosdbLine: org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    concat_ws(" ",
      lit("put"),
      array_join(split(col("service"), " "), "."),
      (col("time_s").cast("long") * 1000L).cast("string"),
      col("metric").cast("float").cast("string"),
      when(col("host").isNotNull, concat(lit("host="), col("host"))))
  }

  /** KairosDB sink (kairosdb.clj:88-170): telnet metrics formatted
    * distributed, handed per partition to the injected transport.
    * Events without metric or service drop (make-metric's guards). */
  class KairosDbSink(transport: Iterator[String] => Unit) extends EventSink {
    override def write(batch: DataFrame, batchId: Long): Unit = {
      import org.apache.spark.sql.functions._
      batch.filter(col("metric").isNotNull && col("service").isNotNull)
        .select(concat(kairosdbLine, lit("\n")).as("line"))
        .foreachPartition { (rows: Iterator[Row]) =>
          transport(rows.map(_.getString(0)))
        }
    }
  }

  /** InfluxDB sink (reference src/riemann/influxdb.clj:135-231): each
    * event becomes one line-protocol point via [[influxLine]] —
    * formatted distributed and handed to the injected HTTP transport
    * per partition (the batched `/write` POST). Events without a
    * metric are dropped (a point needs ≥1 field). */
  class InfluxDbSink(transport: Iterator[String] => Unit) extends EventSink {
    override def write(batch: DataFrame, batchId: Long): Unit = {
      import org.apache.spark.sql.functions._
      batch.filter(col("metric").isNotNull)
        .select(influxLine.as("line"))
        .foreachPartition { (rows: Iterator[Row]) =>
          transport(rows.map(_.getString(0)))
        }
    }
  }

  /** InfluxDB v2 write options (reference src/riemann/influxdb2.clj:55-63
    * default-opts): org/bucket/token replace v1's db/user/password, and
    * the write endpoint is `/api/v2/write` with a `Token` auth header. */
  case class Influx2Config(
      organization: String = "riemann", bucket: String = "riemann",
      scheme: String = "http", host: String = "localhost", port: Int = 8086,
      token: String = "riemann", precision: String = "s") {
    require(Influx2Config.Precisions.contains(precision),
      s"precision must be one of ${Influx2Config.Precisions.keys}")
    def url: String =
      s"$scheme://$host:$port/api/v2/write?org=$organization" +
        s"&bucket=$bucket&precision=$precision"
    def headers: Map[String, String] = Map(
      "Authorization" -> s"Token $token",
      "Content-Type" -> "text/plain; charset=utf-8")
  }
  object Influx2Config {
    /** precision → seconds multiplier (influxdb2.clj:23-30
      * convert-time; :seconds/:milliseconds/:microseconds/:nanoseconds
      * become the API's s/ms/us/ns). */
    val Precisions: Map[String, Long] = Map(
      "s" -> 1L, "ms" -> 1000L, "us" -> 1000000L, "ns" -> 1000000000L)
  }

  /** One v2 measurement point (influxdb2.clj:32-40 event->point):
    * measurement = service, host tag, `value=<metric>` field, time
    * scaled to the configured precision. Same line-protocol escaping
    * as v1; a null host renders as an empty tag value, which the v2
    * client then omits — reproduced by dropping the tag. */
  def influx2Line(precision: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val mult = Influx2Config.Precisions(precision)
    val meas = regexp_replace(col("service"), "([, ])", "\\\\$1")
    val hostTag = when(col("host").isNotNull && col("host") =!= "",
      concat(lit(",host="),
        regexp_replace(col("host"), "([,= ])", "\\\\$1")))
      .otherwise(lit(""))
    concat(
      meas, hostTag,
      lit(" value="), col("metric").cast("double").cast("string"),
      lit(" "), (col("time_s").cast("long") * mult).cast("string"))
  }

  /** InfluxDB v2 sink (influxdb2.clj:66-120 `influxdb2`): points
    * formatted distributed via [[influx2Line]], each partition POSTed
    * as one newline-joined body to the v2 write URL with the token
    * header — the WriteApi.writePoints batch. Metric-less events drop
    * (a point needs its value field). */
  class Influx2Sink(cfg: Influx2Config,
      post: (String, Map[String, String], String) => Unit) extends EventSink {
    override def write(batch: DataFrame, batchId: Long): Unit = {
      import org.apache.spark.sql.functions._
      val (url, headers) = (cfg.url, cfg.headers)
      batch.filter(col("metric").isNotNull && col("service").isNotNull)
        .select(influx2Line(cfg.precision).as("line"))
        .foreachPartition { (rows: Iterator[Row]) =>
          val body = rows.map(_.getString(0)).mkString("\n")
          if (body.nonEmpty) post(url, headers, body)
        }
    }
  }

  /** RabbitMQ publisher (reference src/riemann/rabbitmq.clj:17-82):
    * events rendered as JSON and published to an exchange under a
    * routing key. The AMQP client is injected as
    * `(config, routingKey, payload) => Unit` — the full config reaches
    * the client so exchange declaration and content-type settings (the
    * reference's `:exchange-settings` defaults) are honored. */
  case class RabbitMqConfig(
      exchange: String = "riemann", exchangeType: String = "topic",
      durable: Boolean = false, autoDelete: Boolean = false,
      internal: Boolean = false, routingKey: String = "riemann.events",
      contentType: String = "application/json")

  class RabbitMqSink(cfg: RabbitMqConfig,
      publish: (RabbitMqConfig, String, String) => Unit)
      extends EventSink {
    override def write(batch: DataFrame, batchId: Long): Unit = {
      import org.apache.spark.sql.functions._
      val (c, rk) = (cfg, cfg.routingKey)
      batch
        .select(to_json(struct(batch.columns.toIndexedSeq.map(col): _*)).as("payload"))
        .foreachPartition { (rows: Iterator[Row]) =>
          // the full config reaches the injected client so exchange
          // declaration / content-type settings are honored, not dead
          rows.foreach(r => publish(c, rk, r.getString(0)))
        }
    }
  }

  /** Kafka producer sink (kafka.clj:11-48): native in Spark — this just
    * pins the contract (value = JSON event). */
  def kafka[T](ds: Dataset[T], bootstrap: String, topic: String): DataStreamWriter[Row] = {
    import org.apache.spark.sql.functions._
    ds.toDF()
      .select(to_json(struct(ds.toDF().columns.toIndexedSeq.map(col): _*)).as("value"))
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
  }
}
