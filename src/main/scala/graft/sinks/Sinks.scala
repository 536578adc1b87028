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

  object GraphiteSink {
    /** The user-facing default, matching `(graphite {:host …})`
      * (graphite.clj:128-170): pooled TCP to host:2003 with the
      * reference's pool defaults (size 4, claim-timeout 0.1 s,
      * reconnect-interval 5 s, block-start). The transport-injected
      * constructor above remains for tests and exotic carriers. */
    def apply(host: String, port: Int = 2003, poolSize: Int = 4,
        claimTimeoutMs: Long = 100): GraphiteSink =
      new GraphiteSink(Pool.tcpLineTransport(host, port, size = poolSize,
        claimTimeoutMs = claimTimeoutMs))
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
    def publish(channel: String, batch: DataFrame, batchId: Long = 0L): Unit = {
      val subscribers = subs.getOrElse(channel, Vector.empty)
      if (subscribers.isEmpty) return
      // Fan-out fast path: when the batch is exactly the SEvent shape
      // or the tagged index shape (SEvent + tags — what Main's index
      // channel publishes) and several subscribers
      // filter it, collect ONCE and evaluate each subscriber's query
      // as the serving-path compiled closure — one Spark job per batch
      // instead of one filter+collect job PER SUBSCRIBER per batch
      // (1 000 ws clients = 1 000 jobs each micro-batch on the legacy
      // path). Each subscriber still receives a DataFrame: a local
      // relation Catalyst folds without submitting jobs. Closure ==
      // Catalyst on these schemas is EventPredicateSpec's pinned
      // parity (tagged/attribute membership included); any OTHER
      // shape — renamed, reordered, or extra columns — falls back to
      // the per-subscriber Catalyst filter.
      val base = Seq("host", "service", "state", "metric", "time", "ttl")
      val cols = batch.columns.toSeq
      val hasTags = cols == base :+ "tags" ||
        cols == base :+ "tags" :+ "attributes"
      val hasAttrs = cols == base :+ "tags" :+ "attributes"
      val fanout: Option[Seq[graft.streaming.WireEvent]] =
        if (subscribers.count(_._1.isDefined) >= 2 &&
            (cols == base || hasTags))
          try {
            import org.apache.spark.sql.functions.{expr, lit}
            // NULL (not empty) containers for columns the batch lacks:
            // Catalyst on the original schema resolves absent fields to
            // null literals, so `tags = nil` must stay true there
            val withTags =
              if (hasTags) batch
              else batch.withColumn("tags",
                lit(null).cast("array<string>"))
            val typed =
              if (hasAttrs) withTags
              else withTags.withColumn("attributes",
                expr("cast(null as map<string,string>)"))
            Some(typed.as[graft.streaming.WireEvent](
              org.apache.spark.sql.Encoders
                .product[graft.streaming.WireEvent])
              .collect().toSeq)
          } catch { case scala.util.control.NonFatal(_) => None }
        else None
      subscribers.foreach { case (q, sink) =>
        // per-sink isolation: one failing subscriber (bad query, dead
        // transport) must not abort delivery to the others or crash
        // the publishing (streaming) thread — mirrors the reference's
        // per-handler rescue
        try {
          val routed = (fanout, q) match {
            case (Some(events), _) =>
              val hits = q match {
                case Some(query) =>
                  events.filter(graft.query.EventPredicate.tagged(query))
                case None => events
              }
              batch.sparkSession.createDataFrame(
                java.util.Arrays.asList(hits.map(e =>
                  org.apache.spark.sql.Row(Seq(e.host, e.service, e.state,
                    e.metric.map(Double.box).orNull, e.time,
                    e.ttl.map(Double.box).orNull) ++
                    (if (hasTags) Seq(e.tags) else Nil) ++
                    (if (hasAttrs) Seq(e.attributes) else Nil): _*)): _*),
                batch.schema)
            case (None, Some(query)) => batch.filter(
              graft.query.QueryLanguage.predicate(query, batch.schema))
            case (None, None) => batch
          }
          sink.write(routed, batchId)
        } catch {
          case scala.util.control.NonFatal(e) =>
            org.slf4j.LoggerFactory.getLogger(getClass)
              .warn(s"pubsub '$channel': subscriber failed, skipping", e)
        }
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

  /** [[ForwardSink]] with the production transport out of the box:
    * pooled synchronous framed TCP ([[Pool.tcpFrameTransport]] — one
    * ack read per Msg), optionally over mutual TLS to a
    * `tlskeystore`-configured riemann server. */
  def forwardSink(host: String, port: Int,
      tls: Option[graft.TlsFiles] = None, batchSize: Int = 100): ForwardSink =
    new ForwardSink(Pool.tcpFrameTransport(host, port, tls), batchSize)

  /** `forward` (streams.clj:1255-1261): riemann→riemann forwarding —
    * events re-encoded to framed protobuf Msg payloads per partition,
    * handed to the injected TCP transport.
    *
    * Delivery contract (pinned by ForwardersSpec): the pooled framed
    * transport acks every Msg, which confirms TRANSPORT delivery, not
    * end-to-end idempotence. foreachBatch is at-least-once, so this
    * sink carries the same in-process batchId guard as
    * [[graft.streaming.ReinjectLoop]]: a same-process re-invocation of
    * an already-forwarded batchId is dropped. What the guard cannot
    * cover: a task RETRY re-sends its partition inside a batch (the
    * send happens on executors), and a JVM restart resets the guard so
    * the recovered query's replayed batch forwards again — both are
    * at-least-once, exactly like the reference's forward (reconnect +
    * resend). Downstream, riemann's index is latest-per-key and
    * absorbs replays idempotently; only downstream counters/rates
    * would double-count, and deduplicating there (e.g. streaming exact
    * dedup on an event id) is the receiving topology's call. */
  class ForwardSink(transport: Iterator[Array[Byte]] => Unit,
      batchSize: Int = 100) extends EventSink {
    private var lastRun: String = null
    private var lastBatch = Long.MinValue
    override def write(batch: DataFrame, batchId: Long): Unit = synchronized {
      // batchIds are monotonic only within one streaming RUN: a
      // redeploy with a fresh checkpoint restarts them at 0, and a
      // guard carried across runs would silently drop every batch
      // until the counter caught up. foreachBatch executes on the
      // query thread, where StreamExecution sets the runId as a local
      // property — key the guard on it and reset on change (null in
      // batch/test use, which still gets the in-run replay guard).
      val runId = batch.sparkSession.sparkContext
        .getLocalProperty("sql.streaming.runId")
      if (runId != lastRun) { lastRun = runId; lastBatch = Long.MinValue }
      if (batchId <= lastBatch) return
      // the guard advances only AFTER the forwarding job succeeds
      // (ReinjectLoop's discipline): marking first would record a
      // batch whose transport send FAILED as forwarded, and the
      // recovery replay would be silently dropped — event loss
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
      lastBatch = batchId
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
