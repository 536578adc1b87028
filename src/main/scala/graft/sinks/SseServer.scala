package graft.sinks

import java.io.{BufferedReader, InputStreamReader, OutputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket, URLDecoder}
import java.nio.charset.StandardCharsets

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.query.QueryLanguage

/** `sse-server` (reference src/riemann/transport/sse.clj:47-170): HTTP
  * clients GET `/index?query=<query-language>` and receive
  * `data: <event-json>\n\n` frames — first the current index search
  * results, then a live pubsub subscription to the "index" channel
  * filtered by the same query, until the client disconnects.
  *
  * The driver hosts the HTTP listener (as with [[graft.sources.RiemannServers]],
  * socket assembly is central, the riemann role netty plays in the
  * reference); the subscription push itself is inherently driver-side
  * fan-out — per-client volume is a filtered alert stream, not the
  * firehose. `snapshot()` supplies the current index relation for the
  * initial dump (None skips it). The websocket transport shares ALL of
  * these semantics (ws subscribe = this pubsub+query path, ws PUT =
  * the JSON decode the kafka source uses); only the ws frame codec is
  * out of scope. */
class SseServer(pubsub: Sinks.Pubsub, port: Int,
    snapshot: () => Option[DataFrame] = () => None,
    host: String = "127.0.0.1") {

  private val server = new ServerSocket()
  server.bind(new InetSocketAddress(host, port))
  @volatile private var running = true
  private val clients = new ArrayBuffer[Socket]()

  val boundPort: Int = server.getLocalPort

  private val acceptor = new Thread(() =>
    try {
      while (running) {
        val client = server.accept()
        clients.synchronized(clients += client)
        val t = new Thread(() =>
          try serve(client)
          catch { case _: java.io.IOException => () }
          finally {
            client.close()
            clients.synchronized { clients -= client; () }
          }, s"sse-client-${client.getPort}")
        t.setDaemon(true)
        t.start()
      }
    } catch { case _: java.io.IOException => () }, "sse-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  private def jsonLines(batch: DataFrame): Array[String] =
    batch.select(to_json(struct(batch.columns.toIndexedSeq.map(col): _*)))
      .collect().map(_.getString(0))

  private def sendEvent(out: OutputStream, json: String): Unit = {
    out.write(s"data: $json\n\n".getBytes(StandardCharsets.UTF_8))
    out.flush()
  }

  private def serve(client: Socket): Unit = {
    val in = new BufferedReader(new InputStreamReader(
      client.getInputStream, StandardCharsets.UTF_8))
    val out = client.getOutputStream
    // request line + headers (headers themselves are not needed)
    val reqLine = in.readLine()
    var line = in.readLine()
    while (line != null && line.nonEmpty) line = in.readLine()
    val parts = if (reqLine == null) Array.empty[String] else reqLine.split(" ")
    val uri = if (parts.length >= 2) parts(1) else ""
    val (path, rawQuery) = uri.split("\\?", 2) match {
      case Array(p, q) => (p, Some(q))
      case Array(p) => (p, None)
    }
    if (!path.matches("^/index/?$")) {
      out.write(("HTTP/1.1 404 Not Found\r\nContent-Length: 0\r\n\r\n")
        .getBytes(StandardCharsets.UTF_8))
      out.flush()
      return
    }
    val query = rawQuery.flatMap(_.split("&").collectFirst {
      case kv if kv.startsWith("query=") =>
        URLDecoder.decode(kv.stripPrefix("query="), "UTF-8")
    }).filter(_.nonEmpty)
    out.write(("HTTP/1.1 200 OK\r\nContent-Type: text/event-stream\r\n" +
      "Cache-Control: no-cache\r\nConnection: keep-alive\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8))
    out.flush()

    // 1. current index state, filtered by the query
    snapshot().foreach { idx =>
      val hits = query.fold(idx)(q =>
        idx.filter(QueryLanguage.predicate(q, idx.schema)))
      jsonLines(hits).foreach(sendEvent(out, _))
    }

    // 2. live subscription until the client hangs up; a dead socket
    // detaches itself rather than failing publish for other subscribers
    object sink extends Sinks.EventSink {
      override def write(batch: DataFrame, batchId: Long): Unit =
        try jsonLines(batch).foreach(sendEvent(out, _))
        catch {
          case _: java.io.IOException =>
            pubsub.unsubscribe("index", this)
            client.close()
        }
    }
    query match {
      case Some(q) => pubsub.subscribeQuery("index", q, sink)
      case None => pubsub.subscribe("index", sink)
    }
    try {
      // park until disconnect: the client never sends again, so read()
      // returns -1 (or throws) exactly when the connection drops
      while (running && in.read() != -1) ()
    } finally pubsub.unsubscribe("index", sink)
  }

  def stop(): Unit = {
    running = false
    server.close()
    clients.synchronized { clients.foreach(c =>
      try c.close() catch { case _: java.io.IOException => () }) }
  }
}
