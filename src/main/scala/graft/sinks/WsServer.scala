package graft.sinks

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, InputStream, OutputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket, URLDecoder}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Base64

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.query.QueryLanguage

/** `ws-server` (reference src/riemann/transport/websockets.clj:83-243):
  * the two websocket endpoints —
  *
  *  - `GET /index?query=…` + websocket upgrade: current index hits,
  *    then a live pubsub subscription filtered by the query, each
  *    event one text frame of JSON (ws-pubsub-handler / ws-index).
  *  - `PUT/GET /events` + upgrade: each inbound text frame is one
  *    JSON event handed to `onEvent` (ws-put-events-handler) — wire it
  *    to a [[graft.streaming.ReinjectLoop]] or a `from_json` decode
  *    against `Event.schema` (the same decode the kafka source uses).
  *
  * RFC 6455 is hand-rolled on the JDK (SHA-1 + Base64 handshake,
  * masked client frames, unmasked server frames, ping/pong, close) —
  * no dependencies. As with [[SseServer]], the driver hosts the
  * socket; per-client volume is a filtered alert stream. */
class WsServer(pubsub: Sinks.Pubsub, port: Int,
    snapshot: () => Option[DataFrame] = () => None,
    onEvent: String => Unit = _ => (),
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
          }, s"ws-client-${client.getPort}")
        t.setDaemon(true)
        t.start()
      }
    } catch { case _: java.io.IOException => () }, "ws-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  // ------------------------------------------------------------ RFC 6455
  private val WsGuid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

  private def acceptKey(key: String): String =
    Base64.getEncoder.encodeToString(
      MessageDigest.getInstance("SHA-1")
        .digest((key + WsGuid).getBytes(StandardCharsets.US_ASCII)))

  /** One server→client text frame (FIN, unmasked). */
  private[sinks] def textFrame(payload: String): Array[Byte] = {
    val data = payload.getBytes(StandardCharsets.UTF_8)
    val header =
      if (data.length < 126) Array[Byte](0x81.toByte, data.length.toByte)
      else if (data.length <= 0xffff)
        Array[Byte](0x81.toByte, 126,
          (data.length >> 8).toByte, data.length.toByte)
      else Array[Byte](0x81.toByte, 127, 0, 0, 0, 0,
        (data.length >> 24).toByte, (data.length >> 16).toByte,
        (data.length >> 8).toByte, data.length.toByte)
    header ++ data
  }

  /** Read one client frame: (opcode, payload) — client frames MUST be
    * masked (RFC 6455 §5.1). */
  private def readFrame(in: DataInputStream): (Int, Array[Byte]) = {
    val b0 = in.readUnsignedByte()
    val opcode = b0 & 0x0f
    val b1 = in.readUnsignedByte()
    val masked = (b1 & 0x80) != 0
    var len: Long = b1 & 0x7f
    if (len == 126) len = in.readUnsignedShort().toLong
    else if (len == 127) len = in.readLong()
    if (len > (16 << 20)) throw new java.io.IOException(s"frame too big: $len")
    val mask = if (masked) {
      val m = new Array[Byte](4); in.readFully(m); m
    } else null
    val payload = new Array[Byte](len.toInt)
    in.readFully(payload)
    if (masked) {
      var i = 0
      while (i < payload.length) {
        payload(i) = (payload(i) ^ mask(i % 4)).toByte; i += 1
      }
    }
    (opcode, payload)
  }

  private def jsonLines(batch: DataFrame): Array[String] =
    batch.select(to_json(struct(batch.columns.toIndexedSeq.map(col): _*)))
      .collect().map(_.getString(0))

  // ------------------------------------------------------------- handler
  private def serve(client: Socket): Unit = {
    val in = new DataInputStream(new BufferedInputStream(client.getInputStream))
    val out = new BufferedOutputStream(client.getOutputStream)
    def send(bytes: Array[Byte]): Unit = { out.write(bytes); out.flush() }

    // HTTP upgrade request (byte-wise: nothing past the blank line may
    // be consumed — the first ws frame follows immediately)
    val head = new StringBuilder
    var cur = in.read()
    while (cur != -1 && !head.endsWith("\r\n\r\n")) {
      head.append(cur.toChar)
      cur = if (head.endsWith("\r\n\r\n")) -1 else in.read()
    }
    val lines = head.toString.split("\r\n")
    val reqParts = lines.headOption.getOrElse("").split(" ")
    val uri = if (reqParts.length >= 2) reqParts(1) else ""
    val key = lines.collectFirst {
      case l if l.toLowerCase.startsWith("sec-websocket-key:") =>
        l.split(":", 2)(1).trim
    }
    if (key.isEmpty) {
      send("HTTP/1.1 400 Bad Request\r\nContent-Length: 0\r\n\r\n"
        .getBytes(StandardCharsets.UTF_8))
      return
    }
    val (path, rawQuery) = uri.split("\\?", 2) match {
      case Array(p, q) => (p, Some(q))
      case Array(p) => (p, None)
    }
    send(("HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n" +
      s"Connection: Upgrade\r\nSec-WebSocket-Accept: ${acceptKey(key.get)}\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8))

    val subscribed = path.matches("^/index/?$")
    val query = rawQuery.flatMap(_.split("&").collectFirst {
      case kv if kv.startsWith("query=") =>
        URLDecoder.decode(kv.stripPrefix("query="), "UTF-8")
    }).filter(_.nonEmpty)

    object sink extends Sinks.EventSink {
      override def write(batch: DataFrame, batchId: Long): Unit =
        try jsonLines(batch).foreach(j => send(textFrame(j)))
        catch {
          case _: java.io.IOException =>
            pubsub.unsubscribe("index", this)
            client.close()
        }
    }
    if (subscribed) {
      snapshot().foreach { idx =>
        val hits = query.fold(idx)(q =>
          idx.filter(QueryLanguage.predicate(q, idx.schema)))
        jsonLines(hits).foreach(j => send(textFrame(j)))
      }
      query match {
        case Some(q) => pubsub.subscribeQuery("index", q, sink)
        case None => pubsub.subscribe("index", sink)
      }
    }
    try {
      var open = true
      while (running && open) {
        val (opcode, payload) = readFrame(in)
        opcode match {
          case 0x1 if !subscribed => // text frame on /events: one event
            onEvent(new String(payload, StandardCharsets.UTF_8))
          case 0x8 => // close: echo and drop
            send(Array[Byte](0x88.toByte, 0)); open = false
          case 0x9 => // ping -> pong with the same payload
            send(Array[Byte](0x8a.toByte, payload.length.toByte) ++ payload)
          case _ => () // text on /index, pong, continuations: ignored
        }
      }
    } finally if (subscribed) pubsub.unsubscribe("index", sink)
  }

  def stop(): Unit = {
    running = false
    server.close()
    clients.synchronized { clients.foreach(c =>
      try c.close() catch { case _: java.io.IOException => () }) }
  }
}
