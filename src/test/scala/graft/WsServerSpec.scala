package graft

import java.io.{BufferedInputStream, DataInputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Base64

import org.apache.spark.sql.functions._

import graft.sinks.{Sinks, WsServer}

/** `ws-server` end to end (transport/websockets.clj:83-243) with a
  * hand-rolled RFC 6455 client: handshake, masked client frames,
  * /index subscription push, /events PUT ingest, ping/pong. */
class WsServerSpec extends SparkSpec {

  private def handshake(sock: Socket, path: String): Unit = {
    val key = Base64.getEncoder.encodeToString(
      Array.tabulate[Byte](16)(i => (i * 7 + 3).toByte))
    sock.getOutputStream.write(
      (s"GET $path HTTP/1.1\r\nHost: localhost\r\nUpgrade: websocket\r\n" +
        s"Connection: Upgrade\r\nSec-WebSocket-Key: $key\r\n" +
        "Sec-WebSocket-Version: 13\r\n\r\n").getBytes(StandardCharsets.UTF_8))
    sock.getOutputStream.flush()
    val in = sock.getInputStream
    val head = new StringBuilder
    var c = in.read()
    while (c != -1 && !head.endsWith("\r\n\r\n")) {
      head.append(c.toChar)
      c = if (head.endsWith("\r\n\r\n")) -1 else in.read()
    }
    assert(head.toString.contains("101 Switching Protocols"))
    val expect = Base64.getEncoder.encodeToString(
      MessageDigest.getInstance("SHA-1").digest(
        (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11")
          .getBytes(StandardCharsets.US_ASCII)))
    assert(head.toString.contains(s"Sec-WebSocket-Accept: $expect"))
  }

  /** Client→server masked text frame. */
  private def maskedText(payload: String, opcode: Int = 0x1): Array[Byte] = {
    val data = payload.getBytes(StandardCharsets.UTF_8)
    require(data.length < 126)
    val mask = Array[Byte](0x11, 0x22, 0x33, 0x44)
    Array[Byte]((0x80 | opcode).toByte, (0x80 | data.length).toByte) ++
      mask ++ data.zipWithIndex.map { case (b, i) =>
        (b ^ mask(i % 4)).toByte }
  }

  /** Read one server frame (unmasked): (opcode, payload). */
  private def readFrame(in: DataInputStream): (Int, String) = {
    val b0 = in.readUnsignedByte()
    val b1 = in.readUnsignedByte()
    var len: Int = b1 & 0x7f
    if (len == 126) len = in.readUnsignedShort()
    val payload = new Array[Byte](len)
    in.readFully(payload)
    (b0 & 0x0f, new String(payload, StandardCharsets.UTF_8))
  }

  test("ws /index: handshake, initial dump, live filtered push, ping/pong") {
    val pubsub = new Sinks.Pubsub
    val idx = events(
      E(id = 1, host = "web01", service = "cpu", state = "critical", metric = 0.9),
      E(id = 2, host = "web02", service = "cpu", state = "ok", metric = 0.1))
    val server = new WsServer(pubsub, 0, () => Some(idx))
    try {
      val sock = new Socket("127.0.0.1", server.boundPort)
      sock.setSoTimeout(20000)
      try {
        handshake(sock, "/index?query=state%20%3D%20%22critical%22")
        val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
        val (op1, first) = readFrame(in)
        assert(op1 == 0x1 && first.contains("web01")) // only the critical hit

        pubsub.publish("index", events(
          E(id = 3, host = "web03", service = "mem", state = "critical", metric = 1.0),
          E(id = 4, host = "web04", service = "mem", state = "ok", metric = 0.2)))
        val (_, pushed) = readFrame(in)
        assert(pushed.contains("web03") && !pushed.contains("web04"))

        // ping -> pong with the same payload
        sock.getOutputStream.write(maskedText("hi", opcode = 0x9))
        sock.getOutputStream.flush()
        val (opPong, pong) = readFrame(in)
        assert(opPong == 0xa && pong == "hi")
      } finally sock.close()
    } finally server.stop()
  }

  test("ws: fragmented text message reassembles before delivery") {
    val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = new WsServer(new Sinks.Pubsub, 0, onEvent = got.add(_))
    try {
      val sock = new Socket("127.0.0.1", server.boundPort)
      sock.setSoTimeout(10000)
      try {
        handshake(sock, "/events")
        val out = sock.getOutputStream
        // {"host":"frag"} split across a non-FIN text frame + a FIN
        // continuation (opcode 0)
        val mask = Array[Byte](1, 2, 3, 4)
        def frame(fin: Boolean, opcode: Int, s: String): Array[Byte] = {
          val data = s.getBytes(StandardCharsets.UTF_8)
          Array[Byte](((if (fin) 0x80 else 0) | opcode).toByte,
            (0x80 | data.length).toByte) ++ mask ++
            data.zipWithIndex.map { case (b, i) => (b ^ mask(i % 4)).toByte }
        }
        out.write(frame(fin = false, 0x1, """{"host":"""))
        out.write(frame(fin = true, 0x0, """"frag"}"""))
        out.flush()
        val deadline = System.currentTimeMillis() + 10000
        while (got.isEmpty && System.currentTimeMillis() < deadline)
          Thread.sleep(50)
        assert(got.peek() == """{"host":"frag"}""")
      } finally sock.close()
    } finally server.stop()
  }

  test("ws /events: masked text frames land as JSON events in the consumer") {
    val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val pubsub = new Sinks.Pubsub
    val server = new WsServer(pubsub, 0, onEvent = got.add(_))
    try {
      val sock = new Socket("127.0.0.1", server.boundPort)
      sock.setSoTimeout(10000)
      try {
        handshake(sock, "/events")
        val out = sock.getOutputStream
        out.write(maskedText("""{"host":"ws01","service":"cpu","metric":1.5}"""))
        out.write(maskedText("""{"host":"ws02","service":"mem","metric":2.5}"""))
        out.flush()
        val deadline = System.currentTimeMillis() + 10000
        while (got.size < 2 && System.currentTimeMillis() < deadline)
          Thread.sleep(50)
        assert(got.size == 2)

        // the received JSON decodes against the canonical Event schema
        // (the same from_json path the kafka source uses)
        val spark0 = spark
        import spark0.implicits._
        val decoded = got.toArray.map(_.toString).toSeq.toDF("value")
          .select(from_json(col("value"), graft.model.Event.schema).as("e"))
          .select("e.host", "e.metric")
        assert(decoded.collect().map(r => (r.getString(0), r.getDouble(1)))
          .toSet == Set(("ws01", 1.5), ("ws02", 2.5)))
      } finally sock.close()
    } finally server.stop()
  }
}
