package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.{DatagramPacket, DatagramSocket, InetAddress, ServerSocket, Socket}

import org.apache.spark.sql.functions._

import graft.operators.Index
import graft.sources.{RiemannProtobuf, RiemannServers, Sources}
import graft.sources.RiemannProtobuf.PEvent

/** End-to-end ingest over the real wire protocol (reference
  * src/riemann/transport/tcp.clj:246-296, udp.clj:147-181): a client
  * socket sends int32-framed protobuf `Msg` bytes to the
  * `riemann-server` MicroBatchStream, which acks each Msg, decodes on
  * executors, and feeds the index + query-language search. */
class RiemannServerSpec extends SparkSpec {

  private def freePort(): Int = {
    val s = new ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  private def pe(host: String, service: String, state: String, m: Double,
      t: Long) =
    PEvent(host, service, state, null, Some(m), Seq("wire"), Some(t),
      Some(60.0), Map("src" -> "test"))

  private def connectRetry(port: Int, attempts: Int = 100): Socket = {
    var last: Exception = null
    (1 to attempts).foreach { _ =>
      try return new Socket("127.0.0.1", port)
      catch { case e: java.io.IOException =>
        last = e; Thread.sleep(100) }
    }
    throw last
  }

  /** Drive micro-batches until the memory sink holds `n` rows. */
  private def awaitRows(q: org.apache.spark.sql.streaming.StreamingQuery,
      table: String, n: Long): Unit = {
    val deadline = System.currentTimeMillis() + 30000
    while (spark.table(table).count() < n) {
      assert(System.currentTimeMillis() < deadline,
        s"timed out waiting for $n rows in $table")
      Thread.sleep(100)
      q.processAllAvailable()
    }
  }

  test("tcp server: framed Msg -> ack -> decode -> index -> query search") {
    val port = freePort()
    val q = Sources.riemannTcpServer(spark, "127.0.0.1", port)
      .writeStream.format("memory").queryName("tcp_e2e")
      .outputMode("append").start()
    try {
      val sock = connectRetry(port)
      try {
        val out = new DataOutputStream(sock.getOutputStream)
        val in = new DataInputStream(sock.getInputStream)
        // two Msgs on one connection: a 2-event batch, then 1 more
        out.write(RiemannProtobuf.frame(RiemannProtobuf.encodeMsg(Seq(
          pe("web01", "cpu", "ok", 0.7, 1706000000L),
          pe("web02", "cpu", "critical", 0.95, 1706000010L)))))
        out.flush()
        out.write(RiemannProtobuf.frame(RiemannProtobuf.encodeMsg(Seq(
          pe("web01", "mem", "ok", 512.0, 1706000020L)))))
        out.flush()
        // each Msg is acked with framed Msg{ok: true}
        (1 to 2).foreach { _ =>
          val len = in.readInt()
          val ack = new Array[Byte](len)
          in.readFully(ack)
          assert(ack.sameElements(Array[Byte](0x10, 1)))
        }
      } finally sock.close()

      awaitRows(q, "tcp_e2e", 3)
      val emitted = spark.table("tcp_e2e")
        .withColumn("event_id", monotonically_increasing_id())

      // wire metadata survives the trip
      assert(emitted.filter(col("host") === "web02").count() == 1)
      assert(one[Double](emitted.filter(col("host") === "web02"), "metric") == 0.95)
      assert(one[scala.collection.Seq[String]](
        emitted.filter(col("service") === "mem"), "tags").toList == List("wire"))
      assert(one[Map[String, String]](
        emitted.filter(col("service") === "mem"), "attributes")("src") == "test")

      // ...and answers a query-language search through the index
      val hits = Index.searchEvents(emitted,
        """state = "critical" and metric > 0.9""")
      assert(hits.select("host").collect().map(_.getString(0)).toSeq ==
        Seq("web02"))
    } finally q.stop()
  }

  test("udp server: one un-framed Msg per datagram, no ack") {
    val port = freePort()
    val q = Sources.riemannUdpServer(spark, "127.0.0.1", port)
      .writeStream.format("memory").queryName("udp_e2e")
      .outputMode("append").start()
    try {
      // the bind happens at stream construction; retry until it's up
      val payload = RiemannProtobuf.encodeMsg(Seq(
        pe("edge01", "ping", "ok", 1.0, 1706000100L)))
      val sock = new DatagramSocket()
      try {
        val addr = InetAddress.getByName("127.0.0.1")
        val deadline = System.currentTimeMillis() + 30000
        while (spark.table("udp_e2e").count() < 1) {
          assert(System.currentTimeMillis() < deadline,
            "timed out waiting for the datagram to land")
          sock.send(new DatagramPacket(payload, payload.length, addr, port))
          Thread.sleep(200)
          q.processAllAvailable()
        }
      } finally sock.close()
      val got = spark.table("udp_e2e").filter(col("host") === "edge01")
      assert(got.count() >= 1)
      assert(one[Double](got.limit(1), "metric") == 1.0)
    } finally q.stop()
  }

  test("truncated/corrupt frames are dropped, later Msgs still decode") {
    val port = freePort()
    val q = Sources.riemannTcpServer(spark, "127.0.0.1", port)
      .writeStream.format("memory").queryName("tcp_corrupt")
      .outputMode("append").start()
    try {
      val sock = connectRetry(port)
      try {
        val out = new DataOutputStream(sock.getOutputStream)
        // a frame whose payload is garbage protobuf: the server buffers
        // it (framing is intact), the executor-side decode drops it
        out.write(RiemannProtobuf.frame(Array[Byte](0x7f, -1, -1, -1, -1)))
        out.write(RiemannProtobuf.frame(RiemannProtobuf.encodeMsg(Seq(
          pe("ok01", "cpu", "ok", 2.0, 1706000200L)))))
        out.flush()
        val in = new DataInputStream(sock.getInputStream)
        (1 to 2).foreach { _ =>
          val len = in.readInt(); in.readFully(new Array[Byte](len))
        }
      } finally sock.close()
      awaitRows(q, "tcp_corrupt", 1)
      assert(one[String](spark.table("tcp_corrupt"), "host") == "ok01")
    } finally q.stop()
  }
}
