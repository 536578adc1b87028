package graft

import java.io.BufferedReader
import java.io.InputStreamReader
import java.net.Socket
import java.nio.charset.StandardCharsets

import graft.sinks.{Sinks, SseServer}

/** `sse-server` end to end (transport/sse.clj:47-170): HTTP GET with a
  * query-language query → current index hits as `data:` frames, then
  * live pubsub pushes filtered by the same query. */
class SseServerSpec extends SparkSpec {

  test("sse: initial index dump + live filtered subscription over HTTP") {
    val pubsub = new Sinks.Pubsub
    val idx = events(
      E(id = 1, host = "web01", service = "cpu", state = "critical", metric = 0.9),
      E(id = 2, host = "web02", service = "cpu", state = "ok", metric = 0.1))
    val server = new SseServer(pubsub, 0, () => Some(idx))
    try {
      val sock = new Socket("127.0.0.1", server.boundPort)
      sock.setSoTimeout(20000)
      try {
        val out = sock.getOutputStream
        out.write(("GET /index?query=state%20%3D%20%22critical%22 HTTP/1.1\r\n" +
          "Host: localhost\r\nAccept: text/event-stream\r\n\r\n")
          .getBytes(StandardCharsets.UTF_8))
        out.flush()
        val in = new BufferedReader(new InputStreamReader(
          sock.getInputStream, StandardCharsets.UTF_8))
        assert(in.readLine().contains("200"))
        var line = in.readLine()
        while (line != null && line.nonEmpty) line = in.readLine() // headers
        // initial dump: only the critical event passes the query
        val first = in.readLine()
        assert(first.startsWith("data: ") && first.contains("web01"))
        assert(in.readLine().isEmpty) // frame terminator

        // live publish: one matching, one filtered out
        pubsub.publish("index", events(
          E(id = 3, host = "web03", service = "mem", state = "critical", metric = 1.0),
          E(id = 4, host = "web04", service = "mem", state = "ok", metric = 0.2)))
        val pushed = in.readLine()
        assert(pushed.startsWith("data: ") && pushed.contains("web03"))
        assert(in.readLine().isEmpty)
        // nothing else is buffered: web04 was filtered by the query
        pubsub.publish("index", events(
          E(id = 5, host = "web05", service = "mem", state = "critical", metric = 2.0)))
        val next = in.readLine()
        assert(next.contains("web05") && !next.contains("web04"))
      } finally sock.close()
    } finally server.stop()
  }

  test("sse: unknown path 404s; unsubscribe detaches the sink") {
    val pubsub = new Sinks.Pubsub
    val server = new SseServer(pubsub, 0)
    try {
      val sock = new Socket("127.0.0.1", server.boundPort)
      sock.setSoTimeout(10000)
      try {
        sock.getOutputStream.write(
          "GET /nope HTTP/1.1\r\nHost: x\r\n\r\n".getBytes(StandardCharsets.UTF_8))
        sock.getOutputStream.flush()
        val in = new BufferedReader(new InputStreamReader(sock.getInputStream))
        assert(in.readLine().contains("404"))
      } finally sock.close()

      // a malformed query is rejected up front with 400 — it must never
      // reach publish, where it would fail every subscriber
      val bad = new Socket("127.0.0.1", server.boundPort)
      bad.setSoTimeout(10000)
      try {
        bad.getOutputStream.write(
          "GET /index?query=%28garbage HTTP/1.1\r\nHost: x\r\n\r\n"
            .getBytes(StandardCharsets.UTF_8))
        bad.getOutputStream.flush()
        val bin = new BufferedReader(new InputStreamReader(bad.getInputStream))
        assert(bin.readLine().contains("400"))
      } finally bad.close()

      // unsubscribe by identity removes exactly that sink
      val a = new Sinks.MemorySink
      val b = new Sinks.MemorySink
      pubsub.subscribe("index", a)
      pubsub.subscribe("index", b)
      pubsub.unsubscribe("index", a)
      pubsub.publish("index", events(E(id = 1, metric = 1.0)))
      assert(a.size == 0 && b.size == 1)
    } finally server.stop()
  }
}
