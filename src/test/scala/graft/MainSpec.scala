package graft

import java.io.{BufferedInputStream, DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.security.MessageDigest
import java.util.Base64

import graft.sources.RiemannProtobuf
import graft.sources.RiemannProtobuf.PEvent

/** The packaged process (bin.clj:135-167 analog) end to end: a config
  * file defines the servers and the index topology, [[Main.start]]
  * assembles it, events arrive over a REAL framed-protobuf TCP socket,
  * and `GET /index?query=…` over a REAL websocket answers from the
  * served index — then a mid-traffic reload preserves both the index
  * and undrained acked frames. */
class MainSpec extends SparkSpec {

  private def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  private def connect(port: Int): Socket = {
    var s: Socket = null
    var last: Exception = null
    (1 to 100).foreach { _ =>
      if (s == null) try s = new Socket("127.0.0.1", port)
      catch { case e: java.io.IOException => last = e; Thread.sleep(100) }
    }
    if (s == null) throw last
    s
  }

  private def sendEvents(port: Int, events: Seq[PEvent]): Unit = {
    val sock = connect(port)
    try {
      val out = new DataOutputStream(sock.getOutputStream)
      val in = new DataInputStream(sock.getInputStream)
      events.foreach { e =>
        out.write(RiemannProtobuf.frame(RiemannProtobuf.encodeMsg(Seq(e))))
        out.flush()
        val len = in.readInt()
        in.readFully(new Array[Byte](len)) // the ok-ack
      }
    } finally sock.close()
  }

  private def wsHandshake(sock: Socket, path: String): Unit = {
    val key = Base64.getEncoder.encodeToString(
      Array.tabulate[Byte](16)(i => (i * 5 + 1).toByte))
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

  private def readFrame(in: DataInputStream): (Int, String) = {
    val b0 = in.readUnsignedByte()
    val b1 = in.readUnsignedByte()
    var len: Int = b1 & 0x7f
    if (len == 126) len = in.readUnsignedShort()
    val payload = new Array[Byte](len)
    in.readFully(payload)
    (b0 & 0x0f, new String(payload, StandardCharsets.UTF_8))
  }

  /** Dump the current /index hits for a query over a fresh ws client. */
  private def wsIndexDump(port: Int, query: String, atLeast: Int): Seq[String] = {
    val sock = connect(port)
    sock.setSoTimeout(20000)
    try {
      wsHandshake(sock,
        "/index?query=" + java.net.URLEncoder.encode(query, "UTF-8"))
      val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
      (1 to atLeast).map(_ => readFrame(in)._2)
    } finally sock.close()
  }

  test("config file -> Main.start -> TCP ingest -> ws index query; " +
    "reload mid-traffic preserves index state and acked frames") {
    val tcpPort = freePort()
    val tcp2Port = freePort()
    val wsPort = freePort()
    val dir = Files.createTempDirectory("graft-main")
    val cfg = dir.resolve("graft.json")
    val ckpt = dir.resolve("ckpt").toString
    // two ingest servers (each server source feeds exactly one stream):
    // tcp -> the index topology, tcp2 -> a filtering stream whose
    // definition the reload changes mid-traffic
    def writeCfg(hotExpr: String): Unit = Files.writeString(cfg,
      s"""{"servers": {
         |   "tcp":  {"host": "127.0.0.1", "port": $tcpPort},
         |   "tcp2": {"protocol": "tcp", "host": "127.0.0.1", "port": $tcp2Port},
         |   "ws":   {"port": $wsPort} },
         | "streams": [
         |   {"name": "index", "source": "tcp",
         |    "pipeline": [{"op": "index"}],
         |    "sink": {"kind": "index", "outputMode": "update",
         |             "checkpoint": "$ckpt"}},
         |   {"name": "hot", "source": "tcp2",
         |    "pipeline": [{"op": "where", "expr": "$hotExpr"}],
         |    "sink": {"kind": "memory"}}
         |]}""".stripMargin)
    writeCfg("metric > 0.5")

    val running = Main.start(cfg, Some(spark))
    try {
      def drain(): Unit =
        running.core.activeQueries.values.foreach(_.processAllAvailable())

      def ev(host: String, metric: Double, t: Long) =
        PEvent(host, "cpu", if (metric > 0.8) "critical" else "ok", null,
          Some(metric), Nil, Some(t), Some(3600.0), Map.empty)

      sendEvents(tcpPort, Seq(
        ev("web01", 0.95, 1706000000L), ev("web02", 0.30, 1706000010L)))
      drain()
      val deadline = System.currentTimeMillis() + 30000
      while (running.index.size < 2 &&
          System.currentTimeMillis() < deadline) { drain(); Thread.sleep(100) }
      assert(running.index.size == 2, s"index has ${running.index.size} keys")

      // the query surface, over the wire: only web01 is critical
      val hits = wsIndexDump(wsPort, """state = "critical"""", 1)
      assert(hits.exists(_.contains("web01")), s"hits: $hits")
      assert(!hits.exists(_.contains("web02")))

      // the riemann-wire query path (transport.clj:175-181): a
      // Msg{query} on the INGEST socket answers from the same index
      def wireQuery(q: String): (Option[Boolean], Option[String],
          Seq[RiemannProtobuf.PEvent]) = {
        val sock = connect(tcpPort)
        sock.setSoTimeout(20000)
        try {
          val out = new DataOutputStream(sock.getOutputStream)
          val in = new DataInputStream(sock.getInputStream)
          out.write(RiemannProtobuf.frame(RiemannProtobuf.encodeQueryMsg(q)))
          out.flush()
          val len = in.readInt()
          val reply = new Array[Byte](len)
          in.readFully(reply)
          RiemannProtobuf.decodeReply(reply)
        } finally sock.close()
      }
      val (ok, err, evs) = wireQuery("""state = "critical"""")
      assert(ok.contains(true) && err.isEmpty, s"reply: $ok $err")
      assert(evs.map(_.host) == Seq("web01"), s"events: $evs")
      val (bok, berr, bevs) = wireQuery("state ===== not a query")
      assert(bok.contains(false) && bevs.isEmpty)
      assert(berr.exists(_.startsWith("parse error")), s"error: $berr")

      // serving-path throughput: the compiled-closure evaluator (no
      // per-query Spark job) must clear hundreds of sequential wire
      // queries per second over ONE socket — a Spark-job-per-query
      // path caps at ~10-20 QPS, so 200 QPS separates cleanly even on
      // a loaded CI box. Mixed pkey point lookups and scan queries.
      locally {
        val sock = connect(tcpPort)
        sock.setSoTimeout(20000)
        try {
          val out = new DataOutputStream(sock.getOutputStream)
          val in = new DataInputStream(sock.getInputStream)
          val n = 300
          val t0 = System.nanoTime()
          (1 to n).foreach { i =>
            val q = if (i % 2 == 0) """host = "web01" and service = "cpu""""
              else """state = "critical""""
            out.write(RiemannProtobuf.frame(RiemannProtobuf.encodeQueryMsg(q)))
            out.flush()
            val len = in.readInt()
            val reply = new Array[Byte](len)
            in.readFully(reply)
            val (qok, _, qevs) = RiemannProtobuf.decodeReply(reply)
            assert(qok.contains(true) && qevs.nonEmpty)
          }
          val qps = n / ((System.nanoTime() - t0) / 1e9)
          info(f"wire serving: $qps%.0f queries/s (closed-loop, one socket)")
          // floor sits 2.5x above the old Spark-job path's IDLE ~20 QPS
          // yet 60x under the closure path's measured ~3300, so a
          // loaded CI box (the repo documents 2-7x inflation) cannot
          // flake it while a per-query-Spark-job regression still fails
          assert(qps > 50, f"serving path too slow: $qps%.0f QPS")
        } finally sock.close()
      }

      // the reference's index stores whole events: tags ingested on
      // the wire survive the tagged index path and answer `tagged`
      // queries (with the tags riding back in the reply)
      sendEvents(tcpPort, Seq(PEvent("web09", "disk", "warning", null,
        Some(0.7), Seq("prod", "canary"), Some(1706000040L), Some(3600.0),
        Map("dc" -> "eu"))))
      drain()
      while (running.index.size < 3 &&
          System.currentTimeMillis() < deadline) { drain(); Thread.sleep(100) }
      val (tok, terr, tevs) = wireQuery("""tagged "canary"""")
      assert(tok.contains(true) && terr.isEmpty, s"reply: $tok $terr")
      assert(tevs.map(_.host) == Seq("web09"), s"events: $tevs")
      assert(tevs.head.tags == Seq("prod", "canary"), s"tags: $tevs")
      assert(tevs.head.attributes == Map("dc" -> "eu"), s"attrs: $tevs")
      // attribute queries resolve through the stored attributes
      val (aok, _, aevs) = wireQuery("""dc = "eu"""")
      assert(aok.contains(true) && aevs.map(_.host) == Seq("web09"),
        s"attr query: $aevs")

      // ACK some frames on tcp2 that its query has not drained yet,
      // then reload with a CHANGED hot definition: the restarted query
      // must adopt the parked frames (CoreSpec's handoff, here driven
      // through the packaged process); the untouched index stream must
      // keep running with its served state intact
      sendEvents(tcp2Port, Seq(ev("app01", 0.70, 1706000050L)))
      val beforeId = running.core.activeQueries("index").id
      writeCfg("metric > 0.6")
      val restarted = running.loader.reload() // what SIGHUP invokes
      assert(restarted == Seq("hot"), s"restarted: $restarted")
      assert(running.core.activeQueries("index").id == beforeId,
        "unchanged index stream must not restart on reload")
      assert(running.index.size == 3, "reload lost served index state")

      // post-reload traffic still flows into both topologies
      sendEvents(tcpPort, Seq(ev("web03", 0.99, 1706000100L)))
      sendEvents(tcp2Port, Seq(ev("app02", 0.65, 1706000110L)))
      drain()
      while ((running.index.size < 4 ||
          running.loader.memorySinks("hot").size < 2) &&
          System.currentTimeMillis() < deadline) { drain(); Thread.sleep(100) }
      assert(running.index.size == 4)
      val hits2 = wsIndexDump(wsPort, """state = "critical"""", 2)
      assert(hits2.exists(_.contains("web01")) &&
        hits2.exists(_.contains("web03")), s"hits: $hits2")
      // app01 was acked pre-reload and adopted by the restarted query;
      // app02 arrived after — both pass the new metric > 0.6 filter
      import scala.jdk.CollectionConverters._
      val hotHosts = running.loader.memorySinks("hot").rows.asScala
        .map(_.getAs[String]("host")).toSet
      assert(hotHosts == Set("app01", "app02"), s"hot saw $hotHosts")
    } finally {
      running.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("multi-source stream over REAL sockets: one config stream fed by " +
    "the tcp AND udp server blocks at once — the reference's default " +
    "deployment shape (riemann.config:6-28: one (streams ...) topology " +
    "receiving from every transport, core.clj:15-20)") {
    import java.net.{DatagramPacket, DatagramSocket, InetAddress}
    val tcpPort = freePort()
    val udpPort = freePort()
    val dir = Files.createTempDirectory("graft-main-multisrc")
    val cfg = dir.resolve("graft.json")
    Files.writeString(cfg,
      s"""{"servers": {
         |   "tcp": {"host": "127.0.0.1", "port": $tcpPort},
         |   "udp": {"host": "127.0.0.1", "port": $udpPort} },
         | "streams": [
         |   {"name": "merged", "source": ["tcp", "udp"],
         |    "pipeline": [{"op": "where", "expr": "metric > 0.1"}],
         |    "sink": {"kind": "memory"}}
         |]}""".stripMargin)
    val running = Main.start(cfg, Some(spark))
    try {
      // each server source has exactly ONE subscriber: the union
      // consumes both directly — one query, no tee
      assert(running.core.activeQueries.keySet == Set("merged"))
      def drain(): Unit =
        running.core.activeQueries.values.foreach(_.processAllAvailable())
      def ev(host: String, metric: Double, t: Long) =
        PEvent(host, "cpu", "ok", null, Some(metric), Nil, Some(t),
          Some(3600.0), Map.empty)

      sendEvents(tcpPort, Seq(ev("via-tcp", 0.9, 1706000000L)))
      drain()
      // udp has no ack: resend until the datagram lands
      val payload = RiemannProtobuf.encodeMsg(Seq(
        ev("via-udp", 0.8, 1706000010L)))
      val sock = new DatagramSocket()
      import scala.jdk.CollectionConverters._
      def hosts(): Set[String] = running.loader.memorySinks("merged")
        .rows.asScala.map(_.getAs[String]("host")).toSet
      try {
        val addr = InetAddress.getByName("127.0.0.1")
        val deadline = System.currentTimeMillis() + 30000
        while (!hosts().contains("via-udp")) {
          assert(System.currentTimeMillis() < deadline,
            s"udp event never landed; sink has ${hosts()}")
          sock.send(new DatagramPacket(payload, payload.length, addr, udpPort))
          Thread.sleep(200)
          drain()
        }
      } finally sock.close()
      // both transports' events flowed through the ONE stream
      assert(hosts() == Set("via-tcp", "via-udp"), s"saw ${hosts()}")
    } finally {
      running.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("files-protocol ingest: the packaged process runs a curation-" +
    "style firehose from a parquet landing zone — natively replayable " +
    "(two subscribers, NO tee), later-landed files flow to both, " +
    "cross-batch dedup state spans batches; fanout block wires " +
    "retention + the replayable set") {
    val spark0 = spark
    import spark0.implicits._
    val dir = Files.createTempDirectory("graft-main-files")
    val zone = dir.resolve("zone")
    Files.createDirectories(zone)
    def land(rows: (Long, String, Long)*): Unit =
      rows.toSeq.toDF("doc_id", "text", "time_s")
        .selectExpr("doc_id", "text", "timestamp_seconds(time_s) AS time")
        .write.mode("append").parquet(zone.toString)
    land((1L, "the same document text", 100L))
    val cfg = dir.resolve("graft.json")
    Files.writeString(cfg,
      s"""{"servers": {
         |   "docs": {"protocol": "files", "path": "$zone",
         |            "format": "parquet"} },
         | "fanout": {"retentionHours": 2},
         | "streams": [
         |   {"name": "uniq", "source": "docs",
         |    "pipeline": [{"op": "dedup", "horizon": "1 hour"}],
         |    "sink": {"kind": "memory"}},
         |   {"name": "raw", "source": "docs", "pipeline": [],
         |    "sink": {"kind": "memory"}}
         |]}""".stripMargin)
    val running = Main.start(cfg, Some(spark))
    try {
      // natively replayable: each subscriber consumes the landing zone
      // itself — no tee query, no spool
      assert(running.core.activeQueries.keySet == Set("uniq", "raw"))
      assert(running.loader.replayableSources.contains("docs"))
      assert(running.loader.retentionMs == 2L * 3600 * 1000)
      def drain(): Unit = running.core.processAllAvailable()
      drain()
      import scala.jdk.CollectionConverters._
      def ids(n: String): Seq[Long] = running.loader.memorySinks(n)
        .rows.asScala.map(_.getAs[Long]("doc_id")).toSeq.sorted
      assert(ids("raw") == Seq(1L))
      // a LATER-landed file with a duplicate text: raw sees both rows,
      // uniq's cross-batch state drops the duplicate
      land((2L, "the same document text", 200L),
        (3L, "a different document", 300L))
      val deadline = System.currentTimeMillis() + 30000
      while (ids("raw").size < 3 && System.currentTimeMillis() < deadline) {
        drain(); Thread.sleep(100)
      }
      assert(ids("raw") == Seq(1L, 2L, 3L))
      assert(ids("uniq") == Seq(1L, 3L), s"uniq saw ${ids("uniq")}")
    } finally {
      running.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("landing-zone atomic-arrival contract: a dot-prefixed in-flight " +
    "file dropped into the zone mid-stream is never read; renaming it " +
    "in atomically makes exactly its rows visible (docs/config.md " +
    "producer contract, r19 VERDICT #5)") {
    val spark0 = spark
    import spark0.implicits._
    val dir = Files.createTempDirectory("graft-main-atomic")
    val zone = dir.resolve("zone")
    val staging = dir.resolve("staging")
    Files.createDirectories(zone)
    Files.createDirectories(staging)
    def mkParquet(into: java.nio.file.Path, rows: (Long, String, Long)*)
        : java.nio.file.Path = {
      val tmp = Files.createTempDirectory(dir, "w")
      rows.toSeq.toDF("doc_id", "text", "time_s")
        .selectExpr("doc_id", "text", "timestamp_seconds(time_s) AS time")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      import scala.jdk.CollectionConverters._
      val part = Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val out = into.resolve(part.getFileName)
      Files.move(part, out)
      out
    }
    mkParquet(zone, (1L, "first", 100L))
    val cfg = dir.resolve("graft.json")
    Files.writeString(cfg,
      s"""{"servers": {
         |   "docs": {"protocol": "files", "path": "$zone",
         |            "format": "parquet"} },
         | "streams": [
         |   {"name": "raw", "source": "docs", "pipeline": [],
         |    "sink": {"kind": "memory"}}]}""".stripMargin)
    val running = Main.start(cfg, Some(spark))
    try {
      def drain(): Unit = running.core.processAllAvailable()
      drain()
      import scala.jdk.CollectionConverters._
      def ids(): Seq[Long] = running.loader.memorySinks("raw")
        .rows.asScala.map(_.getAs[Long]("doc_id")).toSeq.sorted
      assert(ids() == Seq(1L))
      // a producer staging IN the zone under a dot-prefixed name: the
      // listing must never surface it, however many triggers run
      val staged = mkParquet(staging, (2L, "second", 200L))
      val hidden = zone.resolve("." + staged.getFileName.toString + ".tmp")
      Files.move(staged, hidden)
      for (_ <- 1 to 3) { drain(); Thread.sleep(50) }
      assert(ids() == Seq(1L),
        "an in-flight dot-prefixed file must be invisible to the zone")
      // the atomic publish: rename to a visible name — its rows (and
      // only its rows) arrive
      Files.move(hidden,
        zone.resolve(hidden.getFileName.toString.stripPrefix(".")
          .stripSuffix(".tmp")),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      val deadline = System.currentTimeMillis() + 30000
      while (ids().size < 2 && System.currentTimeMillis() < deadline) {
        drain(); Thread.sleep(100)
      }
      assert(ids() == Seq(1L, 2L))
    } finally {
      running.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("the fanout block is include-merged like the streams, and a " +
    "reload that removes retentionHours reverts to the constructor " +
    "default instead of pinning the last applied value (r19 ADVICE)") {
    val spark0 = spark
    import spark0.implicits._
    val dir = Files.createTempDirectory("graft-main-fanout-inc")
    val zone = dir.resolve("zone")
    Files.createDirectories(zone)
    Seq((1L, "doc", 100L)).toDF("doc_id", "text", "time_s")
      .selectExpr("doc_id", "text", "timestamp_seconds(time_s) AS time")
      .write.mode("append").parquet(zone.toString)
    val inc = dir.resolve("fanout.json")
    Files.writeString(inc, """{"fanout": {"retentionHours": 3}}""")
    val cfg = dir.resolve("graft.json")
    def writeCfg(withInclude: Boolean): Unit = Files.writeString(cfg,
      s"""{${if (withInclude) "\"include\": [\"fanout.json\"]," else ""}
         | "servers": {"docs": {"protocol": "files", "path": "$zone",
         |             "format": "parquet"}},
         | "streams": [{"name": "raw", "source": "docs", "pipeline": [],
         |   "sink": {"kind": "memory"}}]}""".stripMargin)
    writeCfg(withInclude = true)
    val running = Main.start(cfg, Some(spark))
    try {
      assert(running.loader.retentionMs == 3L * 3600 * 1000,
        "a fanout block in an INCLUDED file must be honored")
      // drop the include: retentionHours is now absent everywhere, so
      // retention reverts to the constructor default
      writeCfg(withInclude = false)
      running.reload()
      assert(running.loader.retentionMs ==
        running.loader.fanoutRetentionMs)
      assert(running.loader.retentionMs == 24L * 3600 * 1000)
    } finally {
      running.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("Running.reload rebinds an edited ingest server socket: the " +
    "non-equiv service restart (core.clj:105-161), traffic continuing " +
    "into the same sink") {
    val portA = freePort()
    val portB = freePort()
    val dir = Files.createTempDirectory("graft-main-rebind")
    val cfg = dir.resolve("graft.json")
    def writeCfg(port: Int): Unit = Files.writeString(cfg,
      s"""{"servers": {"tcp": {"host": "127.0.0.1", "port": $port}},
         | "streams": [
         |   {"name": "flow", "source": "tcp", "pipeline": [],
         |    "sink": {"kind": "memory"}}]}""".stripMargin)
    writeCfg(portA)
    val running = Main.start(cfg, Some(spark))
    try {
      def drain(): Unit =
        running.core.activeQueries.values.foreach(_.processAllAvailable())
      def rows() = running.loader.memorySinks.get("flow")
        .map(_.size).getOrElse(0)
      def ev(host: String, t: Long) = PEvent(host, "cpu", "ok", null,
        Some(0.5), Nil, Some(t), Some(60.0), Map.empty)
      val deadline = System.currentTimeMillis() + 30000
      sendEvents(portA, Seq(ev("h1", 1706000000L)))
      while (rows() < 1 && System.currentTimeMillis() < deadline) {
        drain(); Thread.sleep(100)
      }
      assert(rows() == 1, s"pre-reload rows: ${rows()}")

      // edit ONLY the server block — the stream definition is
      // unchanged, but its signature is salted with the block, so the
      // stream is non-equiv: it restarts, its source stop() closes the
      // old socket, the successor binds the new port
      writeCfg(portB)
      val restarted = running.reload()
      assert(restarted == Seq("flow"), s"restarted: $restarted")
      // the old port must actually be released (single attempt, no
      // retry loop — a lingering listener would accept)
      intercept[java.io.IOException] {
        new Socket("127.0.0.1", portA).close()
      }
      // traffic on the NEW port lands in the SAME memory sink
      sendEvents(portB, Seq(ev("h2", 1706000010L)))
      while (rows() < 2 && System.currentTimeMillis() < deadline) {
        drain(); Thread.sleep(100)
      }
      assert(rows() == 2, s"post-reload rows: ${rows()}")

      // a reload against the unchanged file is fully equiv: nothing
      // restarts, the socket stays bound
      assert(running.reload().isEmpty)
      sendEvents(portB, Seq(ev("h3", 1706000020L)))
      while (rows() < 3 && System.currentTimeMillis() < deadline) {
        drain(); Thread.sleep(100)
      }
      assert(rows() == 3)
    } finally {
      running.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("a tls-configured tcp server block terminates mutual TLS through " +
    "the packaged process (tlsclientauth as a NATIVE json boolean)") {
    val ks = TlsTestSupport.keystore
    val tlsPort = freePort()
    val dir = Files.createTempDirectory("graft-main-tls")
    val cfg = dir.resolve("graft.json")
    Files.writeString(cfg,
      s"""{"servers": {
         |   "tcp": {"host": "127.0.0.1", "port": $tlsPort,
         |           "tlskeystore": "${ks.getPath}",
         |           "tlspassword": "changeit", "tlsclientauth": true}},
         | "streams": [
         |   {"name": "secure", "source": "tcp", "pipeline": [],
         |    "sink": {"kind": "memory"}}]}""".stripMargin)
    val running = Main.start(cfg, Some(spark))
    try {
      val ctx = TlsTestSupport.clientContext()
      var sock: Socket = null
      var last: Exception = null
      (1 to 100).foreach { _ =>
        if (sock == null)
          try sock = ctx.getSocketFactory.createSocket("127.0.0.1", tlsPort)
          catch { case e: java.io.IOException => last = e; Thread.sleep(100) }
      }
      if (sock == null) throw last
      try {
        val out = new DataOutputStream(sock.getOutputStream)
        val in = new DataInputStream(sock.getInputStream)
        out.write(RiemannProtobuf.frame(RiemannProtobuf.encodeMsg(Seq(
          PEvent("secure01", "cpu", "ok", null, Some(0.5), Nil,
            Some(1706000100L), Some(60.0), Map.empty)))))
        out.flush()
        val len = in.readInt()
        in.readFully(new Array[Byte](len)) // the ok-ack over TLS
      } finally sock.close()
      val deadline = System.currentTimeMillis() + 30000
      def rows() = running.loader.memorySinks.get("secure")
        .map(_.size).getOrElse(0)
      while (rows() < 1 && System.currentTimeMillis() < deadline) {
        running.core.activeQueries.values.foreach(_.processAllAvailable())
        Thread.sleep(100)
      }
      assert(rows() == 1, "TLS-ingested event did not land")
    } finally {
      running.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("a typo'd tlsclientauth value THROWS instead of silently " +
    "disabling client-cert verification") {
    val ks = TlsTestSupport.keystore
    val dir = Files.createTempDirectory("graft-main-tls-bad")
    val cfg = dir.resolve("graft.json")
    Files.writeString(cfg,
      s"""{"servers": {
         |   "tcp": {"host": "127.0.0.1", "port": ${freePort()},
         |           "tlskeystore": "${ks.getPath}",
         |           "tlspassword": "changeit", "tlsclientauth": "yes"}},
         | "streams": []}""".stripMargin)
    val e = intercept[IllegalArgumentException] {
      Main.start(cfg, Some(spark)).stop()
    }
    assert(e.getMessage.contains("tlsclientauth"))
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("config test mode (bin.clj 'test'): passing and failing tests " +
    "report correctly, driven through a real streaming query") {
    val dir = Files.createTempDirectory("graft-main-test")
    val cfg = dir.resolve("graft.json")
    Files.writeString(cfg,
      """{"streams": [
        |   {"name": "hot", "source": "unused",
        |    "pipeline": [{"op": "where", "expr": "metric > 0.5"},
        |                 {"op": "tag", "tags": ["hot"]}],
        |    "sink": {"kind": "memory"}}],
        | "tests": [
        |   {"name": "keeps-hot", "stream": "hot",
        |    "inject": [
        |      {"host": "h1", "service": "cpu", "state": "critical",
        |       "metric": 0.9, "time_s": 100},
        |      {"host": "h2", "service": "cpu", "state": "ok",
        |       "metric": 0.2, "time_s": 101}],
        |    "expect": [{"host": "h1", "metric": 0.9}],
        |    "expect_count": 1},
        |   {"name": "wrong-expectation", "stream": "hot",
        |    "inject": [{"host": "h3", "service": "cpu", "state": "ok",
        |                "metric": 0.1, "time_s": 102}],
        |    "expect": [{"host": "h3"}]}
        |]}""".stripMargin)
    val before = spark.conf
      .getOption("spark.sql.streaming.stateStore.providerClass")
    val (passed, failedN) = Main.runTests(cfg, spark)
    // runTests restores the caller's provider conf itself
    assert(spark.conf
      .getOption("spark.sql.streaming.stateStore.providerClass") == before)
    assert(passed == 1 && failedN == 1, s"got $passed passed, $failedN failed")
  }

  test("jobs command: the packaged process runs the config's batch " +
    "planners (cap -> split -> pack) from the command-line surface, " +
    "writing the planned corpus and reporting rows per job") {
    val spark0 = spark
    import spark0.implicits._
    val dir = Files.createTempDirectory("graft-main-jobs")
    val in = dir.resolve("corpus.parquet").toString
    (1 to 200).map(i => (i.toLong, s"src${i % 3}",
        ("token " * (10 + i % 5)).trim, "en"))
      .toDF("doc_id", "source", "text", "lang")
      .write.parquet(in)
    val outPath = dir.resolve("train.parquet").toString
    val cfg = dir.resolve("jobs.json")
    Files.writeString(cfg,
      s"""{"jobs": [
         |  {"name": "train-set", "input": "$in",
         |   "pipeline": [
         |     {"op": "cap", "maxPerSource": 50},
         |     {"op": "split", "trainFrac": 0.8, "valFrac": 0.1,
         |      "keep": "train"},
         |     {"op": "pack", "budget": 64, "nShards": 2}],
         |   "output": "$outPath"}
         |]}""".stripMargin)
    val results = Main.runJobsCmd(cfg, spark)
    assert(results.map(_._1) == Seq("train-set"))
    assert(results.head._2 > 0)
    val out = spark.read.parquet(outPath)
    assert(out.count() == results.head._2)
    assert(out.columns.contains("shard"))
  }

  test("version command prints and exits") {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(out) { Main.main(Array("version")) }
    assert(out.toString.contains("0.11"))
  }

  test("fan-out from ONE tcp server block: two config streams share the " +
    "socket (one bind, one server instance), both see every wire event " +
    "(core.clj:15-20 through the packaged process); reload restarts " +
    "only the edited one") {
    val tcpPort = freePort()
    val dir = Files.createTempDirectory("graft-main-fanout")
    val cfg = dir.resolve("graft.json")
    def writeCfg(expr: String): Unit = Files.writeString(cfg,
      s"""{"servers": {"tcp": {"host": "127.0.0.1", "port": $tcpPort}},
         | "streams": [
         |   {"name": "all", "source": "tcp", "pipeline": [],
         |    "sink": {"kind": "memory"}},
         |   {"name": "crit", "source": "tcp",
         |    "pipeline": [{"op": "where", "expr": "$expr"}],
         |    "sink": {"kind": "memory"}}]}""".stripMargin)
    writeCfg("state = 'critical'")
    val running = Main.start(cfg, Some(spark))
    try {
      // one tee consumes the server (one bind), two subscriber queries
      assert(running.core.activeQueries.keySet ==
        Set("all", "crit", "__fanout__tcp"))
      def ev(host: String, metric: Double, t: Long) =
        PEvent(host, "cpu", if (metric > 0.8) "critical" else "ok", null,
          Some(metric), Nil, Some(t), Some(3600.0), Map.empty)
      // one send on ONE socket — proving a single bound server feeds
      // both streams (the pre-fan-out Loader would have double-bound)
      sendEvents(tcpPort, Seq(
        ev("web01", 0.95, 1706000000L), ev("web02", 0.30, 1706000010L)))
      import scala.jdk.CollectionConverters._
      def hosts(n: String) = running.loader.memorySinks.get(n)
        .map(_.rows.asScala.map(_.getAs[String]("host")).toSeq.sorted)
        .getOrElse(Nil)
      val deadline = System.currentTimeMillis() + 30000
      while ((hosts("all").size < 2 || hosts("crit").size < 1) &&
          System.currentTimeMillis() < deadline) {
        running.core.processAllAvailable(); Thread.sleep(100)
      }
      assert(hosts("all") == Seq("web01", "web02"), s"all: ${hosts("all")}")
      assert(hosts("crit") == Seq("web01"), s"crit: ${hosts("crit")}")

      // edit only `crit`: the tee and `all` keep running; post-reload
      // traffic reaches both through the same socket
      val allId = running.core.activeQueries("all").id
      writeCfg("metric > 0.2")
      assert(running.reload() == Seq("crit"))
      assert(running.core.activeQueries("all").id == allId)
      sendEvents(tcpPort, Seq(ev("web03", 0.25, 1706000020L)))
      while ((hosts("all").size < 3 || hosts("crit").size < 2) &&
          System.currentTimeMillis() < deadline) {
        running.core.processAllAvailable(); Thread.sleep(100)
      }
      assert(hosts("all") == Seq("web01", "web02", "web03"))
      assert(hosts("crit").contains("web03"), s"crit: ${hosts("crit")}")
    } finally {
      running.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("modelsKeep retention (VERDICT r17 #8): a configured keep policy " +
    "prunes the artifact store from the packaged process — a long " +
    "deployment self-prunes instead of relying on a manual CLI") {
    import graft.pipeline.Models
    val dir = Files.createTempDirectory("graft-main-models")
    val root = dir.resolve("models").toString
    for (i <- 0 until 2) {
      val p = s"$root/corpus/bpe_$i"
      Models.saveBpe(spark, p, Seq(s"a b$i"), Map("i" -> i.toString))
      java.nio.file.Files.setLastModifiedTime(
        java.nio.file.Paths.get(p, "manifest.json"),
        java.nio.file.attribute.FileTime.fromMillis(1000000L + i * 1000))
    }
    val cfg = dir.resolve("graft.json")
    Files.writeString(cfg,
      s"""{"modelsKeep": {"root": "$root", "keepPerKind": 1,
         |                "intervalSeconds": 3600},
         | "streams": []}""".stripMargin)
    val running = Main.start(cfg, Some(spark))
    try {
      // the first prune fires immediately (initial delay 0), async
      val deadline = System.currentTimeMillis() + 30000
      while (running.prunedCount < 1 &&
          System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(running.prunedCount == 1, s"pruned ${running.prunedCount}")
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$root/corpus/bpe_0")))
      assert(Models.loadBpe(spark, s"$root/corpus/bpe_1") == Seq("a b1"))
    } finally {
      running.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
