package graft

import org.scalacheck.Gen

import graft.sources.RiemannProtobuf
import graft.sources.RiemannProtobuf.PEvent

/** Wire-format tests for the riemann protobuf transport decode
  * (transport/tcp.clj:220-244, udp.clj:147-181): round-trips, golden
  * bytes (hand-computed against the wire spec), framing, metric field
  * precedence, and the distributed DataFrame adapter. */
class ProtobufSpec extends SparkSpec {

  private val full = PEvent("web01", "api latency", "ok", "p99 spike",
    Some(42.5), Seq("prod", "http"), Some(1706000000L), Some(60.0),
    Map("dc" -> "east", "team" -> "core"))

  test("event round-trips through the wire format") {
    val got = RiemannProtobuf.decodeMsg(
      RiemannProtobuf.encodeMsg(Seq(full))).head
    assert(got == full)
  }

  test("golden bytes: minimal event") {
    // Msg { events[6] { service[3]="a", metric_d[14]=1.0 } }
    // field 6 key = 0x32; event: field 3 key = 0x1a, len 1, 'a';
    // field 14 key = 0x71, little-endian double 1.0
    val event = Array[Byte](0x1a, 0x01, 'a'.toByte, 0x71,
      0, 0, 0, 0, 0, 0, -16, 0x3f)
    val msg = Array[Byte](0x32, event.length.toByte) ++ event
    val got = RiemannProtobuf.decodeMsg(msg)
    assert(got == Seq(PEvent(null, "a", null, null, Some(1.0), Seq(), None,
      None, Map())))
  }

  test("metric precedence: sint64 over double over float (client codec order)") {
    // encode metric_d then append metric_sint64 field (13, zigzag 7 -> 14)
    val base = RiemannProtobuf.encodeEvent(full.copy(metric = Some(2.5)))
    val withSint = base ++ Array[Byte]((13 << 3).toByte, 14)
    val msg = Array[Byte](0x32, withSint.length.toByte) ++ withSint
    assert(RiemannProtobuf.decodeMsg(msg).head.metric == Some(7.0))
  }

  test("unknown fields are skipped (open schema forward-compat)") {
    // unknown varint field 12 (0x60, value 5) and unknown
    // length-delimited field 11 (0x5a, len 2) inside the event
    val extra = Array[Byte](0x60, 0x05, 0x5a, 0x02, 'h', 'i')
    val event = RiemannProtobuf.encodeEvent(full) ++ extra
    val msg = Array[Byte](0x32) ++ varintBytes(event.length) ++ event
    assert(RiemannProtobuf.decodeMsg(msg).head == full)
  }

  private def varintBytes(v: Int): Array[Byte] = {
    var x = v; val out = scala.collection.mutable.ArrayBuffer[Byte]()
    while ((x & ~0x7f) != 0) { out += ((x & 0x7f) | 0x80).toByte; x >>>= 7 }
    out += x.toByte
    out.toArray
  }

  test("64-bit field length overflowing toInt is rejected, not misparsed") {
    // Msg field 6 (0x32) with length varint 2^32+5 (bytes 85 80 80 80
    // 10): a toInt guard would see a plausible 5 and misalign the parse
    val msg = Array[Byte](0x32, 0x85.toByte, 0x80.toByte, 0x80.toByte,
      0x80.toByte, 0x10) ++ Array.fill(5)(0x1a.toByte)
    intercept[IllegalArgumentException](RiemannProtobuf.decodeMsg(msg))
  }

  test("field length overrunning its scope is rejected, not read across " +
    "sibling fields") {
    // event sub-message: service (0x1a) declares 10 bytes, scope has 2
    // — a guard bounded by the whole buffer instead of the remaining
    // scope would read the NEXT event's bytes as the service string
    val inner = Array[Byte](0x1a, 0x0a, 'a'.toByte, 'b'.toByte)
    val msg = Array[Byte](0x32, inner.length.toByte) ++ inner ++
      Array[Byte](0x32, 0x02, 0x1a, 0x00)
    intercept[IllegalArgumentException](RiemannProtobuf.decodeMsg(msg))
  }

  test("int32 framing round-trip (tcp.clj int32-frame-decoder)") {
    val msg = RiemannProtobuf.encodeMsg(Seq(full))
    assert(RiemannProtobuf.unframe(RiemannProtobuf.frame(msg)).toSeq == msg.toSeq)
  }

  // ---------------------------------------------------- property fuzz

  /** Deterministic property driver (IndexParitySpec precedent). */
  private def forAllN[A](gen: Gen[A], n: Int)(f: A => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(11L)
    for (_ <- 0 until n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
    }
  }

  /** Valid-UTF-8 strings (no unpaired surrogates — the wire is UTF-8
    * bytes), including empty and escape-heavy shapes; `withNull` adds
    * the absent-field case. */
  private def genStr(withNull: Boolean): Gen[String] = {
    val s = Gen.frequency(
      1 -> Gen.const(""),
      8 -> Gen.listOf(Gen.frequency(
        8 -> Gen.alphaNumChar,
        2 -> Gen.oneOf('é', '中', 'π', '\n', '"', '\\', ' ')
      )).map(_.mkString))
    if (withNull) Gen.frequency(1 -> Gen.const(null: String), 6 -> s) else s
  }

  private val genEvent: Gen[PEvent] = for {
    host <- genStr(withNull = true)
    service <- genStr(withNull = true)
    state <- genStr(withNull = true)
    descr <- genStr(withNull = true)
    metric <- Gen.option(Gen.oneOf(
      Gen.chooseNum(-1e12, 1e12),
      Gen.oneOf(0.0, -0.0, Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity, Double.MinPositiveValue)))
    tags <- Gen.listOf(genStr(withNull = false))
    // full signed-Long range: negative seconds must survive the
    // 10-byte varint path
    time <- Gen.option(Gen.chooseNum(Long.MinValue, Long.MaxValue))
    // ttl is float32 on the wire: generate float-exact doubles so
    // round-trip equality is identity, not approximation
    ttl <- Gen.option(Gen.chooseNum(-1e6f, 1e6f).map(_.toDouble))
    attrs <- Gen.mapOf(Gen.zip(genStr(withNull = false), genStr(withNull = false)))
  } yield PEvent(host, service, state, descr, metric, tags, time, ttl, attrs)

  /** Bit-level comparison key: Scala's `Some(NaN) == Some(NaN)` is
    * FALSE (primitive ==), but the wire round-trips NaN bit-exactly —
    * compare double fields by their raw bits instead. */
  private def bitKey(e: PEvent) = (e.copy(metric = None, ttl = None),
    e.metric.map(java.lang.Double.doubleToLongBits),
    e.ttl.map(java.lang.Double.doubleToLongBits))

  test("property: arbitrary Msgs round-trip the wire format exactly " +
    "(unicode, empty-vs-null, negative times, NaN/Inf/-0.0 metrics)") {
    forAllN(Gen.listOfN(3, Gen.resize(12, genEvent)), 300) { evs =>
      val bytes = RiemannProtobuf.encodeMsg(evs)
      assert(RiemannProtobuf.decodeMsg(bytes).map(bitKey) == evs.map(bitKey),
        s"unframed: $evs")
      assert(RiemannProtobuf.decodeMsg(
        RiemannProtobuf.unframe(RiemannProtobuf.frame(bytes)))
        .map(bitKey) == evs.map(bitKey), s"framed: $evs")
    }
  }

  test("property: corrupt payloads (bit flips, truncation, random bytes) " +
    "never escape decodeMsgs' isolation net — and never hang") {
    // the net in decodeMsgs: RuntimeException | ArrayIndexOutOfBounds.
    // Anything else (or an infinite loop — see Reader.bytes' negative-
    // length guard) would wedge a real task instead of dropping the
    // payload.
    val genCorrupt: Gen[Array[Byte]] = Gen.oneOf(
      // mutated valid encoding: flip one byte anywhere
      for {
        evs <- Gen.listOfN(2, Gen.resize(6, genEvent))
        bytes = RiemannProtobuf.encodeMsg(evs)
        if bytes.nonEmpty
        pos <- Gen.choose(0, bytes.length - 1)
        b <- Gen.choose(Byte.MinValue, Byte.MaxValue)
      } yield { val m = bytes.clone(); m(pos) = b; m },
      // truncated valid encoding
      for {
        evs <- Gen.listOfN(2, Gen.resize(6, genEvent))
        bytes = RiemannProtobuf.encodeMsg(evs)
        n <- Gen.choose(0, bytes.length)
      } yield bytes.take(n),
      // pure noise
      Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    forAllN(genCorrupt, 600) { bytes =>
      try { RiemannProtobuf.decodeMsg(bytes); () }
      catch { case _: RuntimeException | _: ArrayIndexOutOfBoundsException => () }
    }
  }

  test("property: query/reply wire round-trips, and scanMsg sees " +
    "exactly the events/query the Msg carries") {
    forAllN(Gen.zip(genStr(withNull = false),
        Gen.listOfN(2, Gen.resize(8, genEvent)), Gen.oneOf(true, false),
        Gen.option(genStr(withNull = false))), 300) {
      case (q, evs, ok, err) =>
        // query Msg: scanMsg finds the query string, no events
        val qm = RiemannProtobuf.encodeQueryMsg(q)
        assert(RiemannProtobuf.scanMsg(qm) == ((false, Some(q))))
        // event Msg: events present, no query
        val em = RiemannProtobuf.encodeMsg(evs)
        assert(RiemannProtobuf.scanMsg(em) == ((evs.nonEmpty, None)))
        // both on one Msg (transport.clj handle's combined case)
        assert(RiemannProtobuf.scanMsg(em ++ qm) ==
          ((evs.nonEmpty, Some(q))))
        // reply round-trip
        val (rok, rerr, revs) = RiemannProtobuf.decodeReply(
          RiemannProtobuf.encodeReply(ok, err, evs))
        assert(rok == Some(ok) && rerr == err &&
          revs.map(bitKey) == evs.map(bitKey))
    }
  }

  test("property: corrupt payloads never escape scanMsg/decodeReply's " +
    "isolation net either (the serve loop catches and falls back)") {
    val genCorrupt: Gen[Array[Byte]] = Gen.oneOf(
      for {
        q <- genStr(withNull = false)
        bytes = RiemannProtobuf.encodeQueryMsg(q)
        if bytes.nonEmpty
        pos <- Gen.choose(0, bytes.length - 1)
        b <- Gen.choose(Byte.MinValue, Byte.MaxValue)
      } yield { val m = bytes.clone(); m(pos) = b; m },
      Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    forAllN(genCorrupt, 600) { bytes =>
      try { RiemannProtobuf.scanMsg(bytes); () }
      catch { case _: RuntimeException | _: ArrayIndexOutOfBoundsException => () }
      try { RiemannProtobuf.decodeReply(bytes); () }
      catch { case _: RuntimeException | _: ArrayIndexOutOfBoundsException => () }
    }
  }

  test("DataFrame adapter decodes framed payloads on executors") {
    val spark0 = spark
    import spark0.implicits._
    val e2 = full.copy(host = "web02", metric = Some(1.25))
    val payloads = Seq(
      RiemannProtobuf.frame(RiemannProtobuf.encodeMsg(Seq(full))),
      RiemannProtobuf.frame(RiemannProtobuf.encodeMsg(Seq(e2))))
    val df = payloads.toDF("value")
    val got = RiemannProtobuf.decodeMsgs(df, framed = true)
      .collect().sortBy(_.host)
    assert(got.toSeq == Seq(full, e2))
  }
}
