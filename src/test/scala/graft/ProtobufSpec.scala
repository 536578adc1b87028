package graft

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

  test("int32 framing round-trip (tcp.clj int32-frame-decoder)") {
    val msg = RiemannProtobuf.encodeMsg(Seq(full))
    assert(RiemannProtobuf.unframe(RiemannProtobuf.frame(msg)).toSeq == msg.toSeq)
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
