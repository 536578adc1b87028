package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{CombineStreams, SEvent}

/** Golden cases for streaming coalesce / project / fill-in. */
class CombineStreamsSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000)
  private def ev(host: String, service: String, m: Double, t: Long,
      ttl: Option[Double] = None) =
    SEvent(host, service, "ok", Some(m), ts(t), ttl)

  test("streaming coalesce emits the remembered set; expired emitted once (streams.clj:1187-1241)") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SEvent]
    val q = CombineStreams.coalesce(input.toDS())
      .writeStream.format("memory").queryName("co").outputMode("append").start()
    try {
      input.addData(ev("a", "cpu", 1.0, 100, Some(50.0)), ev("b", "cpu", 2.0, 100))
      q.processAllAvailable()
      input.addData(ev("b", "cpu", 3.0, 200)) // a's ttl (50s) lapses vs t=200
      q.processAllAvailable()
      input.addData(ev("b", "cpu", 4.0, 300))
      q.processAllAvailable()
      val snaps = spark.table("co").as[CombineStreams.Snapshot].collect()
        .sortBy(_.emitted_at.getTime)
      assert(snaps.length == 3)
      assert(snaps(0).events.map(e => (e.host, e.metric.get)).toSet ==
        Set(("a", 1.0), ("b", 2.0)))
      // second snapshot: a expired (emitted once, state="expired"), b updated
      val s1 = snaps(1).events.map(e => (e.host, e.state, e.metric.get)).toSet
      assert(s1 == Set(("a", "expired", 1.0), ("b", "ok", 3.0)))
      // third: a gone for good
      assert(snaps(2).events.map(_.host).toSeq == Seq("b"))
    } finally q.stop()
  }

  test("streaming project re-emits the basis on any slot update (streams.clj:2032-2101)") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SEvent]
    val q = CombineStreams.project(input.toDS(), Seq(
      e => e.service == "enq", e => e.service == "deq"))
      .writeStream.format("memory").queryName("pj").outputMode("append").start()
    try {
      input.addData(ev("h", "enq", 10.0, 1))
      q.processAllAvailable()
      input.addData(ev("h", "deq", 5.0, 2), ev("h", "other", 9.0, 3))
      q.processAllAvailable()
      val bases = spark.table("pj").as[CombineStreams.Basis].collect()
      assert(bases.length == 2) // 'other' matched nothing -> no emission
      val last = bases.map(b => b.slots.map(_.map(_.metric.get)))
        .maxBy(_.flatten.sum)
      assert(last == Seq(Some(10.0), Some(5.0)))
    } finally q.stop()
  }

  test("streaming fill-in fills gaps even when events resume in the same trigger") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SEvent]
    val q = CombineStreams.fillIn(input.toDS(), 10, 0.0)
      .writeStream.format("memory").queryName("fi2").outputMode("append").start()
    try {
      // one batch contains the gap AND the resuming event: output must be
      // identical to the cross-trigger case (determinism under replay)
      input.addData(ev("a", "hb", 5.0, 100))
      q.processAllAvailable()
      input.addData(ev("a", "hb", 7.0, 135))
      q.processAllAvailable()
      val rows = spark.table("fi2").as[SEvent].collect()
        .filter(_.host == "a").sortBy(_.time.getTime)
      // fillers at 110,120,130 synthesized inline, then the real event
      assert(rows.map(e => (e.time.getTime / 1000, e.metric.get)).toSeq ==
        Seq((100L, 5.0), (110L, 0.0), (120L, 0.0), (130L, 0.0), (135L, 7.0)))
    } finally q.stop()
  }

  test("streaming fill-in synthesizes events for empty intervals (streams.clj:683-719)") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SEvent]
    val q = CombineStreams.fillIn(input.toDS(), 10, 0.0)
      .writeStream.format("memory").queryName("fi").outputMode("append").start()
    try {
      input.addData(ev("a", "hb", 5.0, 100))
      q.processAllAvailable()
      // another key's events advance the watermark to 140
      input.addData(ev("zz", "other", 1.0, 140))
      q.processAllAvailable()
      input.addData(ev("zz", "other", 1.0, 141)) // extra trigger fires timers
      q.processAllAvailable()
      val rows = spark.table("fi").as[SEvent].collect()
        .filter(_.host == "a").sortBy(_.time.getTime)
      // original at 100 plus fillers at 110..140 (the 130-140 interval
      // completes exactly at the watermark)
      assert(rows.map(_.time.getTime / 1000).toSeq ==
        Seq(100L, 110L, 120L, 130L, 140L))
      assert(rows.tail.forall(_.metric.contains(0.0)))
    } finally q.stop()
  }
}
