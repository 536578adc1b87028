package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.operators.Index
import graft.streaming.{IndexProcessor, SEvent, StreamingIndex}

/** Randomized parity: the three index implementations — batch
  * snapshot/reaper (operators/Index), flatMapGroupsWithState
  * (StreamingIndex), and transformWithState (IndexProcessor) — must
  * agree on (a) the latest event per pkey and (b) which keys the
  * reaper expires, for arbitrary event sequences. This is the
  * batch/streaming contract SURVEY §2.7 promises, checked by property
  * rather than one golden case.
  *
  * Times are integers and ttls k+0.5 so the expiry comparison can
  * never land on the strict-vs-non-strict boundary; metrics increase
  * with event id so the same-second tie-break (event_id in batch,
  * metric in streaming — arrival order is not stable inside a
  * micro-batch) picks the same winner. */
class IndexParitySpec extends SparkSpec {

  private val NowS = 55L
  private def ts(s: Long) = new Timestamp(s * 1000)

  private case class Ev(host: String, t: Long, ttl: Option[Double])

  private val caseGen = for {
    n <- Gen.chooseNum(1, 12)
    evs <- Gen.listOfN(n, for {
      host <- Gen.oneOf("a", "b", "c")
      t <- Gen.chooseNum(1L, 50L)
      ttl <- Gen.option(Gen.chooseNum(1, 40).map(_ + 0.5))
    } yield Ev(host, t, ttl))
  } yield evs

  private def forAllN[A](gen: Gen[A], n: Int)(f: A => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(7L)
    for (_ <- 0 until n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
    }
  }

  /** (latest (host, metric, time) per key, expired host set). */
  private def batchModel(evs: Seq[Ev]): (Set[(String, Double, Long)], Set[String]) = {
    val df = events(evs.zipWithIndex.map { case (e, i) =>
      E(id = i + 1, host = e.host, service = "s", metric = (i + 1).toDouble,
        time = e.t, ttl = e.ttl.map(Double.box).orNull)
    }: _*)
    val snap = Index.snapshot(df)
      .select("host", "metric", "time_s").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val expired = Index.expiredAt(df, lit(NowS))
      .select("host").collect().map(_.getString(0)).toSet
    (snap, expired)
  }

  private def runStreaming(evs: Seq[Ev],
      wire: org.apache.spark.sql.Dataset[SEvent] => org.apache.spark.sql.Dataset[SEvent],
      name: String): (Set[(String, Double, Long)], Set[String]) = {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SEvent]
    val q = wire(input.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try {
      input.addData(evs.zipWithIndex.map { case (e, i) =>
        SEvent(e.host, "s", "ok", Some((i + 1).toDouble), ts(e.t), e.ttl)
      })
      q.processAllAvailable()
      // sentinel key advances the watermark to NowS; extra trigger
      // fires the armed timers against the new watermark
      input.addData(SEvent("wm", "s", "ok", Some(0.0), ts(NowS), None))
      q.processAllAvailable()
      input.addData(SEvent("wm", "s", "ok", Some(0.0), ts(NowS), None))
      q.processAllAvailable()
      val rows = spark.table(name).as[SEvent].collect()
        .filter(_.host != "wm")
      val latest = rows.filter(_.state != "expired")
        .groupBy(_.host).map { case (_, rs) =>
          val last = rs.maxBy(e => (e.time.getTime, e.metric.getOrElse(0.0)))
          (last.host, last.metric.get, last.time.getTime / 1000)
        }.toSet
      val expired = rows.filter(_.state == "expired").map(_.host).toSet
      (latest, expired)
    } finally q.stop()
  }

  test("batch, flatMapGroupsWithState, and transformWithState indexes agree under random events") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      var i = 0
      forAllN(caseGen, 6) { evs =>
        i += 1
        val (snap, expired) = batchModel(evs)
        val (gsSnap, gsExpired) =
          runStreaming(evs, StreamingIndex(_), s"par_gs_$i")
        val (twsSnap, twsExpired) =
          runStreaming(evs, IndexProcessor(_), s"par_tws_$i")
        assert(gsSnap == snap, s"GroupState latest mismatch for $evs")
        assert(twsSnap == snap, s"transformWithState latest mismatch for $evs")
        assert(gsExpired == expired, s"GroupState expiry mismatch for $evs")
        assert(twsExpired == expired,
          s"transformWithState expiry mismatch for $evs")
      }
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("tie-break corners: both streaming indexes pick the SAME winner " +
    "(metric None vs Some, ttl-presence, state on exact time ties)") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark0 = spark
    import spark0.implicits._
    def se(state: String, m: Option[Double], ttl: Option[Double]) =
      SEvent("h", "s", state, m, ts(100), ttl)
    def winner(wire: org.apache.spark.sql.Dataset[SEvent] =>
        org.apache.spark.sql.Dataset[SEvent], name: String,
        evs: Seq[SEvent]): SEvent = {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[SEvent]
      val q = wire(input.toDS()).writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      try {
        input.addData(evs)
        q.processAllAvailable()
        val rows = spark.table(name).as[SEvent].collect()
        assert(rows.length == 1, s"$name emitted ${rows.length} rows")
        rows.head
      } finally q.stop()
    }
    val corners = Seq(
      // metric None must lose to Some(-1.0), not conflate with 0.0
      Seq(se("ok", None, None), se("ok", Some(-1.0), None)),
      // exact (time, metric, state) tie: ttl presence decides — the
      // immortal event must not silently win in one impl only
      Seq(se("ok", Some(1.0), None), se("ok", Some(1.0), Some(5000.0))),
      // state breaks a (time, metric) tie identically
      Seq(se("b", Some(1.0), None), se("a", Some(1.0), None)),
      // null state must not conflate with "" (wire events may lack the
      // field entirely): presence ranks below any string
      Seq(se(null, Some(1.0), None), se("", Some(1.0), None)))
    try corners.zipWithIndex.foreach { case (evs, i) =>
      val gs = winner(StreamingIndex(_), s"corner_gs_$i", evs)
      val tws = winner(IndexProcessor(_), s"corner_tws_$i", evs)
      val expect = evs.maxBy(SEvent.totalKey)
      assert(gs == expect, s"StreamingIndex corner $i picked $gs")
      assert(tws == expect, s"IndexProcessor corner $i picked $tws")
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
