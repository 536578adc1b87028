package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** The riemann index on the modern `transformWithState` API
  * (StatefulProcessor + explicit per-key timers) — the arbitrary-state
  * operator SURVEY §2.9/§4 targets. Semantics identical to
  * [[StreamingIndex]] (latest event per [host, service]; reaper emits
  * one `state="expired"` copy when the TTL deadline passes the
  * watermark, then forgets the key), but with named state and real
  * timer registration instead of the single GroupStateTimeout slot —
  * per-key TTL timers are first-class here.
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass`), which is also the
  * right provider at scale: state lives off-heap and spills. */
class IndexProcessor extends StatefulProcessor[(String, String), SEvent, SEvent]
    with ArmedTimer[(String, String), SEvent, SEvent] {

  @transient private var latest: ValueState[SEvent] = _
  @transient private var _armed: ValueState[Long] = _
  override protected def armed: ValueState[Long] = _armed

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    latest = getHandle.getValueState[SEvent]("latest",
      Encoders.product[SEvent], TTLConfig.NONE)
    _armed = getHandle.getValueState[Long]("armed",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: (String, String), rows: Iterator[SEvent],
      timerValues: TimerValues): Iterator[SEvent] = {
    val rs = rows.toSeq
    // (time, metric) tie-break matches StreamingIndex; maxBy alone would
    // keep the FIRST maximum — the stored event — so a same-second state
    // transition would never replace it
    val newest = (Option(latest.get()).toSeq ++ rs)
      .maxBy(e => (e.time.getTime, e.metric.getOrElse(0.0)))
    latest.update(newest)
    newest.ttl.foreach { t =>
      val deadline = newest.time.getTime + (t * 1000).toLong
      rearm(math.max(deadline, timerValues.getCurrentWatermarkInMs() + 1))
    }
    Iterator(newest)
  }

  override def handleExpiredTimer(key: (String, String),
      timerValues: TimerValues,
      expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
      : Iterator[SEvent] = {
    val cur = latest.get()
    if (cur == null) return Iterator.empty
    val deadline = cur.ttl.map(t => cur.time.getTime + (t * 1000).toLong)
    if (deadline.exists(_ <= timerValues.getCurrentWatermarkInMs())) {
      latest.clear()
      armed.clear()
      Iterator(cur.copy(state = "expired",
        time = new java.sql.Timestamp(timerValues.getCurrentWatermarkInMs())))
    } else {
      // stale timer: a newer event moved (or removed) the deadline
      armed.clear()
      deadline.foreach(d => rearm(
        math.max(d, timerValues.getCurrentWatermarkInMs() + 1)))
      Iterator.empty
    }
  }
}

object IndexProcessor {
  /** Wire the processor: insert stream → updates + reaper expiries. */
  def apply(events: Dataset[SEvent], watermarkDelay: String = "0 seconds")
      : Dataset[SEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("time", watermarkDelay)
      .groupByKey(e => (e.host, e.service))
      .transformWithState(new IndexProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
