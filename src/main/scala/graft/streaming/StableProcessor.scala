package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** `stable dt :state` as a StatefulProcessor (reference
  * streams.clj:1936-2030) — the full probation-buffer semantics: when a
  * key's state changes, subsequent events are BUFFERED (ListState);
  * once the value has persisted dt seconds — proven either by a later
  * event or by the watermark passing a per-key timer — the whole buffer
  * flushes and further same-value events stream through. A flap before
  * dt discards the buffer (those events are never delivered).
  *
  * Delivery-time stamping (divergence, mirroring the reaper's
  * `time = now`): flushed buffer events carry the proof moment as their
  * event time — the confirming event's time, or the timer's watermark.
  * Append-mode event-time operators drop output rows behind the
  * watermark, so emitting the ORIGINAL (by then > dt old) timestamps
  * would silently lose the buffer. The default watermark delay equals
  * the probation window for the same reason. */
class StableProcessor(dtSeconds: Long)
    extends StatefulProcessor[(String, String), SEvent, SEvent]
    with ArmedTimer[(String, String), SEvent, SEvent] {

  // (current value, probation start ms, confirmed stable)
  @transient private var cur: ValueState[(String, Long, Boolean)] = _
  @transient private var buf: ListState[SEvent] = _
  @transient private var _armed: ValueState[Long] = _
  override protected def armed: ValueState[Long] = _armed

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    cur = getHandle.getValueState[(String, Long, Boolean)]("cur",
      Encoders.product[(String, Long, Boolean)], TTLConfig.NONE)
    buf = getHandle.getListState[SEvent]("buf",
      Encoders.product[SEvent], TTLConfig.NONE)
    _armed = getHandle.getValueState[Long]("armed",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  private def flush(stampMs: Long): Iterator[SEvent] = {
    val out = buf.get().toSeq
      .map(e => e.copy(time = new java.sql.Timestamp(stampMs)))
    buf.clear()
    out.iterator
  }

  override def handleInputRows(key: (String, String), rows: Iterator[SEvent],
      timerValues: TimerValues): Iterator[SEvent] = {
    val out = Seq.newBuilder[SEvent]
    for (e <- rows.toSeq.sortBy(_.time.getTime)) {
      val t = e.time.getTime
      Option(cur.get()) match {
        case Some((v, since, confirmed))
            if java.util.Objects.equals(v, e.state) =>
          if (confirmed) out += e
          else if (t - since >= dtSeconds * 1000) {
            // value persisted dt: deliver the probation buffer + this,
            // stamped at the proving event's time
            out ++= flush(t)
            out += e
            cur.update((v, since, true))
          } else buf.appendValue(e)
        case _ =>
          // flap (or first event): discard any probation buffer
          buf.clear()
          buf.appendValue(e)
          cur.update((e.state, t, false))
          rearm(math.max(t + dtSeconds * 1000,
            timerValues.getCurrentWatermarkInMs() + 1))
      }
    }
    out.result().iterator
  }

  override def handleExpiredTimer(key: (String, String),
      timerValues: TimerValues,
      expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
      : Iterator[SEvent] = {
    Option(cur.get()) match {
      case Some((v, since, false))
          if timerValues.getCurrentWatermarkInMs() >= since + dtSeconds * 1000 =>
        cur.update((v, since, true))
        armed.clear() // this timer is consumed; `armed` means live timer
        flush(timerValues.getCurrentWatermarkInMs())
      case _ => Iterator.empty // stale timer from a superseded segment
    }
  }
}

object StableProcessor {
  def apply(events: Dataset[SEvent], dtSeconds: Long,
      watermarkDelay: String = null): Dataset[SEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    val delay = Option(watermarkDelay).getOrElse(s"$dtSeconds seconds")
    events.withWatermark("time", delay)
      .groupByKey(e => (e.host, e.service))
      .transformWithState(new StableProcessor(dtSeconds),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
