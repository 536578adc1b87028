package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** `rollup n dt` as a StatefulProcessor (reference
  * streams.clj:1120-1156) — the alert de-spamming combinator: per key
  * and per dt period, the first n events pass through immediately; the
  * overflow is buffered, and when the period's timer fires the whole
  * buffer is delivered as ONE vector emission (riemann sends the
  * children a vector of events; here the emission row carries the
  * buffered events as a sequence).
  *
  * Periods are first-event-anchored: the first event after an idle or
  * closed period opens a new period at its event time and arms a timer
  * at period-start + dt. Buffered events are stamped at the timer's
  * watermark when flushed (the reaper's `time = now` pattern —
  * append-mode event-time operators drop output rows behind the
  * watermark, so original timestamps would silently lose the buffer).
  */
class RollupProcessor(n: Int, dtSeconds: Long)
    extends StatefulProcessor[String, SEvent, RollupProcessor.Emission]
    with ArmedTimer[String, SEvent, RollupProcessor.Emission] {
  import RollupProcessor.Emission

  // (period start ms, events passed this period)
  @transient private var period: ValueState[(Long, Int)] = _
  @transient private var buf: ListState[SEvent] = _
  // the live period's armed timer, so superseded timers can be deleted
  @transient private var _armed: ValueState[Long] = _
  override protected def armed: ValueState[Long] = _armed

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    period = getHandle.getValueState[(Long, Int)]("period",
      Encoders.product[(Long, Int)], TTLConfig.NONE)
    buf = getHandle.getListState[SEvent]("buf",
      Encoders.product[SEvent], TTLConfig.NONE)
    _armed = getHandle.getValueState[Long]("armed",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  private def drainBuffer(stampMs: Long, key: String): Option[Emission] = {
    val rolled = buf.get().toSeq
    buf.clear()
    if (rolled.isEmpty) None
    else {
      val stamp = new java.sql.Timestamp(stampMs)
      Some(Emission(key, rolled.map(_.copy(time = stamp)), rolled = true,
        stamp))
    }
  }

  override def handleInputRows(key: String, rows: Iterator[SEvent],
      timerValues: TimerValues): Iterator[Emission] = {
    val out = Seq.newBuilder[Emission]
    for (e <- rows.toSeq.sortBy(_.time.getTime)) {
      val t = e.time.getTime
      Option(period.get()) match {
        case Some((start, passed)) if t < start + dtSeconds * 1000 =>
          if (passed < n) {
            out += Emission(key, Seq(e), rolled = false, e.time)
            period.update((start, passed + 1))
          } else buf.appendValue(e)
        case _ =>
          // idle or closed period (its timer may not have fired yet if
          // the watermark lags): the rollover delivers the previous
          // period's overflow NOW, stamped at the opening event — the
          // buffer never mixes two periods — and supersedes its timer
          out ++= drainBuffer(t, key)
          rearm(math.max(t + dtSeconds * 1000,
            timerValues.getCurrentWatermarkInMs() + 1))
          period.update((t, 1))
          out += Emission(key, Seq(e), rolled = false, e.time)
      }
    }
    out.result().iterator
  }

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
      expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
      : Iterator[Emission] = {
    // only the LIVE period's timer may flush: a stale timer from a
    // superseded period (already drained at rollover) must not touch
    // the current buffer
    Option(period.get()) match {
      case Some((start, _))
          if timerValues.getCurrentWatermarkInMs() >= start + dtSeconds * 1000 =>
        period.clear()
        armed.clear()
        drainBuffer(timerValues.getCurrentWatermarkInMs(), key).iterator
      case _ => Iterator.empty
    }
  }
}

object RollupProcessor {
  /** One rollup delivery: a pass-through event (`rolled = false`, one
    * element) or the period-end buffered vector (`rolled = true`). */
  case class Emission(key: String, events: Seq[SEvent], rolled: Boolean,
      emitted_at: java.sql.Timestamp)

  /** Key the rollup by `scope` (riemann composes `(by [:service] (rollup
    * ...))`; service is the usual alerting scope). Watermark delay
    * defaults to the period so late stragglers still buffer. */
  def apply(events: Dataset[SEvent], n: Int, dtSeconds: Long,
      scope: SEvent => String = _.service,
      watermarkDelay: String = null): Dataset[Emission] = {
    val spark = events.sparkSession
    import spark.implicits._
    val delay = Option(watermarkDelay).getOrElse(s"$dtSeconds seconds")
    events.withWatermark("time", delay)
      .groupByKey(scope)
      .transformWithState(new RollupProcessor(n, dtSeconds),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
