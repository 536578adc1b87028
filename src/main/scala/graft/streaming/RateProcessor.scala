package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** `rate interval` as a StatefulProcessor with the reference's expiry
  * semantics (streams.clj:841-883; golden: streams_test.clj
  * rate-expiration): per key, sum the metrics of each epoch-aligned
  * interval and emit sum/interval at the interval tick; between events
  * keep emitting zero-rate ticks carrying the latest event's ttl
  * decremented per interval, and STOP once that ttl lapses (the stream
  * "expires" — reference `periodically-until-expired`,
  * streams.clj:499-541). The next event restarts the poller.
  *
  * The wall-clock poller becomes event-time timers: each tick's timer
  * fires when the watermark passes the interval end, emits, and
  * re-arms the next tick while the carried ttl is live. Late events
  * (older than the open interval) are dropped, mirroring the batch
  * operator's per-event-time bucketing.
  */
class RateProcessor(dtSeconds: Long)
    extends StatefulProcessor[String, SEvent, RateProcessor.RateEmission]
    with ArmedTimer[String, SEvent, RateProcessor.RateEmission] {
  import RateProcessor.RateEmission

  private val dtMs = dtSeconds * 1000

  // open interval: (startMs, metric sum, kind) with kind 0 = synthetic
  // zero-fill tick, 1 = real events but only null metrics, 2 = real
  // events with a metric sum
  @transient private var bucket: ValueState[(Long, Double, Int)] = _
  // newest event: (its bucket startMs, ttl seconds — NaN when the event
  // has no ttl, i.e. never expires)
  @transient private var carry: ValueState[(Long, Double)] = _
  @transient private var _armed: ValueState[Long] = _
  override protected def armed: ValueState[Long] = _armed

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    bucket = getHandle.getValueState[(Long, Double, Int)]("bucket",
      Encoders.product[(Long, Double, Int)], TTLConfig.NONE)
    carry = getHandle.getValueState[(Long, Double)]("carry",
      Encoders.product[(Long, Double)], TTLConfig.NONE)
    _armed = getHandle.getValueState[Long]("armed",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  /** Decayed ttl for the interval starting `startMs`: Some(v) counts
    * down from the carried event's bucket; None = never expires. */
  private def decayedTtl(startMs: Long): Option[Double] =
    Option(carry.get()).flatMap { case (ws, ttl) =>
      if (ttl.isNaN) None else Some(ttl - (startMs - ws) / 1000.0)
    }

  private def emit(key: String, start: Long, sum: Double,
      kind: Int): RateEmission =
    RateEmission(key, (start + dtMs) / 1000,
      kind match {
        case 0 => Some(0.0)
        case 1 => None
        case _ => Some(sum / dtSeconds)
      },
      decayedTtl(start))

  /** True when a zero-fill tick at `startMs` would still be live. */
  private def fillLive(startMs: Long): Boolean =
    decayedTtl(startMs).forall(_ > 0)

  override def handleInputRows(key: String, rows: Iterator[SEvent],
      timerValues: TimerValues): Iterator[RateEmission] = {
    val out = Seq.newBuilder[RateEmission]
    for (e <- rows.toSeq.sortBy(_.time.getTime)) {
      val t = e.time.getTime
      val bs = t - t % dtMs
      val kindOf = if (e.metric.isDefined) 2 else 1
      Option(bucket.get()) match {
        case Some((start, _, _)) if bs < start => () // late: drop
        case Some((start, sum, kind)) if bs == start =>
          if (kind == 0) // a synthetic tick the event just caught up with
            bucket.update((start, e.metric.getOrElse(0.0), kindOf))
          else
            bucket.update((start, sum + e.metric.getOrElse(0.0),
              math.max(kind, kindOf)))
        case Some((start, sum, kind)) =>
          // rollover: close the open interval now; zero-fill the gap up
          // to the new event's interval while the carried ttl is live
          out += emit(key, start, sum, kind)
          var f = start + dtMs
          var live = true
          while (f < bs && live) {
            if (fillLive(f)) out += emit(key, f, 0.0, 0)
            else live = false
            f += dtMs
          }
          bucket.update((bs, e.metric.getOrElse(0.0), kindOf))
        case None =>
          bucket.update((bs, e.metric.getOrElse(0.0), kindOf))
      }
      // newest event wins the carry (arrival order breaks ties like the
      // batch op's event_id)
      if (Option(carry.get()).forall(_._1 <= bs))
        carry.update((bs, e.ttl.getOrElse(Double.NaN)))
      rearm(math.max(
        Option(bucket.get()).map(_._1 + dtMs).getOrElse(bs + dtMs),
        timerValues.getCurrentWatermarkInMs() + 1))
    }
    out.result().iterator
  }

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
      expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
      : Iterator[RateEmission] = {
    armed.clear()
    Option(bucket.get()) match {
      case Some((start, sum, kind))
          if timerValues.getCurrentWatermarkInMs() >= start + dtMs =>
        val em = emit(key, start, sum, kind)
        // chain the next tick: a zero-fill while the ttl stays live,
        // else expire and go quiet until the next event
        if (fillLive(start + dtMs)) {
          bucket.update((start + dtMs, 0.0, 0))
          rearm(math.max(start + 2 * dtMs,
            timerValues.getCurrentWatermarkInMs() + 1))
        } else {
          bucket.clear(); carry.clear()
        }
        Iterator.single(em)
      case Some(_) =>
        // watermark lagged the deadline: try again when it catches up
        rearm(timerValues.getCurrentWatermarkInMs() + 1)
        Iterator.empty
      case None => Iterator.empty
    }
  }
}

object RateProcessor {
  /** One rate tick: `time_s` is the interval END (the flush tick),
    * `rate` None when the interval saw only metric-less events, `ttl`
    * the carried (decayed) ttl — None when the event had no ttl. */
  case class RateEmission(key: String, time_s: Long, rate: Option[Double],
      ttl: Option[Double])

  /** Keyed by `scope` (riemann composes `(by [:service] (rate ...))`). */
  def apply(events: Dataset[SEvent], dtSeconds: Long,
      scope: SEvent => String = _.service,
      watermarkDelay: String = "0 seconds"): Dataset[RateEmission] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("time", watermarkDelay)
      .groupByKey(scope)
      .transformWithState(new RateProcessor(dtSeconds),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
