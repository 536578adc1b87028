package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** `batch n dt` as a StatefulProcessor (reference
  * streams.clj:1158-1185) — accumulate events and deliver them as one
  * vector when EITHER the buffer reaches n events (flushed inline,
  * stamped at the triggering event's time) OR dt seconds pass after the
  * first buffered event (flushed by the per-key timer, stamped at the
  * watermark). The streaming front-end for bulk sinks: elasticsearch
  * bulk POSTs, kafka producer batching, webhook digests.
  */
class BatchProcessor(n: Int, dtSeconds: Long)
    extends StatefulProcessor[String, SEvent, BatchProcessor.Flush]
    with ArmedTimer[String, SEvent, BatchProcessor.Flush] {
  import BatchProcessor.Flush

  // deadline (ms) of the currently buffered batch; unset = empty
  // buffer. Doubles as the armed-timer deadline for the shared
  // rearm/disarm hygiene.
  @transient private var deadline: ValueState[Long] = _
  override protected def armed: ValueState[Long] = deadline
  @transient private var buf: ListState[SEvent] = _
  @transient private var count: ValueState[Int] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    deadline = getHandle.getValueState[Long]("deadline",
      Encoders.scalaLong, TTLConfig.NONE)
    buf = getHandle.getListState[SEvent]("buf",
      Encoders.product[SEvent], TTLConfig.NONE)
    count = getHandle.getValueState[Int]("count",
      Encoders.scalaInt, TTLConfig.NONE)
  }

  private def flush(key: String, stampMs: Long, byTimer: Boolean): Flush = {
    val events = buf.get().toSeq
    // stamp at the batch's max event time (a late-but-on-time arrival
    // can be buffered after a newer one) or the timer's watermark
    val stamp = new java.sql.Timestamp(
      (stampMs +: events.map(_.time.getTime)).max)
    val out = Flush(key, events, byTimer, stamp)
    buf.clear()
    count.clear()
    // a size-flush retires this batch's dt timer; without the delete, a
    // hot key accumulates one dead timer in the store per flushed batch
    if (byTimer) deadline.clear() else disarm()
    out
  }

  override def handleInputRows(key: String, rows: Iterator[SEvent],
      timerValues: TimerValues): Iterator[Flush] = {
    val out = Seq.newBuilder[Flush]
    for (e <- rows.toSeq.sortBy(_.time.getTime)) {
      if (!deadline.exists()) {
        // first event of a fresh batch arms the dt timer
        rearm(math.max(e.time.getTime + dtSeconds * 1000,
          timerValues.getCurrentWatermarkInMs() + 1))
      }
      buf.appendValue(e)
      val c = Option(count.get()).getOrElse(0) + 1
      count.update(c)
      if (c >= n) out += flush(key, e.time.getTime, byTimer = false)
    }
    out.result().iterator
  }

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
      expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
      : Iterator[Flush] = {
    // deadline re-validation: a later batch's timer must not fire early
    // for the current buffer
    if (deadline.exists() &&
        timerValues.getCurrentWatermarkInMs() >= deadline.get())
      Iterator(flush(key, timerValues.getCurrentWatermarkInMs(),
        byTimer = true))
    else Iterator.empty
  }
}

object BatchProcessor {
  /** One delivered batch: ≤ n events. The dt bound is first-buffered
    * event to deadline; an out-of-order arrival that is still inside
    * the watermark joins the open batch, so the EVENT-time span can
    * stretch up to dt + the watermark delay. */
  case class Flush(key: String, events: Seq[SEvent], by_timer: Boolean,
      emitted_at: java.sql.Timestamp)

  def apply(events: Dataset[SEvent], n: Int, dtSeconds: Long,
      scope: SEvent => String = _.service,
      watermarkDelay: String = null): Dataset[Flush] = {
    val spark = events.sparkSession
    import spark.implicits._
    val delay = Option(watermarkDelay).getOrElse(s"$dtSeconds seconds")
    events.withWatermark("time", delay)
      .groupByKey(scope)
      .transformWithState(new BatchProcessor(n, dtSeconds),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
