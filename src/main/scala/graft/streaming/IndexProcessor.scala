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
class IndexProcessor(keepKeys: Set[String] = IndexProcessor.DefaultKeep,
    deleteState: Option[String] = None)
    extends StatefulProcessor[(String, String), SEvent, SEvent]
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
    // deletes (config.clj:258-271 delete-from-index, marked by the
    // `deleteState` convention) interleave with inserts in event-time
    // order: a delete drops the entry and its timer, emits nothing, and
    // a later insert re-creates the key. Ties on time are broken by
    // [[SEvent.totalKey]] — the SHARED total order over every non-key
    // field, so shuffle arrival order can never decide the winner and
    // StreamingIndex agrees event-for-event. The rule: the greatest
    // row in this total order wins (the LAST in sorted order).
    def totalKey(e: SEvent) = SEvent.totalKey(e)
    val rs = rows.toSeq.sortBy(totalKey)
    var cur = Option(latest.get())
    for (e <- rs) {
      if (deleteState.contains(e.state)) cur = None
      // same total-order key as the sort: the primary (time, metric)
      // tie-break matches StreamingIndex (maxBy alone would keep the
      // FIRST maximum — the stored event — so a same-second state
      // transition would never replace it); the trailing components
      // only engage on exact (time, metric) ties, where the batch
      // relation's winner is otherwise unspecified
      else cur = Some((cur.toSeq :+ e).maxBy(totalKey))
    }
    cur match {
      case None =>
        latest.clear()
        // disarm (not armed.clear()): the registered timer must go with
        // the armed record, else a re-insert re-registers over an
        // orphaned timer and the store logs duplicate-timer warnings
        disarm()
        Iterator.empty
      case Some(newest) =>
        latest.update(newest)
        newest.ttl.foreach { t =>
          val deadline = newest.time.getTime + (t * 1000).toLong
          rearm(math.max(deadline, timerValues.getCurrentWatermarkInMs() + 1))
        }
        Iterator(newest)
    }
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
      // reaper :keep-keys (core.clj:282-304): the expired copy carries
      // only the kept fields — default [host, service] (the pkey always
      // survives); `All` preserves the whole event. State is always
      // "expired", time always the expiry time.
      val keepAll = keepKeys == IndexProcessor.All
      Iterator(cur.copy(state = "expired",
        time = new java.sql.Timestamp(timerValues.getCurrentWatermarkInMs()),
        metric = if (keepAll || keepKeys("metric")) cur.metric else None,
        ttl = if (keepAll || keepKeys("ttl")) cur.ttl else None))
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
  /** Reaper default: the expired copy keeps only the pkey
    * (core.clj:295 `(get opts :keep-keys [:host :service])`). */
  val DefaultKeep: Set[String] = Set("host", "service")
  /** `:keep-keys :all` sentinel — preserve every field. */
  val All: Set[String] = Set("*all*")

  /** Wire the processor: insert stream → updates + reaper expiries.
    * `keepKeys` = the reaper's :keep-keys option; `deleteState`, when
    * set, marks tombstones — union a delete stream tagged with that
    * state to get `delete-from-index` (config.clj:258-271). */
  def apply(events: Dataset[SEvent], watermarkDelay: String = "0 seconds",
      keepKeys: Set[String] = DefaultKeep,
      deleteState: Option[String] = None): Dataset[SEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("time", watermarkDelay)
      .groupByKey(e => (e.host, e.service))
      .transformWithState(new IndexProcessor(keepKeys, deleteState),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
