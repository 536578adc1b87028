package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** [[IndexProcessor]] over [[WireEvent]] — identical latest-wins /
  * TTL-reaper / delete-tombstone semantics with the wire tags carried
  * through, so the served index can answer `tagged "x"` queries (the
  * reference's index stores whole events, index.clj:58-126; ours
  * previously typed tags away at this boundary). A separate concrete
  * processor rather than a type-parameterized IndexProcessor: the
  * state encoders and the three-way parity pins on the SEvent form
  * stay untouched.
  *
  * Tie-breaks extend [[SEvent.totalKey]] with the tag list (joined) as
  * the FINAL component, so two events equal on every SEvent field but
  * differing in tags still resolve deterministically. The reaper's
  * expired copy keeps tags only under keep-keys "tags" / :all, like
  * every other non-pkey field. */
class WireIndexProcessor(
    keepKeys: Set[String] = IndexProcessor.DefaultKeep,
    deleteState: Option[String] = None)
    extends StatefulProcessor[(String, String), WireEvent, WireEvent]
    with ArmedTimer[(String, String), WireEvent, WireEvent] {

  @transient private var latest: ValueState[WireEvent] = _
  @transient private var _armed: ValueState[Long] = _
  override protected def armed: ValueState[Long] = _armed

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    latest = getHandle.getValueState[WireEvent]("latest",
      Encoders.product[WireEvent], TTLConfig.NONE)
    _armed = getHandle.getValueState[Long]("armed",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  /** Length-prefixed joins so the key is INJECTIVE — a plain mkString
    * would collide on separator-containing values (Seq("a,b") vs
    * Seq("a","b")) and fall back to arrival order, the very
    * nondeterminism the total key exists to kill. */
  private def lp(parts: Seq[String]): String =
    parts.map(p => s"${p.length}:$p").mkString(",")

  private def totalKey(e: WireEvent) =
    (SEvent.totalKey(e.toSEvent),
      if (e.tags == null) "" else lp(e.tags),
      if (e.attributes == null) ""
      else lp(e.attributes.toSeq.sorted.flatMap(kv => Seq(kv._1, kv._2))))

  override def handleInputRows(key: (String, String),
      rows: Iterator[WireEvent], timerValues: TimerValues)
      : Iterator[WireEvent] = {
    val rs = rows.toSeq.sortBy(totalKey)
    var cur = Option(latest.get())
    for (e <- rs) {
      if (deleteState.contains(e.state)) cur = None
      else cur = Some((cur.toSeq :+ e).maxBy(totalKey))
    }
    cur match {
      case None =>
        latest.clear()
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
      : Iterator[WireEvent] = {
    val cur = latest.get()
    if (cur == null) return Iterator.empty
    val deadline = cur.ttl.map(t => cur.time.getTime + (t * 1000).toLong)
    if (deadline.exists(_ <= timerValues.getCurrentWatermarkInMs())) {
      latest.clear()
      armed.clear()
      val keepAll = keepKeys == IndexProcessor.All
      Iterator(cur.copy(state = "expired",
        time = new java.sql.Timestamp(timerValues.getCurrentWatermarkInMs()),
        metric = if (keepAll || keepKeys("metric")) cur.metric else None,
        ttl = if (keepAll || keepKeys("ttl")) cur.ttl else None,
        tags = if (keepAll || keepKeys("tags")) cur.tags else Seq.empty,
        // riemann's keep-keys is select-keys over the EVENT MAP, where
        // attributes are top-level keys — so individual attribute
        // names can be kept
        attributes =
          if (keepAll) cur.attributes
          else cur.attributes.filter(kv => keepKeys(kv._1))))
    } else {
      armed.clear()
      deadline.foreach(d => rearm(
        math.max(d, timerValues.getCurrentWatermarkInMs() + 1)))
      Iterator.empty
    }
  }
}

object WireIndexProcessor {
  def apply(events: Dataset[WireEvent],
      watermarkDelay: String = "0 seconds",
      keepKeys: Set[String] = IndexProcessor.DefaultKeep,
      deleteState: Option[String] = None): Dataset[WireEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("time", watermarkDelay)
      .groupByKey(e => (e.host, e.service))
      .transformWithState(new WireIndexProcessor(keepKeys, deleteState),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
