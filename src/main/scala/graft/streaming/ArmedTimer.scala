package graft.streaming

import org.apache.spark.sql.streaming.{StatefulProcessor, ValueState}

/** The one-live-timer-per-key protocol shared by the stateful
  * processors: `rearm` deletes the superseded timer before registering
  * the new deadline, so a churning key never accumulates stale timers
  * in the store, and `disarm` retires the timer when its batch/period
  * is closed early (e.g. a size flush).
  *
  * Timers that were already consumed by handleExpiredTimer need no
  * bookkeeping — implementations clear `armed` there. */
private[streaming] trait ArmedTimer[K, I, O] {
  this: StatefulProcessor[K, I, O] =>

  /** The currently armed deadline (ms); implementations create it in
    * init() alongside their other state. */
  protected def armed: ValueState[Long]

  protected def rearm(ts: Long): Unit = {
    if (armed.exists()) getHandle.deleteTimer(armed.get())
    getHandle.registerTimer(ts)
    armed.update(ts)
  }

  protected def disarm(): Unit = {
    if (armed.exists()) {
      getHandle.deleteTimer(armed.get())
      armed.clear()
    }
  }
}
