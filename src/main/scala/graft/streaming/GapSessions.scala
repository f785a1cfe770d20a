package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming._

/** Gap-sessionization on the v2 `transformWithState` API with
  * EVENT-TIME TIMERS — the timer/watermark half of the v2 state surface
  * that [[TypeCompletion]] (c55: MapState/ValueState) does not touch,
  * and the streaming restatement of the batch sessionize shape (c43).
  *
  * Semantics: a session is a maximal run of a user's events where
  * consecutive gaps are ≤ `gapUs` (strict `>` opens a new session —
  * identical to c43's `us - lag(us) > gap`). A session CLOSES two ways:
  *  - in-batch: a later event from the same user arrives beyond the
  *    gap — emitted immediately from [[Processor.handleInputRows]];
  *  - by timer: no such event exists, and the event-time watermark
  *    passes the session's expiry (`last + gapUs`) — emitted from
  *    [[Processor.handleExpiredTimer]]. This is the v2 replacement for
  *    v1's `GroupStateTimeout.EventTimeTimeout`: the timer is per-key
  *    state-store data (registered/deleted like any state row), not a
  *    per-query timeout callback.
  *
  * Determinism contract: the emitted SET is a pure function of the
  * input multiset and the FINAL watermark — in-batch closures depend
  * only on the user's own event order (each batch's rows are sorted by
  * event time before folding, so arrival order inside a batch cannot
  * flip a boundary), and timer closures depend only on whether the
  * final watermark passed the session's expiry. With a 0-second
  * watermark delay the final watermark is the global max event time, so
  * the batch oracle restates the output exactly: c43's session frame,
  * keeping each session iff a later same-user event closed it OR its
  * expiry (ms-floored, matching the timer API's millisecond register)
  * is strictly below the ms-floored global max. Session ids stay c43's
  * 1-based per-user numbering: only a user's LAST session can stay
  * open (session last-times strictly increase), so emitted sessions
  * are always a prefix of the batch numbering.
  *
  * Scale shape: state per user is three longs + one timer row — no
  * per-event retention; a batch's rows for one key buffer only for the
  * in-batch sort (bounded by a user's per-micro-batch volume, the
  * admission-bounded shape of [[StreamingSync]]). Timers live in the
  * state store (RocksDB), one row per open session, retired as they
  * fire — the 100 TB posture is "state ∝ open sessions", never
  * "state ∝ events".
  */
object GapSessions {

  final case class SessionEvent(user_id: Long, us: Long)
  final case class Session(
      user_id: Long, session_id: Long, n_events: Long, duration_us: Long)

  final class Processor(gapUs: Long)
      extends StatefulProcessor[Long, SessionEvent, Session] {
    @transient private var startUs: ValueState[Long] = _
    @transient private var lastUs: ValueState[Long] = _
    @transient private var nEvents: ValueState[Long] = _
    @transient private var emitted: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      startUs = getHandle.getValueState[Long](
        "start_us", Encoders.scalaLong, TTLConfig.NONE)
      lastUs = getHandle.getValueState[Long](
        "last_us", Encoders.scalaLong, TTLConfig.NONE)
      nEvents = getHandle.getValueState[Long](
        "n_events", Encoders.scalaLong, TTLConfig.NONE)
      emitted = getHandle.getValueState[Long](
        "emitted", Encoders.scalaLong, TTLConfig.NONE)
    }

    private def closeOpenSession(key: Long): Session = {
      val sid = (if (emitted.exists()) emitted.get() else 0L) + 1L
      emitted.update(sid)
      val s = Session(key, sid, nEvents.get(), lastUs.get() - startUs.get())
      startUs.clear(); lastUs.clear(); nEvents.clear()
      s
    }

    override def handleInputRows(
        key: Long, rows: Iterator[SessionEvent],
        timerValues: TimerValues): Iterator[Session] = {
      // sort the batch's rows so in-batch session boundaries are a
      // function of event time, not arrival order (bounded: one user's
      // rows in ONE micro-batch)
      val sorted = rows.toArray.sortBy(_.us)
      val out = Seq.newBuilder[Session]
      sorted.foreach { r =>
        if (!startUs.exists()) {
          startUs.update(r.us); lastUs.update(r.us); nEvents.update(1L)
        } else if (r.us - lastUs.get() > gapUs) {
          out += closeOpenSession(key)
          startUs.update(r.us); lastUs.update(r.us); nEvents.update(1L)
        } else {
          if (r.us > lastUs.get()) lastUs.update(r.us)
          nEvents.update(nEvents.get() + 1L)
        }
      }
      // one timer per open session: re-arm at the new expiry. Register
      // in ms (the timer API's unit), rounded UP so the timer can never
      // fire before the true µs expiry.
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      if (startUs.exists())
        getHandle.registerTimer((lastUs.get() + gapUs + 999L) / 1000L)
      out.result().iterator
    }

    override def handleExpiredTimer(
        key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Session] =
      if (startUs.exists()) Iterator.single(closeOpenSession(key))
      else Iterator.empty
  }

  /** Session stream: one [[Session]] per closed session (in-batch gap
    * or watermark-passed timer). Caller supplies the session so the
    * encoders resolve on the isolated streaming session. */
  def sessions(
      spark: SparkSession,
      events: Dataset[SessionEvent],
      gapUs: Long): Dataset[Session] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new Processor(gapUs), TimeMode.EventTime(), OutputMode.Append(),
        Encoders.product[Session])
  }
}
