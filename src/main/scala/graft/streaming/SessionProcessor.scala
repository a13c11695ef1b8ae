package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Input to [[SessionProcessor]]: event time as both the watermarked
  * TIMESTAMP (TimeMode.EventTime requires it on the input) and exact
  * epoch-µs (the state arithmetic — a java.sql.Timestamp round-trip
  * through ms would drop sub-ms precision).
  */
final case class SessEvent(user_id: Long, ts: java.sql.Timestamp,
    ts_us: Long, event_id: Long, cents: Long)

/** One open session per user: first/last event µs, count, cents sum. */
final case class SessState(start_us: Long, last_us: Long, n: Long,
    cents: Long)

/** One CLOSED session: end = last event + gap, the `session_window`
  * convention. Emitted exactly once — by the gap-exceeding next event
  * or by the event-time timer, never both (see the staleness guard).
  */
final case class SessOut(user_id: Long, start_us: Long, end_us: Long,
    n_events: Long, cents: Long)

/** Sessionization re-expressed on the arbitrary-state v2 API — the
  * EVENT-TIME TIMER half of `transformWithState` that [[RunningTopK]]
  * (pure ValueState) doesn't touch: an open session is one ValueState
  * row; a gap-exceeding event closes it inline; the REGISTERED
  * event-time timer at `last + gap` closes it when the WATERMARK passes
  * (Spark calls [[handleExpiredTimer]]) — the mechanism that emits a
  * user's final session, which no later input row ever would.
  *
  * Semantics equal `session_window(gap)`: events with inter-arrival
  * < gap share a session; end = last event + gap. Determinism for the
  * hash gate: batch rows are sorted by (ts, id) inside the handler;
  * batches arrive in event-time order (tertile slices), so cross-batch
  * folding is the same left-to-right scan the oracle's lag/islands SQL
  * performs. Timer-vs-input ordering within a batch is immaterial: a
  * timer only fires once the watermark passed `last + gap`, and every
  * same-batch input row is ahead of the watermark, so such a row starts
  * a NEW session under either processing order.
  *
  * TIMER HYGIENE: when a batch moves a user's expiry (extension or a
  * new session), the superseded timer is DELETED before the new one is
  * registered — otherwise pending timers accumulate one per extension
  * until the watermark passes each, inflating the timer store and
  * firing dead timers at scale (round-10 advisory). The STALENESS GUARD
  * stays as defense in depth: a fired timer is ignored unless its
  * expiry equals the CURRENT session's `last + gap` (recomputed with
  * the same µs→ms floor used at registration), so even a timer that
  * escaped deletion (e.g. restored from a checkpoint taken before the
  * hygiene fix) cannot close a live session early.
  *
  * Scale shape: O(1) state + ONE pending timer per user (deletion keeps
  * the invariant exact); per-batch work is O(batch log batch) for the
  * in-handler sort.
  */
final class SessionProcessor(gapMs: Long)
    extends StatefulProcessor[Long, SessEvent, SessOut] {

  @transient private var st: ValueState[SessState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[SessState]("sess",
      Encoders.product[SessState], TTLConfig.NONE)

  private def expiryOf(s: SessState): Long = s.last_us / 1000 + gapMs

  private def closed(key: Long, s: SessState): SessOut =
    SessOut(key, s.start_us, s.last_us + gapMs * 1000, s.n, s.cents)

  override def handleInputRows(key: Long, rows: Iterator[SessEvent],
      timerValues: TimerValues): Iterator[SessOut] = {
    val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
    var cur = if (st.exists()) Option(st.get()) else None
    val prevExpiry = cur.map(expiryOf)
    val out = Seq.newBuilder[SessOut]
    sorted.foreach { e =>
      cur match {
        case Some(s) if e.ts_us - s.last_us < gapMs * 1000 =>
          cur = Some(SessState(s.start_us, math.max(s.last_us, e.ts_us),
            s.n + 1, s.cents + e.cents))
        case Some(s) =>
          out += closed(key, s)
          cur = Some(SessState(e.ts_us, e.ts_us, 1L, e.cents))
        case None =>
          cur = Some(SessState(e.ts_us, e.ts_us, 1L, e.cents))
      }
    }
    cur.foreach { s =>
      st.update(s)
      val expiry = expiryOf(s)
      if (!prevExpiry.contains(expiry)) {
        // the batch moved this user's expiry: drop the superseded timer
        // so exactly one stays pending (see TIMER HYGIENE above)
        prevExpiry.foreach(getHandle.deleteTimer)
        getHandle.registerTimer(expiry)
      }
    }
    out.result().iterator
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[SessOut] =
    if (st.exists()) {
      val s = st.get()
      if (expiredTimerInfo.getExpiryTimeInMs() == expiryOf(s)) {
        st.clear()
        Iterator.single(closed(key, s))
      } else Iterator.empty // superseded timer of an extended session
    } else Iterator.empty
}
