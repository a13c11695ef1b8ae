package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Input to [[RunningTopK]]: one event, value pre-converted to exact
  * integer cents (the decimal→cents move happens in the PLAN, before
  * the typed boundary, so the state arithmetic is integer-exact).
  */
final case class TwsEvent(user_id: Long, event_id: Long, cents: Long)

/** One retained top-k entry. Ordering contract: (cents desc, id asc). */
final case class TwsHit(cents: Long, event_id: Long)

/** Per-user running state: event count, exact cents sum, bounded top-k. */
final case class TwsAgg(n: Long, cents: Long, top: List[TwsHit])

/** One emission per (user, batch-with-activity): the running totals
  * AFTER folding the batch — the newest emission per user is the final
  * answer, selected downstream by max `n_events` (strictly increasing).
  */
final case class TwsOut(user_id: Long, n_events: Long, cents_sum: Long,
    top3: String)

/** Per-key running (count, sum, top-k) on Spark's arbitrary-state v2 API
  * (`transformWithState`, Spark 4.x): a [[StatefulProcessor]] holding
  * ONE typed [[ValueState]] per key in the RocksDB state store — the
  * successor to `flatMapGroupsWithState` (which
  * [[TxnConsistentStream]] pins) with named state variables, TTL
  * configs, and timers as first-class API instead of one opaque blob.
  *
  * Determinism under arbitrary per-batch row order (required for the
  * hash gate): the fold is order-independent — count and sum are
  * commutative, and bounded top-k under "insert, sort by (cents desc,
  * id asc), truncate to k" yields the true top-k of the multiset
  * regardless of insertion order (an element of the true top-k is never
  * evicted: eviction requires k strictly-better-ordered elements, which
  * then remain).
  *
  * Scale shape: state is O(1) per key (k entries + two longs) however
  * long the stream runs; per-batch work is O(batch × k log k); keys
  * partition across the state store like any keyed operator.
  */
final class RunningTopK(k: Int)
    extends StatefulProcessor[Long, TwsEvent, TwsOut] {

  @transient private var st: ValueState[TwsAgg] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[TwsAgg]("agg", Encoders.product[TwsAgg],
      TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[TwsEvent],
      timerValues: TimerValues): Iterator[TwsOut] = {
    val prev = if (st.exists()) st.get() else TwsAgg(0L, 0L, Nil)
    val merged = rows.foldLeft(prev) { (s, e) =>
      val top = (TwsHit(e.cents, e.event_id) :: s.top)
        .sortBy(h => (-h.cents, h.event_id)).take(k)
      TwsAgg(s.n + 1, s.cents + e.cents, top)
    }
    st.update(merged)
    Iterator.single(TwsOut(key, merged.n, merged.cents,
      merged.top.map(h => s"${h.cents}:${h.event_id}").mkString(",")))
  }
}
