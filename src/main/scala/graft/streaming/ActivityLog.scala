package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Input to [[ActivityLog]]: one event with its type tag. */
final case class ActEvent(user_id: Long, event_id: Long,
    event_type: String, cents: Long)

/** One emission per (user, batch-with-activity): the running per-type
  * histogram (sorted `type:count` summary), total event count (strictly
  * increasing — the newest-emission selector downstream), and the
  * purchase log's count / id-sum / cents-sum.
  */
final case class ActOut(user_id: Long, n_total: Long, type_summary: String,
    n_purchases: Long, purchase_id_sum: Long, purchase_cents: Long)

/** Per-user activity log on the arbitrary-state v2 API's UNBOUNDED
  * collection state variables — the half of `transformWithState` that
  * [[RunningTopK]] (one `ValueState` blob per key) and
  * [[SessionProcessor]] (ValueState + timers) leave untouched, and the
  * half that makes the API scale past one-blob-per-key:
  *
  *  - `MapState[event_type → count]`: the per-type histogram. Each
  *    arriving event does ONE point read + ONE point write of its own
  *    type's entry — a ValueState holding the whole map would
  *    deserialize/reserialize every key's histogram per event, which at
  *    100 TB/day turns O(Δ) state traffic into O(state).
  *  - `ListState[purchase record]`: the append-only per-user purchase
  *    log. `appendValue` writes ONE list element; no read-modify-write
  *    of the whole list ever happens on the hot path (the emission fold
  *    reads it, but production would emit aggregates maintained
  *    alongside — here the read IS the gate's checkable output).
  *
  * Both variables take a real [[TTLConfig]] — the v2 API's state-GC
  * contract: entries older (by PROCESSING time, the only mode Spark
  * supports TTL in) than the duration are filtered at read and swept by
  * the store's cleanup pass, bounding state for keys that go quiet
  * forever. The correctness GATE passes a TTL far wider than its own
  * wall-clock run so the fold is deterministic (the machinery — TTL
  * metadata columns, cleanup passes — is live, but nothing expires);
  * the eviction semantic itself is pinned by `StreamingTtlSpec` with a
  * short TTL and a restart: expired entries must be GONE after resume,
  * surviving ones intact.
  *
  * Determinism under arbitrary per-batch row order: count increments
  * commute, and the purchase log is emitted as order-independent
  * aggregates (count, id sum, cents sum), never as a sequence.
  *
  * Scale shape: state per user is O(distinct types) + O(purchases
  * within TTL); per-event work is O(1) state ops; keys partition across
  * the RocksDB store like any keyed operator.
  */
final class ActivityLog(ttl: TTLConfig)
    extends StatefulProcessor[Long, ActEvent, ActOut] {

  @transient private var counts: MapState[String, Long] = _
  @transient private var purchases: ListState[Long] = _
  @transient private var purchaseCents: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    counts = getHandle.getMapState[String, Long]("typeCounts",
      Encoders.STRING, Encoders.scalaLong, ttl)
    purchases = getHandle.getListState[Long]("purchaseIds",
      Encoders.scalaLong, ttl)
    purchaseCents = getHandle.getListState[Long]("purchaseCents",
      Encoders.scalaLong, ttl)
  }

  override def handleInputRows(key: Long, rows: Iterator[ActEvent],
      timerValues: TimerValues): Iterator[ActOut] = {
    rows.foreach { e =>
      val prev =
        if (counts.containsKey(e.event_type)) counts.getValue(e.event_type)
        else 0L
      counts.updateValue(e.event_type, prev + 1L)
      if (e.event_type == "purchase") {
        purchases.appendValue(e.event_id)
        purchaseCents.appendValue(e.cents)
      }
    }
    val hist = counts.iterator().toSeq.sortBy(_._1)
    val pids = purchases.get().toSeq
    val cents = purchaseCents.get().toSeq
    Iterator.single(ActOut(key,
      hist.map(_._2).sum,
      hist.map { case (t, n) => s"$t:$n" }.mkString(","),
      pids.length.toLong, pids.sum, cents.sum))
  }
}
