package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A change event tagged with its transaction: `tx` is the envelope's
  * `source.txId`, `lsn` the per-event ordering key, `value` the raw
  * envelope line (byte-faithful passthrough, P18).
  */
final case class TxnEvent(tx: Long, lsn: Long, value: String)

/** A transaction END record (Debezium transaction-metadata topic shape):
  * the transaction committed with exactly `expected` data events.
  */
final case class TxnMeta(tx: Long, expected: Int)

/** Internal union row: `kind` 'e' = data event, 'm' = END metadata. */
final case class TxnTagged(tx: Long, kind: String, lsn: Long,
    expected: Int, value: String)

/** Per-transaction buffer state: END count if seen, events so far
  * (keyed by lsn — at-least-once transports replay events, and a
  * duplicate must not inflate the completeness count), and whether the
  * transaction already released (so replays after release emit nothing).
  */
final case class TxnState(expected: Option[Int],
    buffered: Map[Long, String], released: Boolean)

/** Streaming twin of `q_cdc_txn_consistent`: release change events to
  * downstream consumers only in whole transactions. Events buffer in
  * per-`txId` state until the transaction's END metadata has arrived AND
  * every expected event is present; then the whole transaction emits
  * atomically (in lsn order), exactly once. Torn transactions (missing
  * events) and END-less transactions stay buffered — a downstream
  * materialization can never observe a partial transaction, the
  * guarantee Debezium's transaction-metadata topic exists to enable.
  *
  * Scale shape: state is keyed by txId, so memory is O(open
  * transactions × their event payloads) — bounded by transaction size
  * and commit latency, not by stream length; released transactions
  * collapse to a tombstone flag. The shuffle is the one hash exchange
  * on txId that any transaction assembly needs. Production deployments
  * should evict abandoned transactions with a timeout policy
  * (GroupStateTimeout + a dead-letter emit); the operator keeps
  * NoTimeout so the release rule stays purely deterministic here.
  */
object TxnConsistentStream {

  def release(events: Dataset[TxnEvent],
      meta: Dataset[TxnMeta]): Dataset[TxnEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    val tagged = events.map(e => TxnTagged(e.tx, "e", e.lsn, -1, e.value))
      .unionByName(meta.map(m => TxnTagged(m.tx, "m", 0L, m.expected, "")))
    tagged.groupByKey(_.tx)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout())(releaseTxn)
  }

  /** The per-group transition — package-visible so the specs can drive
    * it directly against hand-built states.
    */
  private[graft] def releaseTxn(tx: Long, it: Iterator[TxnTagged],
      state: GroupState[TxnState]): Iterator[TxnEvent] = {
    val st = state.getOption.getOrElse(TxnState(None, Map.empty, false))
    if (st.released) {
      // replayed events/metadata of an already-released transaction:
      // keep the tombstone, emit nothing (exactly-once downstream)
      Iterator.empty
    } else {
      var expected = st.expected
      var buf = st.buffered
      it.foreach { r =>
        if (r.kind == "m") expected = Some(r.expected)
        else buf = buf.updated(r.lsn, r.value)
      }
      if (expected.contains(buf.size)) {
        state.update(TxnState(expected, Map.empty, released = true))
        buf.toSeq.sortBy(_._1).iterator
          .map { case (lsn, v) => TxnEvent(tx, lsn, v) }
      } else {
        state.update(TxnState(expected, buf, released = false))
        Iterator.empty
      }
    }
  }
}
