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

/** Event-time variants for the evicting release: `ts` is the event's
  * source timestamp (the envelope `ts_ms`), which drives the watermark
  * and the abandoned-transaction horizon.
  */
final case class TxnEventTs(tx: Long, lsn: Long, value: String,
    ts: java.sql.Timestamp)
final case class TxnMetaTs(tx: Long, expected: Int, ts: java.sql.Timestamp)
final case class TxnTaggedTs(tx: Long, kind: String, lsn: Long,
    expected: Int, value: String, ts: java.sql.Timestamp)

/** Output of the evicting release: `dead = false` rows are whole
  * released transactions (same contract as [[TxnEvent]]); `dead = true`
  * rows are the buffered events of a transaction evicted at the horizon
  * — the dead-letter channel a downstream splits off by filtering.
  */
final case class TxnVerdict(tx: Long, lsn: Long, value: String,
    dead: Boolean)

/** Per-transaction buffer state: END count if seen, events so far
  * (keyed by lsn — at-least-once transports replay events, and a
  * duplicate must not inflate the completeness count), and whether the
  * transaction already released (so replays after release emit nothing).
  * `seenTs` (evicting mode only) is the max event time ever observed
  * for this transaction: the horizon is measured from the TRUE last
  * piece, so a replayed-only batch (stale timestamps) can never pull
  * the eviction timeout backward and shrink the horizon.
  */
final case class TxnState(expected: Option[Int],
    buffered: Map[Long, String], released: Boolean, seenTs: Long = 0L)

/** State shape for the NoTimeout [[TxnConsistentStream.release]] path —
  * deliberately WITHOUT the evicting mode's `seenTs` field. Round-6
  * added `seenTs` to [[TxnState]], which changes the state-store encoder
  * schema; a checkpoint of the release() operator written before that
  * round would fail Spark's state schema compatibility check on restore
  * (round-7 advisory). Keeping release() on the original three-field
  * shape preserves those checkpoints; the evicting path needs `seenTs`
  * and keeps the extended shape (its gates always start fresh).
  *
  * COMPATIBILITY NOTE (one-way trade, round-8 advisory): a checkpoint
  * of release() written by ROUND-6 code — whose state encoder was the
  * four-field [[TxnState]] — does NOT restore against this three-field
  * shape; only the pre-round-6 direction is preserved. Operators
  * holding a round-6-era release() checkpoint must restart that stream
  * fresh (re-deliver from the source); the evicting path is unaffected.
  */
final case class TxnReleaseState(expected: Option[Int],
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
  * Two modes:
  *
  *  - [[release]] (NoTimeout): purely deterministic — torn and
  *    END-less transactions buffer until their missing pieces arrive,
  *    however long that takes. State here is NOT bounded by stream
  *    length alone: abandoned transactions hold their buffers forever
  *    and released transactions accrete one tombstone flag each, so
  *    state grows O(abandoned buffers + total transactions released).
  *    Right for replayable bounded backfills, wrong for an unbounded
  *    production stream.
  *  - [[releaseOrEvict]] (EventTimeTimeout): the production mode. A
  *    transaction that is still incomplete when the watermark passes
  *    `ts(last piece seen) + horizon` is EVICTED — its buffered events
  *    emit once with `dead = true` (a dead-letter channel, so torn
  *    input is observable, not silently dropped) and its state is
  *    removed. Released transactions' tombstones expire at the same
  *    horizon, so state is O(transactions open or released within one
  *    horizon window) — genuinely bounded by commit latency. Replays
  *    arriving after a tombstone expired cannot double-release: their
  *    event times predate the watermark, and the watermark's late-data
  *    filter drops them before they reach the state function. The
  *    at-least-once transport the reference assumes (restart replays
  *    from a non-durable offset store) makes torn input a certainty,
  *    which is why the horizon is the default production posture.
  *
  * Scale shape (both modes): the shuffle is the one hash exchange on
  * txId that any transaction assembly needs; per-batch work is
  * O(arriving events).
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

  /** Evicting release (see class doc): whole transactions emit with
    * `dead = false`; transactions still incomplete `horizonMs` after
    * their last piece (by event time, once the watermark confirms it)
    * dead-letter their buffered events with `dead = true` and free
    * their state. `watermarkDelay` is the usual out-of-orderness bound
    * (e.g. "10 seconds"); the watermark is placed on the UNION of
    * events and metadata so one exhausted side cannot pin it.
    */
  def releaseOrEvict(events: Dataset[TxnEventTs], meta: Dataset[TxnMetaTs],
      watermarkDelay: String, horizonMs: Long): Dataset[TxnVerdict] = {
    val spark = events.sparkSession
    import spark.implicits._
    val tagged = events
      .map(e => TxnTaggedTs(e.tx, "e", e.lsn, -1, e.value, e.ts))
      .unionByName(meta.map(m =>
        TxnTaggedTs(m.tx, "m", 0L, m.expected, "", m.ts)))
      .withWatermark("ts", watermarkDelay)
    tagged.groupByKey(_.tx)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout())(releaseOrEvictTxn(horizonMs))
  }

  /** The evicting per-group transition — package-visible for specs.
    * On timeout: an unreleased buffer dead-letters (lsn order, once), a
    * released tombstone silently expires; either way the state frees.
    * On data: same release rule as [[releaseTxn]], plus the timeout
    * re-arms at `max(event time seen, watermark) + horizon` so the
    * clock measures staleness from the LAST piece of the transaction.
    */
  private[graft] def releaseOrEvictTxn(horizonMs: Long)(tx: Long,
      it: Iterator[TxnTaggedTs],
      state: GroupState[TxnState]): Iterator[TxnVerdict] = {
    if (state.hasTimedOut) {
      val st = state.get
      state.remove()
      if (st.released) Iterator.empty
      else st.buffered.toSeq.sortBy(_._1).iterator
        .map { case (lsn, v) => TxnVerdict(tx, lsn, v, dead = true) }
    } else {
      val st = state.getOption.getOrElse(TxnState(None, Map.empty, false))
      var maxTs = st.seenTs
      var expected = st.expected
      var buf = st.buffered
      it.foreach { r =>
        if (r.ts != null) maxTs = math.max(maxTs, r.ts.getTime)
        if (!st.released) {
          if (r.kind == "m") expected = Some(r.expected)
          else buf = buf.updated(r.lsn, r.value)
        }
      }
      if (st.released) {
        // keep the tombstone (and its horizon clock) alive; persist the
        // advanced seenTs so the next arm stays monotone
        state.update(st.copy(seenTs = maxTs))
      } else if (expected.contains(buf.size)) {
        state.update(TxnState(expected, Map.empty, released = true, maxTs))
      } else {
        state.update(TxnState(expected, buf, released = false, maxTs))
      }
      // Arm from the transaction's LAST piece ever seen (seenTs), not
      // this batch's max: a replayed-only batch carries stale times and
      // must not pull the timeout backward. Both arguments of the max
      // are monotone across batches (seenTs by construction, the
      // watermark by definition — EventTimeTimeout also requires the
      // arm point beyond it), so the arm itself is monotone.
      val wm = state.getCurrentWatermarkMs()
      state.setTimeoutTimestamp(math.max(maxTs, wm + 1) + horizonMs)
      if (st.released || !state.get.released) Iterator.empty
      else buf.toSeq.sortBy(_._1).iterator
        .map { case (lsn, v) => TxnVerdict(tx, lsn, v, dead = false) }
    }
  }

  /** The per-group transition — package-visible so the specs can drive
    * it directly against hand-built states.
    */
  private[graft] def releaseTxn(tx: Long, it: Iterator[TxnTagged],
      state: GroupState[TxnReleaseState]): Iterator[TxnEvent] = {
    val st = state.getOption
      .getOrElse(TxnReleaseState(None, Map.empty, false))
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
        state.update(TxnReleaseState(expected, Map.empty, released = true))
        buf.toSeq.sortBy(_._1).iterator
          .map { case (lsn, v) => TxnEvent(tx, lsn, v) }
      } else {
        state.update(TxnReleaseState(expected, buf, released = false))
        Iterator.empty
      }
    }
  }
}
