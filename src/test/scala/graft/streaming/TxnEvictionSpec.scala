package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, TestGroupState, Trigger}

/** [[TxnConsistentStream.releaseOrEvict]]: the abandoned-transaction
  * horizon. The claims (round-6 verdict item #1):
  *  (a) a torn transaction evicts once the watermark passes its horizon,
  *      emitting its buffered events exactly once with `dead = true`;
  *  (b) a late-but-complete transaction (pieces spread across restarts,
  *      all within the horizon) still releases exactly once, `dead =
  *      false`;
  *  (c) a replay arriving AFTER eviction emits nothing — the replayed
  *      rows carry their original event times, which the watermark's
  *      late-data filter drops before they reach state, so an expired
  *      tombstone cannot double-release and an evicted buffer cannot
  *      resurrect.
  */
class TxnEvictionSpec extends SparkSpec {

  private val T0 = 1700000000000L
  private def ts(ms: Long) = new Timestamp(ms)

  private def run(evDir: String, mtDir: String, out: String,
      ck: String): Unit = {
    import spark.implicits._
    val ev = spark.readStream
      .schema("tx LONG, lsn LONG, value STRING, ts TIMESTAMP")
      .parquet(evDir).as[TxnEventTs]
    val mt = spark.readStream
      .schema("tx LONG, expected INT, ts TIMESTAMP")
      .parquet(mtDir).as[TxnMetaTs]
    TxnConsistentStream.releaseOrEvict(ev, mt, "10 seconds", 60000L)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck)
      .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow())
      .start().awaitTermination()
  }

  test("torn txns dead-letter at the horizon; late-but-complete txns " +
    "release; post-eviction replays emit nothing") {
    import spark.implicits._
    val (evDir, mtDir, out, ck) =
      (tmpDir("ev-ev"), tmpDir("ev-mt"), tmpDir("ev-out") + "/p",
        tmpDir("ev-ck"))
    // run 1 at T0: txn1 torn (1 of 2, END seen), txn2 END-less (both
    // events, no END), txn3 complete, txn4 half-arrived (completes
    // late, in run 2, still within ITS horizon)
    Seq(TxnEventTs(1, 11, "a", ts(T0)),
      TxnEventTs(2, 21, "x", ts(T0)), TxnEventTs(2, 22, "y", ts(T0)),
      TxnEventTs(3, 31, "p", ts(T0)), TxnEventTs(3, 32, "q", ts(T0)),
      TxnEventTs(4, 41, "m", ts(T0))).toDF()
      .coalesce(1).write.mode("append").parquet(evDir)
    Seq(TxnMetaTs(1, 2, ts(T0)), TxnMetaTs(3, 2, ts(T0)),
      TxnMetaTs(4, 2, ts(T0))).toDF()
      .coalesce(1).write.mode("append").parquet(mtDir)
    run(evDir, mtDir, out, ck)
    val r1 = spark.read.parquet(out).as[TxnVerdict].collect()
    assert(r1.forall(!_.dead) && r1.map(_.tx).toSet == Set(3L),
      s"only complete txn3 released in run 1: ${r1.toSeq}")

    // run 2: txn4's second event lands at T0+30s (inside txn4's
    // horizon), and an unrelated advancer event pushes the watermark
    // far past every horizon → txn1 and txn2 must evict
    Seq(TxnEventTs(4, 42, "n", ts(T0 + 30000L)),
      TxnEventTs(99, 991, "adv", ts(T0 + 86400000L))).toDF()
      .coalesce(1).write.mode("append").parquet(evDir)
    run(evDir, mtDir, out, ck)
    val r2 = spark.read.parquet(out).as[TxnVerdict].collect()
    val dead = r2.filter(_.dead)
    assert(dead.map(e => (e.tx, e.lsn, e.value)).sortBy(identity).toSeq ==
      Seq((1L, 11L, "a"), (2L, 21L, "x"), (2L, 22L, "y")),
      s"torn txn1 + END-less txn2 dead-letter whole, once: ${r2.toSeq}")
    assert(r2.filter(e => !e.dead && e.tx == 4L)
      .map(e => (e.lsn, e.value)).sortBy(_._1).toSeq ==
      Seq((41L, "m"), (42L, "n")),
      "late-but-complete txn4 releases whole")
    assert(r2.count(e => e.tx == 3L) == 2, "txn3 not re-emitted")

    // run 3: at-least-once replays of an EVICTED event, a RELEASED
    // event (tombstone may have expired), and txn1's missing END —
    // all carrying their ORIGINAL (now-late) timestamps
    Seq(TxnEventTs(1, 11, "a", ts(T0)),
      TxnEventTs(3, 31, "p", ts(T0))).toDF()
      .coalesce(1).write.mode("append").parquet(evDir)
    Seq(TxnMetaTs(2, 2, ts(T0))).toDF()
      .coalesce(1).write.mode("append").parquet(mtDir)
    run(evDir, mtDir, out, ck)
    val r3 = spark.read.parquet(out).as[TxnVerdict].collect()
    assert(r3.length == r2.length,
      s"post-eviction replays emit nothing: ${r3.toSeq.diff(r2.toSeq)}")
  }

  test("transition function: timeout paths — unreleased buffer " +
    "dead-letters in lsn order, released tombstone expires silently") {
    def state(init: Option[TxnState], timedOut: Boolean,
        wmMs: Long = 0L) = TestGroupState.create[TxnState](
      org.apache.spark.api.java.Optional.fromNullable(init.orNull),
      GroupStateTimeout.EventTimeTimeout(), 0L,
      org.apache.spark.api.java.Optional.of(wmMs),
      hasTimedOut = timedOut)
    val f = TxnConsistentStream.releaseOrEvictTxn(60000L) _
    // timed-out unreleased buffer → dead-letter, lsn-ordered, state gone
    val s1 = state(Some(TxnState(Some(3),
      Map(7L -> "g", 5L -> "e"), released = false)), timedOut = true)
    val out1 = f(4L, Iterator.empty, s1).toSeq
    assert(out1 == Seq(TxnVerdict(4, 5, "e", dead = true),
      TxnVerdict(4, 7, "g", dead = true)))
    assert(!s1.exists, "evicted state removed")
    // timed-out released tombstone → nothing, state gone
    val s2 = state(Some(TxnState(Some(2), Map.empty, released = true)),
      timedOut = true)
    assert(f(5L, Iterator.empty, s2).isEmpty && !s2.exists)
    // data path: arming uses max(event ts, watermark+1) + horizon, so a
    // replayed-only batch (stale ts ≤ watermark) still arms legally
    val s3 = state(Some(TxnState(Some(2), Map.empty, released = true)),
      timedOut = false, wmMs = 500000L)
    val out3 = f(6L, Iterator(TxnTaggedTs(6, "e", 1, -1, "v",
      new Timestamp(100L))), s3).toSeq
    assert(out3.isEmpty, "replay to a live tombstone emits nothing")
    assert(s3.getTimeoutTimestampMs.get() == 500001L + 60000L,
      "timeout re-arms beyond the watermark")
    // a replayed-only batch (stale ts, low watermark) must not pull an
    // existing horizon backward: the arm comes from seenTs, the max
    // event time EVER observed for the transaction
    val s3b = state(Some(TxnState(Some(3), Map(1L -> "a"),
      released = false, seenTs = 1000000L)), timedOut = false, wmMs = 0L)
    val out3b = f(7L, Iterator(TxnTaggedTs(7, "e", 1, -1, "a",
      new Timestamp(100L))), s3b).toSeq
    assert(out3b.isEmpty)
    assert(s3b.getTimeoutTimestampMs.get() == 1000000L + 60000L,
      "replay must not shrink the horizon measured from the true last piece")
    // and a release through the evicting path tags dead = false
    val s4 = state(None, timedOut = false)
    val out4 = f(8L, Iterator(
      TxnTaggedTs(8, "e", 2, -1, "b", new Timestamp(T0)),
      TxnTaggedTs(8, "e", 1, -1, "a", new Timestamp(T0)),
      TxnTaggedTs(8, "m", 0, 2, "", new Timestamp(T0))), s4).toSeq
    assert(out4 == Seq(TxnVerdict(8, 1, "a", dead = false),
      TxnVerdict(8, 2, "b", dead = false)))
    assert(s4.get.released &&
      s4.getTimeoutTimestampMs.get() == T0 + 60000L)
  }
}
