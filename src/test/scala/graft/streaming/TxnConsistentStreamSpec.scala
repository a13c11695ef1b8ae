package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, TestGroupState, Trigger}

/** [[TxnConsistentStream]]: whole-transaction release over micro-batches.
  * The claims: a transaction's events emit only once its END metadata AND
  * all expected events have arrived (atomically, lsn-ordered); torn and
  * END-less transactions stay buffered across restarts; at-least-once
  * replays (of events or metadata, before or after release) never
  * duplicate the output.
  */
class TxnConsistentStreamSpec extends SparkSpec {

  private def run(evDir: String, mtDir: String, out: String,
      ck: String): Unit = {
    import spark.implicits._
    val ev = spark.readStream.schema("tx LONG, lsn LONG, value STRING")
      .parquet(evDir).as[TxnEvent]
    val mt = spark.readStream.schema("tx LONG, expected INT")
      .parquet(mtDir).as[TxnMeta]
    TxnConsistentStream.release(ev, mt)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck)
      .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow())
      .start().awaitTermination()
  }

  test("transactions release whole, in order, exactly once across " +
    "restarts and replays") {
    import spark.implicits._
    val (evDir, mtDir, out, ck) =
      (tmpDir("txn-ev"), tmpDir("txn-mt"), tmpDir("txn-out") + "/p",
        tmpDir("txn-ck"))
    // batch 1: txn1 torn (2 of 3 events, no END), txn2 complete with END
    Seq(TxnEvent(1, 12, "b"), TxnEvent(1, 11, "a"),
      TxnEvent(2, 21, "x"), TxnEvent(2, 22, "y")).toDF()
      .coalesce(1).write.mode("append").parquet(evDir)
    Seq(TxnMeta(2, 2)).toDF().coalesce(1).write.mode("append").parquet(mtDir)
    run(evDir, mtDir, out, ck)
    val first = spark.read.parquet(out).as[TxnEvent].collect()
    assert(first.map(_.tx).toSet == Set(2L), "only the complete txn releases")
    assert(first.map(e => (e.lsn, e.value)).sortBy(_._1).toSeq ==
      Seq((21L, "x"), (22L, "y")))

    // batch 2 after restart: txn1's last event + END arrive, PLUS
    // at-least-once replays of txn2's event and END
    Seq(TxnEvent(1, 13, "c"), TxnEvent(2, 21, "x")).toDF()
      .coalesce(1).write.mode("append").parquet(evDir)
    Seq(TxnMeta(1, 3), TxnMeta(2, 2)).toDF()
      .coalesce(1).write.mode("append").parquet(mtDir)
    run(evDir, mtDir, out, ck)
    val all = spark.read.parquet(out).as[TxnEvent].collect()
    assert(all.length == 5, s"txn1 releases once, txn2 never re-emits: " +
      s"${all.toSeq}")
    assert(all.filter(_.tx == 1).map(e => (e.lsn, e.value)).sortBy(_._1)
      .toSeq == Seq((11L, "a"), (12L, "b"), (13L, "c")))
    assert(all.count(_.tx == 2) == 2)
  }

  test("transition function: duplicate events don't inflate completeness; " +
    "overshoot stays buffered") {
    def state(init: Option[TxnReleaseState]) = TestGroupState.create[TxnReleaseState](
      org.apache.spark.api.java.Optional.fromNullable(init.orNull),
      GroupStateTimeout.NoTimeout(), 0L,
      org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    // the same (lsn 5) event delivered twice + END(2): still only 1
    // distinct event — must NOT release
    val s1 = state(None)
    val out1 = TxnConsistentStream.releaseTxn(9L, Iterator(
      TxnTagged(9, "e", 5, -1, "v"), TxnTagged(9, "e", 5, -1, "v"),
      TxnTagged(9, "m", 0, 2, "")), s1).toSeq
    assert(out1.isEmpty)
    assert(s1.get.buffered.size == 1 && s1.get.expected.contains(2))
    // second distinct event arrives → releases both, state tombstones
    val s2 = state(Some(s1.get))
    val out2 = TxnConsistentStream.releaseTxn(9L,
      Iterator(TxnTagged(9, "e", 6, -1, "w")), s2).toSeq
    assert(out2.map(e => (e.lsn, e.value)) == Seq((5L, "v"), (6L, "w")))
    assert(s2.get.released && s2.get.buffered.isEmpty)
    // metadata claiming FEWER events than buffered (corrupt input):
    // never matches equality, stays buffered — loud in monitoring, not
    // a wrong release
    val s3 = state(None)
    val out3 = TxnConsistentStream.releaseTxn(7L, Iterator(
      TxnTagged(7, "e", 1, -1, "p"), TxnTagged(7, "e", 2, -1, "q"),
      TxnTagged(7, "m", 0, 1, "")), s3).toSeq
    assert(out3.isEmpty && !s3.get.released)
  }
}
