package graft.queries

import graft.SparkSpec
import graft.cdc.FeedConsumer

/** Pins the DECOUPLED consumer's independence rails — the contracts
  * `q_cdc_feed_consumer`'s hash cannot express by itself:
  *
  *  1. MULTI-GENERATION CATCH-UP — a consumer that lags the producer
  *     applies generations N+1..N+k contiguously (the signed folds
  *     telescope) and lands on the reference answer.
  *  2. CONSUMER mid-drive kill — un-commit the consumer's last batch
  *     (checkpoint surgery) and restart: the re-delivered batch folds
  *     into its pre-batch state (bounded reads) and republishes
  *     byte-identically.
  *  3. PRODUCER at-least-once — a producer checkpoint replay rewrites
  *     feed generation 2 with identical content but FRESH part files;
  *     the consumer's file source surfaces them as new input, and the
  *     applied-frontier filter makes the re-delivery a no-op.
  *  4. RETENTION OUTRUNS the consumer — a consumer bootstrapping after
  *     the producer's keepLast=2 prune swept the bootstrap feed must
  *     FAIL LOUDLY (a silent skip would corrupt every group the swept
  *     generation touched).
  */
class FeedConsumerSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def downOf(c: FeedConsumer): Seq[Seq[Any]] =
    c.state.readLatest("down").get.orderBy("seg").collect()
      .map(_.toSeq.toIndexedSeq).toIndexedSeq

  private def appliedOf(c: FeedConsumer): Long =
    c.state.readLatest("applied").get.head().getLong(0)

  test("decoupled consumer: catch-up, consumer-kill replay, producer " +
    "at-least-once no-op, and a loud failure behind the retention " +
    "window") {
    val s = spark
    val base = tmpDir("graft-fc-spec")
    // the in-step consumer (one run per producer generation) and a
    // LAGGED one that sees only the bootstrap during the drive
    val consumer = Cdc.changefeedConsumer(s, base, "consumer")
    val lagged = Cdc.changefeedConsumer(s, base, "lagged")
    val drive = Cdc.streamChangefeedDrive(s, sf, base, afterRun = gen => {
      consumer.runOnce()
      if (gen == 0L) lagged.runOnce()
    })
    val want = downOf(consumer)
    assert(want.nonEmpty)
    assert(appliedOf(consumer) == 2L,
      "in-step consumer must have applied the last generation")

    // 1. catch-up: lagged applied only v0 during the drive; one run now
    // must apply v1 and v2 (contiguous, still retained) in one tail
    assert(appliedOf(lagged) == 0L)
    lagged.runOnce()
    assert(appliedOf(lagged) == 2L)
    assert(downOf(lagged) == want,
      "multi-generation catch-up must land on the reference answer")

    // 2. consumer mid-drive kill: un-commit its newest batch and
    // restart — a REAL re-delivery through the foreachBatch path
    val lastCid = consumer.state.versions.max
    val cCommit = new org.apache.hadoop.fs.Path(
      s"$base/consumer/ck/commits/$lastCid")
    val fs = cCommit.getFileSystem(s.sessionState.newHadoopConf())
    assert(fs.exists(cCommit), s"expected consumer commit $lastCid")
    assert(fs.delete(cCommit, false))
    consumer.runOnce()
    assert(downOf(consumer) == want,
      "re-delivered consumer batch must republish byte-identically")
    assert(appliedOf(consumer) == 2L)

    // 3. producer at-least-once: un-commit the PRODUCER's batch 2 and
    // rerun it — feed v2 is rewritten (same content, new part files);
    // the consumer must see the new files and apply them as a no-op
    val pCommit = new org.apache.hadoop.fs.Path(s"${drive.ck}/commits/2")
    assert(fs.exists(pCommit), "expected a producer commit for batch 2")
    assert(fs.delete(pCommit, false))
    drive.runOnce()
    consumer.runOnce()
    assert(downOf(consumer) == want,
      "a replayed producer generation must apply as a no-op")
    assert(appliedOf(consumer) == 2L)

    // 4. a consumer bootstrapping NOW is beyond the retention window
    // (the producer's live keepLast=2 prune swept the bootstrap feed):
    // it must fail loudly, not silently skip the missing generation
    assert(drive.state.versions == Seq(1L, 2L))
    val late = Cdc.changefeedConsumer(s, base, "late")
    val ex = intercept[Exception](late.runOnce())
    val messages = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse(""))
      .toSeq
    assert(messages.exists(_.contains("retention outran")),
      s"expected the retention-gap failure, got: $messages")
  }
}
