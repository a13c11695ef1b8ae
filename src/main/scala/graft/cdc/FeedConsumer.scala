package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** A DECOUPLED change-feed consumer: a second, separately-checkpointed
  * streaming query that TAILS the feed generations a producer publishes
  * (the `feed` kind of a [[VersionedState]] store) and maintains its own
  * downstream aggregate from them — the topology that makes a change
  * feed a TOPIC rather than a subroutine. The reference's architecture
  * is exactly this split: the enriched topic is tailed by an independent
  * subscriber process (`/root/reference/docs/architecture.md:54-63`,
  * verified by a separate consumer in `scripts/verify.sh:404-412`);
  * everything the producer knows reaches the consumer through the
  * published parquet alone.
  *
  * Independence properties (each spec-pinned in `FeedConsumerSpec`):
  *
  *  - OWN checkpoint, own lifecycle: the consumer resumes from ITS
  *    file-source checkpoint across restarts, regardless of how many
  *    generations the producer ran in between; a mid-drive kill
  *    (un-committed consumer batch) re-delivers through the same
  *    foreachBatch path and lands byte-identically.
  *  - AT-LEAST-ONCE tolerant: the producer's own checkpoint replay
  *    overwrites a feed generation with identical content but fresh
  *    part-file names, which the file source surfaces as new input; the
  *    consumer filters rows to upstream versions STRICTLY ABOVE its
  *    applied frontier, so replayed generations apply as no-ops.
  *  - RETENTION-AWARE, loudly: the producer prunes to `keepLast`
  *    generations. A consumer that falls behind the retention window
  *    cannot silently skip the swept generations — the frontier gap
  *    check throws, because applying feed N+2 on top of state N would
  *    silently corrupt every group N+1 touched. (A legitimately EMPTY
  *    generation is indistinguishable from a swept one at the row
  *    level — this producer's per-batch feeds are never empty, and a
  *    deployment with empty generations would co-publish a version
  *    manifest; failing loudly on the ambiguity is the safe side.)
  *  - CONTIGUOUS multi-generation catch-up: signed folds compose across
  *    consecutive feeds (a group's −old₁+new₁−old₂+new₂ telescopes, as
  *    new₁ = old₂ for images of the same group), so one micro-batch
  *    carrying generations N+1..N+k applies in one
  *    [[graft.operators.ViewDelta.cascadeAgg]] fold.
  *
  * State layout (the consumer's OWN [[VersionedState]], anchored on
  * `down`, versioned by the CONSUMER's batch ids): `applied` — a
  * one-row frame holding the upstream-version frontier — publishes
  * first, the anchoring `down` last; both are read back bounded
  * (`readLatestBefore(cid)`), so a consumer-side checkpoint replay
  * folds into its pre-batch state and republishes byte-identically.
  *
  * Scale shape: per consumer batch, one O(|feed|) signed fold + one
  * group-keyed merge into the group-sized downstream view; the
  * upstream-version scan is a `distinct()` over the feed's version
  * column collected to the driver — bounded by the handful of
  * generations a trigger can carry, never by data volume. Nothing here
  * reads the producer's base tables or its upstream view: deltas in,
  * rollup out, the dataflow-topic contract.
  */
final class FeedConsumer(
    spark: SparkSession,
    feedGlob: String,
    feedSchema: String,
    store: String,
    checkpoint: String,
    groupOf: Column,
    groupName: String,
    valueCols: Seq[String]) {

  /** The consumer's own versioned state (anchor `down`) — readable by
    * the gate after the stream stops, prunable like any maintained
    * store.
    */
  val state = new VersionedState(spark, store, "down")

  private def emptyDown(like: DataFrame): DataFrame =
    like.select(groupOf.as(groupName) +: lit(0L).as("n_rows") +:
        valueCols.map(v => lit(0L).as(s"sum_$v")): _*)
      .filter(lit(false))

  /** One AvailableNow drive of the tail: process every feed generation
    * published since the consumer's checkpoint, then stop. Call again
    * after the producer advances — each call is a RESTART that resumes
    * from the consumer's own checkpoint (the gate interleaves these
    * with producer generations; a real deployment would run the same
    * query with a continuous trigger).
    */
  def runOnce(): Unit =
    spark.readStream.schema(feedSchema).parquet(feedGlob)
      .writeStream
      .foreachBatch { (batch: DataFrame, cid: Long) =>
        val b = batch.cache()
        try {
          // bounded reads: a replayed consumer batch folds into the
          // state BEFORE its own publish (see VersionedState)
          val applied = state.readLatestBefore("applied", cid)
            .map(_.head().getLong(0)).getOrElse(-1L)
          // distinct upstream versions this trigger carried: a
          // constant-size driver boundary (generations per trigger),
          // never data-sized
          val versions = b.select(col("feed_version")).distinct()
            .collect().map(_.getLong(0)).sorted
          val fresh = versions.filter(_ > applied)
          if (fresh.nonEmpty) {
            val missing = ((applied + 1) to fresh.max)
              .filterNot(fresh.contains)
            if (missing.nonEmpty) throw new IllegalStateException(
              s"feed retention outran this consumer: upstream " +
                s"generation(s) ${missing.mkString(", ")} were swept " +
                s"before it saw them (applied frontier $applied, " +
                s"incoming ${fresh.mkString(", ")}); re-seed the " +
                "consumer from a fresh bootstrap feed")
          }
          // producer replays (and any already-applied generation) drop
          // out here — the at-least-once idempotence rail
          val freshRows = b.filter(col("feed_version") > lit(applied))
          val down0 = state.readLatestBefore("down", cid)
            .getOrElse(emptyDown(b))
          val down2 = graft.operators.ViewDelta.cascadeAgg(
            down0, freshRows, groupOf, groupName, valueCols)
          val frontier = if (fresh.nonEmpty) fresh.max else applied
          val s2 = spark
          import s2.implicits._
          // non-anchor first, anchor last: a crash between the two
          // leaves the previous (applied, down) pair current
          state.publish("applied", cid,
            Seq(frontier).toDF("upstream_version"))
          state.publish("down", cid, down2)
          state.prune(keepLast = 2)
        } finally b.unpersist(): Unit
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start().awaitTermination()
}
