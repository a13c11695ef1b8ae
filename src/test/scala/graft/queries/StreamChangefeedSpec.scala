package graft.queries

import graft.SparkSpec

/** Pins the two contracts of the in-loop change feed the gate's hash
  * cannot express by itself:
  *
  *  1. REPLAY IDEMPOTENCE — a crash between a batch's publish and the
  *     streaming checkpoint's commit re-delivers the batch; the
  *     replayed handler's bounded `readLatestBefore` fold must
  *     reproduce a byte-identical feed (and view), proven by real
  *     checkpoint surgery: delete the last batch's commit marker and
  *     restart the stream, forcing an actual re-delivery through the
  *     foreachBatch path.
  *  2. LIVE RETENTION — the handler prunes to keepLast = 2 after its
  *     own publish, so after three batches the bootstrap generation is
  *     GONE from every kind, yet the re-delivered batch still finds
  *     its fold version (the documented ≥ 2 floor: keepLast = 1 would
  *     have swept exactly the version the replay needs).
  */
class StreamChangefeedSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("a re-delivered micro-batch reproduces a byte-identical feed " +
    "post-prune, and retention swept the bootstrap generation live") {
    val s = spark
    val drive = Cdc.streamChangefeedDrive(s, sf, tmpDir("graft-cf-spec"),
      cascade = true)
    val state = drive.state

    // live retention already ran inside the handler: only the newest 2
    // generations survive, for every kind including the feed
    assert(state.versions == Seq(1L, 2L))
    def feedAt(v: Long): Seq[Seq[Any]] =
      state.readAt("feed", v).orderBy("g", "op").collect()
        .map(_.toSeq.toIndexedSeq).toIndexedSeq
    def aggAt(v: Long): Seq[Seq[Any]] =
      state.readAt("agg", v).orderBy("g").collect()
        .map(_.toSeq.toIndexedSeq).toIndexedSeq
    val feed1 = feedAt(1L)
    val feed2 = feedAt(2L)
    val agg2 = aggAt(2L)
    assert(feed1.nonEmpty && feed2.nonEmpty)
    def downAt(v: Long): Seq[Seq[Any]] =
      state.readAt("down", v).orderBy("seg").collect()
        .map(_.toSeq.toIndexedSeq).toIndexedSeq
    val down2 = downAt(2L)
    assert(down2.nonEmpty)

    // checkpoint surgery: un-commit batch 2 so the restarted stream
    // RE-DELIVERS it (offsets intact → same files, same batch id)
    val commit2 = new org.apache.hadoop.fs.Path(s"${drive.ck}/commits/2")
    val fs = commit2.getFileSystem(s.sessionState.newHadoopConf())
    assert(fs.exists(commit2), "expected a commit marker for batch 2")
    assert(fs.delete(commit2, false))
    drive.runOnce()

    // the replayed fold read v1 (retained by keepLast = 2) and its
    // publish overwrote v2 with identical content — feed AND view
    assert(state.versions == Seq(1L, 2L))
    assert(feedAt(2L) == feed2, "replayed feed must be byte-identical")
    assert(aggAt(2L) == agg2, "replayed view must be byte-identical")
    assert(feedAt(1L) == feed1, "earlier generations must be untouched")
    // the cascade stage obeys the same discipline: its replay folded
    // the re-delivered feed into the RETAINED v1 downstream state
    assert(downAt(2L) == down2,
      "replayed cascade stage must be byte-identical")
  }
}
