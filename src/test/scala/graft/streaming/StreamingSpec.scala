package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues, Trigger, TTLConfig, ValueState}
import java.sql.Timestamp

case class Ev(event_id: Long, ts: Timestamp, user_id: Long, value: Double)

/** Spark 4 arbitrary-state API (transformWithState): running per-user
  * count in RocksDB-backed ValueState.
  */
class RunningCountProcessor extends StatefulProcessor[Long, Ev, (Long, Long)] {
  @transient private var count: ValueState[Long] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[Ev],
      tv: TimerValues): Iterator[(Long, Long)] = {
    val n = (if (count.exists()) count.get() else 0L) + rows.size
    count.update(n)
    Iterator((key, n))
  }
}

case class ChangeRec(id: Int, lsn: Long, op: String, name: String)
case class StateRec(lsn: Long, op: String, name: String)

/** Streaming twin of the batch latest-state materialization
  * (`queries.Cdc.qCdcLatestState`): per-key max-lsn state in RocksDB-backed
  * ValueState, late (lower-lsn) events ignored, deletes tombstoned.
  */
class LatestStateProcessor
    extends StatefulProcessor[Int, ChangeRec, (Int, Long, String, String)] {
  @transient private var st: ValueState[StateRec] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[StateRec]("latest",
      Encoders.product[StateRec], TTLConfig.NONE)
  override def handleInputRows(key: Int, rows: Iterator[ChangeRec],
      tv: TimerValues): Iterator[(Int, Long, String, String)] = {
    var cur = if (st.exists()) st.get() else null
    rows.foreach { r =>
      if (cur == null || r.lsn > cur.lsn)
        cur = StateRec(r.lsn, r.op, if (r.op == "d") null else r.name)
    }
    st.update(cur)
    Iterator((key, cur.lsn, cur.op, cur.name))
  }
}

/** Event-time session timeout via transformWithState TIMERS: accumulate a
  * per-user count, re-arm a timer at last-event + gap, and emit the closed
  * session ONLY when the watermark passes the timer — the emit-on-timeout
  * half of sessionization that `session_window` (which emits on watermark
  * per window) doesn't expose for custom payloads.
  */
class SessionTimeoutProcessor(gapMs: Long)
    extends StatefulProcessor[Long, Ev, (Long, Long)] {
  @transient private var cnt: ValueState[Long] = _
  @transient private var maxTs: ValueState[Long] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong, TTLConfig.NONE)
    maxTs = getHandle.getValueState[Long]("maxTs", Encoders.scalaLong, TTLConfig.NONE)
  }
  override def handleInputRows(key: Long, rows: Iterator[Ev],
      tv: TimerValues): Iterator[(Long, Long)] = {
    var out = List.empty[(Long, Long)]
    var oldMax = if (maxTs.exists()) Some(maxTs.get()) else None
    var n = if (cnt.exists()) cnt.get() else 0L
    // input rows are processed BEFORE expired timers: if this key's timer
    // has already passed the batch watermark, close the old session here —
    // deleting its timer below and accumulating into it would silently
    // merge two sessions and never emit the first
    oldMax.filter(_ + gapMs <= tv.getCurrentWatermarkInMs()).foreach { o =>
      out ::= (key, n)
      getHandle.deleteTimer(o + gapMs)
      n = 0L
      oldMax = None
    }
    var m = oldMax.getOrElse(0L)
    rows.foreach { r => n += 1; m = math.max(m, r.ts.getTime) }
    oldMax.filter(_ != m).foreach(o => getHandle.deleteTimer(o + gapMs))
    cnt.update(n); maxTs.update(m)
    getHandle.registerTimer(m + gapMs)
    out.iterator // empty unless an expired session was closed above
  }
  override def handleExpiredTimer(key: Long, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[(Long, Long)] = {
    val n = if (cnt.exists()) cnt.get() else 0L
    cnt.clear(); maxTs.clear()
    Iterator((key, n))
  }
}

/** Structured Streaming semantics: windowed aggregation parity with batch,
  * watermark-gated append emission across checkpointed restarts, stateful
  * dedup within watermark, and custom state via flatMapGroupsWithState —
  * the streaming surface of SURVEY.md §2.9 beyond the CDC pipeline specs.
  */
class StreamingSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def writeEvents(dir: String, evs: Seq[Ev]): Unit = {
    import spark.implicits._
    evs.toDF().coalesce(1).write.mode("append").parquet(dir)
  }

  private def streamFrom(dir: String): DataFrame = {
    import spark.implicits._
    spark.readStream.schema(Seq.empty[Ev].toDF().schema).parquet(dir)
  }

  test("complete-mode tumbling window aggregation matches batch") {
    val in = tmpDir("st-in")
    val evs = (0 until 48).map(h =>
      Ev(h, ts(f"2024-01-${1 + h / 24}%02d ${h % 24}%02d:30:00"), h % 5, 1.5))
    writeEvents(in, evs)

    streamFrom(in)
      .groupBy(window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("tumbling_complete")
      .outputMode(OutputMode.Complete).trigger(Trigger.AvailableNow())
      .start().awaitTermination()

    val streamed = spark.table("tumbling_complete")
      .select(col("window.start").cast("string"), col("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == Map("2024-01-01 00:00:00" -> 24L, "2024-01-02 00:00:00" -> 24L))
  }

  test("append mode emits windows only once watermark passes (across restarts)") {
    val in = tmpDir("wm-in")
    val out = tmpDir("wm-out")
    val ckpt = tmpDir("wm-ckpt")

    def run(): Unit =
      streamFrom(in)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 day"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").cast("string").as("wstart"), col("n"))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow())
        .start().awaitTermination()

    writeEvents(in, (0 until 10).map(i => Ev(i, ts(s"2024-01-01 10:0$i:00"), 1, 1.0)))
    run()
    assert(spark.read.parquet(out).count() == 0, "day-1 window must stay open")

    writeEvents(in, Seq(Ev(100, ts("2024-01-03 00:00:00"), 1, 1.0)))
    run() // batch runs with watermark from run 1 — still nothing emitted
    writeEvents(in, Seq(Ev(101, ts("2024-01-03 01:00:00"), 1, 1.0)))
    run() // watermark now 2024-01-02 23:00 > day-1 window end → emit
    val rows = spark.read.parquet(out).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("2024-01-01 00:00:00" -> 10L))
  }

  test("dropDuplicatesWithinWatermark dedups within and across batches") {
    val in = tmpDir("dd-in")
    val out = tmpDir("dd-out")
    val ckpt = tmpDir("dd-ckpt")

    def run(): Unit =
      streamFrom(in)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("event_id")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow())
        .start().awaitTermination()

    // batch 1: ids 1..5 plus in-batch duplicates of 1 and 2
    writeEvents(in, (1 to 5).map(i => Ev(i, ts(s"2024-01-01 10:0$i:00"), 1, 1.0))
      ++ Seq(Ev(1, ts("2024-01-01 10:07:00"), 1, 9.9), Ev(2, ts("2024-01-01 10:08:00"), 1, 9.9)))
    run()
    assert(spark.read.parquet(out).select("event_id").collect().map(_.getLong(0)).sorted
      .toSeq == (1L to 5L))

    // batch 2: cross-batch duplicates of 3,4 (within watermark) + new 6
    writeEvents(in, Seq(Ev(3, ts("2024-01-01 10:09:00"), 1, 9.9),
      Ev(4, ts("2024-01-01 10:10:00"), 1, 9.9), Ev(6, ts("2024-01-01 10:11:00"), 1, 1.0)))
    run()
    assert(spark.read.parquet(out).select("event_id").collect().map(_.getLong(0)).sorted
      .toSeq == (1L to 6L))
  }

  test("session_window streams with watermark, matches batch sessionization") {
    import spark.implicits._
    val in = tmpDir("sw-in")
    // user 1: two sessions (gap > 30 min); user 2: one session
    val evs = Seq(
      Ev(1, ts("2024-01-01 10:00:00"), 1, 1.0),
      Ev(2, ts("2024-01-01 10:10:00"), 1, 1.0),
      Ev(3, ts("2024-01-01 11:30:00"), 1, 1.0),
      Ev(4, ts("2024-01-01 10:05:00"), 2, 1.0),
      // watermark pusher so all sessions close
      Ev(9, ts("2024-01-02 00:00:00"), 9, 0.0))
    writeEvents(in, evs)
    streamFrom(in)
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").cast("string").as("start"), col("n"))
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow())
      .start().awaitTermination()
    val streamed = spark.table("sess_stream").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    // batch twin over the same rows; the watermark-pusher's own session
    // (user 9) stays OPEN in append mode — only closed sessions compare
    val batch = evs.toDF().filter(col("user_id") =!= 9)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").cast("string").as("start"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
    assert(streamed((1L, "2024-01-01 10:00:00")) == 2L) // merged session
    assert(streamed.contains((1L, "2024-01-01 11:30:00"))) // second session
  }

  test("stream-static join enriches a stream against a dimension table") {
    import spark.implicits._
    val in = tmpDir("ss-in")
    writeEvents(in, (1 to 10).map(i => Ev(i, ts(s"2024-01-01 10:0${i % 10}:00"), i % 3, 1.0)))
    val dim = Seq((0L, "bronze"), (1L, "silver"), (2L, "gold")).toDF("user_id", "tier")
    streamFrom(in)
      .join(dim, "user_id") // static side broadcast per micro-batch
      .groupBy("tier").count()
      .writeStream.format("memory").queryName("ss_join")
      .outputMode(OutputMode.Complete).trigger(Trigger.AvailableNow())
      .start().awaitTermination()
    val out = spark.table("ss_join").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("bronze" -> 3L, "silver" -> 4L, "gold" -> 3L))
  }

  test("stream-stream interval join with watermarks") {
    import spark.implicits._
    val inA = tmpDir("ssj-a")
    val inB = tmpDir("ssj-b")
    // clicks at :00/:10/:20..., purchases 5 min after some of them
    writeEvents(inA, Seq(1L, 2L, 3L).map(i =>
      Ev(i, ts(s"2024-01-01 10:${i}0:00"), i, 1.0)))
    writeEvents(inB, Seq(1L, 3L).map(i =>
      Ev(100 + i, ts(s"2024-01-01 10:${i}5:00"), i, 2.0)))
    val clicks = streamFrom(inA).withWatermark("ts", "1 hour")
      .select(col("event_id").as("click_id"),
        col("user_id").as("c_uid"), col("ts").as("click_ts"))
    val purchases = streamFrom(inB).withWatermark("ts", "1 hour")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_uid"), col("ts").as("purchase_ts"))
    clicks.join(purchases,
        expr("c_uid = p_uid AND purchase_ts >= click_ts " +
          "AND purchase_ts <= click_ts + interval 10 minutes"))
      .writeStream.format("memory").queryName("ssj")
      .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow())
      .start().awaitTermination()
    val pairs = spark.table("ssj").select("click_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 101L), (3L, 103L)))
  }

  test("stream-stream LEFT OUTER join: unmatched rows emit with NULLs " +
    "only after the watermark closes their window, across restart") {
    import spark.implicits._
    val inA = tmpDir("ssoj-a")
    val inB = tmpDir("ssoj-b")
    val out = tmpDir("ssoj-out") + "/p"
    val ck = tmpDir("ssoj-ck")
    def run(): Unit = {
      val clicks = streamFrom(inA).withWatermark("ts", "5 minutes")
        .select(col("event_id").as("click_id"),
          col("user_id").as("c_uid"), col("ts").as("click_ts"))
      val purchases = streamFrom(inB).withWatermark("ts", "5 minutes")
        .select(col("event_id").as("purchase_id"),
          col("user_id").as("p_uid"), col("ts").as("purchase_ts"))
      clicks.join(purchases,
          expr("c_uid = p_uid AND purchase_ts >= click_ts " +
            "AND purchase_ts <= click_ts + interval 10 minutes"),
          "left_outer")
        .select(col("click_id"), col("purchase_id"))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    }
    // click 1 converts, click 2 does not; nothing may emit for click 2
    // yet — its 10-minute window is still open at the watermark
    writeEvents(inA, Seq(
      Ev(1, ts("2024-01-01 10:10:00"), 1, 1.0),
      Ev(2, ts("2024-01-01 10:20:00"), 2, 1.0)))
    writeEvents(inB, Seq(Ev(101, ts("2024-01-01 10:15:00"), 1, 2.0)))
    run()
    val first = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(first == Set((1L, Some(101L))),
      s"click 2's window is open — no NULL row may emit yet: $first")
    // a later event pushes the watermark past click 2's window close
    // (10:30) + 5 min delay; the restarted query must emit (2, NULL)
    // exactly once and never revisit click 1
    writeEvents(inA, Seq(Ev(3, ts("2024-01-01 11:00:00"), 9, 1.0)))
    writeEvents(inB, Seq(Ev(199, ts("2024-01-01 11:00:00"), 8, 2.0)))
    run()
    val all = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toList
    assert(all.count(_ == ((2L, None))) == 1,
      s"unmatched click must emit exactly one NULL row: $all")
    assert(all.count(_._1 == 1L) == 1, "matched click re-emitted")
  }

  test("incremental aggregate maintenance: update-mode delta counters across restart") {
    import spark.implicits._
    val in = tmpDir("iagg-in")
    val ckpt = tmpDir("iagg-ckpt")
    def writeChg(rows: Seq[(Long, String)]): Unit =
      rows.map { case (id, op) =>
        (id, op, if (id % 2 == 0) "even.example.com" else "odd.example.com")
      }.toDF("id", "op", "domain").coalesce(1).write.mode("append").parquet(in)

    val out = tmpDir("iagg-out")
    // foreachBatch = the MV-upsert sink pattern: each micro-batch delivers
    // only the keys whose counters changed (update mode), stamped with the
    // batch id so the newest version per key wins downstream
    def run(): Unit =
      spark.readStream
        .schema("id LONG, op STRING, domain STRING").parquet(in)
        .withColumn("delta", graft.queries.Cdc.liveDelta(col("op")))
        .groupBy(col("domain"))
        .agg(sum(col("delta")).as("live"), count(lit(1)).as("n_events"))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          batch.withColumn("batch_id", lit(id))
            .write.mode("append").parquet(out): Unit
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update).trigger(Trigger.AvailableNow())
        .start().awaitTermination()

    writeChg((1L to 10L).map(_ -> "r"))
    run()
    // restart with more changes: deletes 1..3, no-delta updates 4..5 —
    // state resumes from the checkpoint, counters absorb only the deltas
    writeChg(Seq(1L -> "d", 2L -> "d", 3L -> "d", 4L -> "u", 5L -> "u"))
    run()
    val fin = spark.read.parquet(out).collect()
      .groupBy(_.getAs[String]("domain"))
      .map { case (d, rs) => d -> rs.maxBy(_.getAs[Long]("batch_id")) }
    assert(fin("even.example.com").getAs[Long]("live") == 4L) // 5 − id 2
    assert(fin("odd.example.com").getAs[Long]("live") == 3L) // 5 − ids 1,3
    assert(fin("even.example.com").getAs[Long]("n_events") == 7L) // 5 r + id2 d + id4 u
    assert(fin("odd.example.com").getAs[Long]("n_events") == 8L) // 5 r + 1,3 d + id5 u
  }

  test("transformWithState timers: sessions emit on event-time timeout only") {
    import spark.implicits._
    val in = tmpDir("twt-in")
    val out = tmpDir("twt-out")
    val ckpt = tmpDir("twt-ckpt")
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def run(): Unit =
        streamFrom(in).as[Ev]
          .withWatermark("ts", "0 seconds")
          .groupByKey(_.user_id)
          .transformWithState(new SessionTimeoutProcessor(600000L), // 10 min gap
            TimeMode.EventTime(), OutputMode.Append())
          .toDF("user_id", "n_events")
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow())
          .start().awaitTermination()

      // users 1 (3 events) and 2 (2 events), all before 10:05
      writeEvents(in, Seq(
        Ev(1, ts("2024-01-01 10:00:00"), 1, 1.0),
        Ev(2, ts("2024-01-01 10:02:00"), 1, 1.0),
        Ev(3, ts("2024-01-01 10:04:00"), 1, 1.0),
        Ev(4, ts("2024-01-01 10:01:00"), 2, 1.0),
        Ev(5, ts("2024-01-01 10:05:00"), 2, 1.0)))
      run() // watermark ends at 10:05 — timers (10:14/10:15) still armed
      assert(spark.read.parquet(out).count() == 0,
        "no session may close before the watermark passes its timer")
      // user 3 at 11:00 advances the watermark for the NEXT batch
      writeEvents(in, Seq(Ev(6, ts("2024-01-01 11:00:00"), 3, 1.0)))
      run() // this batch still runs at watermark 10:05
      writeEvents(in, Seq(Ev(7, ts("2024-01-01 12:00:00"), 3, 1.0)))
      run() // watermark 11:00 > both timers → sessions 1 and 2 emit
      val sessions = spark.read.parquet(out).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(sessions == Map(1L -> 3L, 2L -> 2L),
        s"expected users 1,2 closed and user 3 still open, got $sessions")
      // interleaving hazard: user 3's timer (12:10) expires AND a new
      // user-3 event arrives in the SAME batch — the expired session must
      // still emit (input-row processing closes it) instead of silently
      // merging into the new one
      writeEvents(in, Seq(Ev(8, ts("2024-01-01 13:00:00"), 4, 1.0)))
      run() // advances the watermark to 13:00 for the next batch
      writeEvents(in, Seq(Ev(9, ts("2024-01-01 13:30:00"), 3, 1.0)))
      run() // wm 13:00 ≥ user-3 timer 12:10, new event same batch;
      // AvailableNow then runs a no-data batch at wm 13:30, which also
      // fires user 4's 13:10 timer — user 3's NEW session (timer 13:40)
      // stays open
      val sessions2 = spark.read.parquet(out).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(sessions2 == Map(1L -> 3L, 2L -> 2L, 3L -> 2L, 4L -> 1L),
        s"expired session must close despite same-batch new event: $sessions2")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState: RocksDB-backed per-user running counts") {
    import spark.implicits._
    val in = tmpDir("tws-in")
    writeEvents(in, (0 until 24).map(i =>
      Ev(i, ts(f"2024-01-01 ${i % 24}%02d:00:00"), i % 4, 1.0)))
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      streamFrom(in).as[Ev]
        .groupByKey(_.user_id)
        .transformWithState(new RunningCountProcessor(),
          TimeMode.None(), OutputMode.Update())
        .toDF("user_id", "running_n")
        .writeStream.format("memory").queryName("tws")
        .outputMode(OutputMode.Update).trigger(Trigger.AvailableNow())
        .start().awaitTermination()
      val finalCounts = spark.table("tws")
        .groupBy("user_id").agg(max("running_n").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(finalCounts == Map(0L -> 6L, 1L -> 6L, 2L -> 6L, 3L -> 6L))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming latest-state: max-lsn wins across restarts, late events ignored") {
    import spark.implicits._
    val in = tmpDir("tws-ls-in")
    val ckpt = tmpDir("tws-ls-ckpt")
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // memory sink cannot recover from a checkpoint; foreachBatch can
    def run(): Map[Int, (Long, String, String)] = {
      val emitted =
        scala.collection.mutable.Map[Int, (Long, String, String)]()
      spark.readStream.schema(Seq.empty[ChangeRec].toDF().schema).parquet(in)
        .as[ChangeRec]
        .groupByKey(_.id)
        .transformWithState(new LatestStateProcessor(),
          TimeMode.None(), OutputMode.Update())
        .toDF("id", "lsn", "op", "name")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = df.collect()
          emitted.synchronized {
            rows.foreach(r => emitted(r.getInt(0)) =
              (r.getLong(1), r.getString(2), r.getString(3)))
          }
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update).trigger(Trigger.AvailableNow())
        .start().awaitTermination()
      emitted.toMap
    }
    try {
      // batch 1: snapshot of 5 keys
      (1 to 5).map(i => ChangeRec(i, i, "r", s"N$i")).toDF()
        .coalesce(1).write.mode("append").parquet(in)
      val s1 = run()
      assert(s1 == (1 to 5).map(i => i -> ((i.toLong, "r", s"N$i"))).toMap)

      // batch 2 after restart: update id 2, delete id 3, LATE event for id 4
      // (lsn 0 < snapshot lsn — must not override the newer state)
      Seq(ChangeRec(2, 102, "u", "N2v2"), ChangeRec(3, 103, "d", "gone"),
        ChangeRec(4, 0, "u", "stale")).toDF()
        .coalesce(1).write.mode("append").parquet(in)
      val s2 = run()
      assert(s2 == Map(
        2 -> ((102L, "u", "N2v2")),
        3 -> ((103L, "d", null)),      // tombstoned, name cleared
        4 -> ((4L, "r", "N4"))))       // late event ignored, state unchanged
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("flatMapGroupsWithState maintains running per-user counts") {
    import spark.implicits._
    val in = tmpDir("st-fm-in")
    writeEvents(in, (0 until 30).map(i =>
      Ev(i, ts(f"2024-01-01 ${i % 24}%02d:00:00"), i % 3, 1.0)))

    streamFrom(in).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[Ev], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + it.size
          state.update(n)
          Iterator((uid, n))
      }
      .toDF("user_id", "running_n")
      .writeStream.format("memory").queryName("fmgws")
      .outputMode(OutputMode.Update).trigger(Trigger.AvailableNow())
      .start().awaitTermination()

    val finalCounts = spark.table("fmgws")
      .groupBy("user_id").agg(max("running_n").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(finalCounts == Map(0L -> 10L, 1L -> 10L, 2L -> 10L))
  }

  test("streaming volume monitor: incrementally maintained daily counts " +
    "feed the batch anomaly flags, across restart") {
    import spark.implicits._
    val in = tmpDir("vm-in")
    val ckpt = tmpDir("vm-ckpt")
    val out = tmpDir("vm-out")
    def writeDay(day: String, clicks: Int, views: Int): Unit =
      ((0 until clicks).map(i => ("click", ts(f"$day%s 10:00:${i % 60}%02d"))) ++
        (0 until views).map(i => ("view", ts(f"$day%s 11:00:${i % 60}%02d"))))
        .toDF("event_type", "ts").coalesce(1).write.mode("append").parquet(in)
    // update-mode incremental daily counts: each micro-batch emits only
    // the (type, day) keys whose counters changed; foreachBatch upserts
    // them stamped with the batch id (newest wins downstream) — the
    // event volume is never rescanned
    def run(): Unit =
      spark.readStream.schema("event_type STRING, ts TIMESTAMP").parquet(in)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          batch.withColumn("batch_id", lit(id))
            .write.mode("append").parquet(out): Unit
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update).trigger(Trigger.AvailableNow())
        .start().awaitTermination()

    writeDay("2024-03-01", clicks = 40, views = 40)
    writeDay("2024-03-02", clicks = 38, views = 42)
    run()
    // restart: a collapsed click day (40 → 10, ratio 2632 ≤ 5000) and a
    // view spike (42 → 80, ratio 19047 ≥ 15000) arrive later
    writeDay("2024-03-03", clicks = 10, views = 80)
    run()
    // newest counter version per (type, day), then the SAME flag pass the
    // batch gate uses
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"), col("day"))
      .orderBy(col("batch_id").desc)
    val daily = spark.read.parquet(out)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("day"), col("n"))
    val flags = graft.queries.Events.anomalyFlags(daily).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getAs[Long]("n"), r.getAs[Boolean]("is_anomaly"))).toMap
    assert(flags(("click", "2024-03-02")) == (38L, false))
    assert(flags(("click", "2024-03-03")) == (10L, true), "collapse flagged")
    assert(flags(("view", "2024-03-02")) == (42L, false))
    assert(flags(("view", "2024-03-03")) == (80L, true), "spike flagged")
    // and the streamed counts equal a batch recount of the full input
    val batchDaily = spark.read.parquet(in)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    assert(daily.exceptAll(batchDaily).isEmpty &&
      batchDaily.exceptAll(daily).isEmpty)
  }

  test("streaming aggregate-over-join view: foreachBatch drives " +
    "IncrementalAggView.step per micro-batch with versioned state " +
    "publishes, survives a restart, and equals a full recompute") {
    import spark.implicits._
    import graft.cdc.{IncrementalAggView, IncrementalJoinView}
    val in = tmpDir("aggview-in")
    val ckpt = tmpDir("aggview-ckpt")
    val store = tmpDir("aggview-store")
    // one delta stream carrying both sides; side A's payload is the
    // GROUP, side B's the metric (encoded in one string payload column)
    def writeBatch(rows: Seq[(String, Int, String, Long, String)]): Unit =
      rows.toDF("side", "id", "op", "lsn", "payload")
        .coalesce(1).write.mode("append").parquet(in)
    def latestVersion(kind: String): Option[Long] = {
      val d = new java.io.File(s"$store/$kind")
      Option(d.listFiles).map(_.filter(_.getName.startsWith("v"))
        .map(_.getName.drop(1).toLong)).filter(_.nonEmpty).map(_.max)
    }
    def readLatest(kind: String): Option[DataFrame] =
      latestVersion(kind).map(v => spark.read.parquet(s"$store/$kind/v$v"))
    // versioned publish keyed by BATCH id: a replayed micro-batch after
    // a crash overwrites its own version — idempotent, newest-wins reads
    def publish(kind: String, id: Long, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$store/$kind/v$id")
    def run(): Unit =
      spark.readStream
        .schema("side STRING, id INT, op STRING, lsn LONG, payload STRING")
        .parquet(in)
        .writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          val b = batch.cache()
          val aDelta = b.filter(col("side") === "a")
            .select(col("id"), col("op"), col("lsn"),
              col("payload").as("g"))
          val bDelta = b.filter(col("side") === "b")
            .select(col("id"), col("op"), col("lsn"),
              col("payload").cast("long").as("m"))
          val (agg2, aS2, bS2) =
            (readLatest("aState"), readLatest("bState"), readLatest("agg")) match {
              case (Some(aS), Some(bS), Some(agg)) =>
                IncrementalAggView.step(agg.drop("via"), aS, bS,
                  aDelta, bDelta, "id", "g", "m", "via")
              case _ => // first batch bootstraps from the deltas alone
                val aS = IncrementalJoinView.sideState(aDelta, "id")
                val bS = IncrementalJoinView.sideState(bDelta, "id")
                (IncrementalAggView.bootstrap(aS, bS, "id", "g", "m")
                  .withColumn("via", lit("bootstrap")), aS, bS)
            }
          publish("agg", id, agg2)
          publish("aState", id, aS2)
          publish("bState", id, bS2)
          b.unpersist(): Unit
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update).trigger(Trigger.AvailableNow())
        .start().awaitTermination()

    val gen1 = (1 to 20).flatMap(k => Seq(
      ("a", k, "r", k.toLong, s"g${k % 4}"),
      ("b", k, "r", k.toLong, (k * 10L).toString)))
    writeBatch(gen1)
    run()
    // generation 2 AFTER a restart: metric updates, a group MOVE, and
    // deletes on both sides
    val gen2 = Seq(
      ("a", 3, "u", 1000L, "moved"), // group move
      ("b", 4, "u", 1001L, "999"), // metric update
      ("a", 5, "d", 1002L, null), // A-side delete
      ("b", 8, "d", 1003L, null)) // B-side delete
    writeBatch(gen2)
    run()
    val got = readLatest("agg").get.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // reference: latest-state fold over ALL deltas, join, group
    val all = gen1 ++ gen2
    def fold(side: String): Map[Int, String] =
      all.filter(_._1 == side).groupBy(_._2).flatMap { case (k, rows) =>
        val w = rows.maxBy(r => (r._4, r._3))
        if (w._3 == "d") None else Some(k -> w._5)
      }
    val fa = fold("a"); val fb = fold("b")
    val want = (1 to 20).flatMap(k =>
        for (g <- fa.get(k); m <- fb.get(k)) yield (g, m.toLong))
      .groupBy(_._1).map { case (g, rows) =>
        (g, rows.size.toLong, rows.map(_._2).sum)
      }.toSet
    assert(got == want, s"got=$got\nwant=$want")
    // the second run must have applied deltas, not re-bootstrapped
    assert(readLatest("agg").get.collect()
      .exists(_.getString(3) == "carried"),
      "restarted run must carry untouched groups through step()")
  }
}
