package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TTLConfig, TimeMode,
  Trigger}

/** TTL on the v2 state variables ([[ActivityLog]]'s MapState/ListState)
  * — the eviction semantic the `q_stream_tws_activity` gate deliberately
  * keeps OUT of its hash (its 6 h TTL never fires in a seconds-long
  * run): entries older than the TTL by PROCESSING time are gone after a
  * checkpoint restart, and with a wide TTL the same flow retains them.
  * Two drives of the same two-batch fixture differ ONLY in the TTL, so
  * the assertion isolates eviction from every other mechanism.
  */
class StreamingTtlSpec extends SparkSpec {

  /** Drive [[ActivityLog]] over two one-batch `Trigger.Once` runs with a
    * restart + `sleepMs` pause between them, returning the batch-1
    * emissions (user_id → (n_total, type_summary, n_purchases)).
    * `Trigger.Once`, not AvailableNow: ProcessingTime mode (TTL's only
    * legal mode) makes AvailableNow loop no-data batches forever.
    */
  private def drive(ttl: TTLConfig, sleepMs: Long)
      : Map[Long, (Long, String, Long)] = {
    val s = spark
    import s.implicits._
    val base = tmpDir("graft-ttl")
    val (inDir, sink, ck) = (s"$base/in", s"$base/sink", s"$base/ck")
    def run(): Unit = {
      val src = s.readStream
        .schema("user_id LONG, event_id LONG, event_type STRING, cents LONG")
        .parquet(inDir)
        .as(Encoders.product[ActEvent])
      implicit val outEnc: org.apache.spark.sql.Encoder[ActOut] =
        Encoders.product[ActOut]
      src.groupByKey(_.user_id)(Encoders.scalaLong)
        .transformWithState(new ActivityLog(ttl),
          TimeMode.ProcessingTime(), OutputMode.Update())
        .toDF()
        .writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          batch.write.mode("overwrite").parquet(s"$sink/batch=$id"): Unit
        }
        .option("checkpointLocation", ck)
        .outputMode(OutputMode.Update).trigger(Trigger.Once())
        .start().awaitTermination()
    }
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = s.conf.getOption(provider)
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set(provider, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    s.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      // batch 0: user 1 has a click + a purchase, user 2 a click
      Seq((1L, 100L, "click", 0L), (1L, 101L, "purchase", 250L),
          (2L, 102L, "click", 0L))
        .toDF("user_id", "event_id", "event_type", "cents")
        .coalesce(1).write.parquet(s"$inDir")
      run()
      Thread.sleep(sleepMs) // processing time passes while the stream is down
      // batch 1 (after restart): one view per user — append lands a new
      // part file in the SAME source dir (unique task-UUID names), which
      // the file source picks up as the next batch
      Seq((1L, 200L, "view", 0L), (2L, 201L, "view", 0L))
        .toDF("user_id", "event_id", "event_type", "cents")
        .coalesce(1).write.mode("append").parquet(inDir)
      run()
    } finally {
      prevProv.fold(s.conf.unset(provider))(s.conf.set(provider, _))
      s.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
    s.read.parquet(s"$sink/batch=1").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getLong(3)))
      .toMap
  }

  test("short TTL: batch-0 map entries and list elements are EXPIRED " +
    "after the restart — batch-1 emissions see only batch-1 state") {
    val got = drive(TTLConfig(java.time.Duration.ofMillis(500)), 4000L)
    assert(got == Map(
      1L -> ((1L, "view:1", 0L)), // click/purchase gone, purchase log empty
      2L -> ((1L, "view:1", 0L))))
  }

  test("wide TTL control: the SAME flow retains batch-0 entries across " +
    "the restart — eviction, not restart, is what the short TTL proved") {
    val got = drive(TTLConfig(java.time.Duration.ofHours(1)), 4000L)
    assert(got == Map(
      1L -> ((3L, "click:1,purchase:1,view:1", 1L)),
      2L -> ((2L, "click:1,view:1", 0L))))
  }
}
