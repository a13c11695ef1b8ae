package graft.cdc

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** [[CdcLogCompaction]]: per-key frontier rewrite of a JSON-lines change
  * log — Kafka compacted-topic semantics on the file transport. The core
  * claim is consumer-equivalence: latest-state materialization from the
  * compacted log must equal materialization from the full log, with
  * superseded versions gone, tombstoned keys dropped, and every survivor
  * byte-identical to its original line.
  */
class CdcLogCompactionSpec extends SparkSpec {

  private val env =
    """{"before":%s,"after":%s,"source":{"version":"1","connector":"postgresql","name":"dbserver1","ts_ms":1,"snapshot":"false","db":"inventory","schema":"public","table":"customers","txId":null,"lsn":%d},"op":"%s","ts_ms":1}"""

  private def pay(id: Int, v: String) =
    s"""{"id":$id,"name":"$v","email":"$v@x.com","created_at":1}"""

  /** id 1: created then updated twice (winner lsn 31, name C).
    * id 2: created only.
    * id 3: created then deleted (tombstone wins).
    * plus one corrupt line and one foreign JSON object.
    */
  private def writeLog(dir: String): Unit = {
    val lines = Seq(
      env.format("null", pay(1, "A"), 11, "c"),
      env.format("null", pay(1, "B"), 21, "u"),
      env.format("null", pay(1, "C"), 31, "u"),
      env.format("null", pay(2, "D"), 12, "c"),
      env.format("null", pay(3, "E"), 13, "c"),
      env.format(pay(3, "E"), "null", 23, "d"),
      "corrupt{{not-json",
      """{"hello":"world"}""")
    Files.write(Paths.get(dir, "0000000001.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
  }

  test("frontier rewrite: consumer parity, tombstone drop, byte-faithful " +
    "survivors, stats") {
    val in = tmpDir("compact-in")
    val out = tmpDir("compact-out") + "/log"
    writeLog(in)
    val stats = CdcLogCompaction.compact(spark, in, out)
    // 2 live keys kept, 3 superseded versions (B,A and created-E), 1
    // tombstoned key, 2 passthrough lines
    assert(stats == CdcLogCompaction.Stats(2, 3, 1, 2), stats.toString)

    val survivors = spark.read.text(out).collect().map(_.getString(0)).toSet
    val originals = spark.read.text(in).collect().map(_.getString(0)).toSet
    assert(survivors.subsetOf(originals), "a survivor was re-serialized")
    assert(survivors.size == 4)
    assert(survivors.exists(_.contains("\"name\":\"C\"")), "id 1 frontier")
    assert(survivors.exists(_.contains("\"name\":\"D\"")), "id 2 frontier")
    assert(!survivors.exists(_.contains("\"id\":3")), "id 3 must drop out")
    assert(survivors.contains("corrupt{{not-json"), "corrupt passthrough")

    // consumer parity: latest-state over full log == over compacted log
    def state(dir: String) =
      CdcMaterialize.latestState(
        CdcEnvelope.parse(spark.read.text(dir)), keyField = "id")
        .select("id", "name", "email", "last_lsn")
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Int].toLong)
    assert(state(out).sameElements(state(in)))

    // the compacted directory is still a graft-cdc table
    val back = spark.read.format("graft-cdc").load(out)
      .filter(col("op").isNotNull)
      .select(col("after.id"), col("source.lsn")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(back == Set((1, 31L), (2, 12L)))
  }

  test("null-lsn envelopes compact at -infinity: they lose to any " +
    "positioned record and dedupe among themselves; op-less lines still " +
    "pass through") {
    val in = tmpDir("compact-nulllsn-in")
    val out = tmpDir("compact-nulllsn-out") + "/log"
    val envNull =
      """{"before":null,"after":%s,"source":{"version":"1","connector":"postgresql","name":"dbserver1","ts_ms":1,"snapshot":"false","db":"inventory","schema":"public","table":"customers","txId":null,"lsn":null},"op":"%s","ts_ms":1}"""
    val lines = Seq(
      // id 5: an unpositioned duplicate must LOSE to the positioned update
      envNull.format(pay(5, "STALE"), "c"),
      env.format("null", pay(5, "FRESH"), 51, "u"),
      // id 6: only unpositioned records — exactly one deterministic winner
      envNull.format(pay(6, "NA"), "c"),
      envNull.format(pay(6, "NB"), "c"),
      // key-bearing but op-less foreign shape: still passthrough
      """{"after":{"id":7},"note":"no-op-field"}""")
    Files.write(Paths.get(in, "0000000001.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val stats = CdcLogCompaction.compact(spark, in, out)
    assert(stats == CdcLogCompaction.Stats(2, 2, 0, 1), stats.toString)
    val survivors = spark.read.text(out).collect().map(_.getString(0)).toSet
    assert(survivors.exists(_.contains("\"name\":\"FRESH\"")),
      "positioned record wins over the unpositioned duplicate")
    assert(!survivors.exists(_.contains("\"name\":\"STALE\"")),
      "the unpositioned duplicate is removed, not passed through")
    // tiebreak among null-lsn records is value-desc → "NB" > "NA"
    assert(survivors.exists(_.contains("\"name\":\"NB\"")) &&
      !survivors.exists(_.contains("\"name\":\"NA\"")))
    assert(survivors.exists(_.contains("no-op-field")))
  }

  test("nullLsnTsMsFallback: an unpositioned record that is the NEWEST " +
    "state for its key wins by ts_ms under the opt-in, still loses " +
    "under the default") {
    val in = tmpDir("compact-tsfb-in")
    val envNullTs =
      """{"before":null,"after":%s,"source":{"version":"1","connector":"postgresql","name":"dbserver1","ts_ms":1,"snapshot":"false","db":"inventory","schema":"public","table":"customers","txId":null,"lsn":null},"op":"%s","ts_ms":%d}"""
    val lines = Seq(
      // id 5: positioned update at lsn 51 (ts_ms 1, from `env`) vs a
      // LIVE null-lsn event whose ts_ms is far newer than the lsn value
      env.format("null", pay(5, "POSITIONED"), 51, "u"),
      envNullTs.format(pay(5, "LIVE_NULL_LSN"), "u", 9999L))
    Files.write(Paths.get(in, "0000000001.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val outDefault = tmpDir("compact-tsfb-out-a") + "/log"
    CdcLogCompaction.compact(spark, in, outDefault)
    val defSurv = spark.read.text(outDefault).collect()
      .map(_.getString(0)).toSet
    assert(defSurv.exists(_.contains("POSITIONED")) &&
      !defSurv.exists(_.contains("LIVE_NULL_LSN")),
      "default policy: unpositioned records rank at -infinity")
    val outFb = tmpDir("compact-tsfb-out-b") + "/log"
    CdcLogCompaction.compact(spark, in, outFb, nullLsnTsMsFallback = true)
    val fbSurv = spark.read.text(outFb).collect().map(_.getString(0)).toSet
    assert(fbSurv.exists(_.contains("LIVE_NULL_LSN")) &&
      !fbSurv.exists(_.contains("POSITIONED")),
      "fallback: the null-lsn record ranks at its ts_ms (9999 > 51)")
  }

  test("retainTombstones keeps the winning delete envelope") {
    val in = tmpDir("compact-tomb-in")
    val out = tmpDir("compact-tomb-out") + "/log"
    writeLog(in)
    val stats = CdcLogCompaction.compact(spark, in, out,
      retainTombstones = true)
    assert(stats == CdcLogCompaction.Stats(3, 3, 0, 2), stats.toString)
    val survivors = spark.read.text(out).collect().map(_.getString(0))
    assert(survivors.count(_.contains("\"op\":\"d\"")) == 1)
  }

  test("V2 tail bootstraps from a compacted log and drains later rolls " +
    "exactly once") {
    val in = tmpDir("compact-tail-in")
    val base = tmpDir("compact-tail")
    val (log, out, ck) = (s"$base/log", s"$base/out", s"$base/ck")
    writeLog(in)
    CdcLogCompaction.compact(spark, in, log)
    // a NEW consumer bootstraps from the compacted snapshot: 4 survivors
    // (2 frontiers + 2 passthrough lines)
    val cfg = EnrichConfig(processingTimeIso = Some("t"))
    CdcPipeline.startV2(spark, log, out, ck, cfg).awaitTermination()
    assert(spark.read.text(out).count() == 4)
    // the collector keeps appending rolls after the compacted prefix;
    // the restarted tail must drain exactly the new file
    Files.write(Paths.get(log, "0000000002.jsonl"),
      env.format("null", pay(2, "D2"), 42, "u").getBytes("UTF-8"))
    CdcPipeline.startV2(spark, log, out, ck, cfg).awaitTermination()
    val lines = spark.read.text(out).collect().map(_.getString(0))
    assert(lines.length == 5, "restart must add exactly the new roll")
    assert(lines.count(_.contains("\"name\":\"D2\"")) == 1)
  }

  test("generational chaining: a tail swapped onto the next compacted " +
    "generation converges to the continuous tail's output; re-delivery " +
    "is exactly the frontier; an in-place swap under a live checkpoint " +
    "fails loud") {
    val in = tmpDir("compact-gen-in")
    val base = tmpDir("compact-gen")
    val (gen1, gen2, cont) = (s"$base/gen1", s"$base/gen2", s"$base/cont")
    val (out1, ck1) = (s"$base/out1", s"$base/ck1")
    val (out2, ck2) = (s"$base/out2", s"$base/ck2")
    val (outC, ckC) = (s"$base/outC", s"$base/ckC")
    writeLog(in)
    CdcLogCompaction.compact(spark, in, gen1)
    val rollA = env.format("null", pay(2, "D2"), 42, "u")
    val rollB = env.format("null", pay(1, "C2"), 50, "u")
    val cfg = EnrichConfig(processingTimeIso = Some("t"))
    // generation 1 in service: compacted prefix + roll A, tailed to out1
    Files.write(Paths.get(gen1, "0000000002.jsonl"), rollA.getBytes("UTF-8"))
    CdcPipeline.startV2(spark, gen1, out1, ck1, cfg).awaitTermination()
    // maintenance publishes generation 2 = frontier(gen1 + roll A); the
    // collector appends subsequent rolls THERE; the reader swaps over
    // with a FRESH checkpoint (bootstrap re-reads the frontier — the
    // bounded, idempotent re-delivery a compacted-topic reset pays)
    CdcLogCompaction.compact(spark, gen1, gen2)
    Files.write(Paths.get(gen2, "0000000003.jsonl"), rollB.getBytes("UTF-8"))
    CdcPipeline.startV2(spark, gen2, out2, ck2, cfg).awaitTermination()
    // continuous reference: the same stream of changes with NO swap
    new java.io.File(cont).mkdirs()
    new java.io.File(gen1).listFiles().filter(_.getName.endsWith(".jsonl"))
      .foreach(f => Files.copy(f.toPath, Paths.get(cont, f.getName)))
    Files.write(Paths.get(cont, "0000000003.jsonl"), rollB.getBytes("UTF-8"))
    CdcPipeline.startV2(spark, cont, outC, ckC, cfg).awaitTermination()
    val swap = spark.read.text(out1).collect().map(_.getString(0)) ++
      spark.read.text(out2).collect().map(_.getString(0))
    val ref = spark.read.text(outC).collect().map(_.getString(0))
    assert(swap.toSet == ref.toSet,
      "swapped-generation tail must deliver exactly the continuous " +
        "tail's record set — nothing lost, nothing foreign")
    val frontierSize = new java.io.File(gen2).listFiles()
      .filter(_.getName.endsWith(".jsonl")).filter(_.getName.contains("compacted"))
      .map(f => Files.readAllLines(f.toPath).size).sum
    assert(swap.length == ref.length + frontierSize,
      s"re-delivery must be exactly the generation-2 frontier " +
        s"($frontierSize lines): got ${swap.length} vs ${ref.length}")
    // the design forbids IN-PLACE swaps precisely because a checkpointed
    // reader would mix generations: simulate one and prove the offset's
    // boundary/membership witness refuses to read on
    new java.io.File(gen1).listFiles()
      .filter(f => f.getName.endsWith(".jsonl") || f.getName.endsWith(".crc"))
      .foreach(_.delete())
    new java.io.File(gen2).listFiles().filter(_.getName.endsWith(".jsonl"))
      .foreach(f => Files.copy(f.toPath, Paths.get(gen1, f.getName)))
    Files.write(Paths.get(gen1, "0000000004.jsonl"),
      rollA.getBytes("UTF-8")) // fresh data so a batch actually plans
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      CdcPipeline.startV2(spark, gen1, out1, ck1, cfg).awaitTermination()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("graft-cdc")),
      s"stale checkpoint over a swapped directory must fail loud: $e")
  }

  test("compacted prefix sorts before new log rolls; existing output " +
    "refused") {
    val in = tmpDir("compact-roll-in")
    val out = tmpDir("compact-roll-out") + "/log"
    writeLog(in)
    CdcLogCompaction.compact(spark, in, out)
    intercept[IllegalArgumentException] {
      CdcLogCompaction.compact(spark, in, out)
    }
    // a collector appends a fresh roll after compaction: id 2 updated
    Files.write(Paths.get(out, "0000000002.jsonl"),
      env.format("null", pay(2, "D2"), 42, "u").getBytes("UTF-8"))
    val names = new java.io.File(out).listFiles().map(_.getName).sorted
    assert(names.last == "0000000002.jsonl",
      s"compacted files must sort before new rolls: ${names.mkString(",")}")
    val st = CdcMaterialize.latestState(
      CdcEnvelope.parse(spark.read.text(out)), keyField = "id")
      .select("id", "name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(st == Map(1 -> "C", 2 -> "D2"))
  }
}
