package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

case class Doc(doc_id: Long, text: String)

/** Incremental LSH near-dup detection over a document stream: verdicts
  * come from band-key joins against the append-only index — never a
  * corpus scan — and match the batch minhash query's semantics exactly
  * (shared signature/banding/verify helpers).
  */
class StreamingDedupSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._

  private val base =
    "the quick brown fox jumps over the lazy dog near the old stone bridge at dawn"
  private def variant(tail: String) =
    base.split(" ").dropRight(1).mkString(" ") + " " + tail

  private def writeDocs(dir: String, docs: Seq[Doc]): Unit = {
    import spark.implicits._
    docs.toDF().coalesce(1).write.mode("append").parquet(dir)
  }

  test("stream batches dedup against the accumulated index and themselves") {
    import spark.implicits._
    val in = tmpDir("sdedup-in"); val index = tmpDir("sdedup-idx")
    val out = tmpDir("sdedup-out"); val ck = tmpDir("sdedup-ck")
    // batch 1: two genuinely different docs
    writeDocs(in, Seq(
      Doc(1L, base),
      Doc(2L, "completely different content about distributed query engines and shuffles here twelve tokens")))
    val stream = spark.readStream
      .schema(Seq.empty[Doc].toDF().schema).parquet(in)
    val q = StreamingDedup.run(stream, index, out, ck)
    try {
      q.processAllAvailable()
      // batch 2: doc 3 ≈ doc 1 (one trailing token differs → J well over
      // the LSH threshold), doc 4 novel, doc 5 ≈ doc 4 IN THE SAME BATCH
      writeDocs(in, Seq(
        Doc(3L, variant("dusk")),
        Doc(4L, "a totally novel document mentioning vectors embeddings and sketches with nothing shared"),
        Doc(5L, "a totally novel document mentioning vectors embeddings and sketches with nothing stolen")))
      q.processAllAvailable()
    } finally q.stop()

    val verdicts = spark.read.parquet(out)
      .select(col("doc_id"), col("dup_of"), col("matched")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // cross-batch: 3 flagged against 1; in-batch: 5 against 4
    assert(verdicts.contains((3L, 1L)), s"missing cross-batch dup: $verdicts")
    assert(verdicts.contains((5L, 4L)), s"missing in-batch dup: $verdicts")
    // the unrelated pairs are NOT flagged
    assert(!verdicts.exists { case (a, b) => Set(a, b) == Set(1L, 2L) })
    assert(!verdicts.exists { case (a, b) => Set(a, b) == Set(3L, 4L) })

    // the index accumulated every admitted doc's bands
    val idx = spark.read.parquet(index)
    assert(idx.select("doc_id").distinct().count() == 5)
    assert(idx.count() == 5L * graft.text.TextOps.LshBands)

    // semantics parity: the flagged pair agrees with the batch verifier
    val sigs = spark.read.parquet(in)
      .select(col("doc_id"), StreamingDedup.signature(col("text")).as("sig"))
    val s1 = sigs.filter(col("doc_id") === 1).select("sig").as[Seq[Long]].head()
    val s3 = sigs.filter(col("doc_id") === 3).select("sig").as[Seq[Long]].head()
    val slots = s1.zip(s3).count { case (a, b) => a == b }
    assert(slots >= graft.text.TextOps.MinhashParams.size / 2)
  }

  test("a doc repeated verbatim across batches is flagged with full-signature match") {
    import spark.implicits._
    val in = tmpDir("sdedup2-in"); val index = tmpDir("sdedup2-idx")
    val out = tmpDir("sdedup2-out"); val ck = tmpDir("sdedup2-ck")
    writeDocs(in, Seq(Doc(10L, base)))
    val stream = spark.readStream
      .schema(Seq.empty[Doc].toDF().schema).parquet(in)
    val q = StreamingDedup.run(stream, index, out, ck)
    try {
      q.processAllAvailable()
      writeDocs(in, Seq(Doc(11L, base)))
      q.processAllAvailable()
    } finally q.stop()
    val v = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of"),
        r.getAs[Long]("matched")))
    assert(v.contains((11L, 10L, graft.text.TextOps.MinhashParams.size.toLong)), v.toSeq)
  }

  test("out-of-id-order arrival: a later batch with a SMALLER doc id still " +
      "matches the indexed doc") {
    import spark.implicits._
    val in = tmpDir("sdedup4-in"); val index = tmpDir("sdedup4-idx")
    val out = tmpDir("sdedup4-out"); val ck = tmpDir("sdedup4-ck")
    writeDocs(in, Seq(Doc(100L, base))) // big id admitted first
    val schema = Seq.empty[Doc].toDF().schema
    val q = StreamingDedup.run(
      spark.readStream.schema(schema).parquet(in), index, out, ck)
    try {
      q.processAllAvailable()
      writeDocs(in, Seq(Doc(5L, base))) // backfill with a smaller id
      q.processAllAvailable()
    } finally q.stop()
    val v = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of"))).toSet
    assert(v.contains((5L, 100L)),
      s"smaller-id arrival must still match the index: $v")
  }

  test("replayed batch id republishes the same index rows — no duplicates, " +
      "no self-verdicts") {
    import spark.implicits._
    val index = tmpDir("sdedup5-idx")
    val batch = Seq(Doc(1L, base), Doc(2L, variant("dusk"))).toDF()
    val v1 = StreamingDedup.increment(batch, index, batchId = 0L).collect()
    // simulate at-least-once replay of the SAME batch id (verdict write
    // failed after the index write committed)
    val v2 = StreamingDedup.increment(batch, index, batchId = 0L).collect()
    val idx = spark.read.parquet(index)
    assert(idx.count() == 2L * graft.text.TextOps.LshBands,
      "replay must overwrite its batch directory, not append")
    def pairs(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of"))).toSet
    assert(pairs(v1) == Set((2L, 1L)))
    assert(pairs(v2) == Set((2L, 1L)),
      s"replay must emit the first run's verdicts, got ${pairs(v2)}")
  }

  test("an index tree holding only a _temporary residue (crash during the " +
      "first batch's write) reads as absent, so the replay repairs it") {
    import spark.implicits._
    val index = tmpDir("sdedup7-idx")
    // what a task-kill mid-write leaves behind: a batch directory whose
    // only content is the committer's hidden scratch tree — no data files
    val tmp = java.nio.file.Paths.get(index, "batch_id=0", "_temporary", "0")
    java.nio.file.Files.createDirectories(tmp)
    java.nio.file.Files.write(tmp.resolve("part-stub"), "junk".getBytes)
    val batch = Seq(Doc(1L, base), Doc(2L, variant("dusk"))).toDF()
    // must NOT throw schema-inference errors: the hidden-only tree is
    // "absent", the overwrite repairs batch_id=0, verdicts flow
    val v = StreamingDedup.increment(batch, index, batchId = 0L).collect()
    assert(v.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of")))
      .toSet == Set((2L, 1L)))
    assert(spark.read.parquet(index).count() ==
      2L * graft.text.TextOps.LshBands)
  }

  test("verdict output is replay-idempotent: re-running a batch id leaves " +
      "one copy of its verdict rows") {
    import spark.implicits._
    val index = tmpDir("sdedup8-idx"); val out = tmpDir("sdedup8-out")
    val batch = Seq(Doc(1L, base), Doc(2L, variant("dusk"))).toDF()
    // the sink's exact write pattern, replayed twice for the same batch id
    for (_ <- 1 to 2)
      StreamingDedup.increment(batch, index, batchId = 0L)
        .write.mode("overwrite").parquet(s"$out/batch_id=0")
    val rows = spark.read.parquet(out).collect()
    assert(rows.length == 1, s"replay appended duplicates: ${rows.toSeq}")
    assert(rows.head.getAs[Long]("doc_id") == 2L &&
      rows.head.getAs[Long]("dup_of") == 1L)
  }

  test("a corrupt index fails the batch loudly instead of silently " +
      "skipping cross-batch dedup") {
    import spark.implicits._
    val index = tmpDir("sdedup6-idx")
    // an existing-but-unreadable index: not the missing-dir case
    java.nio.file.Files.write(
      java.nio.file.Paths.get(index, "batch_id=0"), "garbage".getBytes)
    intercept[Exception] {
      StreamingDedup.increment(
        Seq(Doc(1L, base)).toDF(), index, batchId = 1L).collect()
    }
  }

  test("index compaction: directory count falls to O(1) in batches, " +
      "verdicts and replays are unchanged, repeated compaction converges") {
    import spark.implicits._
    val index = tmpDir("sdedup9-idx")
    // five batches accumulate five batch_id directories
    for (b <- 0 until 4)
      StreamingDedup.increment(
        Seq(Doc(10L + b, s"unique content number $b about wholly distinct topic ${"xyz" * (b + 1)}")).toDF(),
        index, batchId = b.toLong).collect()
    val probe = Seq(Doc(50L, base), Doc(51L, variant("dusk"))).toDF()
    val vBefore = StreamingDedup.increment(probe, index, batchId = 4L).collect()
    def batchDirs() = new java.io.File(index).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id=")).map(_.getName)
    assert(batchDirs().length == 5, batchDirs().toSeq)
    val rowsBefore = spark.read.parquet(index)
      .select("band_bucket", "band_key", "doc_id", "sig")
      .collect().map(_.toString).sorted.toSeq

    StreamingDedup.compactIndex(spark, index)
    // (b) layout: ONE base dir, fanned out by band_bucket only
    assert(batchDirs().toSeq == Seq("batch_id=-1"), batchDirs().toSeq)
    val buckets = new java.io.File(index, "batch_id=-1").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(buckets.nonEmpty &&
      buckets.forall(_.startsWith("band_bucket=")) &&
      buckets.length <= StreamingDedup.IndexBuckets, buckets.toSeq)
    // content identical row-for-row
    val rowsAfter = spark.read.parquet(index)
      .select("band_bucket", "band_key", "doc_id", "sig")
      .collect().map(_.toString).sorted.toSeq
    assert(rowsAfter == rowsBefore)

    // (a) a replayed batch id (at-least-once delivery) emits the SAME
    // verdicts against the compacted base, and its recreated directory
    // folds away on the next compaction
    val vReplay = StreamingDedup.increment(probe, index, batchId = 4L).collect()
    def pairs(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of"),
        r.getAs[Long]("matched"))).toSet
    assert(pairs(vReplay) == pairs(vBefore), s"${pairs(vReplay)} vs ${pairs(vBefore)}")
    StreamingDedup.compactIndex(spark, index)
    assert(batchDirs().toSeq == Seq("batch_id=-2"), batchDirs().toSeq)
    assert(spark.read.parquet(index)
      .select("band_bucket", "band_key", "doc_id", "sig")
      .collect().map(_.toString).sorted.toSeq == rowsBefore,
      "re-compaction after a replay must converge to the same rows")

    // new docs still dedup against the compacted base
    val vNew = StreamingDedup.increment(
      Seq(Doc(60L, base)).toDF(), index, batchId = 5L).collect()
    assert(pairs(vNew).exists { case (d, of, _) => d == 60L && of == 50L },
      s"new batch must match the compacted base: ${pairs(vNew)}")
  }

  test("restart: index and checkpoint survive, dups flagged against pre-restart docs") {
    import spark.implicits._
    val in = tmpDir("sdedup3-in"); val index = tmpDir("sdedup3-idx")
    val out = tmpDir("sdedup3-out"); val ck = tmpDir("sdedup3-ck")
    writeDocs(in, Seq(Doc(20L, base)))
    val schema = Seq.empty[Doc].toDF().schema
    val q1 = StreamingDedup.run(
      spark.readStream.schema(schema).parquet(in), index, out, ck)
    try q1.processAllAvailable() finally q1.stop()
    // docs arriving while the query is DOWN; the restarted query (same
    // checkpoint) must process exactly these and dedup them against the
    // index built before the restart
    writeDocs(in, Seq(Doc(21L, variant("dusk")), Doc(22L, base)))
    val q2 = StreamingDedup.run(
      spark.readStream.schema(schema).parquet(in), index, out, ck)
    try q2.processAllAvailable() finally q2.stop()
    val v = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of"))).toSet
    assert(v.contains((21L, 20L)) && v.contains((22L, 20L)),
      s"post-restart docs must match the pre-restart index: $v")
    // no doc was double-admitted to the index by the restart
    val idx = spark.read.parquet(index)
    assert(idx.count() == idx.dropDuplicates("doc_id", "band_key").count(),
      "restart must not duplicate index rows")
    assert(idx.select("doc_id").distinct().count() == 3)
  }
}
