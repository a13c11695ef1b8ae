package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** V2 write path (`write/writeStream.format("graft-cdc")`): batch and
  * streaming commits, name-contract round-trips (sink output is valid
  * tail input), truncate-on-overwrite, idempotent epoch republish, and
  * the single-string-column input contract.
  */
class CdcSinkSpec extends SparkSpec {
  import spark.implicits._

  private val env =
    """{"before":null,"after":{"id":%d,"name":"N%d","email":"n%d@x.org","created_at":1},"source":{"version":"v","connector":"postgresql","name":"dbserver1","ts_ms":5,"snapshot":"false","db":"inventory","schema":"public","table":"customers","txId":1,"lsn":%d},"op":"c","ts_ms":1}"""
  private def lines(ids: Int*) = ids.map(i => env.format(i, i, i, i))

  private def names(dir: String): Seq[String] =
    new java.io.File(dir).listFiles().toSeq.map(_.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith(".")).sorted

  test("batch write commits zero-padded monotone names the source can read") {
    val dir = tmpDir("sink_batch")
    lines(1, 2, 3).toDF("value").repartition(2)
      .write.format("graft-cdc").mode("append").save(dir)
    val fs = names(dir)
    assert(fs.nonEmpty && fs.forall(_.matches("b\\d{12}-p\\d{5}\\.jsonl")), fs)
    // no temp debris
    assert(new java.io.File(dir).listFiles().forall(f =>
      !f.getName.startsWith("._tmp")), "temp files left behind")
    // round-trip through the V2 SOURCE: sink output is valid tail input
    val back = spark.read.format("graft-cdc").load(dir)
    assert(back.select("after.id").collect().map(_.getInt(0)).sorted.toSeq ==
      Seq(1, 2, 3))

    // a second append commits under a LATER sequence — names stay monotone
    lines(4).toDF("value").coalesce(1)
      .write.format("graft-cdc").mode("append").save(dir)
    val fs2 = names(dir)
    assert(fs2.length > fs.length && fs2.sorted == fs2, fs2)
    assert(fs2.filterNot(fs.contains).forall(_ > fs.max), fs2)
    assert(spark.read.format("graft-cdc").load(dir).count() == 4)
  }

  test("overwrite truncates previously committed files") {
    val dir = tmpDir("sink_trunc")
    lines(1, 2).toDF("value").write.format("graft-cdc").mode("append").save(dir)
    lines(9).toDF("value").coalesce(1)
      .write.format("graft-cdc").mode("overwrite").save(dir)
    val back = spark.read.format("graft-cdc").load(dir)
    assert(back.select("after.id").collect().map(_.getInt(0)).toSeq == Seq(9))
  }

  test("input contract: multi-column or non-string input is rejected") {
    val dir = tmpDir("sink_badschema")
    val e = intercept[Exception] {
      Seq((1, "x")).toDF("a", "b").write.format("graft-cdc")
        .mode("append").save(dir)
    }
    assert(e.getMessage.contains("one STRING column"), e.getMessage)
  }

  test("partitionColumn fan-out: one tailable subdirectory per routing key") {
    val dir = tmpDir("sink_fanout")
    Seq(
      ("customers", lines(1).head),
      ("orders", lines(2).head),
      ("customers", lines(3).head),
      (null.asInstanceOf[String], lines(4).head),   // unroutable
      ("../weird key!", lines(5).head))             // hostile key
      .toDF("source_table", "value")
      .coalesce(1)
      .write.format("graft-cdc").option("partitionColumn", "source_table")
      .mode("append").save(dir)

    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).sorted.toSeq
    assert(subdirs.contains("customers") && subdirs.contains("orders"), subdirs)
    // hostile key sanitized into a READABLE directory (never hidden/escaping)
    assert(subdirs.forall(d => !d.startsWith(".") && !d.contains("/")), subdirs)

    // every subdirectory is independently tailable by the V2 source
    val cust = spark.read.format("graft-cdc").load(s"$dir/customers")
    assert(cust.select("after.id").collect().map(_.getInt(0)).sorted.toSeq ==
      Seq(1, 3))
    assert(spark.read.format("graft-cdc").load(s"$dir/orders").count() == 1)
    // null key routed, not dropped
    val all = subdirs.map(d =>
      spark.read.format("graft-cdc").load(s"$dir/$d").count()).sum
    assert(all == 5, s"rows across subdirs=$all")
  }

  test("streaming fan-out closes the reference loop: tail -> enrich/route " +
      "-> per-table tailable logs") {
    val srcDir = tmpDir("fanout_src")
    val outDir = tmpDir("fanout_out")
    val cp = tmpDir("fanout_cp")
    // two-table change mix, one transport stream (the reference's
    // one-connector/many-topics shape)
    val custLine = lines(1).head
    val ordLine = lines(2).head.replace("\"table\":\"customers\"",
      "\"table\":\"orders\"")
    java.nio.file.Files.write(java.nio.file.Paths.get(srcDir, "00000.jsonl"),
      s"$custLine\n$ordLine\nnot-json{{{".getBytes("UTF-8"))

    val routed = graft.cdc.CdcPipeline.routedValues(
      spark.readStream.format("graft-cdc").load(srcDir).select("value"),
      graft.cdc.EnrichConfig(processingTimeIso = Some("t")))
    val q = routed.writeStream.format("graft-cdc")
      .option("path", outDir).option("partitionColumn", "source_table")
      .option("checkpointLocation", cp).start()
    try q.processAllAvailable() finally q.stop()

    val subdirs = new java.io.File(outDir).listFiles().filter(_.isDirectory)
      .map(_.getName).sorted.toSeq
    // "_unrouted" is charset-safe, so the routedValues contract name is
    // used verbatim — consumers find the passthrough log where the
    // pipeline documents it
    assert(subdirs == Seq("_unrouted", "customers", "orders"), subdirs)
    // enriched output in the customers log still carries the original id
    val cust = spark.read.json(
      spark.read.format("graft-cdc").load(s"$outDir/customers")
        .select("value").as[String])
    assert(cust.select("original.after.id").collect().map(_.getLong(0))
      .toSeq == Seq(1L))
  }

  test("startV2: the official V2-transport pipeline — paced tail, enrich, " +
      "fan-out, chainable per-table logs") {
    val srcDir = tmpDir("v2pipe_src")
    val outDir = tmpDir("v2pipe_out")
    val cp = tmpDir("v2pipe_cp")
    java.nio.file.Files.write(java.nio.file.Paths.get(srcDir, "00000.jsonl"),
      (lines(1) ++ Seq("junk{{{")).mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(srcDir, "00001.jsonl"),
      lines(2).mkString("\n").getBytes("UTF-8"))

    val q = graft.cdc.CdcPipeline.startV2(spark, srcDir, outDir, cp,
      graft.cdc.EnrichConfig(processingTimeIso = Some("t")),
      fanOutByTable = true, maxFilesPerTrigger = Some(1))
    try q.awaitTermination(60000) finally q.stop()

    // per-table log holds the enriched records; the junk line went to
    // _unrouted byte-unchanged (P18)
    val cust = spark.read.format("graft-cdc").load(s"$outDir/customers")
      .select("value").as[String].collect()
    assert(cust.length == 2)
    val unrouted = spark.read.format("graft-cdc").load(s"$outDir/_unrouted")
      .select("value").as[String].collect()
    assert(unrouted.toSeq == Seq("junk{{{"))
    // chainable: the per-table log tails straight into another V2 read
    assert(spark.readStream.format("graft-cdc").load(s"$outDir/customers")
      .isStreaming)
  }

  test("overwrite + partitionColumn replaces old fan-out data and keeps " +
      "the new batch intact") {
    val dir = tmpDir("sink_fanout_ow")
    Seq(("customers", lines(1).head), ("orders", lines(2).head))
      .toDF("source_table", "value").coalesce(1)
      .write.format("graft-cdc").option("partitionColumn", "source_table")
      .mode("append").save(dir)
    Seq(("customers", lines(9).head))
      .toDF("source_table", "value").coalesce(1)
      .write.format("graft-cdc").option("partitionColumn", "source_table")
      .mode("overwrite").save(dir)
    assert(spark.read.format("graft-cdc").load(s"$dir/customers")
      .select("after.id").collect().map(_.getInt(0)).toSeq == Seq(9))
    assert(spark.read.format("graft-cdc").load(s"$dir/orders").count() == 0)
  }

  test("distinct routing keys never merge: sanitized names carry a hash " +
      "of the raw key") {
    val dir = tmpDir("sink_collide")
    Seq(("order items", lines(1).head), ("order_items", lines(2).head))
      .toDF("source_table", "value").coalesce(1)
      .write.format("graft-cdc").option("partitionColumn", "source_table")
      .mode("append").save(dir)
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).toSeq
    assert(subdirs.length == 2 && subdirs.distinct.length == 2, subdirs)
    assert(subdirs.contains("order_items"), subdirs) // safe key verbatim
  }

  test("batch append into a streaming-written log is refused (names would " +
      "sort behind the tail boundary)") {
    val dir = tmpDir("sink_mix")
    val cp = tmpDir("sink_mix_cp")
    val src = tmpDir("sink_mix_src")
    java.nio.file.Files.write(java.nio.file.Paths.get(src, "00000.jsonl"),
      lines(1).head.getBytes("UTF-8"))
    val q = spark.readStream.format("graft-cdc").load(src).select("value")
      .writeStream.format("graft-cdc").option("path", dir)
      .option("checkpointLocation", cp).start()
    try q.processAllAvailable() finally q.stop()

    val e = intercept[Exception] {
      lines(2).toDF("value").coalesce(1)
        .write.format("graft-cdc").mode("append").save(dir)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("batch append")), msgs(e).mkString("|"))
    // overwrite is the sanctioned way to repurpose the directory
    lines(3).toDF("value").coalesce(1)
      .write.format("graft-cdc").mode("overwrite").save(dir)
    assert(spark.read.format("graft-cdc").load(dir)
      .select("after.id").collect().map(_.getInt(0)).toSeq == Seq(3))
  }

  test("complete output mode is refused: an append-only log cannot " +
      "republish the full result per epoch") {
    val dir = tmpDir("sink_complete")
    val e = intercept[Exception] {
      val q = spark.readStream
        .format("rate").option("rowsPerSecond", 1).load()
        .groupBy().count().select(col("count").cast("string").as("value"))
        .writeStream.format("graft-cdc").outputMode("complete")
        .option("path", dir)
        .option("checkpointLocation", tmpDir("sink_complete_cp")).start()
      try q.processAllAvailable() finally q.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("complete output mode")),
      msgs(e).mkString("|"))
  }

  test("fresh checkpoint into an existing log is refused before a " +
      "restarted epoch clobbers committed data") {
    val dir = tmpDir("sink_freshcp")
    def part(epoch: Long, line: String): CdcCommitMessage = {
      val w = new CdcLineWriter(dir, f"e$epoch%012d-p${0}%05d.jsonl")
      w.write(org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(line)))
      w.commit().asInstanceOf[CdcCommitMessage]
    }
    // an earlier query committed up to epoch 5
    val w0 = new CdcStreamingWrite(dir, Map.empty, 0, None)
    w0.commit(5L, Array[org.apache.spark.sql.connector.write.WriterCommitMessage](
      part(5L, lines(1).head)))
    // a NEW query over a fresh checkpoint restarts epoch numbering: its
    // CdcStreamingWrite (built at query start) sees the floor and refuses
    val w1 = new CdcStreamingWrite(dir, Map.empty, 0, None)
    val before = names(dir)
    val e = intercept[IllegalStateException] {
      w1.commit(0L, Array[org.apache.spark.sql.connector.write.WriterCommitMessage](
        part(0L, lines(9).head)))
    }
    assert(e.getMessage.contains("FRESH checkpoint"), e.getMessage)
    assert(names(dir) == before, "committed files must be untouched")
    // crash-replay of the floor epoch itself stays allowed (idempotent)
    w1.commit(5L, Array[org.apache.spark.sql.connector.write.WriterCommitMessage](
      part(5L, lines(2).head)))
    assert(spark.read.format("graft-cdc").load(dir)
      .select("after.id").collect().map(_.getInt(0)).toSeq == Seq(2))
  }

  test("stale parts of a replayed epoch are swept: republish with fewer " +
      "partitions leaves no duplicates") {
    val dir = tmpDir("sink_stale")
    // simulate epoch 3 attempt 1 with two partitions
    def writePart(part: Int, line: String): CdcCommitMessage = {
      val w = new CdcLineWriter(dir, f"e${3L}%012d-p$part%05d.jsonl")
      w.write(org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(line)))
      w.commit().asInstanceOf[CdcCommitMessage]
    }
    CdcSinkFiles.publish(dir,
      Array(writePart(0, lines(1).head), writePart(1, lines(2).head)),
      overwrite = true)
    assert(names(dir).length == 2)
    // replayed attempt produces ONE partition; the streaming commit path
    // must sweep the stale p00001 from the dead attempt
    val sw = new CdcStreamingWrite(dir, Map.empty, 0, None)
    sw.commit(3L, Array[org.apache.spark.sql.connector.write.WriterCommitMessage](
      writePart(0, lines(9).head)))
    assert(names(dir) == Seq(f"e${3L}%012d-p${0}%05d.jsonl"), names(dir))
    assert(spark.read.format("graft-cdc").load(dir)
      .select("after.id").collect().map(_.getInt(0)).toSeq == Seq(9))
  }

  test("failure injection: a task dying mid-batch aborts the commit with " +
      "NO rows visible and no temp debris; the retried batch publishes once") {
    val dir = tmpDir("sink_taskfail")
    // 3 partitions; the partition holding id=42 throws after writing
    // some rows. local[4] has task maxFailures=1, so the job aborts —
    // the driver must discard every successful task's uncommitted temp
    // and the failing task's own writer must abort its temp: nothing
    // visible, nothing hidden left behind.
    val e = intercept[org.apache.spark.SparkException] {
      lines(40 to 60: _*).toDF("value").repartition(3).as[String]
        .map { v => // fail mid-stream of one task, after rows were written
          if (v.contains("\"id\":42")) throw new RuntimeException("injected")
          v
        }.toDF("value")
        .write.format("graft-cdc").mode("append").save(dir)
    }
    assert(e.getMessage.contains("injected") ||
      Option(e.getCause).exists(_.getMessage.contains("injected")))
    def left = Option(new java.io.File(dir).listFiles()).map(_.toSeq).getOrElse(Nil)
    // visibility is SYNCHRONOUS: publish renames happen only in the
    // driver's commit, which never ran — assert immediately. Hidden
    // temp debris MAY survive a dirty abort (a sibling task that
    // completed right at the failure has its commit message race the
    // job abort — Spark's abort(messages) never sees it), which is why
    // the contract is "invisible to readers, swept by the next commit"
    // rather than "gone instantly".
    assert(left.forall(f => f.getName.startsWith("_") || f.getName.startsWith(".")),
      s"partial commit visible: ${left.map(_.getName)}")
    // the healthy retry of the whole batch (what a scheduler does after a
    // failed job) publishes exactly once AND sweeps any orphaned debris
    lines(40 to 60: _*).toDF("value").repartition(3)
      .write.format("graft-cdc").mode("append").save(dir)
    assert(spark.read.format("graft-cdc").load(dir)
      .select("after.id").collect().map(_.getInt(0)).sorted.toSeq ==
      (40 to 60).toSeq)
    assert(!left.exists(_.getName.startsWith("._tmp")),
      s"orphaned temps survived the retry's commit sweep: ${left.map(_.getName)}")
  }

  test("failure injection at the writer protocol: a dead first attempt " +
      "(no abort ever runs) leaves only hidden bytes; the retry attempt's " +
      "commit publishes exactly its own rows") {
    val dir = tmpDir("sink_attemptfail")
    val valueSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.StringType)))
    val info = new org.apache.spark.sql.connector.write.LogicalWriteInfo {
      override def options() = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of())
      override def queryId(): String = "qf1"
      override def schema(): org.apache.spark.sql.types.StructType = valueSchema
    }
    val write = new CdcWriteBuilder(dir, info).build().toBatch
    val factory = write.createBatchWriterFactory(null)
    def row(s: String) = org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    // attempt 1: writes rows, then the executor DIES — neither commit()
    // nor abort() ever runs (hard kill, not an exception path)
    val attempt1 = factory.createWriter(0, 0L)
    attempt1.write(row("{\"lost\":1}"))
    attempt1.write(row("{\"lost\":2}"))
    // attempt 2 (the retry of partition 0): writes the real rows, commits
    val attempt2 = factory.createWriter(0, 1L)
    attempt2.write(row(env.format(7, 7, 7, 7)))
    val msg = attempt2.commit()
    write.commit(Array(msg))
    // visible result: exactly ONE committed file with attempt 2's row —
    // the dead attempt's bytes stay hidden from every reader/tailer
    val visible = names(dir)
    assert(visible.length == 1 && visible.head.matches("b\\d{12}-p00000\\.jsonl"),
      visible)
    assert(spark.read.format("graft-cdc").load(dir)
      .select("after.id").collect().map(_.getInt(0)).toSeq == Seq(7))
    assert(spark.read.text(dir).count() == 1,
      "dead-attempt bytes leaked into the readable namespace")
    // the dead attempt's temp was never aborted (process death), but the
    // retry's commit sweeps orphaned temporaries after publishing — no
    // residue class at all, not even hidden
    val orphans = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("._tmp"))
    assert(orphans.isEmpty, orphans.map(_.getName).toSeq)
  }

  test("null payload rows fail the write instead of silently vanishing") {
    val dir = tmpDir("sink_nullval")
    val e = intercept[Exception] {
      Seq(Some(lines(1).head), None).toDF("value")
        .coalesce(1).write.format("graft-cdc").mode("append").save(dir)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("null payload")), msgs(e).mkString("|"))
  }

  test("invalid UTF-8 payload bytes survive sink and source unchanged " +
      "(P18 byte-faithfulness through the V2 transport)") {
    val dir = tmpDir("sink_rawbytes")
    // a line with a lone 0xFF byte: JVM String decoding would replace it
    // with U+FFFD and the corruption would round-trip invisibly
    val rawLine = ("not-json-".getBytes("UTF-8") :+ 0xFF.toByte) ++
      "-tail".getBytes("UTF-8")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "00000.jsonl"), rawLine :+ '\n'.toByte)
    val viaV2 = spark.read.format("graft-cdc").load(dir)
      .select("value").collect()(0).getString(0).getBytes("UTF-8")
    val viaText = spark.read.text(dir)
      .collect()(0).getString(0).getBytes("UTF-8")
    assert(java.util.Arrays.equals(viaV2, viaText),
      s"v2=${viaV2.toSeq} text=${viaText.toSeq}")

    // and through the SINK: tail -> sink -> bytes on disk identical
    val outDir = tmpDir("sink_rawbytes_out")
    spark.read.format("graft-cdc").load(dir).select("value")
      .coalesce(1).write.format("graft-cdc").mode("append").save(outDir)
    val written = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(outDir).resolve(names(outDir).head))
    assert(java.util.Arrays.equals(written, rawLine :+ '\n'.toByte),
      s"sink bytes=${written.toSeq}")
  }

  test("different query over an existing log: even epoch 0 == floor 0 is " +
      "refused via the writer-identity marker") {
    val dir = tmpDir("sink_qid")
    def part(epoch: Long, line: String): CdcCommitMessage = {
      val w = new CdcLineWriter(dir, f"e$epoch%012d-p${0}%05d.jsonl")
      w.write(org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(line)))
      w.commit().asInstanceOf[CdcCommitMessage]
    }
    val a = new CdcStreamingWrite(dir, Map.empty, 0, None, queryId = "query-A")
    a.commit(0L, Array[org.apache.spark.sql.connector.write.WriterCommitMessage](
      part(0L, lines(1).head)))
    // query A replaying its own epoch 0: allowed (same identity)
    val a2 = new CdcStreamingWrite(dir, Map.empty, 0, None, queryId = "query-A")
    a2.commit(0L, Array[org.apache.spark.sql.connector.write.WriterCommitMessage](
      part(0L, lines(1).head)))
    // query B (fresh checkpoint, new identity) at epoch 0 == floor 0:
    // the epoch-number check alone cannot fire — the marker must
    val b = new CdcStreamingWrite(dir, Map.empty, 0, None, queryId = "query-B")
    val e = intercept[IllegalStateException] {
      b.commit(0L, Array[org.apache.spark.sql.connector.write.WriterCommitMessage](
        part(0L, lines(9).head)))
    }
    assert(e.getMessage.contains("query-A"), e.getMessage)
    assert(spark.read.format("graft-cdc").load(dir)
      .select("after.id").collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("reserved routing buckets cannot be shadowed by a real table " +
      "named like them") {
    import org.apache.spark.sql.functions.col
    val env =
      """{"before":null,"after":{"id":1,"name":"N","email":"n@x.org","created_at":1},"source":{"version":"v","connector":"postgresql","name":"d","ts_ms":5,"snapshot":"false","db":"i","schema":"p","table":"_unrouted","txId":1,"lsn":2},"op":"c","ts_ms":1}"""
    val routed = graft.cdc.CdcPipeline.routedValues(
      Seq(env, "junk{{{").toDF("value"),
      graft.cdc.EnrichConfig(processingTimeIso = Some("t")))
      .select(col("source_table")).collect().map(_.getString(0)).sorted
    // the REAL table named "_unrouted" is escaped; the junk line owns
    // the reserved bucket
    assert(routed.contains("_unrouted") &&
      routed.exists(_.startsWith("t_unrouted-")), routed.toSeq)
  }

  test("streaming sink: epoch-named files, tailable by the source, " +
      "idempotent republish") {
    val srcDir = tmpDir("sink_stream_src")
    val outDir = tmpDir("sink_stream_out")
    val cp = tmpDir("sink_stream_cp")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(srcDir, "00000.jsonl"),
      lines(7, 8).mkString("\n").getBytes("UTF-8"))

    // the full loop: graft-cdc SOURCE tail → transform → graft-cdc SINK
    val q = spark.readStream.format("graft-cdc").load(srcDir)
      .select(col("value"))
      .writeStream.format("graft-cdc").option("path", outDir)
      .option("checkpointLocation", cp).start()
    try {
      q.processAllAvailable()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(srcDir, "00001.jsonl"),
        lines(9).mkString("\n").getBytes("UTF-8"))
      q.processAllAvailable()
    } finally q.stop()

    val fs = names(outDir)
    assert(fs.nonEmpty && fs.forall(_.matches("e\\d{12}-p\\d{5}\\.jsonl")), fs)
    assert(fs.sorted == fs)
    // the sink's output dir is itself a valid graft-cdc source dir
    val back = spark.read.format("graft-cdc").load(outDir)
    assert(back.select("after.id").collect().map(_.getInt(0)).sorted.toSeq ==
      Seq(7, 8, 9))

    // idempotent epoch republish: re-commit the same deterministic names
    // (what a recovered epoch does) must not duplicate rows
    val before = spark.read.format("graft-cdc").load(outDir).count()
    val w = new CdcLineWriter(outDir, fs.head)
    w.write(org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString(lines(7).head)))
    val msg = w.commit()
    CdcSinkFiles.publish(outDir, Array(msg), overwrite = true)
    val after = spark.read.format("graft-cdc").load(outDir)
    assert(after.count() == before - 1) // epoch 0 had 2 rows, republished with 1
    assert(names(outDir) == fs) // same names, no extras
  }
}
