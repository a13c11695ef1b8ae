package graft.sources

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{StringType, StructType}

/** V2 write path for the `graft-cdc` table: envelope JSON lines out, with
  * committed file names chosen to satisfy the SOURCE's contract.
  *
  * The tailing reader ([[CdcMicroBatchStream]]) requires file names that
  * are lexicographically monotone across log rolls. This sink is the
  * producing half of that contract: batch commits name files by a
  * zero-padded commit sequence (`b<seq>-p<partition>.jsonl`), streaming
  * commits by zero-padded epoch (`e<epoch>-p<partition>.jsonl`), so a
  * directory written by `graft-cdc` is always a valid directory to tail
  * with `graft-cdc` — pipeline output feeds the next pipeline's source.
  *
  * Commit protocol: task writers write to hidden `._tmp_*` files (hidden
  * names are invisible to the reader's listing); the DRIVER's commit
  * renames them to their final names only after every task succeeded, and
  * deletes any existing destination first so a re-executed streaming
  * epoch lands idempotently (at-least-once commit + deterministic names +
  * overwrite = exactly-once content for replayed epochs). Abort deletes
  * the temporaries. A crash mid-rename leaves earlier files visible —
  * the same non-atomicity window as Hadoop's v2 file committer; the
  * monotone-name check on the reading side still holds because renames
  * happen in name order.
  *
  * Input contract: exactly ONE string column (the serialized envelope —
  * what [[graft.cdc.CdcPipeline.routedValues]]' `value` or any
  * `to_json` projection produces).
  */
class CdcWriteBuilder(dir: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new CdcWrite(dir, info.schema(), doTruncate)
}

class CdcWrite(dir: String, schema: StructType, truncate: Boolean)
    extends Write {
  require(schema.length == 1 && schema.head.dataType == StringType,
    s"graft-cdc sink expects exactly one STRING column (the serialized " +
      s"envelope line); got ${schema.simpleString}")
  // capture the session Hadoop conf on the driver; factories ship it to
  // executor-side writers (same rationale as the read path)
  private val confMap = CdcDataSource.hadoopConfMap()
  override def toBatch: BatchWrite = new CdcBatchWrite(dir, truncate, confMap)
  override def toStreaming: StreamingWrite = new CdcStreamingWrite(dir, confMap)
}

case class CdcCommitMessage(tmpPath: String, finalName: String, rows: Long)
    extends WriterCommitMessage

object CdcSinkFiles {
  /** Driver-side FS handle: the session's Hadoop conf (commit/publish,
    * truncate, and sequence discovery all run on the driver).
    */
  def fs(dir: String): FileSystem = new Path(dir).getFileSystem(
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())

  /** Driver-side publish: delete-then-rename each temp to its final name,
    * in name order. Delete-first makes replayed streaming epochs (same
    * deterministic names) idempotent.
    */
  def publish(dir: String, messages: Array[WriterCommitMessage]): Unit = {
    val f = fs(dir)
    f.mkdirs(new Path(dir))
    messages.collect { case m: CdcCommitMessage => m }
      .sortBy(_.finalName)
      .foreach { m =>
        val dst = new Path(dir, m.finalName)
        if (f.exists(dst)) f.delete(dst, false)
        if (!f.rename(new Path(m.tmpPath), dst))
          throw new java.io.IOException(
            s"graft-cdc sink: rename ${m.tmpPath} -> $dst failed")
      }
  }

  def discard(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: CdcCommitMessage => m }.foreach { m =>
      val p = new Path(m.tmpPath)
      val f = p.getFileSystem(
        org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
      if (f.exists(p)) f.delete(p, false)
    }

  /** Existing committed data files (the reader's listing rules). */
  def committed(dir: String): Seq[Path] = {
    val f = fs(dir)
    val p = new Path(dir)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq.map(_.getPath)
      .filter(q => !q.getName.startsWith("_") && !q.getName.startsWith("."))
  }
}

class CdcBatchWrite(dir: String, truncate: Boolean,
    confMap: Map[String, String]) extends BatchWrite {
  // one batch = one commit sequence; files of earlier commits into the
  // same dir sort first because the sequence is the max existing +1
  private val seq: Long = {
    val existing = CdcSinkFiles.committed(dir).map(_.getName)
      .filter(_.startsWith("b")).map(_.takeWhile(_ != '-').drop(1))
      .flatMap(s => scala.util.Try(s.toLong).toOption)
    existing.maxOption.map(_ + 1).getOrElse(0L)
  }
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new CdcWriterFactory(dir, f"b$seq%012d", confMap)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    if (truncate) {
      val f = CdcSinkFiles.fs(dir)
      CdcSinkFiles.committed(dir).foreach(p => f.delete(p, false))
    }
    CdcSinkFiles.publish(dir, messages)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    CdcSinkFiles.discard(messages)
}

class CdcStreamingWrite(dir: String, confMap: Map[String, String])
    extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new CdcStreamingWriterFactory(dir, confMap)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    CdcSinkFiles.publish(dir, messages)
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    CdcSinkFiles.discard(messages)
}

class CdcWriterFactory(dir: String, prefix: String,
    confMap: Map[String, String]) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new CdcLineWriter(dir, f"$prefix-p$partitionId%05d.jsonl", confMap)
}

class CdcStreamingWriterFactory(dir: String, confMap: Map[String, String])
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new CdcLineWriter(dir, f"e$epochId%012d-p$partitionId%05d.jsonl", confMap)
}

/** Executor-side line writer: hidden temp file, renamed by the driver's
  * commit. The final name is deterministic (commit-seq/epoch +
  * partition), the temp name is not (speculative duplicates of one task
  * must not collide).
  */
class CdcLineWriter(dir: String, finalName: String,
    confMap: Map[String, String] = Map.empty)
    extends DataWriter[InternalRow] {
  private val tmp = new Path(dir,
    s"._tmp_${finalName}_${UUID.randomUUID().toString.take(8)}")
  private val f = tmp.getFileSystem(
    if (confMap.isEmpty) new Configuration()
    else CdcDataSource.confFrom(confMap))
  f.mkdirs(new Path(dir))
  private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
    f.create(tmp, true), java.nio.charset.StandardCharsets.UTF_8))
  private var rows = 0L

  override def write(record: InternalRow): Unit = {
    out.write(record.getUTF8String(0).toString)
    out.write('\n')
    rows += 1
  }
  override def commit(): WriterCommitMessage = {
    out.close()
    CdcCommitMessage(tmp.toString, finalName, rows)
  }
  override def abort(): Unit = {
    out.close()
    if (f.exists(tmp)) f.delete(tmp, false)
  }
  override def close(): Unit = ()
}
