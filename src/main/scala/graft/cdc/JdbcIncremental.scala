package graft.cdc

import java.sql.DriverManager
import java.util.{Properties, UUID}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S2 completed to the full snapshot-THEN-stream lifecycle over a plain
  * JDBC database — the Spark analogue of the reference connector's
  * `snapshot.mode: initial` followed by continuous WAL capture
  * (reference kubernetes/manifests/debezium-postgres-connector.yaml:33-34).
  *
  * Spark has no WAL hook, so the incremental half is the portable pattern
  * every JDBC-based capture uses: a changelog table with a monotone
  * sequence column (trigger-fed, as in the spec, or an application outbox)
  * polled with a persisted watermark. Each poll is a BOUNDED partitioned
  * JDBC range scan — `seq > lo AND seq <= hi` pushed into the database —
  * wrapped per-row into the same envelopes the file transport carries
  * ([[CdcSource.changesMixed]]), so everything downstream (parse → enrich
  * → sink → materialize) is transport-agnostic.
  *
  * Log + watermark protocol (exactly-once into the log):
  *   - the snapshot publishes `a0-<w0>-p<k>.jsonl`, each poll
  *     `c<lo>-<hi>-p<k>.jsonl` (zero-padded, so names are lexicographically
  *     monotone across the snapshot and every later poll — the same
  *     contract the `graft-cdc` tail source requires of its producers;
  *     the distinct `a` prefix also keeps the first poll's same-`lo`
  *     sweep from ever touching snapshot files);
  *   - names are DETERMINISTIC in the polled range, and a replayed poll
  *     overwrites them idempotently (sweeping any partial prior attempt
  *     with the same `lo`), the rename-commit pattern of
  *     [[graft.sources.CdcSinkFiles]];
  *   - the watermark is committed LAST as the hidden `_watermark` marker
  *     (temp + rename); on a crash anywhere before that commit the next
  *     poll re-reads from the prior watermark and republishes the same
  *     names. `_`-prefixed files are invisible to every reader.
  *
  * Scale shape: the poll loop itself is O(1) driver work (one MAX query +
  * O(partitions) renames); the data path is a partitioned JDBC scan of
  * ONLY the new rows — one bounded cursor per executor, never a full-table
  * re-read. At 100 TB the snapshot half is the partitioned scan
  * [[CdcSource.snapshotJdbc]] already provides; the incremental half's
  * cost tracks change volume, not table size.
  */
object JdbcIncremental {

  /** Driver-side watermark probe: run `maxSeqSql` (e.g.
    * `SELECT MAX(seq) FROM customers_changelog`) and return the single
    * long it yields, 0 for NULL/empty — one O(1) indexed query per poll.
    *
    * CONCURRENT-WRITER CAVEAT (the classic sequence-watermark race, shared
    * by every MAX-fenced incremental JDBC reader): sequence values are
    * assigned at INSERT, visibility at COMMIT. If txn A takes seq=100,
    * txn B takes seq=101 and commits first, a poll can observe MAX=101
    * while seq=100 is still invisible; once the watermark passes 101,
    * A's later-committed row is never read. Remedies, strongest first:
    * (a) fence the probe below the oldest in-flight transaction — e.g.
    * PostgreSQL `SELECT least(max(seq), pg_snapshot_xmin(pg_current_snapshot()) - 1) …`
    * when seq IS the txid, or a `WHERE ts < now() - <max txn duration>`
    * stability lag on an insert-timestamp column (how Kafka Connect JDBC's
    * `timestamp.delay.interval.ms` handles the same race) — the fence
    * lives entirely in `maxSeqSql`, no engine change; (b) serialize
    * changelog inserts (single writer / table lock in the trigger), which
    * makes commit order equal sequence order. The Derby spec writes
    * serially, so it exercises (b).
    */
  def currentMax(url: String, props: Properties, maxSeqSql: String): Long = {
    val conn = DriverManager.getConnection(url, props)
    try {
      val rs = conn.createStatement().executeQuery(maxSeqSql)
      if (!rs.next()) 0L
      else {
        val v = rs.getLong(1)
        if (rs.wasNull()) 0L else v
      }
    } finally conn.close()
  }

  /** Bounded changelog read `(lo, hi]` → mixed-op envelopes.
    *
    * @param changelogQuery builds the pushdown subquery for a range — it
    *   MUST embed `seq > lo AND seq <= hi` itself (Spark's JDBC partition
    *   bounds only stride, they don't filter) and alias columns to the
    *   envelope's field names (databases that fold identifier case need
    *   quoted aliases — see the spec's Derby example)
    * @param seqCol DataFrame-side name of the sequence column (also the
    *   partition column for the range-striped scan)
    * @param opCol  DataFrame-side name of the op-code column
    */
  def readChanges(spark: SparkSession, url: String, props: Properties,
      changelogQuery: (Long, Long) => String, lo: Long, hi: Long,
      seqCol: String, opCol: String,
      db: String, schema: String, table: String,
      numPartitions: Int = 8,
      serverName: String = "dbserver1",
      fixedTsMs: Option[Long] = None): DataFrame = {
    require(hi >= lo, s"readChanges: inverted range ($lo, $hi]")
    val sub = changelogQuery(lo, hi)
    // stride only when the range can actually split; a 1-row range with
    // N partitions would issue N-1 empty cursors
    // partition-count math stays in the long domain: hi/lo are sequence
    // VALUES (gaps from rollbacks/preallocation make hi-lo ≫ row count),
    // so (hi-lo).toInt could wrap negative on a >2^31-wide range
    val rows =
      if (hi - lo > 1 && numPartitions > 1)
        spark.read.jdbc(url, sub, seqCol, lo + 1, hi,
          math.min(numPartitions.toLong, hi - lo).toInt, props)
      else spark.read.jdbc(url, sub, props)
    CdcSource.changesMixed(rows, opCol, seqCol, db, schema, table,
      serverName, fixedTsMs)
  }

  /** Snapshot the source table into the log as `op='r'` envelopes covering
    * watermark range `(0, w0]`, where `w0` is the changelog position
    * captured BEFORE the table read. Changes committed while the snapshot
    * scan runs land `> w0`, so the next poll redelivers them — the
    * standard at-least-once snapshot window; latest-state materialization
    * (`CdcMaterialize.latestState`: live lsn beats null-lsn snapshot rows)
    * converges regardless. Returns the committed watermark.
    */
  def snapshotToLog(spark: SparkSession, url: String, props: Properties,
      snapshotTable: String, maxSeqSql: String, logDir: String,
      db: String, schema: String, table: String,
      partitionColumn: Option[String] = None,
      bounds: Option[(Long, Long)] = None,
      numPartitions: Int = 8,
      serverName: String = "dbserver1",
      fixedTsMs: Option[Long] = None): Long = {
    val w0 = currentMax(url, props, maxSeqSql)
    val envelopes = CdcSource.snapshotJdbc(spark, url, snapshotTable,
      db, schema, table, partitionColumn, bounds, numPartitions, props,
      serverName, fixedTsMs)
    publishRange(spark, envelopes, logDir, 0L, w0, prefix = 'a')
    w0
  }

  /** One poll: read `(lastWatermark, currentMax]` from the changelog,
    * publish it into the log, commit the new watermark. No-op (and no new
    * files) when nothing changed. Returns the watermark after the poll.
    * Call in a loop (or from a scheduler) for continuous capture; each
    * call is crash-safe per the protocol above.
    */
  def pollToLog(spark: SparkSession, url: String, props: Properties,
      changelogQuery: (Long, Long) => String, maxSeqSql: String,
      logDir: String, seqCol: String, opCol: String,
      db: String, schema: String, table: String,
      numPartitions: Int = 8,
      serverName: String = "dbserver1",
      fixedTsMs: Option[Long] = None): Long = {
    val lo = lastWatermark(spark, logDir).getOrElse(
      throw new IllegalStateException(
        s"pollToLog: no watermark in '$logDir' — run snapshotToLog first " +
          "(the snapshot commits the initial watermark, completing the " +
          "snapshot-then-stream lifecycle)"))
    val hi = currentMax(url, props, maxSeqSql)
    if (hi <= lo) return lo
    val envelopes = readChanges(spark, url, props, changelogQuery, lo, hi,
      seqCol, opCol, db, schema, table, numPartitions, serverName, fixedTsMs)
    publishRange(spark, envelopes, logDir, lo, hi, prefix = 'c')
    hi
  }

  /** Committed watermark — deliberately NOT inferred from committed file
    * names (that would advance the watermark past parts a crashed attempt
    * never renamed, silently dropping their rows). The marker pair is
    * written strictly after every part of a range is published, so a
    * crash mid-publish re-polls the whole range (idempotent —
    * deterministic names + same-`lo` sweep).
    *
    * Two fixed names close the delete-then-rename crash window: commit
    * order is write `_watermark_next` → delete `_watermark` → rename
    * next→current. A crash between any two steps leaves at least one
    * marker present, and `next >= current` always (watermarks are
    * monotone), so the max of whichever exist is the committed value.
    * None ⇒ the log was never snapshotted.
    */
  def lastWatermark(spark: SparkSession, logDir: String): Option[Long] = {
    val f = fs(spark, logDir)
    def read(name: String): Option[Long] = {
      val p = new Path(logDir, name)
      if (!f.exists(p)) None
      else {
        val in = f.open(p)
        try Some(new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
        finally in.close()
      }
    }
    (read("_watermark").toSeq ++ read("_watermark_next").toSeq).maxOption
  }

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  /** Publish one range's envelopes: distributed write to a hidden temp
    * directory (Spark's text sink — executors never funnel through the
    * driver), then O(partitions) driver-side renames to the deterministic
    * final names, then the watermark marker. Idempotent per `lo`: a
    * partial prior attempt (same `lo`, possibly a smaller `hi` if rows
    * arrived between attempts) is swept before renaming.
    */
  private def publishRange(spark: SparkSession, envelopes: DataFrame,
      logDir: String, lo: Long, hi: Long, prefix: Char): Unit = {
    val f = fs(spark, logDir)
    val dir = new Path(logDir)
    f.mkdirs(dir)
    val tmp = new Path(dir, s"._tmp_poll_${UUID.randomUUID().toString.take(8)}")
    try {
      envelopes.write.mode("overwrite").text(tmp.toString)
      val parts = f.listStatus(tmp).toSeq
        .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
        .sortBy(_.getPath.getName)
      val loPrefix = f"$prefix%c$lo%012d-"
      f.listStatus(dir).toSeq
        .filter(st => st.isFile && st.getPath.getName.startsWith(loPrefix))
        .foreach(st => f.delete(st.getPath, false))
      parts.zipWithIndex.foreach { case (st, k) =>
        val dst = new Path(dir, f"$prefix%c$lo%012d-$hi%012d-p$k%05d.jsonl")
        if (!f.rename(st.getPath, dst))
          throw new java.io.IOException(
            s"JdbcIncremental: rename ${st.getPath} -> $dst failed")
      }
    } finally f.delete(tmp, true)
    // marker-pair commit (see lastWatermark): next → delete current →
    // rename. Every intermediate crash state leaves a readable marker
    // whose max is the committed watermark.
    val next = new Path(dir, "_watermark_next")
    val out = f.create(next, true)
    try out.write(hi.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val marker = new Path(dir, "_watermark")
    if (f.exists(marker)) f.delete(marker, false)
    if (!f.rename(next, marker))
      throw new java.io.IOException(
        s"JdbcIncremental: watermark commit rename failed in $logDir")
  }
}
