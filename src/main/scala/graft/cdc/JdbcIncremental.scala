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
    // same hazard as initializeWatermark: re-running over a LIVE log
    // would sweep the committed a-prefix snapshot files (rewriting
    // history a tail consumer may have consumed) and jump the watermark
    // past unpublished changes. The initial snapshot runs once; a crash
    // BEFORE the marker commit leaves no watermark, so crash-replay is
    // still allowed and republishes the same names. Re-snapshotting a
    // live table is the incremental snapshot's job.
    lastWatermark(spark, logDir).foreach { w =>
      throw new IllegalStateException(
        s"snapshotToLog: '$logDir' already has a committed watermark " +
          s"($w) — the initial snapshot runs once; use " +
          "snapshotChunkToLog/incrementalSnapshotToLog to re-backfill a " +
          "live log, or point at a fresh directory")
    }
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

  /** `no_data` snapshot mode: commit the current changelog position as
    * the log's watermark WITHOUT reading the table — streaming-first
    * capture (Debezium `snapshot.mode: no_data`), the starting state for
    * an incremental snapshot that backfills pre-existing rows later
    * while polls keep flowing. Returns the committed watermark.
    */
  def initializeWatermark(spark: SparkSession, url: String,
      props: Properties, maxSeqSql: String, logDir: String): Long = {
    // a live log already has a watermark — re-initializing would advance
    // it past unpublished changes in (current, MAX], silently losing
    // them (a delete in that gap could never be resurrected: the row is
    // gone from the table, so no later snapshot chunk re-captures it)
    lastWatermark(spark, logDir).foreach { w =>
      throw new IllegalStateException(
        s"initializeWatermark: '$logDir' is already initialized " +
          s"(watermark $w) — re-running would skip the changes between " +
          "it and the current changelog position; use pollToLog to " +
          "advance, or point at a fresh log directory")
    }
    val w0 = currentMax(url, props, maxSeqSql)
    publishRange(spark, null, logDir, 0L, w0, prefix = 'a', dataless = true)
    w0
  }

  /** One DBLog-style snapshot CHUNK (Netflix DBLog §4.2 / Debezium
    * incremental snapshots — the algorithm that backfills a table
    * WITHOUT pausing change capture and WITHOUT a long consistent-read
    * transaction):
    *
    *   1. the LOW watermark `lw` is the log's COMMITTED stream position
    *      ([[lastWatermark]] — everything ≤ lw is already published);
    *   2. read the chunk's key range from the table (EAGERLY — the fetch
    *      must complete before the next probe or the fence is fiction);
    *   3. probe the HIGH watermark `hw` (changelog position after the
    *      read);
    *   4. keys changed in `(lw, hw]` are dropped from the chunk —
    *      DBLog's window dedup. A surviving row had NO change between
    *      the stream position and the read, so its read state IS its
    *      state at `lw` exactly; dropped keys are covered by the change
    *      events the poll loop delivers with seq > lw.
    *   5. survivors publish as `op='r'` envelopes with `lsn = lw`, named
    *      `c<lw>-<lw>-s<idx>p<part>`.
    *
    * Fencing to the COMMITTED watermark (not a fresh changelog probe) is
    * what keeps both orders correct. Lsn order
    * ([[CdcMaterialize.latestState]]): a survivor's content is
    * state-at-lw, beaten by any seq > lw event and beating the already-
    * published seq ≤ lw history — converges to the newest state. Arrival
    * (file-name) order: the zero-padded name sorts after every committed
    * file (all have lo ≤ lw) and before the next poll `c<lw>-<hi>-p…`
    * (same lo, higher hi field) — chunks can never outrun the stream, so
    * the tail's committed-prefix contract holds by construction. Chunks
    * and polls MUST still interleave from one capture loop (as
    * Debezium's connector thread does); a poll committing concurrently
    * with an in-flight chunk publish would trip the tail check loudly.
    *
    * `onChunkRead` runs between steps 2 and 3 (spec hook: inject
    * concurrent writes INTO the watermark window; production leaves the
    * default no-op).
    *
    * Scale shape: per chunk, one bounded partitioned table scan + one
    * O(1) indexed changelog key probe + O(partitions) renames — memory
    * is bounded by chunk size, total cost by table size exactly once;
    * capture latency never pauses (the reason the algorithm exists).
    */
  def snapshotChunkToLog(spark: SparkSession, url: String,
      props: Properties, chunkQuery: String,
      changelogKeysQuery: (Long, Long) => String, maxSeqSql: String,
      logDir: String, keyCol: String,
      db: String, schema: String, table: String, chunkIdx: Int,
      serverName: String = "dbserver1", fixedTsMs: Option[Long] = None,
      onChunkRead: () => Unit = () => ()): Long = {
    import org.apache.spark.sql.functions.lit
    val lw = lastWatermark(spark, logDir).getOrElse(
      throw new IllegalStateException(
        s"snapshotChunkToLog: no watermark in '$logDir' — run " +
          "initializeWatermark (streaming-first) or snapshotToLog first"))
    // eager: the JDBC fetch MUST complete before the hw probe — a lazy
    // frame would read the table during publish, after hw, and rows
    // changed in (lw, hw] could sneak in as phantom "snapshot" state
    val rows = spark.read.jdbc(url, chunkQuery, props).localCheckpoint()
    try {
      onChunkRead()
      val hw = currentMax(url, props, maxSeqSql)
      val winners =
        if (hw > lw) {
          val changed = spark.read.jdbc(url, changelogKeysQuery(lw, hw), props)
          rows.join(changed, Seq(keyCol), "left_anti")
        } else rows
      val envelopes = CdcSource.changes(winners, "r", db, schema, table,
        lit(lw), serverName, fixedTsMs)
      publishChunk(spark, envelopes, logDir, lw, chunkIdx)
      hw
    } finally {
      // a long backfill drives thousands of chunks — without this each
      // chunk's checkpointed rows linger in executor storage until GC
      freeLocalCheckpoint(rows)
    }
  }

  /** Free the executor-storage blocks behind a localCheckpoint'd frame.
    * `Dataset.unpersist` is a CacheManager call and lineage-truncation
    * blocks are never registered there (verified on Spark 4.1.2: after
    * `df.localCheckpoint(); df.unpersist(true)` the RDD stays fully
    * cached) — the checkpointed RDD itself must be unpersisted, found
    * as the plan's `LogicalRDD` leaf. Spec-pinned by `ChunkStorageSpec`.
    */
  private[graft] def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.unpersist(blocking = false)
        ()
      case _ => ()
    }

  /** Whole-table incremental snapshot: drive [[snapshotChunkToLog]] over
    * `[keyMin, keyMax]` in `chunkSize`-key ranges. `tableChunkQuery`
    * builds the pushdown subquery for a key range `(lo, hi]` (aliased to
    * payload names, like `changelogQuery`); `changelogKeysQuery` builds
    * the DISTINCT-changed-keys subquery for a seq range `(lw, hw]`.
    * Returns the number of chunks published (counting from `startIdx`).
    * Interleave with [[pollToLog]] calls from the same loop for live
    * capture during the backfill. `startIdx` offsets the chunk index
    * sequence — a later backfill pass over a log that already holds
    * chunks MUST start above the highest published index, or a
    * same-fence chunk would sweep a committed predecessor's files.
    */
  def incrementalSnapshotToLog(spark: SparkSession, url: String,
      props: Properties, tableChunkQuery: (Long, Long) => String,
      changelogKeysQuery: (Long, Long) => String, maxSeqSql: String,
      logDir: String, keyCol: String,
      keyMin: Long, keyMax: Long, chunkSize: Long,
      db: String, schema: String, table: String,
      serverName: String = "dbserver1", fixedTsMs: Option[Long] = None,
      onChunkRead: Int => Unit = _ => (), startIdx: Int = 0): Int = {
    require(chunkSize > 0, "incrementalSnapshotToLog: chunkSize must be > 0")
    var idx = startIdx
    var lo = keyMin - 1
    while (lo < keyMax) {
      val hi = math.min(lo + chunkSize, keyMax)
      snapshotChunkToLog(spark, url, props, tableChunkQuery(lo, hi),
        changelogKeysQuery, maxSeqSql, logDir, keyCol, db, schema, table,
        idx, serverName, fixedTsMs, { () => onChunkRead(idx) })
      idx += 1
      lo = hi
    }
    idx - startIdx
  }

  /** Publish one snapshot chunk under `c<lw>-<lw>-s<idx>p<part>.jsonl`
    * (see [[snapshotChunkToLog]] for why that name). The sweep matches
    * ONLY a crashed attempt of THIS chunk at THIS fence (same `lw`,
    * same index): a crash can't advance the watermark, so a replay
    * reuses the same names idempotently — while a prior completed
    * backfill's chunk files (older `lw`) are committed history a tail
    * consumer may have consumed; deleting those would change membership
    * inside the committed prefix and wedge the stream. A deliberate
    * re-backfill at an advanced watermark therefore APPENDS newer-lsn
    * rows that supersede in materialization, never rewrites history.
    */
  private def publishChunk(spark: SparkSession, envelopes: DataFrame,
      logDir: String, lw: Long, chunkIdx: Int): Unit = {
    val f = fs(spark, logDir)
    val dir = new Path(logDir)
    f.mkdirs(dir)
    val chunkShape =
      (f"c$lw%012d-$lw%012d-s$chunkIdx%05d" + """p\d{5}\.jsonl""").r
    publishParts(spark, envelopes, dir, f, "chunk",
      k => f"c$lw%012d-$lw%012d-s$chunkIdx%05dp$k%05d.jsonl",
      name => chunkShape.pattern.matcher(name).matches())
  }

  /** The one rename-commit publisher behind polls and snapshot chunks:
    * distributed write to a hidden temp dir, sweep of files matching
    * `sweep` (a prior attempt of the SAME logical publish — never
    * committed history), then verified renames to `nameFor(part)`.
    * Hadoop reports many rename failures as `false`; the loud
    * IOException leaves the committed watermark untouched, so the next
    * cycle re-reads from the source database and republishes — nothing
    * is lost even though the temp directory is cleaned up. Safety rests
    * on the SWEEP, not on name equality: a poll retry may probe a
    * higher `hi` and use different names, and it is the same-`lo`
    * any-`hi` sweep that removes the failed attempt's partial files
    * (tightening the sweep to exact names would leave them for tail
    * readers to consume as duplicates).
    */
  private def publishParts(spark: SparkSession, envelopes: DataFrame,
      dir: Path, f: FileSystem, tag: String,
      nameFor: Int => String, sweep: String => Boolean): Unit = {
    val tmp = new Path(dir, s"._tmp_${tag}_${UUID.randomUUID().toString.take(8)}")
    try {
      val parts = StagedParts.write(envelopes, f, tmp)
      f.listStatus(dir).toSeq
        .filter(st => st.isFile && sweep(st.getPath.getName))
        .foreach(st => f.delete(st.getPath, false))
      parts.zipWithIndex.foreach { case (part, k) =>
        val dst = new Path(dir, nameFor(k))
        if (!f.rename(part, dst))
          throw new java.io.IOException(
            s"JdbcIncremental: rename $part -> $dst failed")
      }
    } finally f.delete(tmp, true)
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
    def read(name: String, lenient: Boolean): Option[Long] = {
      val p = new Path(logDir, name)
      if (!f.exists(p)) None
      else {
        val in = f.open(p)
        val text =
          try new String(in.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8).trim
          finally in.close()
        try Some(text.toLong)
        catch {
          case e: NumberFormatException =>
            // `_watermark_next` is written IN PLACE (create/write/close)
            // before the commit rename, so a crash mid-write can leave it
            // empty/partial. The commit path guarantees that overwrite
            // only ever happens when `_watermark` is committed or the
            // log is provably uninitialized: `repairInterruptedCommit`
            // promotes a parseable orphan `_watermark_next` (the
            // deleted-current, not-yet-renamed crash state, where it is
            // the SOLE committed copy) back to `_watermark` before any
            // truncation. So a torn scratch marker coexists with a
            // valid `_watermark` — or with no marker at all on a log
            // whose FIRST commit crashed, where uninitialized is the
            // right answer. Either way it is ignorable. The COMMITTED
            // marker is only ever produced by an atomic rename of a
            // fully-written file, so corruption there is a real
            // filesystem problem and must stay loud.
            if (lenient) None
            else throw new IllegalStateException(
              s"lastWatermark: committed marker '$name' in '$logDir' is " +
                s"unreadable ('$text') — refusing to guess the capture " +
                "position", e)
        }
      }
    }
    (read("_watermark", lenient = false).toSeq ++
      read("_watermark_next", lenient = true).toSeq).maxOption
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
      logDir: String, lo: Long, hi: Long, prefix: Char,
      dataless: Boolean = false): Unit = {
    val f = fs(spark, logDir)
    val dir = new Path(logDir)
    f.mkdirs(dir)
    if (!dataless) {
      // sweep ONLY prior poll attempts of this range — the exact
      // <prefix><lo>-<hi>-p<k> shape. A bare startsWith(lo) prefix
      // match would also catch snapshot CHUNK files fenced at the same
      // watermark (`c<lo>-<lo>-s<idx>…`) and destroy the backfill
      val pollShape =
        (f"$prefix%c$lo%012d-" + """\d{12}-p\d{5}\.jsonl""").r
      publishParts(spark, envelopes, dir, f, "poll",
        k => f"$prefix%c$lo%012d-$hi%012d-p$k%05d.jsonl",
        name => pollShape.pattern.matcher(name).matches())
    }
    // marker-pair commit (see lastWatermark): next → delete current →
    // rename. Every intermediate crash state leaves a readable marker
    // whose max is the committed watermark.
    repairInterruptedCommit(f, dir)
    val next = new Path(dir, "_watermark_next")
    val out = f.create(next, true)
    // trailing newline = completeness sentinel: a crash mid-write leaves
    // a PREFIX of the intended bytes, and a decimal prefix still parses
    // ('12' of '123') — only the sentinel distinguishes a fully-written
    // marker from a torn one (lastWatermark trims it away on read)
    try out.write((hi.toString + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val marker = new Path(dir, "_watermark")
    if (f.exists(marker)) f.delete(marker, false)
    if (!f.rename(next, marker))
      throw new java.io.IOException(
        s"JdbcIncremental: watermark commit rename failed in $logDir")
  }

  /** Repair a commit interrupted between delete(`_watermark`) and the
    * next→current rename. In that state `_watermark_next` is the ONLY
    * committed copy of the watermark; the in-place `create(next, true)`
    * of a fresh commit would truncate it, and a second crash mid-write
    * would then leave BOTH markers unreadable — the log would look
    * uninitialized, disarming the re-snapshot/re-init guards. So before
    * any overwrite: if `_watermark` is absent and `_watermark_next` is
    * COMPLETE (newline sentinel present + parses — a torn write is a
    * byte prefix, and a decimal prefix like '12' of '123' would parse,
    * so parseability alone cannot prove completeness), promote it with
    * the same atomic rename the commit uses (either the repair
    * completes or the old state persists — no new torn state is
    * reachable). A sentinel-less but parseable next is ALSO promoted
    * when the log holds committed data files (the upgrade window for
    * pre-sentinel writers — see the inline comment for why that is
    * loss-free), bounded BELOW by the max fence encoded in the
    * committed data file names so a torn prefix cannot widen the
    * re-capture window. An incomplete next over a data-less log can only be a
    * crashed first `initializeWatermark` commit, where uninitialized is
    * the correct answer and the overwrite is safe.
    */
  private[graft] def repairInterruptedCommit(f: FileSystem,
      dir: Path): Unit = {
    val next = new Path(dir, "_watermark_next")
    val marker = new Path(dir, "_watermark")
    if (!f.exists(marker) && f.exists(next)) {
      val in = f.open(next)
      val raw =
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      // promote only a COMPLETE marker: it must carry the newline
      // sentinel (a torn write is a byte prefix, and a decimal prefix
      // of the intended value would still parse — promoting it would
      // fabricate a never-committed watermark on a crashed FIRST
      // commit) and parse as a long
      val complete = raw.endsWith("\n") &&
        scala.util.Try(raw.trim.toLong).isSuccess
      // UPGRADE WINDOW (round-7 advisory): a marker written by the
      // pre-sentinel code is complete yet newline-less; without this
      // clause the next commit's create(next, true) truncates the SOLE
      // committed copy, and a second crash mid-write then makes an
      // initialized log look uninitialized. A legacy orphan is
      // promotable when the log already holds committed data files —
      // the delete-current crash window only exists after a publish, so
      // a data-less log (crashed FIRST initializeWatermark commit)
      // still correctly reads as uninitialized. Residual risk, bounded
      // and deliberate: a NEW-code first snapshot commit crashing
      // mid-marker-write after its data rename could present a
      // parseable torn prefix here; promoting it only lowers the
      // watermark, so the worst case is at-least-once re-capture of
      // rows the log's lsn-dedup readers already tolerate — never a
      // silently skipped range.
      val dataFiles = f.listStatus(dir).filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".") &&
          n.endsWith(".jsonl")
      }
      val legacyComplete = !complete &&
        scala.util.Try(raw.trim.toLong).isSuccess && dataFiles.nonEmpty
      // TIGHTEN the legacy promotion against the data file names
      // (round-8 advisory): every committed range/chunk file encodes
      // its fence as `<prefix><lo12>-<hi12>-…` , and a dangling next
      // with an absent current marker is only reachable AFTER a
      // publish's data renames completed — so max(hi) across the
      // committed names is a watermark the log PROVABLY holds data up
      // to. A torn decimal prefix of the intended value parses LOWER;
      // promoting max(parsed, max hi) shrinks the at-least-once
      // re-capture window to zero in the crashed-first-commit case
      // while never exceeding a value the file set substantiates
      // (dataless poll commits can legitimately exceed it — the parsed
      // value wins there). The bounded value is committed via a
      // write-then-rename sibling so no crash state leaves a torn
      // CURRENT marker.
      val nameHi = """^[a-z](\d{12})-(\d{12})-.*\.jsonl$""".r
      val maxHi = dataFiles.flatMap(st => st.getPath.getName match {
        case nameHi(_, hi) => Some(hi.toLong)
        case _ => None
      }).maxOption
      val bounded = maxHi.filter(h =>
        legacyComplete && h > raw.trim.toLong)
      bounded match {
        case Some(h) =>
          val repair = new Path(dir, "_watermark_repair")
          val out = f.create(repair, true)
          try out.write((h.toString + "\n")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
          if (!f.rename(repair, marker))
            throw new java.io.IOException(
              s"JdbcIncremental: watermark repair rename failed in $dir")
          f.delete(next, false)
        case None =>
          if ((complete || legacyComplete) && !f.rename(next, marker))
            throw new java.io.IOException(
              s"JdbcIncremental: watermark repair rename failed in $dir")
      }
    }
  }
}
