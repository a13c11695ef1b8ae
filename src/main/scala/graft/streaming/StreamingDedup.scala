package graft.streaming

import graft.functions.VectorFunctions
import graft.text.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.Materialize.Ops

/** Incremental near-duplicate detection for a document STREAM: the
  * streaming twin of [[graft.queries.Dedup.qDedupMinhash]] (same
  * signatures, same banding — shared helpers, so batch and streaming can
  * never drift).
  *
  * Shape: an LSH index holds one row per (band_key, doc_id, sig) for
  * every document ever admitted. Each micro-batch (foreachBatch):
  *
  *   1. computes signatures + band keys for the arriving docs (narrow,
  *      codegen — the same one-pass [[VectorFunctions.minhashSig]]);
  *   2. candidate-joins arriving bands against the index AND against the
  *      batch itself (equality on (band_bucket, band_key) — O(batch·bands)
  *      join work, never a scan of the corpus);
  *   3. verifies candidates by exact signature-slot agreement (≥ half),
  *      deterministically (max matched per pair, so an upstream doc-id
  *      reuse cannot make verdicts flip between runs);
  *   4. writes the batch's bands to the index under
  *      `batch_id=<id>/band_bucket=<b>/` — ONE overwritten subdirectory
  *      per micro-batch, so an at-least-once replay republishes the same
  *      rows instead of appending duplicates (idempotent index), and the
  *      join's bucket values prune the scan to touched buckets.
  *
  * Replay safety does NOT assume arrival-ordered doc ids: a replayed
  * batch finds its own rows already in the index, so the index side is
  * anti-joined against the batch's ids (a broadcast of one small id
  * column) — cross-batch verdicts are emitted as (arriving, indexed) in
  * whatever id order they come.
  *
  * At 100 TB the index is the only large state. `band_bucket` (a bounded
  * hash of band_key, [[IndexBuckets]] values) keeps the directory count
  * per batch bounded — partitioning by raw band_key would create one
  * near-empty directory per distinct band, and per-trigger listing cost
  * is driven by directory count, which partition pruning does not reduce.
  * Listing grows with batch count (one subdirectory per batch) until
  * [[compactIndex]] folds the accumulated `batch_id=*` directories into
  * one compacted base — the maintenance job a long-running deployment
  * schedules between stream runs, restoring O([[IndexBuckets]]) listing
  * cost.
  */
object StreamingDedup {

  /** Bounded partition fan-out for the on-disk index. */
  val IndexBuckets = 64

  /** Signature column for a `text` column — batch/stream shared. */
  def signature(text: Column): Column =
    VectorFunctions.minhashSig(
      VectorFunctions.shingleHash56(TextOps.tokens(text)),
      TextOps.MinhashParams, TextOps.P)

  /** Band-key array — the batch query's banding, shared via TextOps. */
  def bandKeys(sig: Column): Column = TextOps.lshBandKeys(sig)

  /** Matching-slot count — the batch query's verify, shared via TextOps. */
  def matchedSlots(a: Column, b: Column): Column =
    TextOps.minhashMatchedSlots(a, b)

  private def bandBucket(bandKey: Column): Column =
    pmod(xxhash64(bandKey), lit(IndexBuckets)).cast("int")

  /** True iff `root`'s tree holds at least one data file outside hidden
    * (`_`/`.`-prefixed) paths — the same visibility rule Spark's file
    * index applies when it lists a parquet directory.
    */
  private def hasVisibleDataFile(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Boolean = {
    val rootDepth = root.depth()
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      var p = it.next().getPath
      var hidden = false
      // check every component BELOW the index root (the root's own name
      // is the caller's business)
      while (p.depth() > rootDepth) {
        val n = p.getName
        if (n.startsWith("_") || n.startsWith(".")) hidden = true
        p = p.getParent
      }
      if (!hidden) return true
    }
    false
  }

  private def emptyIndex(batch: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    batch.sparkSession.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField("band_bucket", IntegerType),
        StructField("band_key", StringType),
        StructField("doc_id", LongType),
        StructField("sig", ArrayType(LongType)))))
  }

  /** One increment: near-dup verdicts for `batch` (doc_id, text) against
    * the index at `indexPath` plus earlier docs of the same batch, and the
    * idempotent index write for `batchId`. Returns the verdict frame
    * (doc_id, dup_of, matched).
    */
  def increment(batch: DataFrame, indexPath: String, batchId: Long): DataFrame = {
    val spark = batch.sparkSession
    val sigs = batch
      .select(col("doc_id"), signature(col("text")).as("sig"))
      .stage()
    val bands = sigs
      .select(col("doc_id"), col("sig"),
        explode(bandKeys(col("sig"))).as("band_key"))
      .withColumn("band_bucket", bandBucket(col("band_key")))
    // existence probed explicitly: ONLY a missing/data-less index means
    // "empty". Any other read failure (corrupt footer, wrong path
    // contents) must fail the batch loudly — a blanket exception fallback
    // would skip cross-batch dedup for the batch while still admitting
    // its docs, losing verdicts permanently with no error anywhere.
    // "Data-less" matters: a crash DURING the first batch's index write
    // leaves batch_id=0/_temporary with no data files — a bare
    // listStatus-nonEmpty probe would then route into read.parquet,
    // which fails schema inference on every replay and wedges the
    // stream permanently. Hidden trees (_temporary, _SUCCESS, .crc) are
    // not data.
    val idxPath = new org.apache.hadoop.fs.Path(indexPath)
    val idxFs = idxPath.getFileSystem(spark.sessionState.newHadoopConf())
    val indexAbsent =
      !idxFs.exists(idxPath) || !hasVisibleDataFile(idxFs, idxPath)
    val index =
      if (indexAbsent) emptyIndex(batch)
      else spark.read.parquet(indexPath)
        .select(col("band_bucket"), col("band_key"), col("doc_id"), col("sig"))
    // a replayed batch finds ITS OWN rows in the index (the index write
    // commits before the verdict write): exclude them by id — robust in
    // any doc-id order, unlike an id-inequality filter
    val others = index.join(
      broadcast(sigs.select(col("doc_id"))), Seq("doc_id"), "left_anti")
    def candidateSide(df: DataFrame): DataFrame = df.select(
      col("band_bucket"), col("band_key"),
      col("doc_id").as("dup_of"), col("sig").as("sig_b"))
    // cross-batch: (arriving, indexed) in whatever id order; in-batch:
    // later id wins so exactly one orientation is emitted
    val vsIndex = bands.join(candidateSide(others),
      Seq("band_bucket", "band_key"))
    val inBatch = bands.join(candidateSide(bands),
      Seq("band_bucket", "band_key"))
      .filter(col("doc_id") > col("dup_of"))
    val verdicts = vsIndex.unionByName(inBatch)
      .withColumn("matched", matchedSlots(col("sig"), col("sig_b")))
      // max per pair (not an arbitrary dropDuplicates survivor): if an
      // id was ever re-admitted with different text, the verdict is
      // still deterministic across runs
      .groupBy(col("doc_id"), col("dup_of"))
      .agg(max(col("matched")).as("matched"))
      .filter(col("matched") >= TextOps.MinhashParams.size / 2)
      .select(col("doc_id"), col("dup_of"), col("matched"))
      // MATERIALIZE before the index write below: on a replay, that
      // write overwrites files the verdict plan reads — a lazy verdict
      // frame would execute against deleted files and fail the batch
      // forever. Verdict pairs are tiny; the checkpoint pins them.
      .barrier()
    // one subdirectory per micro-batch, overwritten: replaying the batch
    // republishes identical rows (idempotent) instead of appending dupes
    bands.select(col("band_bucket"), col("band_key"), col("doc_id"), col("sig"))
      .write.mode("overwrite").partitionBy("band_bucket")
      .parquet(s"$indexPath/batch_id=$batchId")
    verdicts
  }

  /** Maintenance job: fold every `batch_id=*` directory (including any
    * previous compacted base) into ONE new compacted base, restoring
    * O([[IndexBuckets]]) directory count after months of triggers have
    * accumulated O(batches) of them. Run it while the stream is stopped
    * (between deployments), like any streaming file-sink maintenance.
    *
    * The base lives at `batch_id=-<generation>` — negative ids are
    * unreachable by real batches, so the read path, partition scheme,
    * and [[increment]]'s idempotent per-batch overwrite are untouched.
    * Crash-safety is write-then-delete: the fold is built under a
    * HIDDEN `.compact_tmp` tree (invisible to readers), renamed into
    * place as a VISIBLE new base, and only then are the old directories
    * deleted — no window ever hides committed rows. A crash mid-delete
    * leaves duplicate rows, which are harmless (verdicts aggregate
    * `max(matched)` per pair) and fold away on the next compaction; a
    * replayed batch whose directory was already compacted likewise just
    * recreates a small directory that the next compaction folds.
    */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Unit = {
    val idxPath = new org.apache.hadoop.fs.Path(indexPath)
    val fs = idxPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(idxPath) || !hasVisibleDataFile(fs, idxPath)) return
    val oldDirs = fs.listStatus(idxPath).filter(_.isDirectory)
      .map(_.getPath).filter(_.getName.startsWith("batch_id="))
    // next compacted generation: below every existing id (first fold
    // lands at -1, the next at -2, …)
    val minId = oldDirs.map(_.getName.stripPrefix("batch_id=").toLong).min
    val gen = math.min(minId, 0L) - 1L
    val tmp = new org.apache.hadoop.fs.Path(indexPath, ".compact_tmp")
    // distinct over ALL columns: replay-recreated rows collapse
    // deterministically; a doc re-admitted with different text keeps
    // both rows, exactly as increment's max-per-pair verdict expects
    spark.read.parquet(indexPath)
      .select(col("band_bucket"), col("band_key"), col("doc_id"), col("sig"))
      .distinct()
      .write.mode("overwrite").partitionBy("band_bucket")
      .parquet(tmp.toString)
    // rename MUST be verified before anything is deleted: Hadoop
    // FileSystems report many failures as `false` rather than throwing
    // (object-store copy renames, src/dst races) — deleting the old
    // directories after a silently failed rename would destroy the whole
    // index while the compacted copy sits invisible under .compact_tmp,
    // and every future duplicate would then be admitted as unique
    val dst = new org.apache.hadoop.fs.Path(idxPath, s"batch_id=$gen")
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(
        s"compactIndex: rename $tmp -> $dst failed; old batch directories " +
          "left untouched (re-run after resolving the filesystem issue)")
    oldDirs.foreach(d => fs.delete(d, true))
  }

  /** Wire the increment as a foreachBatch streaming query. The verdict
    * output mirrors the index's idempotency pattern — one OVERWRITTEN
    * `batch_id=<id>` subdirectory per micro-batch — so an at-least-once
    * replay republishes identical verdict rows instead of appending
    * duplicates (`batch_id` surfaces as a partition column on read).
    *
    * MIGRATION NOTE: earlier revisions appended flat part files with
    * `batch_id` as a data column; a directory written by that layout
    * cannot be extended by this one (Spark's partition discovery
    * refuses mixed leaf depths). Point a resumed deployment at a fresh
    * `outPath` — or rewrite the old files under `batch_id=<id>/` once —
    * before reusing its checkpoint.
    */
  def run(docs: DataFrame, indexPath: String, outPath: String,
      checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        increment(batch, indexPath, batchId)
          .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
        ()
      }
      .start()
}
