package graft.streaming

import graft.functions.VectorFunctions
import graft.text.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental near-duplicate detection for a document STREAM: the
  * streaming twin of [[graft.queries.Dedup.qDedupMinhash]] (same
  * signatures, same banding — shared helpers, so batch and streaming can
  * never drift).
  *
  * Shape: an append-only parquet LSH index holds one row per (band_key,
  * doc_id, sig) for every document ever admitted. Each micro-batch
  * (foreachBatch):
  *
  *   1. computes signatures + band keys for the arriving docs (narrow,
  *      codegen — the same one-pass [[VectorFunctions.minhashSig]]);
  *   2. candidate-joins arriving bands against the index AND against the
  *      batch itself (equality on band_key — O(batch·bands) work, never a
  *      scan of the corpus);
  *   3. verifies candidates by exact signature-slot agreement (≥ half);
  *   4. appends the batch's bands to the index and the verdicts to the
  *      output.
  *
  * At 100 TB the index is the only large state; it is partitioned parquet
  * keyed by band_key — the candidate join prunes to matching band files
  * and never rewrites history (append-only, idempotent per batch id via
  * overwrite-by-batch directory naming if exactly-once is needed; the
  * at-least-once default matches the CDC sink's contract).
  */
object StreamingDedup {

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

  private def emptyIndex(batch: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    batch.sparkSession.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField("band_key", StringType),
        StructField("doc_id", LongType),
        StructField("sig", ArrayType(LongType)))))
  }

  /** One increment: near-dup verdicts for `batch` (doc_id, text) against
    * the index at `indexPath` plus earlier docs of the same batch, and the
    * index append. Returns the verdict frame (doc_id, dup_of, matched).
    */
  def increment(batch: DataFrame, indexPath: String): DataFrame = {
    val spark = batch.sparkSession
    val sigs = batch
      .select(col("doc_id"), signature(col("text")).as("sig"))
      .localCheckpoint()
    val bands = sigs
      .select(col("doc_id"), col("sig"), explode(bandKeys(col("sig"))).as("band_key"))
    val index =
      try spark.read.parquet(indexPath)
      catch { case _: org.apache.spark.sql.AnalysisException => emptyIndex(batch) }
    // candidates: arriving docs vs the corpus index, plus in-batch pairs
    // (later doc is the "arriving" side so the earlier one is its dup_of)
    val vsIndex = bands.join(
      index.select(col("band_key"), col("doc_id").as("dup_of"),
        col("sig").as("sig_b")),
      Seq("band_key"))
      // dup_of < doc_id enforces the earlier-doc-wins invariant under
      // at-least-once REPLAY too: a replayed batch finds its own rows in
      // the index in BOTH directions (and itself, ==), and `=!=` alone
      // would emit a (doc, LATER-doc) verdict no first run can produce.
      // Doc ids are arrival-ordered — the same assumption the in-batch
      // pairing below already makes.
      .filter(col("dup_of") < col("doc_id"))
    val inBatch = bands.join(
      bands.select(col("band_key"), col("doc_id").as("dup_of"),
        col("sig").as("sig_b")),
      Seq("band_key"))
      .filter(col("doc_id") > col("dup_of"))
    val verdicts = vsIndex.unionByName(inBatch)
      .select(col("doc_id"), col("dup_of"), col("sig"), col("sig_b"))
      .dropDuplicates("doc_id", "dup_of")
      .withColumn("matched", matchedSlots(col("sig"), col("sig_b")))
      .filter(col("matched") >= TextOps.MinhashParams.size / 2)
      .select(col("doc_id"), col("dup_of"), col("matched"))
    // partitionBy(band_key): the candidate join equi-joins on band_key,
    // so dynamic partition pruning reads only the band directories the
    // batch actually touches — O(batch·bands) files per trigger, not a
    // rescan of the whole accumulated corpus index
    bands.select(col("band_key"), col("doc_id"), col("sig"))
      .write.mode("append").partitionBy("band_key").parquet(indexPath)
    verdicts
  }

  /** Wire the increment as a foreachBatch streaming query. */
  def run(docs: DataFrame, indexPath: String, outPath: String,
      checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        increment(batch, indexPath)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outPath)
        ()
      }
      .start()
}
