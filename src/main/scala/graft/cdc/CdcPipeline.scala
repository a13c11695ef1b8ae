package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** End-to-end CDC pipeline wiring (SURVEY.md §3.1 stages 3–7 as ONE Spark
  * query): source → parse → enrich → sink.
  *
  * The reference statically wires PostgreSQL→Debezium→topic→function→topic
  * (`docs/architecture.md:9-73`); here the same dataflow is a declarative
  * streaming plan, so Catalyst analyzes/optimizes/codegens it per micro-batch
  * and checkpointing upgrades the reference's at-least-once delivery
  * (`functions/README.md:23`) to exactly-once into idempotent sinks.
  *
  * Scale: the whole plan is narrow (per-record parse/enrich, no shuffle), so
  * it parallelizes linearly with input partitions on a real cluster —
  * 1000 executors each run the identical stateless stage, no coordination.
  */
object CdcPipeline {

  /** P19 (reference py:100 per-record audit log) as Spark observable
    * metrics: per-micro-batch enriched/passthrough counts surfaced through
    * `StreamingQueryProgress.observedMetrics("cdc_enrich")` — zero-cost
    * accumulator aggregation instead of a per-record log line.
    */
  // passthrough = output bytes are the input bytes (invalid JSON or the
  // reference's email-TypeError fallback — see Enrich.apply). Null input
  // (e.g. a Kafka tombstone) is passthrough too: coalesce keeps the
  // n_enriched + n_passthrough == n_total invariant, which a bare
  // null === null comparison would break.
  private def isPassthrough =
    coalesce(col("value_out") === col("value"), lit(true))

  private def enriched(in: DataFrame, cfg: EnrichConfig): DataFrame =
    Enrich(in, cfg)
      .observe("cdc_enrich",
        count(lit(1)).as("n_total"),
        count(when(!isPassthrough, 1)).as("n_enriched"),
        count(when(isPassthrough, 1)).as("n_passthrough"))

  private def enrichedValues(in: DataFrame, cfg: EnrichConfig): DataFrame =
    enriched(in, cfg).select(col("value_out").as("value"))

  /** Per-table output routing column — the sink analogue of the reference's
    * one-topic-per-table layout (`docs/setup-guide.md:33-35`). Passthrough
    * records (raw bytes, replayable) route to `_unrouted`; ENRICHED records
    * whose envelope lacks `source.table` route to `_unknown` so the
    * `_unrouted` partition never mixes enriched output with raw bytes.
    *
    * Leading-underscore names are RESERVED for those system buckets: a
    * genuine source table whose name starts with `_` is escaped to
    * `t<name>-<hash8>` (the hash makes the escape collision-free), so it
    * can never shadow a reserved bucket and silently interleave enriched
    * records with passthrough bytes.
    */
  def routedValues(in: DataFrame, cfg: EnrichConfig): DataFrame = {
    val table = col("envelope.source.table")
    val safeTable = when(table.startsWith("_"),
      concat(lit("t"), table, lit("-"), substring(md5(table), 1, 8)))
      .otherwise(table)
    enriched(in, cfg).select(
      when(isPassthrough, lit("_unrouted"))
        .otherwise(coalesce(safeTable, lit("_unknown")))
        .as("source_table"),
      col("value_out").as("value"))
  }

  /** Streaming pipeline: JSON-lines dir → enrich → JSON-lines dir.
    * `Trigger.AvailableNow` drains what exists then stops (deterministic for
    * tests); pass `trigger = None` for a continuous micro-batch run.
    *
    * `fanOutByTable = true` partitions the sink by source table
    * (`source_table=<t>/` directories), mirroring the reference's
    * one-topic-per-table routing; at scale this also gives per-table
    * readers partition pruning for free.
    */
  def start(spark: SparkSession, inDir: String, outDir: String,
      checkpointDir: String, cfg: EnrichConfig = EnrichConfig(),
      availableNow: Boolean = true,
      fanOutByTable: Boolean = false): StreamingQuery = {
    val values =
      if (fanOutByTable) routedValues(CdcSource.streamJsonLines(spark, inDir), cfg)
      else enrichedValues(CdcSource.streamJsonLines(spark, inDir), cfg)
    var writer = values
      .writeStream
      .format("text")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
    if (fanOutByTable) writer = writer.partitionBy("source_table")
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** V2-transport variant of [[start]]: both ends ride the `graft-cdc`
    * DataSource V2 table ([[graft.sources.CdcTableProvider]]) instead of
    * text source/sink. What that buys over the text transport:
    * admission-controlled tailing (`maxFilesPerTrigger` bounds recovery
    * batches), a loud failure on out-of-order input files (the text
    * source silently skips them), and fan-out into per-table
    * subdirectories that are THEMSELVES tailable `graft-cdc` logs under
    * rename-committed monotone names — so each table's output feeds the
    * next pipeline stage directly, the reference's topic-chaining shape
    * (`docs/architecture.md:30-41`).
    */
  def startV2(spark: SparkSession, inDir: String, outDir: String,
      checkpointDir: String, cfg: EnrichConfig = EnrichConfig(),
      availableNow: Boolean = true,
      fanOutByTable: Boolean = false,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    var reader = spark.readStream.format("graft-cdc")
    maxFilesPerTrigger.foreach(n => reader = reader.option("maxFilesPerTrigger", n))
    val in = reader.load(inDir).select("value")
    val values =
      if (fanOutByTable) routedValues(in, cfg) else enrichedValues(in, cfg)
    var writer = values.writeStream
      .format("graft-cdc")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
    if (fanOutByTable) writer = writer.option("partitionColumn", "source_table")
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** Batch twin (snapshot mode, SURVEY.md §2.1 S2): same transform, bounded
    * input — how Debezium replays pre-existing rows through the same path.
    */
  def runBatch(spark: SparkSession, inDir: String, outDir: String,
      cfg: EnrichConfig = EnrichConfig()): Unit =
    enrichedValues(CdcSource.readJsonLines(spark, inDir), cfg)
      .write.mode("overwrite").text(outDir)
}
