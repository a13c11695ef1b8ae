package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source adapters for the CDC pipeline (SURVEY.md §2.1 S1–S3).
  *
  * The reference's source is config-declared Debezium-over-Pulsar; in Spark
  * the same capability is a `readStream` over any transport that carries the
  * envelope JSON. Production path = Kafka (`format("kafka")` over Debezium
  * topics); test/local path = JSON-lines file streams. Both produce the same
  * one-string-column contract that [[Enrich]] consumes, so the transform is
  * transport-agnostic.
  */
object CdcSource {

  /** S1 (file variant): continuous change stream from JSON-lines files.
    * One `value` string column per message. `maxFilesPerTrigger` paces
    * micro-batches (the Spark analogue of connector backpressure).
    */
  def streamJsonLines(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(dir)

  /** S1 (Kafka variant, production): Debezium topics carry the envelope in
    * the record value. Subscribe pattern = per-table topics
    * `<server>.<schema>.<table>` (reference naming, `docs/setup-guide.md:33-35`).
    * Kafka metadata columns double as P16 context (topic/partition/offset).
    *
    * Manual runbook (no broker ships in this sandbox — the projection is
    * spec-tested against Kafka's record schema in `CdcSourceSpec`):
    *   1. point `bootstrap` at the Kafka cluster fronting Debezium;
    *   2. `topicPattern = "dbserver1\\.public\\..*"` subscribes every
    *      per-table topic the connector routes to;
    *   3. downstream is identical to the file path: [[CdcEnvelope.parse]] →
    *      [[Enrich]] → sink; `message_id`/`topic`/`partition` flow into
    *      P16 `processing_metadata`.
    */
  def streamKafka(spark: SparkSession, bootstrap: String, topicPattern: String): DataFrame =
    projectKafka(spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribePattern", topicPattern)
      .load())

  /** Kafka record → enrichment input contract: decode the value bytes and
    * keep topic/partition/offset as P16 context columns. Split from
    * [[streamKafka]] so the projection is unit-testable against a mocked
    * DataFrame carrying Kafka's source schema.
    */
  def projectKafka(records: DataFrame): DataFrame =
    records.select(
      col("value").cast("string").as("value"),
      col("topic"),
      col("partition"),
      concat_ws(":", col("topic"), col("partition"), col("offset")).as("message_id"))

  /** S1 (TCP socket variant): envelope lines over a live network socket —
    * the in-sandbox stand-in for a broker transport (no Kafka broker or
    * connector jars ship here; see the README runbook for the real
    * wiring). Emits the same one-string-column contract as the file and
    * Kafka variants, so everything downstream is identical; exercised
    * end-to-end over a real socket in `CdcSocketTransportSpec`. Not for
    * production (the socket source is unreplayable — no offsets), which
    * is exactly why the checkpointed file/Kafka variants exist.
    */
  def streamSocket(spark: SparkSession, host: String, port: Int): DataFrame =
    spark.readStream.format("socket")
      .option("host", host).option("port", port).load()

  /** Batch twin of [[streamJsonLines]] for replay/snapshot processing. */
  def readJsonLines(spark: SparkSession, dir: String): DataFrame =
    spark.read.text(dir)

  /** S2: initial snapshot — wrap a batch table scan as `op='r'` envelopes,
    * exactly how Debezium replays existing rows through the same topic
    * (`snapshot.mode: initial`, reference connector yaml:33-34). The rows
    * then flow through the SAME enrichment as live changes (§7.3#6).
    *
    * @param rows      batch DataFrame of the source table
    * @param db/schema/table provenance for the envelope `source` block
    * @param serverName logical server name (topic prefix)
    */
  def snapshot(rows: DataFrame, db: String, schema: String, table: String,
      serverName: String = "dbserver1",
      fixedTsMs: Option[Long] = None): DataFrame = {
    val tsMs = fixedTsMs.map(lit(_).cast("long"))
      .getOrElse((unix_timestamp(current_timestamp()) * 1000).cast("long"))
    // ignoreNullFields=false: Debezium emits EVERY column and block —
    // "before": null, "lsn": null, and a NULL column as "email": null.
    // Default to_json would drop those keys, so a null-valued column
    // became indistinguishable from an absent one and downstream
    // key-presence semantics (has_email_key, field_count) diverged from
    // real connector output.
    rows.select(to_json(struct(
      lit(null).cast(StructType(rows.schema.fields)).as("before"),
      struct(rows.columns.map(col): _*).as("after"),
      struct(
        lit("spark-graft").as("version"),
        lit("postgresql").as("connector"),
        lit(serverName).as("name"),
        tsMs.as("ts_ms"),
        lit("true").as("snapshot"),
        lit(db).as("db"),
        lit(schema).as("schema"),
        lit(table).as("table"),
        lit(null).cast("long").as("txId"),
        lit(null).cast("long").as("lsn")).as("source"),
      lit("r").as("op"),
      tsMs.as("ts_ms")
    ), Map("ignoreNullFields" -> "false")).as("value"))
  }

  /** S2 (JDBC variant): initial snapshot read straight from the source
    * database — the Spark analogue of Debezium's `snapshot.mode: initial`
    * reading the live table (reference connector yaml:33-34), rather than
    * wrapping an already-loaded DataFrame. The rows wrap through
    * [[snapshot]], so envelope shape and enrichment are IDENTICAL to the
    * DataFrame variant (spec-proven parity in `CdcJdbcSnapshotSpec`
    * against an in-JVM Derby with the reference `customers` DDL,
    * reference scripts/install.sh:330).
    *
    * Scale shape: pass `partitionColumn` + `bounds` to split the scan
    * into `numPartitions` bounded range queries (Spark's JDBC
    * partitioned read) — one cursor per executor, the only way a large
    * snapshot is feasible; omitting them falls back to a single-cursor
    * read for small tables.
    *
    * @param url        JDBC url (driver inferred; set `driver` in `props`
    *                   for drivers that don't self-register)
    * @param dbTable    source table (or a pushdown subquery alias)
    */
  def snapshotJdbc(spark: SparkSession, url: String, dbTable: String,
      db: String, schema: String, table: String,
      partitionColumn: Option[String] = None,
      bounds: Option[(Long, Long)] = None,
      numPartitions: Int = 8,
      props: java.util.Properties = new java.util.Properties(),
      serverName: String = "dbserver1",
      fixedTsMs: Option[Long] = None): DataFrame = {
    // half-specified partitioning would SILENTLY fall back to the
    // single-cursor read — the exact scale failure these params prevent
    require(partitionColumn.isDefined == bounds.isDefined,
      "snapshotJdbc: partitionColumn and bounds must be supplied together")
    val rows = (partitionColumn, bounds) match {
      case (Some(pc), Some((lo, hi))) =>
        spark.read.jdbc(url, dbTable, pc, lo, hi, numPartitions, props)
      case _ =>
        spark.read.jdbc(url, dbTable, props)
    }
    snapshot(rows, db, schema, table, serverName, fixedTsMs)
  }

  /** Generator twin of [[snapshot]] for arbitrary ops: wrap rows as
    * c/u/d/r envelopes with an explicit monotone `lsn`. Image placement
    * mirrors Debezium under default replica identity: inserts/updates/reads
    * carry `after` only, deletes carry `before` only.
    */
  def changes(rows: DataFrame, op: String, db: String, schema: String,
      table: String, lsn: org.apache.spark.sql.Column,
      serverName: String = "dbserver1",
      fixedTsMs: Option[Long] = None,
      txId: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val tsMs = fixedTsMs.map(lit(_).cast("long"))
      .getOrElse((unix_timestamp(current_timestamp()) * 1000).cast("long"))
    val image = struct(rows.columns.map(col): _*)
    val noImage = lit(null).cast(StructType(rows.schema.fields))
    val (before, after) =
      if (op == "d") (image, noImage) else (noImage, image)
    rows.select(to_json(struct(
      before.as("before"),
      after.as("after"),
      struct(
        lit("spark-graft").as("version"),
        lit("postgresql").as("connector"),
        lit(serverName).as("name"),
        tsMs.as("ts_ms"),
        lit(if (op == "r") "true" else "false").as("snapshot"),
        lit(db).as("db"),
        lit(schema).as("schema"),
        lit(table).as("table"),
        txId.map(_.cast("long"))
          .getOrElse(lit(null).cast("long")).as("txId"),
        lsn.cast("long").as("lsn")).as("source"),
      lit(op).as("op"),
      tsMs.as("ts_ms")
    ), Map("ignoreNullFields" -> "false")).as("value"))
  }

  /** Mixed-op twin of [[changes]]: rows carry their OWN op and lsn columns
    * (the shape a database changelog/audit table delivers — one row per
    * change, any op), wrapped per-row with Debezium image placement:
    * inserts/updates/reads carry `after` only, deletes `before` only. The
    * JSON layout is field-for-field the one [[changes]] emits, so a poll
    * over a changelog table is byte-indistinguishable from the file
    * transport (spec-proven in `CdcJdbcIncrementalSpec`).
    *
    * @param opCol  column holding the op code (`c`/`u`/`d`/`r`)
    * @param lsnCol column holding the monotone change sequence
    */
  def changesMixed(rows: DataFrame, opCol: String, lsnCol: String,
      db: String, schema: String, table: String,
      serverName: String = "dbserver1",
      fixedTsMs: Option[Long] = None): DataFrame = {
    val payload = rows.columns.filterNot(c => c == opCol || c == lsnCol)
    val tsMs = fixedTsMs.map(lit(_).cast("long"))
      .getOrElse((unix_timestamp(current_timestamp()) * 1000).cast("long"))
    val image = struct(payload.map(col).toIndexedSeq: _*)
    val noImage = lit(null).cast(StructType(payload.map(rows.schema(_))))
    val isDelete = col(opCol) === "d"
    rows.select(to_json(struct(
      when(isDelete, image).otherwise(noImage).as("before"),
      when(isDelete, noImage).otherwise(image).as("after"),
      struct(
        lit("spark-graft").as("version"),
        lit("postgresql").as("connector"),
        lit(serverName).as("name"),
        tsMs.as("ts_ms"),
        when(col(opCol) === "r", "true").otherwise("false").as("snapshot"),
        lit(db).as("db"),
        lit(schema).as("schema"),
        lit(table).as("table"),
        lit(null).cast("long").as("txId"),
        col(lsnCol).cast("long").as("lsn")).as("source"),
      col(opCol).cast("string").as("op"),
      tsMs.as("ts_ms")
    ), Map("ignoreNullFields" -> "false")).as("value"))
  }

  /** S3: table include filter — restrict a multi-table envelope stream to one
    * schema/table, the Spark form of Debezium's `table.include.list`
    * (reference connector yaml:23-24). Applied on parsed envelopes so it
    * pushes into the scan as an ordinary predicate.
    */
  def includeTable(parsed: DataFrame, schema: String, table: String): DataFrame =
    parsed.filter(
      col("envelope.source.schema") === schema &&
        col("envelope.source.table") === table)
}
