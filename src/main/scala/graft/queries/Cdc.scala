package graft.queries

import graft.Tables
import graft.cdc.{CdcEnvelope, CdcMaterialize, CdcSource, Enrich, EnrichConfig}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-gate coverage for the CDC path (SURVEY.md §2.1–2.2): synthesizes
  * snapshot envelopes from the `customer` table, runs the full
  * serialize→parse→enrich pipeline, and projects enrichment fields that a
  * DuckDB oracle can recompute directly from the base table — so the JSON
  * round-trip and every P1–P16 expression sit inside the hash-match gate.
  *
  * Scale note: the whole query is narrow (no shuffle until the final
  * order-by), so it distributes trivially; JSON parse/serialize stays inside
  * whole-stage codegen (no UDFs).
  */
object Cdc {

  private val FixedTs = 1700000000123L // 2023-11-14T22:13:20.123 UTC

  def qCdcEnrich(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).select(
      col("c_custkey").cast("int").as("id"),
      col("c_name").as("name"),
      concat(
        regexp_replace(lower(col("c_name")), "[^a-z0-9]+", "."),
        lit("@"), lower(col("c_mktsegment")), lit(".example.com")).as("email"))
    val envelopes = CdcSource.snapshot(cust, "inventory", "public", "customers",
      fixedTsMs = Some(FixedTs))
    Enrich(envelopes, EnrichConfig(processingTimeIso = Some("2026-01-01T00:00:00")))
      .select(
        col("envelope.after.id").as("id"),
        col("enrichment.operation.code").as("op_code"),
        col("enrichment.operation.label").as("op_label"),
        col("enrichment.operation.is_mutation").as("is_mutation"),
        col("enrichment.timestamps.event_time_ms").as("event_time_ms"),
        col("enrichment.timestamps.event_time_iso").as("event_time_iso"),
        col("enrichment.source_metadata.is_snapshot").as("is_snapshot"),
        col("enrichment.source_metadata.table").as("src_table"),
        col("enrichment.data_quality.has_before").as("has_before"),
        col("enrichment.data_quality.has_after").as("has_after"),
        col("enrichment.data_quality.field_count").as("field_count"),
        col("enrichment.customer_insights.email_domain").as("email_domain"),
        col("enrichment.customer_insights.has_email").as("has_email"),
        col("enrichment.customer_insights.email_length").as("email_length"))
      // checkpoint before the presentation sort: range partitioning samples
      // its input, which would evaluate the whole JSON pipeline twice
      .localCheckpoint()
      .orderBy(col("id"))
  }

  /** Latest-state materialization — the consumer-side operator every CDC
    * user builds (SURVEY.md §2.5 "natural v2 feature"): reduce a c/u/d/r
    * change stream to the current table state. A deterministic change mix
    * is synthesized from `customer` (snapshot all, update every 3rd key,
    * delete every 7th), serialized through the full JSON envelope
    * round-trip, then reduced: per key, the max-`lsn` envelope wins and a
    * winning delete removes the row — one window shuffle on the key, which
    * is the minimum any engine needs for this reduction.
    *
    * The oracle derives the SAME final state independently (closed-form
    * from the mod rules), so the gate checks the materialization logic,
    * not a SQL transliteration of it.
    */
  def qCdcLatestState(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).select(
      col("c_custkey").cast("int").as("id"),
      col("c_name").as("name"),
      concat(
        regexp_replace(lower(col("c_name")), "[^a-z0-9]+", "."),
        lit("@"), lower(col("c_mktsegment")), lit(".example.com")).as("email"))
    def mk(rows: DataFrame, op: String, lsn: Column) =
      CdcSource.changes(rows, op, "inventory", "public", "customers",
        lsn, fixedTsMs = Some(FixedTs))
    val snaps = mk(cust, "r", col("id").cast("long"))
    val upds = mk(cust.filter(col("id") % 3 === 0)
        .withColumn("name", upper(col("name"))),
      "u", col("id") + 10000000L)
    val dels = mk(cust.filter(col("id") % 7 === 0), "d", col("id") + 20000000L)
    val parsed = CdcEnvelope.parse(snaps.unionByName(upds).unionByName(dels))
    CdcMaterialize.latestState(parsed, keyField = "id")
      // the envelope payload schema carries created_at (all-null here:
      // the synthesized change events don't set it) — project it away
      .select(col("id"), col("name"), col("email"), col("last_lsn"))
      .orderBy(col("id"))
  }

  val oracle: Map[String, String] = Map(
    "q_cdc_latest_state" ->
      """SELECT CAST(c_custkey AS INT) AS id,
        |  CASE WHEN c_custkey % 3 = 0 THEN upper(c_name) ELSE c_name END AS name,
        |  regexp_replace(lower(c_name), '[^a-z0-9]+', '.', 'g')
        |    || '@' || lower(c_mktsegment) || '.example.com' AS email,
        |  CAST(CASE WHEN c_custkey % 3 = 0 THEN c_custkey + 10000000
        |            ELSE c_custkey END AS BIGINT) AS last_lsn
        |FROM customer WHERE c_custkey % 7 != 0
        |ORDER BY id""".stripMargin,

    "q_cdc_enrich" ->
      """SELECT CAST(c_custkey AS INT) AS id,
        |  'r' AS op_code, 'READ' AS op_label, false AS is_mutation,
        |  CAST(1700000000123 AS BIGINT) AS event_time_ms,
        |  '2023-11-14T22:13:20.123000' AS event_time_iso,
        |  true AS is_snapshot, 'customers' AS src_table,
        |  false AS has_before, true AS has_after, 3 AS field_count,
        |  lower(c_mktsegment) || '.example.com' AS email_domain,
        |  true AS has_email,
        |  CAST(length(regexp_replace(lower(c_name), '[^a-z0-9]+', '.', 'g')
        |       || '@' || lower(c_mktsegment) || '.example.com') AS INT) AS email_length
        |FROM customer
        |ORDER BY id""".stripMargin
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cdc_enrich" -> (qCdcEnrich _),
    "q_cdc_latest_state" -> (qCdcLatestState _)
  )
}
