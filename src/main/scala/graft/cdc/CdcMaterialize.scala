package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Consumer-side materialization of a parsed envelope stream into current
  * table state — the operator every CDC consumer builds on top of the
  * reference's topics (SURVEY.md §2.5 "latest-state materialization, a
  * natural v2 feature").
  */
object CdcMaterialize {

  /** Reduce parsed envelopes (output of [[CdcEnvelope.parse]]) to the
    * current state of the table: per key, the max-`lsn` envelope wins and
    * a winning delete removes the row. Emits the `after` payload columns
    * plus `last_lsn`.
    *
    * One shuffle on the key — the minimum any engine needs for this
    * reduction. Delete keys come from the `before` image (Debezium deletes
    * carry no `after`). `lsn` ties break on op code for determinism.
    */
  def latestState(parsed: DataFrame, keyField: String = "id"): DataFrame = {
    val keyed = parsed.select(
      coalesce(col(s"envelope.after.$keyField"),
        col(s"envelope.before.$keyField")).as("_key"),
      col("envelope.source.lsn").as("_lsn"),
      col("envelope.op").as("_op"),
      col("envelope.after").as("_after"),
      col("envelope.ts_ms").as("_ts"),
      md5(to_json(col("envelope.after"))).as("_fp"))
    // ts_ms + payload-fingerprint tiebreaks: two envelopes tying on
    // (lsn, op) — e.g. a RE-snapshot's second op='r' image, both with
    // null lsn — would otherwise pick a partition-order-dependent winner.
    // Spark desc is nulls-LAST, so any live lsn beats every snapshot row.
    val w = Window.partitionBy(col("_key"))
      .orderBy(col("_lsn").desc, col("_op"),
        col("_ts").desc, col("_fp"))
    keyed.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col("_op") =!= "d")
      .select(col("_after.*"), col("_lsn").as("last_lsn"))
  }
}
