package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental maintenance of an SCD2 (type-2 slowly-changing-
  * dimension) HISTORY table from CDC deltas — the versioned sibling of
  * [[CdcMaterialize.latestState]]'s current-image view and the fourth
  * member of the IVM family: a warehouse keeps every key's full
  * version history `(id, version, op, payload, valid_from_lsn,
  * valid_to_lsn, is_current)` materialized, and each change batch must
  * append new versions, CLOSE the previously-open interval of every
  * touched key, and leave untouched keys' history bytes alone —
  * without re-scanning the corpus (the batch gate `q_cdc_scd2`
  * recomputes the history from the whole change log; at 100 TB that
  * recompute is exactly what a daily-batch warehouse cannot afford).
  *
  * The key insight making the step O(|Δ|): an SCD2 history is a
  * LOSSLESS encoding of its underlying event sequence — each version
  * row is one event `(id, op, payload, lsn = valid_from_lsn)`, and
  * every derived column (version numbers, interval bounds, the
  * current flag) is a pure window function of that sequence. So a
  * maintenance step:
  *   1. collects the touched keys (delta ids);
  *   2. DECODES the touched keys' stored history rows back to events
  *      (one semi-join — O(|Δ| · avg versions) rows);
  *   3. re-derives those keys' history from decoded ∪ delta events
  *      through the same one-window derivation ([[fromEvents]]);
  *   4. carries every untouched key's history row verbatim via an
  *      anti-join.
  * Late (out-of-order) events need no special case: the window orders
  * by lsn, so a late event splices into its true position and the
  * touched key's version numbers/intervals renumber consistently —
  * the same max-lsn-style arrival-order invariance the other IVM
  * operators have, extended to full sequences.
  *
  * Scale shape: one key-partitioned window over |touched history| +
  * |Δ| rows (never the corpus), one broadcast-sized anti-join for the
  * carry. The recompute alternative re-windows the ENTIRE log.
  */
object IncrementalScd2 {

  /** Derive the SCD2 history from an event frame `(id, op, lsn,
    * payload…)`: per key ordered by lsn, version = position, interval
    * = [lsn, next lsn) with the open sentinel −1 (NOT null — nullable
    * sort keys order differently across engines), `is_current` on the
    * last non-delete. One window shuffle on the key.
    */
  def fromEvents(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("lsn"))
    events
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to_lsn",
        coalesce(lead(col("lsn"), 1).over(w), lit(-1L)))
      .withColumn("is_current",
        col("valid_to_lsn") === -1L && col("op") =!= "d")
      .withColumnRenamed("lsn", "valid_from_lsn")
  }

  /** One maintenance step. `history` must be a [[fromEvents]]-shaped
    * frame (payload columns free); `delta` carries `(id, op, lsn,
    * payload…)`. Returns the updated history with a `touchedCol`
    * marker: `"refreshed"` on every row of a key the batch touched
    * (its whole version chain re-derives — interval closes and
    * renumbering are per-key global), `"carried"` elsewhere.
    */
  def step(history: DataFrame, delta: DataFrame,
      touchedCol: String): DataFrame = {
    import graft.Materialize.Ops
    val histCols = history.columns.filter(_ != touchedCol)
    val touched = delta.select(col("id")).distinct()
      .stage() // the decode semi-join and the carry anti-join
    // decode touched keys' stored rows back to their event sequence
    val payloadCols = histCols.filterNot(Set("id", "version",
      "valid_from_lsn", "valid_to_lsn", "is_current").contains)
    val decoded = history.join(touched, Seq("id"), "left_semi")
      .select((Seq(col("id"), col("valid_from_lsn").as("lsn")) ++
        payloadCols.map(col)).toIndexedSeq: _*)
    val rebuilt = fromEvents(decoded.unionByName(
        delta.select((Seq(col("id"), col("lsn")) ++
          payloadCols.map(col)).toIndexedSeq: _*)))
      .withColumn(touchedCol, lit("refreshed"))
      .select((histCols.map(col) :+ col(touchedCol)).toIndexedSeq: _*)
    history.select(histCols.map(col).toIndexedSeq: _*)
      .join(touched, Seq("id"), "left_anti")
      .withColumn(touchedCol, lit("carried"))
      .unionByName(rebuilt)
  }
}
