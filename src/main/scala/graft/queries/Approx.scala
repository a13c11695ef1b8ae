package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate aggregates — the sketch family a 100 TB pipeline uses when
  * exact distinct/percentile would shuffle the world: HyperLogLog++
  * (`approx_count_distinct`), GK quantile sketch (`percentile_approx`),
  * and frequent-items. Mergeable sketches ⇒ map-side partials, one tiny
  * shuffle, no global sort.
  *
  * No DuckDB oracle is declared: sketch outputs are algorithm-specific
  * (DuckDB's approx_count_distinct uses different HLL parameters), so the
  * driver records these under its weaker rows-only check. Exactness bounds
  * are asserted in `ApproxSpec` instead (vs exact counts at test scale).
  */
object Approx {

  def qApproxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        approx_count_distinct(col("l_suppkey"), 0.01).as("approx_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** Percentile points: shared by the aggregate and the exploded-row
    * labels so the two can never drift apart.
    */
  private val Pcts = Seq(0.5, 0.95, 0.99)

  // One scalar row per (linestatus, percentile): the driver's rows-only
  // check loads results with pandas, which cannot sort an array<double>
  // column — so the percentile array is exploded to (pct, value) rows.
  def qApproxPercentiles(s: SparkSession, d: String): DataFrame = {
    val pctArray = array(Pcts.map(lit): _*)
    Tables.lineitem(s, d)
      .groupBy(col("l_linestatus"))
      .agg(
        percentile_approx(col("l_extendedprice"),
          pctArray, lit(10000)).as("price_pcts"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))
      .select(col("l_linestatus"),
        posexplode(col("price_pcts")).as(Seq("pct_idx", "price_pct")),
        col("min_price"), col("max_price"))
      .withColumn("pct", element_at(pctArray, col("pct_idx") + 1))
      .drop("pct_idx")
      .select(col("l_linestatus"), col("pct"), col("price_pct"),
        col("min_price"), col("max_price"))
      .orderBy(col("l_linestatus"), col("pct"))
  }

  val oracle: Map[String, String] = Map.empty // rows-only: sketch params are engine-specific

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_approx_distinct" -> (qApproxDistinct _),
    "q_approx_percentiles" -> (qApproxPercentiles _)
  )
}
