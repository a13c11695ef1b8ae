package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational query library over the TESTDATA tables.
  *
  * Reference parity note: the reference (mannjg/pulsar-cdc-experiment) has no
  * relational operators at all (SURVEY.md §2.3–2.7 — evidence of absence);
  * this layer supplies the driver-mandated relational core using built-in
  * Catalyst operators only. Design rules for 100 TB (SURVEY.md §6):
  *   - declarative DataFrame plans only — pushdown/pruning/join-reorder free;
  *   - exact DECIMAL aggregates (order-independent, cluster-reproducible);
  *   - broadcast() the small dimension side of every star join;
  *   - deterministic total ordering on every output (oracle hash parity).
  */
object Relational {

  private val one = lit(1.00).cast(Tables.Rate) // exact 1.00 for (1-disc)

  /** q1: pricing summary — full-scan groupBy aggregate (TPC-H Q1 shape).
    * Scale: map-side partial aggregation on 4-ish groups → tiny shuffle.
    */
  def q1PricingSummary(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitemDec(s, d)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice") * (one - col("l_discount"))).as("sum_disc_price"),
        sum(col("l_extendedprice") * (one - col("l_discount")) * (one + col("l_tax"))).as("sum_charge"),
        count(lit(1)).as("count_order")
      )
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val oracle: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
        |  sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS sum_base_price,
        |  sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS sum_disc_price,
        |  sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1.00 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS sum_charge,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _)
  )
}
