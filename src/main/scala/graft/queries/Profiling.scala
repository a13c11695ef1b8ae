package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table profiling — the "analyze" pass a pipeline runs before ingesting a
  * new source: per-column null counts, exact distinct cardinality, min/max.
  * One scan computes every column's stats as parallel aggregates (each with
  * map-side partials), then unpivots to one row per column — no per-column
  * rescans.
  */
object Profiling {

  private val OrdersCols =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")

  def qProfileOrders(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
    // One single-column aggregate per column, unioned: N distinct-counts in
    // ONE agg would plan as an Expand that multiplies every row (N+1)×
    // before the shuffle; per-column scans stay column-pruned and each
    // countDistinct gets a clean two-phase plan.
    OrdersCols.map { c =>
      ord.select(col(c))
        .agg(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_value"),
          max(col(c)).cast("string").as("max_value"))
        .select(lit(c).as("column_name"), col("n_nulls"), col("n_distinct"),
          col("min_value"), col("max_value"))
    }.reduce(_ unionByName _)
      .orderBy(col("column_name"))
  }

  val oracle: Map[String, String] = Map(
    "q_profile_orders" -> OrdersCols.map { c =>
      s"""SELECT '$c' AS column_name,
         |  CAST(count(*) FILTER ($c IS NULL) AS BIGINT) AS n_nulls,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_value,
         |  CAST(max($c) AS VARCHAR) AS max_value
         |FROM orders""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_profile_orders" -> (qProfileOrders _)
  )
}
