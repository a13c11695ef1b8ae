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
    val aggs: Seq[Column] = OrdersCols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = ord.agg(aggs.head, aggs.tail: _*)
    val stackArgs = OrdersCols.map(c =>
      s"'$c', ${c}__nulls, ${c}__distinct, ${c}__min, ${c}__max").mkString(", ")
    wide.selectExpr(
      s"stack(${OrdersCols.size}, $stackArgs) AS " +
        "(column_name, n_nulls, n_distinct, min_value, max_value)")
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
