package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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

  /** Fixed-width histogram bin (whole currency units). */
  private val BinWidth = 5000L

  /** Fixed-width histogram + CDF of lineitem prices: the distribution pass
    * behind partition-size planning and outlier fences. The bucket is
    * floor(price/width) in IEEE double, mirrored term-for-term in the
    * oracle (integer-cents would diverge: Spark's double→long cast
    * truncates where DuckDB's rounds). Scale shape: one narrow scan folds
    * into a tiny bucket aggregate (map-side partials); the running CDF
    * windows run over the O(buckets) aggregate, never the base table.
    */
  def qHistogramPrices(s: SparkSession, d: String): DataFrame = {
    val bins = Tables.lineitem(s, d)
      .select(floor(col("l_extendedprice") / BinWidth).cast("long").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
    val wCum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    bins
      .withColumn("cum_n", sum(col("n")).over(wCum))
      .withColumn("total", sum(col("n")).over(wAll))
      .select(col("bucket"),
        (col("bucket") * BinWidth).as("lo"),
        ((col("bucket") + 1) * BinWidth).as("hi"),
        col("n"), col("cum_n"),
        floor(col("cum_n") * 10000L / col("total")).cast("long")
          .as("cdf_x10000"))
      .orderBy(col("bucket"))
  }

  val oracle: Map[String, String] = Map(
    "q_histogram_prices" ->
      s"""WITH b AS (SELECT CAST(floor(l_extendedprice / $BinWidth) AS BIGINT)
         |    AS bucket
         |  FROM lineitem),
         |g AS (SELECT bucket, count(*) AS n FROM b GROUP BY 1),
         |c AS (SELECT *,
         |  sum(n) OVER (ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
         |  sum(n) OVER () AS total
         |  FROM g)
         |SELECT bucket, bucket * $BinWidth AS lo,
         |  (bucket + 1) * $BinWidth AS hi, n, cum_n,
         |  CAST(cum_n * 10000 // total AS BIGINT) AS cdf_x10000
         |FROM c ORDER BY bucket""".stripMargin,

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
    "q_profile_orders" -> (qProfileOrders _),
    "q_histogram_prices" -> (qHistogramPrices _)
  )
}
