package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, DecimalType}

/** The `spark.sql(...)` surface: a SQL-only user gets the same results as
  * the DataFrame API. The ANSI subset of the DuckDB oracle SQL doubles as
  * Spark SQL — run it over temp views and cross-check against the
  * DataFrame plans, which also re-validates that those oracles are truly
  * engine-neutral ANSI (three engines agree: Spark-DF, Spark-SQL, DuckDB).
  */
class SqlSurfaceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Oracles that are pure ANSI (no //, list_*, string_split, md5-hex
    * arithmetic) and so runnable by Spark SQL directly.
    */
  private val AnsiQueries = Seq(
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    "q6_forecast_revenue", "q10_returned_items", "q12_ship_priority",
    "q13_customer_dist", "q18_large_orders", "q22_wealthy_inactive",
    "q_lateral_topk")

  /** Sorted multiset, not a Set: row multiplicity differences (e.g. a
    * join-induced fanout on one side only) must fail the cross-check.
    */
  private def comparable(df: DataFrame): Seq[String] = {
    val casted = df.select(df.schema.fields.map { f =>
      f.dataType match {
        case _: DecimalType => col(f.name).cast("double").as(f.name)
        case _              => col(f.name)
      }
    }.toIndexedSeq: _*)
    casted.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
  }

  test("ANSI oracle SQL runs in Spark over temp views and matches the DataFrame API") {
    Seq("region", "nation", "customer", "supplier", "part", "orders")
      .foreach(t => Tables.table(spark, sf, t).createOrReplaceTempView(t))
    Tables.lineitem(spark, sf).createOrReplaceTempView("lineitem")
    val oracles = graft.SparkEntry.oracleSql
    AnsiQueries.foreach { name =>
      val viaSql = comparable(spark.sql(oracles(name)))
      val viaDf = comparable(graft.SparkEntry.queries(name)(spark, sf))
      assert(viaSql == viaDf,
        s"$name: SQL and DataFrame results differ\n" +
          s"only-sql: ${(viaSql.diff(viaDf)).take(3)}\n" +
          s"only-df:  ${(viaDf.diff(viaSql)).take(3)}")
    }
  }
}
