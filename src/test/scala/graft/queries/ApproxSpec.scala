package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Accuracy bounds for the sketch aggregates (no DuckDB oracle — sketch
  * outputs are engine-specific; correctness = bounded error vs exact).
  */
class ApproxSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact") {
    val approx = Approx.qApproxDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("p"), countDistinct(col("l_suppkey")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet)
    for ((k, (ap, as_)) <- approx) {
      val (ep, es) = exact(k)
      assert(math.abs(ap - ep).toDouble / ep < 0.05, s"$k parts: $ap vs $ep")
      assert(math.abs(as_ - es).toDouble / es < 0.05, s"$k supps: $as_ vs $es")
    }
  }

  test("percentile_approx brackets exact percentiles") {
    // schema: (l_linestatus, pct, price_pct, min_price, max_price), one
    // scalar row per percentile (exploded for the driver's pandas check)
    val rows = Approx.qApproxPercentiles(spark, sf).collect()
    assert(rows.nonEmpty)
    val byStatus = rows.groupBy(_.getString(0))
    byStatus.foreach { case (status, rs) =>
      assert(rs.length == 3, s"$status: expected 3 percentile rows")
      val sorted = rs.sortBy(_.getDouble(1))
      assert(sorted.map(_.getDouble(1)).toSeq == Seq(0.5, 0.95, 0.99))
      val vals = sorted.map(_.getDouble(2))
      val (mn, mx) = (rs.head.getDouble(3), rs.head.getDouble(4))
      assert(vals.forall(p => p >= mn && p <= mx))
      assert(vals(0) <= vals(1) && vals(1) <= vals(2), "monotone percentiles")
    }
  }

  test("sampled percentiles: monotone, inside the full-data hull, sane sample size") {
    val rows = Approx.qSampledPercentiles(spark, sf).collect()
    assert(rows.nonEmpty)
    val full = graft.Tables.lineitem(spark, sf)
      .agg(org.apache.spark.sql.functions.min("l_extendedprice"),
        org.apache.spark.sql.functions.max("l_extendedprice"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1))).collect().head
    val (mn, mx, n) = (full.getDouble(0), full.getDouble(1), full.getLong(2))
    rows.groupBy(_.getString(0)).foreach { case (status, rs) =>
      assert(rs.length == 3, s"$status: expected 3 percentile rows")
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == Seq(50L, 95L, 99L))
      val vals = sorted.map(_.getDouble(2))
      assert(vals.forall(p => p >= mn && p <= mx))
      assert(vals(0) <= vals(1) && vals(1) <= vals(2))
      // 1/16 hash sampling: group sample between 1% and 25% of the table
      val m = rs.head.getLong(3)
      assert(m > n / 100 && m < n / 4, s"$status: odd sample size $m of $n")
    }
  }
}
