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
    val rows = Approx.qApproxPercentiles(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pcts = r.getSeq[Double](1)
      val (mn, mx) = (r.getDouble(2), r.getDouble(3))
      assert(pcts.length == 3)
      assert(pcts.forall(p => p >= mn && p <= mx))
      assert(pcts(0) <= pcts(1) && pcts(1) <= pcts(2), "monotone percentiles")
    }
  }
}
