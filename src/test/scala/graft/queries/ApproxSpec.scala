package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Accuracy verdicts for the sketch aggregates. The HLL/GK gate queries
  * emit exact-recomputable columns plus an in-plan `within_bound`
  * boolean; these specs independently recompute the exact columns and
  * assert every verdict holds at test scale.
  */
class ApproxSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("approx distinct: exact columns match an independent recompute, verdicts hold") {
    // schema: (l_returnflag, exact_parts, exact_supps, n_rows,
    //          parts_within_bound, supps_within_bound)
    val rows = Approx.qApproxDistinct(spark, sf).collect()
    val got = rows.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("p"), countDistinct(col("l_suppkey")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == exact)
    rows.foreach { r =>
      assert(r.getBoolean(4), s"${r.getString(0)}: parts sketch outside 5σ bound")
      assert(r.getBoolean(5), s"${r.getString(0)}: supps sketch outside 5σ bound")
    }
  }

  test("percentile rank-error audit: 3 rows per group, hull sane, verdicts hold") {
    // schema: (l_linestatus, pct, min_price, max_price, n_rows, within_bound)
    val rows = Approx.qApproxPercentiles(spark, sf).collect()
    assert(rows.nonEmpty)
    val byStatus = rows.groupBy(_.getString(0))
    byStatus.foreach { case (status, rs) =>
      assert(rs.length == 3, s"$status: expected 3 percentile rows")
      val sorted = rs.sortBy(_.getDouble(1))
      assert(sorted.map(_.getDouble(1)).toSeq == Seq(0.5, 0.95, 0.99))
      val (mn, mx) = (rs.head.getDouble(2), rs.head.getDouble(3))
      assert(mn <= mx && rs.head.getLong(4) > 0)
      rs.foreach(r => assert(r.getBoolean(5),
        s"$status pct=${r.getDouble(1)}: GK estimate outside rank bound"))
    }
  }

  test("sketch rollup: unioned per-group sketches estimate like a direct sketch") {
    // the property that makes sketch TABLES work at scale: rolling up
    // persisted per-(flag,status) sketches estimates each flag's
    // distinct count without rescanning rows and without an accuracy
    // cliff. Union is NOT register-identical to direct aggregation
    // (DataSketches unions promote to a different target HLL type), so
    // the check is the honest one: both paths land within the sketch's
    // error bound of the exact count.
    val rows = Approx.qSketchRollup(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(3),
      s"${r.getString(0)}: merged estimate outside 5σ bound"))
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_linestatus"), col("l_partkey"))
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = li.groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey"), lit(12)))
        .as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(hll_sketch_agg(col("l_partkey"), lit(12)).as("sk"))
      .groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(true))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bound = 1.04 / math.sqrt(4096.0) * 5
    for ((k, n) <- exact; est <- Seq(direct(k), merged(k)))
      assert(math.abs(est - n).toDouble / n <= bound,
        s"$k: estimate $est vs exact $n outside ${bound * 100}%")
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
