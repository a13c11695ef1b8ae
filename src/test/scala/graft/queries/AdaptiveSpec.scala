package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** Runtime-adaptive gates ([[Adaptive]]) + the bucketed aggregation
  * elision ([[Physical.qBucketedAggElision]]): value-equality against the
  * straight computation (running the gate also exercises its in-body plan
  * witness), plus the DISCRIMINATIVE control for each — the same query
  * under conditions where the mechanism must NOT fire, proving the
  * witness is a real claim and not a tautology.
  */
class AdaptiveSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  // one AQE-unwrap implementation for gates and specs alike
  private def finalPlan(df: DataFrame) = Physical.prepared(df)

  test("AQE skew join: split-partition join equals the plain rollup; " +
    "production thresholds leave the same plan unsplit") {
    val got = Adaptive.qAqeSkewJoin(spark, sf)
    val want = Tables.lineitem(spark, sf)
      .select(when(col("l_linenumber") >= 2, lit(1L))
        .otherwise(col("l_suppkey")).as("sk"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_shipdate"))
      .join(Tables.supplier(spark, sf), col("sk") === col("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast(Tables.Money)).as("qty_sum"),
        sum(col("l_extendedprice").cast(Tables.Money)).as("price_sum"),
        sum(col("l_discount").cast(Tables.Money)).as("disc_sum"),
        sum(col("l_tax").cast(Tables.Money)).as("tax_sum"),
        max(col("l_shipdate")).as("last_ship"))
    assert(canon(got) == canon(want) && got.count() > 0)
    // control: at the 256 MB default threshold nothing at this sf is
    // "skewed" — the witness's isSkewJoin can genuinely be absent
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ctl = want.orderBy(col("s_nationkey"))
      ctl.collect()
      val nodes = Physical.allNodes(finalPlan(ctl))
      assert(nodes.exists(_.isInstanceOf[SortMergeJoinExec]),
        "control must still be a sort-merge join for the claim to bite")
      val split = nodes.collect {
        case j: SortMergeJoinExec if j.isSkewJoin => j
      }
      assert(split.isEmpty,
        "control: default thresholds should not skew-split at sf0.001")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("runtime bloom join: probe-filtered join equals the plain join; " +
    "disabling the injector removes might_contain") {
    val got = Adaptive.qRuntimeBloomJoin(spark, sf)
    val want = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(col("p_brand") === "Brand#23"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast(Tables.Money)).as("qty_sum"),
        sum(col("l_extendedprice").cast(Tables.Money)).as("price_sum"))
    assert(canon(got) == canon(want) && got.count() > 0)
    val key = "spark.sql.optimizer.runtime.bloomFilter.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val ctl = Tables.lineitem(spark, sf)
        .join(Tables.part(spark, sf).filter(col("p_brand") === "Brand#23"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand")).agg(count(lit(1)).as("n"))
      assert(!finalPlan(ctl).toString.contains("might_contain"),
        "control: with the injector off there must be no bloom probe")
    } finally spark.conf.set(key, prev)
  }

  test("bucketed aggregation elision: shuffle-free per-order rollup " +
    "equals the raw computation; the unbucketed control shuffles base " +
    "rows") {
    val got = Physical.qBucketedAggElision(spark, sf)
    val want = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast(Tables.Money)).as("qty_sum"))
      .groupBy(col("n_lines"))
      .agg(count(lit(1)).as("n_orders"), sum(col("qty_sum")).as("qty_total"))
    assert(canon(got) == canon(want) && got.count() > 0)
    // control: the same rollup over RAW parquet must pay a pre-aggregate
    // exchange (partial aggregates push below it, so look for a shuffle
    // whose subtree still reads the scan through only partial aggs —
    // i.e. an exchange exists at all between scan and FINAL agg; here it
    // suffices that SOME exchange carries the per-orderkey hash
    // partitioning the bucketed layout made unnecessary)
    val raw = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"))
      .groupBy(col("n_lines")).agg(count(lit(1)).as("n_orders"))
    // pre-execution prepared plan: exchanges not yet wrapped in stages
    val exchanges = finalPlan(raw).collect { case e: ShuffleExchangeLike => e }
    assert(exchanges.exists(
      _.outputPartitioning.toString.contains("l_orderkey")),
      "control: the unbucketed rollup should shuffle on l_orderkey; got " +
        exchanges.map(_.outputPartitioning).mkString(", "))
  }

  test("row-group skipping: sorted-layout scan equals the row-filtered " +
    "base; the UNSORTED control cannot skip") {
    val got = Physical.qRowgroupSkip(spark, sf)
    val shipUs = unix_micros(col("l_shipdate").cast("timestamp"))
    val cutoffUs = Tables.lineitem(spark, sf).agg(min(shipUs)).head()
      .getLong(0) + 30L * 86400 * 1000000L
    val want = Tables.lineitem(spark, sf)
      .filter(shipUs <= cutoffUs)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast(Tables.Money)).as("qty_sum"),
        sum(col("l_extendedprice").cast(Tables.Money)).as("price_sum"))
    assert(canon(got) == canon(want) && got.count() > 0)
    // control: the same small-row-group layout WITHOUT the sort — every
    // group spans ~the full date range, so statistics skip nothing and
    // the scan surfaces ~all rows. Proves the gate's metric witness
    // measures the LAYOUT, not the predicate.
    val dir = Cdc.gateTmpDir("graft_rg_unsorted_ctl", sf)
    Tables.lineitem(spark, sf)
      .select(shipUs.as("ship_us"), col("l_returnflag"), col("l_quantity"))
      .repartition(1)
      .write.mode("overwrite")
      .option("parquet.block.size", Physical.RowGroupBytes.toString)
      .option("parquet.page.size", (Physical.RowGroupBytes / 2).toString)
      .parquet(s"$dir/li")
    val ctl = spark.read.parquet(s"$dir/li")
      .filter(col("ship_us") <= cutoffUs)
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    ctl.collect()
    val total = Tables.lineitem(spark, sf).count()
    val scanned = Physical.scannedRows(ctl, "graft_rg_unsorted_ctl").get
    assert(scanned * 2 > total,
      s"control: unsorted layout surfaced only $scanned of $total rows — " +
        "the skip witness would be vacuous")
  }

  test("z-order skipping: Morton-layout scan equals the raw 2-D filter; " +
    "the 1-D day-sorted control scans more under the same predicates") {
    val got = Physical.qZorderSkip(spark, sf)
    val dayIdx = (unix_micros(col("l_shipdate").cast("timestamp")) /
      lit(86400000000L)).cast("long")
    val b = Tables.lineitem(spark, sf)
      .agg(min(dayIdx).as("lo"), max(dayIdx).as("hi")).head()
    val dayCut = b.getLong(0) + (b.getLong(1) - b.getLong(0) + 1) / 4 - 1
    val want = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") <= 12.0 && dayIdx <= dayCut)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast(Tables.Money)).as("qty_sum"),
        sum(col("l_extendedprice").cast(Tables.Money)).as("price_sum"))
    assert(canon(got) == canon(want) && got.count() > 0)
    // z-layout scanned rows (from a fresh run of the gate's plan shape)
    def scannedOf(df: org.apache.spark.sql.DataFrame, tag: String): Long = {
      df.collect()
      Physical.scannedRows(df, tag).get
    }
    // control: day-ONLY sorted layout, same groups, same predicates —
    // the day cut prunes to ~1/4 but the quantity cut prunes nothing
    // (every group spans the full quantity range), so the 1-D layout
    // must scan well more than the 2-D one
    val dir = Cdc.gateTmpDir("graft_zorder_ctl_1d", sf)
    Tables.lineitem(spark, sf)
      .select(col("l_quantity"), dayIdx.as("day_idx"), col("l_returnflag"))
      .repartition(1).sortWithinPartitions(col("day_idx"))
      .write.mode("overwrite")
      .option("parquet.block.size", Physical.ZSkipGroupBytes.toString)
      .option("parquet.page.size", (Physical.ZSkipGroupBytes / 2).toString)
      .parquet(s"$dir/li")
    val ctl = spark.read.parquet(s"$dir/li")
      .filter(col("l_quantity") <= 12.0 && col("day_idx") <= dayCut)
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    val ctlScanned = scannedOf(ctl, "graft_zorder_ctl_1d")
    // re-derive the z scan count on a fresh frame over the staged layout
    // (read-only lookup: the gate run above staged it; a no-op stageOnce
    // here could stamp _STAGED on an empty tree under test reordering)
    val zDir = Cdc.stagedDirIfReady(spark, "graft_zorder_skip", sf)
      .getOrElse(fail("z-order fixture not staged — did the gate run?"))
    val z = spark.read.parquet(s"$zDir/lineitem")
      .filter(col("l_quantity") <= 12.0 && col("day_idx") <= dayCut)
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    val zScanned = scannedOf(z, "graft_zorder_skip")
    // 1.5× at sf0.001's ~15-group granularity (measured 1.85×; the gap
    // widens with group count — at 100 TB granularity it approaches the
    // 4× area ratio of quarter-span vs 1/16-box)
    assert(zScanned > 0 && 2 * ctlScanned >= 3 * zScanned,
      s"1-D layout scanned $ctlScanned vs z-order $zScanned — the curve " +
        "bought no multi-dimensional pruning")
  }

  test("AQE coalesce: merged-partition rollup equals the plain " +
    "aggregate — placement changed, membership didn't") {
    val got = Adaptive.qAqeCoalesce(spark, sf)
    val want = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast(Tables.Money)).as("qty_sum"),
        sum(col("l_extendedprice").cast(Tables.Money)).as("price_sum"))
    assert(canon(got) == canon(want) && got.count() > 0)
  }

  test("conf windows restore: gate runs leave no adaptive/bloom " +
    "thresholds behind") {
    // every conf any gate sets, not a subset — a withConfs restore
    // regression on ANY of them leaks into later gates' plans
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.shuffle.partitions",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst")
    val before = keys.map(k => spark.conf.getOption(k))
    Adaptive.qAqeSkewJoin(spark, sf).count()
    Adaptive.qRuntimeBloomJoin(spark, sf).count()
    Adaptive.qAqeCoalesce(spark, sf).count()
    val after = keys.map(k => spark.conf.getOption(k))
    assert(before == after, s"conf leak: $before -> $after")
  }
}
