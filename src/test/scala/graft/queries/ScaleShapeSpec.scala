package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Scale-shape assertions: the physical plans the engine relies on at
  * 100 TB actually materialize — bucketed co-located joins run without a
  * shuffle, broadcast hints take effect, filters reach the parquet scan.
  */
class ScaleShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.write.format("noop").mode("overwrite").save() // let AQE finalize
    df.queryExecution.executedPlan.toString
  }

  /** Drops every InMemoryRelation display subtree from a printed plan:
    * those nodes are the CONTENTS of a Materialize.stage cache (computed
    * once, then scanned), so per-plan shape assertions — "at most one
    * generator", "no second exchange" — must not count them. Subtree
    * membership is by tree-drawing indentation: any line deeper than the
    * `InMemoryRelation` line belongs to its cached plan.
    */
  private def aboveCaches(plan: String): String = {
    def indentOf(l: String): Int = {
      val i = l.indexWhere(c => !" :+-".contains(c))
      if (i < 0) l.length else i
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var skip = -1
    plan.split('\n').foreach { l =>
      val ind = indentOf(l)
      if (skip >= 0 && ind > skip) () // inside a cached subtree
      else if (l.contains("InMemoryRelation")) skip = ind
      else { skip = -1; out += l }
    }
    out.mkString("\n")
  }

  test("bucketed tables join without any shuffle exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sf).write.mode("overwrite")
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_b")
      Tables.lineitem(spark, sf).write.mode("overwrite")
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("l_quantity").cast(Tables.Money)).as("qty"))
      val plan = finalPlan(joined)
      // the post-join aggregate exchanges on o_orderstatus (expected);
      // the JOIN keys must not be exchanged — bucketing co-locates them
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey")
        && !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join must not shuffle the join keys:\n$plan")
      assert(plan.contains("SortMergeJoin") && plan.contains("Bucketed: true"), plan)
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("broadcast hint produces a broadcast join for dimension tables") {
    val plan = finalPlan(Relational.q5RegionRevenue(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("filters are pushed down to the parquet scan") {
    val df = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") < 24 && col("l_returnflag") === "R")
      .select(col("l_orderkey"))
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") &&
      scan.contains("LessThan(l_quantity,24.0)"), s"pushdown missing:\n$scan")
    // column pruning: only the 3 referenced columns are read
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double,l_returnflag:string>"),
      s"pruning missing:\n$scan")
  }

  test("partitioned writes prune partitions at read") {
    val dir = tmpDir("part-pruning")
    Tables.orders(spark, sf)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("o_year") === 1996)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_year") ||
      plan.contains("PartitionFilters: [(o_year"), s"no partition filter:\n$plan")
    assert(pruned.count() > 0)
    // pruning actually works: partition column filter, not a data filter
    assert(!plan.contains("PushedFilters: [IsNotNull(o_year"), plan)
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    val plan = Relational.q3ShippingPriority(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("contamination check broadcasts the benchmark shingle index") {
    val plan = finalPlan(Curation.qContamination(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark side must broadcast, not shuffle the corpus:\n$plan")
  }

  test("binned range join plans as a hash join, not a nested loop") {
    val plan = finalPlan(Events.qEventsAttribution(spark, sf))
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"range join must bin to an equi join:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
  }

  test("IVF ANN: candidate join is a hash join keyed on the cell") {
    val plan = finalPlan(Similarity.qAnnIvf(spark, sf))
    // the pivot assignment legitimately broadcast-nested-loops (pivots are
    // tiny by construction); the CANDIDATE join — the one that scales with
    // the corpus — must be an equi hash/merge join on the cell key
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"IVF candidate join must be an equi join:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("gap fill and retention cohorts plan without cross products") {
    for (df <- Seq(Events.qGapFill(spark, sf),
        Events.qRetentionCohorts(spark, sf))) {
      val plan = finalPlan(df)
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoop"), s"unexpected cross product:\n$plan")
    }
  }

  test("curation pipeline: broadcast-only joins, no data-sized shuffle join") {
    val df = Curation.qCurationPipeline(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // dedup/quality/sample are window + filters; the packing stage's only
    // join is GlobalRank's O(numPartitions) offsets broadcast — a
    // shuffle-side (SortMerge/ShuffledHash) join would mean a data-sized
    // frame snuck into the pairing
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"pipeline must not shuffle-join:\n$plan")
    assert(df.count() > 0)
  }

  test("cube/rollup/grouping-sets Expand runs over a pre-aggregate, not the base table") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand}
    for (df <- Seq(Relational.qCubeOrders(spark, sf),
        Relational.qRollupBalance(spark, sf),
        Relational.qGroupingSets(spark, sf))) {
      val expands = df.queryExecution.optimizedPlan.collect { case e: Expand => e }
      assert(expands.nonEmpty, "expected an Expand for the grouping sets")
      // the N× row multiplication must happen AFTER the fine-grained
      // aggregate shrank the input, so every Expand sits above an Aggregate
      assert(expands.forall(
        _.child.collectFirst { case a: Aggregate => a }.nonEmpty),
        s"Expand reads the base table directly:\n${df.queryExecution.optimizedPlan}")
    }
  }

  test("q8 market share: part-type filter reaches the scan, no cartesian") {
    val df = Relational.q8MarketShare(spark, sf)
    val scans = df.queryExecution.executedPlan.toString
    assert(scans.contains("EqualTo(p_type,STANDARD)"),
      s"p_type filter not pushed to the part scan:\n$scans")
    val plan = finalPlan(df)
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"q8 must join on keys only:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"dims should broadcast:\n$plan")
  }

  test("events dedup: one shuffle on the window key, earliest-wins") {
    val plan = finalPlan(Events.qEventsDedup(spark, sf))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1,
      s"expected exactly one hash shuffle (the dedup window key), got $shuffles:\n$plan")
  }

  test("ANALYZE statistics feed the optimizer: sizeInBytes drives broadcast choice") {
    // On a cluster, CBO decisions (broadcast, join order) come from catalog
    // statistics, not file listing. Verify the ANALYZE → catalog → plan path:
    // computed stats must reach the optimized plan's size estimate.
    try {
      Tables.nation(spark, sf).write.mode("overwrite").saveAsTable("nation_t")
      Tables.supplier(spark, sf).write.mode("overwrite").saveAsTable("supplier_t")
      spark.sql("ANALYZE TABLE nation_t COMPUTE STATISTICS")
      spark.sql("ANALYZE TABLE nation_t COMPUTE STATISTICS FOR COLUMNS n_nationkey")
      val cat = spark.sql("DESCRIBE EXTENDED nation_t").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(cat("Statistics").contains("rows"),
        s"ANALYZE must record a row count: ${cat("Statistics")}")
      val joined = spark.table("supplier_t")
        .join(spark.table("nation_t"), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name")).count()
      val stats = joined.queryExecution.optimizedPlan.stats
      assert(stats.sizeInBytes > 0 && stats.sizeInBytes < 100L * 1024 * 1024,
        s"catalog stats must bound the size estimate, got ${stats.sizeInBytes}")
      // with a 25-row nation the planner must pick a broadcast join unaided
      assert(finalPlan(joined).contains("BroadcastHashJoin"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS nation_t")
      spark.sql("DROP TABLE IF EXISTS supplier_t")
    }
  }

  test("runtime bloom filter injects on a selective shuffle join") {
    // At 100 TB the big-side scan of a selective join should be pruned by
    // a bloom filter built from the filtered small side (InjectRuntimeFilter).
    // Local sizes are far under the production thresholds, so the test
    // lowers them to prove the rewrite fires; a real deployment keeps the
    // defaults (creation side ≤ 10MB, application side ≥ 10GB scanned).
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val ord = Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_custkey"))
      val j = Tables.lineitem(spark, sf)
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("l_quantity").cast(Tables.Money)).as("qty"))
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected an injected bloom-filter probe (might_contain):\n$optimized")
      assert(j.count() > 0)
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("select-best plans WindowGroupLimit: mappers pre-prune to local top-k") {
    val plan = finalPlan(Curation.qSelectBest(spark, sf))
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=k filter must push a per-mapper group limit below the shuffle:\n$plan")
  }

  test("fuzzy match: levenshtein stays in its bounded (banded-DP) form") {
    val plan = Linkage.qFuzzyMatch(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("levenshtein") && plan.contains("Some(2)"),
      s"expected threshold levenshtein(…, Some(2)) in the plan:\n$plan")
  }

  test("weighted sample plans TakeOrderedAndProject, not a global sort") {
    val plan = Curation.qWeightedSample(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"k-lowest-priority must be a per-mapper top-k merge:\n$plan")
  }

  test("oov rate: the vocabulary side broadcasts into the coverage join") {
    val plan = finalPlan(TextAnalysis.qOovRate(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"top-k vocab must broadcast, never shuffle the token stream:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"vocab top-k must be TakeOrderedAndProject:\n$plan")
  }

  test("embedding quantization is narrow: no exchange before the final sort") {
    val plan = Similarity.qEmbeddingQuantize(spark, sf)
      .queryExecution.executedPlan.toString
    // exactly the presentation sort's rangepartitioning exchange — no
    // hashpartitioning anywhere (the operator itself is shuffle-free)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"quantization must not shuffle:\n$plan")
  }

  test("substring dedup: no cartesian product, join keyed on the window hash") {
    val plan = finalPlan(Dedup.qDedupSubstring(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"substring dedup must never be all-pairs:\n$plan")
  }

  test("span rewrite moves interval lists, not exploded positions: no " +
    "sequence explode, exactly one generator (the window pass)") {
    val plan = finalPlan(Dedup.qDedupSpanRewrite(spark, sf))
    assert(!plan.contains("sequence("),
      s"covered positions must fold to intervals, not a K-wide sequence " +
        s"explode:\n$plan")
    // the shingle-window posexplode sits behind the wins Materialize.stage
    // boundary: it executes ONCE into the cache, and the plan STRING now
    // displays it inside the InMemoryRelation subtree (localCheckpoint
    // used to truncate the display entirely). Count generators only
    // ABOVE cache boundaries — anything more than one there means a
    // token or position re-explode crept back into the live plan
    val generators = "(?i)generate ".r.findAllIn(aboveCaches(plan)).length
    assert(generators <= 1,
      s"only the shingle-window posexplode may generate rows (found " +
        s"$generators) — a token re-explode reintroduces the O(tokens) " +
        s"shuffle:\n$plan")
  }

  test("interval overlap joins on (key, bucket), never a nested loop") {
    val plan = finalPlan(Events.qIntervalOverlap(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"interval overlap must stay an equi-join on (key, bucket):\n$plan")
  }

  test("bloom semi join: probe filter runs below the shuffle, join is semi") {
    val plan = finalPlan(Relational.qBloomSemiJoin(spark, sf))
    assert(plan.contains("LeftSemi"), s"expected a semi join:\n$plan")
    // the might_contain predicate (xxhash64 bit probes) must sit in the
    // probe SCAN stage: walking the printed tree downward from the filter,
    // the parquet scan must appear before any further shuffle — an
    // intervening Exchange would mean the filter ran above the shuffle,
    // after the rows already paid network cost
    val probeFilter = plan.indexOf("xxhash64")
    assert(probeFilter >= 0, s"bloom probe predicate missing:\n$plan")
    val scanBelow = plan.indexOf("FileScan parquet", probeFilter)
    val exchangeBelow = plan.indexOf("Exchange hashpartitioning", probeFilter)
    assert(scanBelow >= 0 &&
      (exchangeBelow == -1 || scanBelow < exchangeBelow),
      s"bloom filter must be in the scan stage, not above a shuffle:\n$plan")
  }

  test("equi-depth bins: distributed range sort + broadcast offsets, " +
    "no single-partition window over the data") {
    // the final query's executed plan hides the rank's sort behind the
    // checkpoint, so assert the sort stage's own plan: a range-partitioned
    // exchange (parallel total sort), NOT a single-partition window
    val cents = (col("o_totalprice").cast(Tables.Money) * 100).cast("long")
    val base = Tables.orders(spark, sf)
      .select(col("o_orderkey"), cents.as("cents"))
    val sortStage = graft.operators.GlobalRank
      .sortedWithId(base, Seq(col("cents"), col("o_orderkey")))
      .queryExecution.executedPlan.toString
    assert(sortStage.contains("Exchange rangepartitioning"),
      s"global rank must range-partition the sort:\n$sortStage")
    assert(!sortStage.contains("Window"),
      s"the rank sort stage must not window the data:\n$sortStage")
    val plan = finalPlan(Layout.qEquidepthBins(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"partition offsets must broadcast back:\n$plan")
  }

  test("ALL gated queries: no cartesian product, every non-equi join has a " +
    "provably bounded side, every window partitioned — NO allowlist") {
    import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo}
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Window => LWindow}
    // A non-equi join or unpartitioned window is a scale killer only when
    // its input is UNBOUNDED. The optimizer's own `maxRows` is the proof
    // of boundedness (Limit and grouping-free Aggregate yield Some(n)):
    // a scalar-stats crossJoin or a window over a top-k list is the
    // standard broadcast pattern, not a defect. Metadata frames whose
    // bound Catalyst can't see (grouped-by-partition-id aggregates) carry
    // GlobalRank.metaPartitionKey instead, precisely so this sweep can
    // stay unconditional. localCheckpoint boundaries hide their upstream
    // stage from this sweep — those stages have dedicated tests above.
    //
    // Round 5: the former bnljAllowed set (ANN query vectors / IVF pivots /
    // k-means centroids) is GONE — those sides are now bounded by
    // construction (capped filter + no-op limit, see Similarity.isQuery),
    // so Catalyst itself proves every broadcast side is O(1) in the
    // corpus. A regression that re-broadcasts a corpus-derived frame in
    // ANY gated query fails this sweep.
    val Bounded = 10000L
    def bounded(p: LogicalPlan): Boolean = p.maxRows.exists(_ <= Bounded)
    val offenders = scala.collection.mutable.ListBuffer[String]()
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      val df = fn(spark, sf)
      if (df.queryExecution.executedPlan.toString.contains("CartesianProduct"))
        offenders += s"$name: CartesianProduct"
      df.queryExecution.optimizedPlan.foreach {
        case j: Join =>
          // EqualNullSafe: intersect/except decorrelate to <=> semi/anti
          val equi = j.condition.exists(_.collectFirst {
            case _: EqualTo => (); case _: EqualNullSafe => () }.nonEmpty)
          if (!equi && !bounded(j.left) && !bounded(j.right))
            offenders += s"$name: non-equi join with no bounded side"
        case w: LWindow
            if w.partitionSpec.isEmpty && !bounded(w.child) =>
          offenders += s"$name: unpartitioned window over unbounded input"
        case _ =>
      }
    }
    assert(offenders.isEmpty,
      s"scale-killer plan shapes in gated queries:\n${offenders.mkString("\n")}")
  }

  test("AQE splits a skewed join partition at runtime (hot-key immunity)") {
    // At 100 TB a hot join key concentrates a partition onto one task; the
    // engine's answer is AQE's runtime skew split (plus explicit salting
    // for aggregations — q_skew_salted). Local sizes sit under the
    // production thresholds, so the test lowers them to prove the
    // rewrite fires; a real deployment keeps the defaults.
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // hot key 0 carries 100k rows; 100 cold keys carry 100 each
      val left = spark.range(100000)
        .select(lit(0L).as("k"), col("id").as("v"))
        .unionAll(spark.range(10000)
          .select((col("id") % 100 + 1).as("k"), col("id").as("v")))
      val right = spark.range(101).select(col("id").as("k"), col("id").as("w"))
      val j = left.join(right, "k")
      // collect() (not count(), which plans its own QueryExecution) so
      // AQE finalizes on THIS frame's plan
      assert(j.collect().length == 110000)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"AQE must split the hot partition (no skew marker in plan):\n$plan")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("z-order curve is narrow: no hash exchange anywhere") {
    val plan = Layout.qZorderCurve(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"the Morton interleave must be scan-speed narrow:\n$plan")
  }
}
