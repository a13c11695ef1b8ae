package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** Physical-layout gates ([[Physical]], Events stream-stream join):
  * value-equality against the straight-over-base computation (the gates'
  * in-body `require`s already pin the PLAN witnesses — running them here
  * exercises those too), plus the discriminative control: the same join
  * WITHOUT the bucketed layout must show the exchanges the witness
  * forbids, proving the assertion can actually fail.
  */
class PhysicalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("bucketed co-located join: values match the plain join; the " +
    "unbucketed control pays the exchanges the witness forbids") {
    val got = Physical.qBucketedColocatedJoin(spark, sf)
    val want = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast(Tables.Money)).as("qty_sum"),
        sum(col("l_extendedprice").cast(Tables.Money)).as("price_sum"))
      .orderBy(col("o_orderpriority"))
    assert(canon(got) == canon(want))
    // control: same join over RAW parquet (no bucket layout) — the SMJ
    // must require shuffles, so the gate's zero-exchange witness is a
    // real claim about the layout, not about Spark defaults
    val raw = Tables.lineitem(spark, sf).hint("merge")
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    val plan = raw.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val smjs = plan.collect { case j: SortMergeJoinExec => j }
    assert(smjs.nonEmpty)
    assert(smjs.flatMap(_.collect { case e: ShuffleExchangeLike => e }).nonEmpty,
      "control: the unbucketed merge join should shuffle both sides")
  }

  test("bucket-pruned scan: the 1-of-N bucket read returns exactly the " +
    "key's rows") {
    val got = Physical.qBucketPrunedScan(spark, sf)
    val k = Tables.lineitem(spark, sf)
      .agg(max(col("l_orderkey"))).head.getLong(0)
    val want = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") === k)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy(col("l_linenumber"))
    assert(canon(got) == canon(want) && got.count() > 0)
  }

  test("partition-pruned scan: pruned-directory read equals the row-" +
    "filtered base") {
    val got = Physical.qPartitionPrunedScan(spark, sf)
    val want = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(Tables.Money)).as("total_sum"))
    assert(canon(got) == canon(want) && got.count() > 0)
  }

  test("dynamic partition pruning: the dim-filtered join over the " +
    "partitioned fact equals the base join") {
    val got = Physical.qDppJoin(spark, sf)
    val want = Tables.customer(spark, sf)
      .join(Tables.nation(spark, sf).filter(col("n_regionkey") === 2),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        sum(col("c_acctbal").cast(Tables.Money)).as("bal_sum"))
    assert(canon(got) == canon(want) && got.count() > 0)
  }

  test("stream-stream LEFT OUTER join: watermark-evicted null emission " +
    "makes the sink equal the batch left join") {
    val got = Events.qStreamStreamOuterJoin(spark, sf)
    val ev = Tables.events(spark, sf)
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("c_ts"),
        col("user_id").as("c_user"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"),
        col("user_id").as("p_user"))
    val want = c.join(p,
        col("c_user") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 2 HOURS"),
        "left_outer")
      .groupBy(col("c_user"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("purchase_id")).as("n_matched"),
        coalesce(sum(col("purchase_id")), lit(0L)).as("pid_sum"),
        coalesce(sum(unix_micros(col("p_ts")) - unix_micros(col("c_ts"))),
          lit(0L)).as("latency_us_sum"))
      .select(col("c_user").as("user_id"), col("n_rows"), col("n_matched"),
        col("pid_sum"), col("latency_us_sum"))
    assert(canon(got) == canon(want))
    // the outer path must actually exercise null emission: some clicks
    // have no purchase in-window at this sf
    assert(got.filter(col("n_matched") < col("n_rows")).count() > 0)
  }

  test("streaming sessionization: watermarked session_window over four " +
    "micro-batches equals the batch session_window") {
    val got = Events.qStreamSession(spark, sf)
    val want = Events.qEventsSession(spark, sf)
    assert(canon(got) == canon(want) && got.count() > 0)
    // sessions must straddle micro-batches for the merge path to be
    // exercised: more sessions than micro-batches guarantees state
    // carried across at least one batch boundary at this gap/sf
    assert(got.count() > 4)
  }

  test("lateral top-k: the decorrelated LATERAL LIMIT equals the window " +
    "formulation") {
    val got = Relational.qLateralTopk(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("cents").desc, col("o_orderkey"))
    val want = Tables.orders(spark, sf)
      .withColumn("cents",
        (col("o_totalprice").cast(Tables.Money) * 100).cast("long"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_mktsegment"), col("o_orderkey"),
        col("cents"))
    assert(canon(got) == canon(want) && got.count() > 0)
  }

  test("late-data dead-letter: streamed classification equals the " +
    "closed-form watermark replay, every late row is a straggler, and " +
    "the accounting reconciles") {
    val got = Events.qStreamLateDeadletter(spark, sf)
    // closed-form twin: replay the slice rule, per-batch max, lateness
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), unix_millis(col("ts")).as("ms"),
        col("user_id"), col("value"))
    val b = ev.agg(min(col("ms")).as("lo"), max(col("ms")).as("hi")).head()
    val (lo, step) = (b.getLong(0), (b.getLong(1) - b.getLong(0)) / 3 + 1)
    val ar = ev
      .withColumn("slice", ((col("ms") - lo) / step).cast("int"))
      .withColumn("arrival",
        when(col("slice") === 0 &&
          col("event_id") % Events.StragglerMod === 0, 2)
          .otherwise(col("slice")))
    val m = ar.agg(
      max(when(col("arrival") === 0, col("ms"))).as("m0"),
      max(when(col("arrival") <= 1, col("ms"))).as("m01")).head()
    val (m0, m01) = (m.getLong(0), m.getLong(1))
    val cls = ar.withColumn("is_late",
      when(col("arrival") === 1, col("ms") < m0 - Events.LateDelayMs)
        .when(col("arrival") === 2, col("ms") < m01 - Events.LateDelayMs)
        .otherwise(lit(false)))
    val want = cls.groupBy(col("user_id"))
      .agg(count(when(!col("is_late"), 1)).as("n_ontime"),
        sum(when(!col("is_late"), col("value").cast(Tables.Money))
          .otherwise(lit(0).cast(Tables.Money))).as("ontime_val_sum"),
        count(when(col("is_late"), 1)).as("n_late"),
        sum(when(col("is_late"), col("event_id")).otherwise(0L))
          .as("late_id_sum"))
    assert(canon(got) == canon(want))
    // invariants: late rows exist, and each is a tertile-0 straggler
    val lateTwin = cls.filter(col("is_late"))
    assert(lateTwin.count() > 0)
    assert(lateTwin.filter(col("slice") =!= 0 ||
      col("event_id") % Events.StragglerMod =!= 0).count() == 0)
    // accounting: on-time + late = corpus
    val sums = got.agg(sum(col("n_ontime")) + sum(col("n_late"))).head()
    assert(sums.getLong(0) == Tables.events(spark, sf).count())
  }

  test("transformWithState running top-k: the final per-user emission " +
    "equals the whole-corpus aggregate, across a checkpoint restart") {
    val got = Events.qStreamTwsTopk(spark, sf)
    val cents = (col("value").cast(Tables.Money) * 100).cast("long")
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), cents.as("cents"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("cents").desc, col("event_id"))
    // collect_list order is shuffle-dependent: sort the collected
    // structs by (cents desc, id asc) explicitly before joining
    val top3 = ev.withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= 3)
      .groupBy(col("user_id"))
      .agg(array_join(transform(sort_array(collect_list(
        struct((col("cents") * -1).as("nc"), col("event_id").as("id"),
          concat(col("cents"), lit(":"), col("event_id")).as("s")))),
        x => x.getField("s")), ",").as("top3"))
    val want = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("cents_sum"))
      .join(top3, Seq("user_id"))
      .select(col("user_id"), col("n_events"), col("cents_sum"), col("top3"))
    assert(canon(got) == canon(want) && got.count() > 0)
    // restart witness: n_events must total the corpus — a re-bootstrap
    // on the restarted run would reset returning users' counts
    assert(got.agg(sum(col("n_events"))).head.getLong(0) ==
      Tables.events(spark, sf).count())
  }

  test("transformWithState sessionization: the timer-driven processor " +
    "equals the built-in session_window, across a checkpoint restart") {
    val got = Events.qStreamTwsSession(spark, sf)
    // the strongest twin available: the BUILT-IN operator's batch form
    // (same gap, same output shape) — two independent formulations of
    // the same semantics must agree row-for-row (the twin's decimal sum
    // cast to double, the driver presentation both gates go through)
    val want = Events.qEventsSession(spark, sf)
      .withColumn("sum_value", col("sum_value").cast("double"))
    assert(canon(got) == canon(want) && got.count() > 0)
    // timers must have emitted the final (never-followed) session of
    // every user: total events across sessions = corpus
    assert(got.agg(sum(col("n_events"))).head.getLong(0) ==
      Tables.events(spark, sf).count())
  }

  test("stream-stream join: three-batch-per-side streamed attribution " +
    "equals the batch join rollup") {
    val got = Events.qStreamStreamJoin(spark, sf)
    val ev = Tables.events(spark, sf)
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("c_ts"),
        col("user_id").as("c_user"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"),
        col("user_id").as("p_user"), col("value"))
    val want = c.join(p,
        col("c_user") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 2 HOURS"))
      .groupBy(col("c_user"))
      .agg(count(lit(1)).as("n_attr"),
        sum(col("purchase_id")).as("pid_sum"),
        sum(unix_micros(col("p_ts")) - unix_micros(col("c_ts")))
          .as("latency_us_sum"),
        sum(col("value").cast(Tables.Money)).as("value_sum"))
      .select(col("c_user").as("user_id"), col("n_attr"), col("pid_sum"),
        col("latency_us_sum"), col("value_sum"))
    assert(canon(got) == canon(want) && got.count() > 0)
  }
}
