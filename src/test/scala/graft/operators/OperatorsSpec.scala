package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {

  test("SkewJoin.salted is result-identical to the plain join") {
    import spark.implicits._
    // skewed left: key 1 carries 80% of rows
    val left = ((1 to 800).map(i => (1L, s"l$i")) ++
      (1 to 200).map(i => (i.toLong % 50 + 2, s"x$i"))).toDF("k", "lv")
    val right = (1L to 60L).map(k => (k, s"r$k")).toDF("k2", "rv")
    val plain = left.join(right, col("k") === col("k2"))
      .select("k", "lv", "rv").collect().map(_.toSeq).toSet
    val salted = SkewJoin.salted(left, right, "k", "k2", factor = 8)
      .select("k", "lv", "rv").collect().map(_.toSeq).toSet
    assert(salted == plain && plain.nonEmpty)
  }

  test("AsOfJoin.lastBefore matches strictly-before semantics incl. ties") {
    import spark.implicits._
    val trades = Seq(
      (1L, 100L, "t1"), (1L, 200L, "t2"), (1L, 50L, "t0"), (2L, 100L, "t3"))
      .toDF("k", "ts", "trade")
    val quotes = Seq(
      (1L, 90L, 10, 1L), (1L, 100L, 11, 2L), (1L, 150L, 12, 3L), (3L, 1L, 99, 4L))
      .toDF("k", "ts", "px", "qid")
    val out = AsOfJoin.lastBefore(
      trades, quotes, "k", "ts", "ts", Seq("px"), Some("qid"))
      .collect().map(r => r.getString(2) -> (if (r.isNullAt(3)) -1 else r.getInt(3))).toMap
    assert(out == Map(
      "t0" -> -1, // no quote before 50
      "t1" -> 10, // quote@90 (quote@100 is simultaneous → excluded)
      "t2" -> 12, // quote@150
      "t3" -> -1)) // key 2 has no quotes
  }

  test("AsOfJoin matches the Events query formulation on real data") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val viaOperator = AsOfJoin.lastBefore(
      purchases, clicks, "user_id", "ts", "ts", Seq("click_id"), Some("click_id"))
      .select(col("event_id"), col("asof_click_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val viaQuery = graft.queries.Events.qEventsAsof(spark, "/root/testdata/sf0.001")
      .select(col("purchase_id"), col("prev_click_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(viaOperator == viaQuery && viaQuery.nonEmpty)
  }

  test("RangeJoin.pointInInterval matches naive range join incl. bucket edges") {
    import spark.implicits._
    // intervals spanning 1..4 buckets (bucket=10), incl. bucket-aligned
    // bounds; points on every boundary
    val intervals = Seq(
      (1L, 101L, 5L, 14L),   // spans buckets 0-1
      (1L, 102L, 10L, 10L),  // empty under [start, end), single point under []
      (1L, 103L, 0L, 39L),   // spans 4 buckets
      (2L, 201L, 7L, 8L),    // within one bucket
      (3L, 301L, 20L, 29L)   // key with no points
    ).toDF("k", "iv_id", "st", "en")
    val points = Seq(
      (1L, 11L, 5L), (1L, 12L, 10L), (1L, 13L, 14L), (1L, 14L, 39L),
      (2L, 21L, 7L), (2L, 22L, 9L), (9L, 91L, 5L)
    ).toDF("k", "pt_id", "t")
    def naive(endInclusive: Boolean) = {
      val upper = if (endInclusive) col("t") <= col("en") else col("t") < col("en")
      points.join(intervals, Seq("k"))
        .filter(col("t") >= col("st") && upper)
        .select("iv_id", "pt_id").collect().map(_.toSeq).toSet
    }
    for (inc <- Seq(false, true)) {
      val got = RangeJoin.pointInInterval(points, intervals, "k",
          "t", "st", "en", bucket = 10L, endInclusive = inc)
        .select("iv_id", "pt_id").collect().map(_.toSeq).toSet
      assert(got == naive(inc) && got.nonEmpty, s"endInclusive=$inc")
    }
  }

  test("AsOfJoin: null-keyed/null-timed right rows match nothing; " +
    "non-numeric tiebreak rejected") {
    import spark.implicits._
    val left = Seq((1L, 10L), (2L, 10L)).toDF("k", "t")
      .withColumn("k", when(col("k") === 2L, lit(null).cast("long"))
        .otherwise(col("k")))
    // right: a null-time row on key 1 (sorts FIRST under asc — would be
    // carried into every frame unfiltered) and a null-key early row
    val right = Seq(
      (Some(1L), Some(5L), "real"),
      (Some(1L), None, "null-time"),
      (None, Some(1L), "null-key")
    ).map { case (k, t, v) => (k, t, v) }.toDF("k", "t", "v")
    val out = AsOfJoin.lastBefore(left, right, "k", "t", "t", Seq("v"))
      .orderBy(col("k")).collect()
    // null-keyed LEFT row: no match (join semantics), not the null-key
    // right row that shares its window partition
    assert(out(0).isNullAt(0) && out(0).isNullAt(2), out(0).toString)
    // key 1 matches the real t=5 row, never the null-time row
    assert(out(1).getAs[String]("asof_v") == "real")
    val err = intercept[IllegalArgumentException] {
      AsOfJoin.lastBefore(left, right, "k", "t", "t", Seq("v"),
        rightTiebreak = Some("v"))
    }
    assert(err.getMessage.contains("must be an integral type"))
  }

  test("prefix sum with null values matches the global null-skipping " +
      "window regardless of partition placement") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // nulls at the head, middle, and straddling partition boundaries
    val vs: Seq[java.lang.Long] =
      Seq(null, null, 5L, null, 3L, null, null, 2L, null, 1L)
    val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val reference = df
      .withColumn("cum", sum(col("v")).over(Window.orderBy(col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cum").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    for (parts <- Seq(2, 3, 7)) {
      val got = graft.operators.GlobalRank
        .withPrefixSum(df.repartition(parts), Seq(col("id")), "v", "cum")
        .select("id", "cum").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      assert(got == reference, s"parts=$parts: $got vs $reference")
    }
  }

  test("AsOfJoin: fractional tiebreak types rejected (cast truncation " +
      "would collapse distinct values)") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 5L, 0.9)).toDF("k", "t", "score")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.lastBefore(left, right, "k", "t", "t", Seq("score"),
        rightTiebreak = Some("score"))
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
  }

  test("AsOfJoin: decimal tiebreaks accepted up to precision 18, rejected " +
      "wider (long-cast overflow would null-sentinel distinct values into ties)") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
    def right(p: Int) = Seq((1L, 5L, BigDecimal(7))).toDF("k", "t", "seq")
      .withColumn("seq", col("seq").cast(
        org.apache.spark.sql.types.DecimalType(p, 0)))
    // p=18 fits Long: accepted and used
    val ok = AsOfJoin.lastBefore(left, right(18), "k", "t", "t", Seq("seq"),
      rightTiebreak = Some("seq")).collect()
    assert(ok.length == 1 &&
      ok(0).getDecimal(ok(0).fieldIndex("asof_seq")).longValue == 7L)
    // p=38 can exceed Long.MaxValue: must be rejected up front
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.lastBefore(left, right(38), "k", "t", "t", Seq("seq"),
        rightTiebreak = Some("seq"))
    }
    assert(e.getMessage.contains("precision 18"), e.getMessage)
  }

  test("SkewJoin: default salt basis skips unhashable map columns") {
    import spark.implicits._
    val left = Seq((1L, "a", Map("x" -> "y")), (1L, "b", Map("p" -> "q")))
      .toDF("k", "payload", "attrs")
    val right = Seq((1L, "r1")).toDF("rk", "rv")
    // with a map column present, the default basis must still work...
    val out = SkewJoin.salted(left, right, "k", "rk", 4)
    assert(out.count() == 2)
    // ...and salts must differ across the two distinct payload rows in
    // at least one factor assignment (content-derived, not constant)
    val onlyMap = Seq((1L, Map("x" -> "y"))).toDF("k", "attrs")
    val e = intercept[IllegalArgumentException] {
      SkewJoin.salted(onlyMap, right, "k", "rk", 4)
    }
    assert(e.getMessage.contains("saltSource"), e.getMessage)
  }

  test("BloomFilterJoin: mismatched key types and degenerate params rejected") {
    import spark.implicits._
    val ints = Seq(5, 6).toDF("k")
    val longs = Seq(5L, 7L).toDF("k2")
    // int vs bigint would hash differently under xxhash64 → silent false
    // negatives; the operator must refuse instead
    val err = intercept[IllegalArgumentException] {
      BloomFilterJoin.semiJoin(longs, ints, "k2", "k")
    }
    assert(err.getMessage.contains("key types must match"))
    assert(intercept[IllegalArgumentException] {
      BloomFilterJoin.buildBits(longs, "k2", numBits = 32, numHashes = 5)
    }.getMessage.contains(">= 64"))
    assert(intercept[IllegalArgumentException] {
      BloomFilterJoin.buildBits(longs, "k2", numBits = 64, numHashes = 0)
    }.getMessage.contains(">= 1"))
  }

  test("RangeJoin: inverted interval raises; null endpoints match nothing") {
    import spark.implicits._
    val pts = Seq((1L, 11L, 5L)).toDF("k", "pt_id", "t")
    val badIv = Seq((1L, 101L, 20L, 10L)).toDF("k", "iv_id", "st", "en")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(pts, badIv, "k", "t", "st", "en", 10L)
        .collect()
    }
    assert(e.getMessage.contains("invalid interval"), e.getMessage)
    val nullIv = Seq((1L, 102L, Some(1L), Option.empty[Long]))
      .toDF("k", "iv_id", "st", "en")
    assert(RangeJoin.pointInInterval(pts, nullIv, "k", "t", "st", "en", 10L)
      .count() == 0)
  }

  test("sideState reduction: max-lsn wins, delete wins, empty-op loses " +
      "equal-lsn ties, null payloads survive — and the plan is a " +
      "partial-aggregating max_by, not a window sort") {
    import graft.cdc.IncrementalJoinView
    import spark.implicits._
    val deltas = Seq(
      // k=1: plain supersede — lsn 2 wins, payload may be null
      (1, "r", 1L, Some("a")), (1, "u", 2L, None),
      // k=2: delete at the max lsn removes the key
      (2, "r", 1L, Some("b")), (2, "d", 5L, None),
      // k=3: the empty-op re-tag (carried state) loses an EQUAL-lsn tie
      // to a real delta op — the refreshTouched supersede rule
      (3, "", 7L, Some("stale")), (3, "u", 7L, Some("fresh")),
      // k=4: delete at a LOWER lsn than a later re-insert — key lives
      (4, "d", 1L, None), (4, "r", 2L, Some("back")))
      .toDF("id", "op", "lsn", "payload")
    val out = IncrementalJoinView.sideState(deltas, "id")
    assert(out.columns.toSeq == Seq("id", "lsn", "payload"))
    val rows = out.collect()
      .map(r => r.getInt(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2)))).toMap
    assert(rows == Map(1 -> ((2L, null)), 3 -> ((7L, "fresh")),
      4 -> ((2L, "back"))))
    // plan witness: the argmax must be an aggregate (map-side partials —
    // the shuffle carries keys, not the delta stream), with no window
    // sort anywhere
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("max_by") || plan.contains("MaxBy"), plan)
  }

  test("sideState preserves the input column order even when the key is " +
      "not the leading column (round-13 advisory: the schema contract " +
      "must not depend on key-first call sites)") {
    import graft.cdc.IncrementalJoinView
    import spark.implicits._
    val deltas = Seq(("stale", "u", 3L, 1), ("x", "u", 4L, 1),
      ("y", "u", 1L, 2))
      .toDF("payload", "op", "lsn", "id") // key LAST on purpose
    val out = IncrementalJoinView.sideState(deltas, "id")
    assert(out.columns.toSeq == Seq("payload", "lsn", "id"))
    assert(out.orderBy(col("id")).collect().map(_.getString(0)).toSeq ==
      Seq("x", "y"))
  }
}
