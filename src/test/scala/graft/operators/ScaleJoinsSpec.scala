package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the round-3 scale operators: distributed exact global rank,
  * interval-overlap join, and the Bloom-filter semi-join prefilter, plus
  * the Z-order curve and equi-depth bucket invariants. Each is checked
  * against a plain-Scala naive recompute on synthetic data (the gate
  * queries check the real-data DuckDB twin).
  */
class ScaleJoinsSpec extends SparkSpec {

  import spark.implicits._

  test("global rank: matches sorted order across many partitions") {
    // values with heavy ties so the tiebreaker matters
    val rows = (1 to 5000).map(i => ((i * 7919) % 100, i.toLong))
    val df = rows.toDF("v", "id").repartition(16)
    val ranked = GlobalRank
      .withRank(df, Seq(col("v"), col("id")), "rank", "n")
      .collect()
    assert(ranked.forall(_.getAs[Long]("n") == 5000L))
    val expected = rows.sorted.zipWithIndex
      .map { case ((v, id), i) => (v, id) -> (i + 1L) }.toMap
    ranked.foreach { r =>
      val key = (r.getAs[Int]("v"), r.getAs[Long]("id"))
      assert(r.getAs[Long]("rank") == expected(key), s"rank of $key")
    }
  }

  test("interval overlap: naive recompute, each pair exactly once") {
    // per-key intervals spanning multiple buckets, some nested, some
    // disjoint, some touching exactly at an endpoint (closed: overlaps)
    val as = Seq((1L, 0L, 25L, "a1"), (1L, 30L, 31L, "a2"),
      (2L, 5L, 5L, "a3"), (2L, 100L, 120L, "a4"))
      .toDF("k", "a_start", "a_end", "a_id")
    val bs = Seq((1L, 10L, 12L, "b1"), (1L, 25L, 40L, "b2"),
      (2L, 0L, 5L, "b3"), (2L, 121L, 130L, "b4"), (3L, 0L, 9L, "b5"))
      .toDF("k", "b_start", "b_end", "b_id")
    val got = IntervalJoin
      .overlap(as, bs, "k", "a_start", "a_end", "b_start", "b_end", bucket = 7L)
      .select("a_id", "b_id").as[(String, String)].collect().sorted
    val naive = for {
      (ak, s1, e1, aid) <- Seq((1L, 0L, 25L, "a1"), (1L, 30L, 31L, "a2"),
        (2L, 5L, 5L, "a3"), (2L, 100L, 120L, "a4"))
      (bk, s2, e2, bid) <- Seq((1L, 10L, 12L, "b1"), (1L, 25L, 40L, "b2"),
        (2L, 0L, 5L, "b3"), (2L, 121L, 130L, "b4"), (3L, 0L, 9L, "b5"))
      if ak == bk && s1 <= e2 && s2 <= e1
    } yield (aid, bid)
    assert(got.toSeq == naive.sorted, s"got ${got.toSeq} vs ${naive.sorted}")
    // exactly-once even though a1×b1 share buckets {0,1} and a1×b2 overlap
    // across the bucket-3 boundary
    assert(got.length == got.distinct.length)
  }

  test("bloom filter: no false negatives; fp rate bounded; semi join exact") {
    val build = (1L to 2000L).map(_ * 3).toDF("bk")
    val bits = BloomFilterJoin.buildBits(build, "bk", 1 << 16, 5)
    // every inserted key passes
    val misses = build
      .filter(!BloomFilterJoin.mightContain(col("bk"), bits, 5)).count()
    assert(misses == 0, "bloom false negative")
    // disjoint probe keys: fp rate ≈ (1-e^(-5*2000/65536))^5 ≈ 5e-5
    val fps = (1L to 20000L).map(_ * 3 + 1).toDF("pk")
      .filter(BloomFilterJoin.mightContain(col("pk"), bits, 5)).count()
    assert(fps <= 20, s"bloom fp count $fps out of 20000")
    // prefiltered semi join ≡ plain semi join
    val probe = (1L to 9000L).toDF("pk")
    val got = BloomFilterJoin.semiJoin(probe, build, "pk", "bk")
      .as[Long].collect().sorted
    assert(got.toSeq == (1L to 6000L).filter(_ % 3 == 0))
    // identical key name on both sides must not be ambiguous (the common
    // semi-join shape — probe column is bound to the filtered frame)
    val sameName = BloomFilterJoin
      .semiJoin((1L to 100L).toDF("k"), (1L to 30L).map(_ * 2).toDF("k"), "k", "k")
      .as[Long].collect().sorted
    assert(sameName.toSeq == (2L to 60L by 2))
  }

  test("interval join: inverted interval raises a named error; zero-length ok") {
    import org.apache.spark.sql.AnalysisException
    val ok = Seq((1L, 5L, 5L, "p")).toDF("k", "a_start", "a_end", "a_id")
    val bs = Seq((1L, 0L, 9L, "q")).toDF("k", "b_start", "b_end", "b_id")
    assert(IntervalJoin.overlap(ok, bs, "k", "a_start", "a_end",
      "b_start", "b_end", bucket = 7L).count() == 1)
    val inverted = Seq((1L, 9L, 2L, "bad")).toDF("k", "a_start", "a_end", "a_id")
    val e = intercept[Exception] {
      IntervalJoin.overlap(inverted, bs, "k", "a_start", "a_end",
        "b_start", "b_end", bucket = 7L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("IntervalJoin: invalid interval")),
      s"expected the named precondition error, got: $e")
  }

  test("z-order curve: Scala bit-interleave recompute; range intact") {
    def zref(x: Long, y: Long): Long =
      (0 until graft.queries.Layout.ZBits).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    val pts = for (x <- 0L to 40L by 7; y <- 0L to 65535L by 4099)
      yield (x, y)
    val got = pts.toDF("x", "y")
      .withColumn("z", graft.queries.Layout.zvalue(col("x"), col("y")))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == zref(x, y), s"z($x,$y)") }
    // interleave of 16+16 bits stays within 32 bits and is injective
    assert(got.forall(_._3 < (1L << 32)))
    assert(got.map(_._3).distinct.length == pts.length)
  }

  test("winsorize: clip bounds and sums match a plain-Scala recompute") {
    val rows = graft.Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_orderpriority"),
        (col("o_totalprice").cast(graft.Tables.Money) * 100).cast("long")
          .as("cents"))
      .as[(Long, String, Long)].collect()
    val sorted = rows.map { case (k, _, c) => (c, k) }.sorted
    val n = sorted.length
    val lo = sorted((n + 99) / 100 - 1)._1
    val hi = sorted((99 * n + 99) / 100 - 1)._1
    val expected = rows.groupBy(_._2).map { case (p, rs) =>
      p -> (rs.length.toLong,
        rs.map { case (_, _, c) => math.min(math.max(c, lo), hi) }.sum,
        rs.count(_._3 < lo).toLong, rs.count(_._3 > hi).toLong)
    }
    val got = graft.queries.Layout.qWinsorize(spark, "/root/testdata/sf0.001")
      .collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val p = r.getAs[String]("o_orderpriority")
      assert((r.getAs[Long]("n_orders"), r.getAs[Long]("sum_winsorized_cents"),
        r.getAs[Long]("n_clipped_low"), r.getAs[Long]("n_clipped_high"))
        == expected(p), s"priority $p")
    }
    // the clip actually fired somewhere (1% tails are non-empty at n>=100)
    assert(got.map(_.getAs[Long]("n_clipped_low")).sum > 0)
    assert(got.map(_.getAs[Long]("n_clipped_high")).sum > 0)
  }

  test("z-order layout: range-partitioning by zval bounds BOTH dims; " +
    "single-column sort scatters the other") {
    // uniform 64×64 grid → 16 range partitions. Quality metric: average
    // per-partition bounding-box area (what min/max pruning sees).
    val pts = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
    val df = pts.toDF("x", "y")
      .withColumn("z", graft.queries.Layout.zvalue(col("x"), col("y")))
    // per-partition span of each dimension under a given layout key —
    // what parquet min/max pruning would see per file
    def spans(sortCol: String): Array[(Long, Long)] =
      df.repartitionByRange(16, col(sortCol))
        .select(col("x"), col("y"), spark_partition_id().as("p"))
        .groupBy(col("p"))
        .agg((max(col("x")) - min(col("x"))).as("dx"),
          (max(col("y")) - min(col("y"))).as("dy"))
        .select(col("dx"), col("dy")).as[(Long, Long)].collect()
    // x-sort: x is perfectly clustered but EVERY partition spans all of y
    // — a filter on y prunes nothing
    val byX = spans("x")
    assert(byX.forall(_._2 == 63L),
      s"x-sort must scatter y across the full axis: ${byX.mkString(",")}")
    // z-sort: every partition stays inside one 16×16 quadrant — both
    // dimensions bounded, so min/max pruning works on either
    val byZ = spans("z")
    assert(byZ.forall { case (dx, dy) => dx <= 31 && dy <= 31 },
      s"z partitions must stay within a quadrant: ${byZ.mkString(",")}")
  }

  test("equi-depth bins: every bucket within one row of n/k") {
    val rows = graft.queries.Layout
      .qEquidepthBins(spark, "/root/testdata/sf0.001").collect()
    val k = graft.queries.Layout.EquidepthK
    assert(rows.length == k)
    val n = rows.map(_.getAs[Long]("n_rows")).sum
    rows.foreach { r =>
      val c = r.getAs[Long]("n_rows")
      assert(c == n / k || c == n / k + 1,
        s"bucket ${r.getAs[Long]("bucket")} has $c rows, n/k=${n / k}")
    }
    // buckets tile the value range in order without overlap
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("hi_cents") <= b.getAs[Long]("lo_cents"))
    }
  }
}
