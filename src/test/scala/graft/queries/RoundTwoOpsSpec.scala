package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant specs for the round-2 operators: repetition signals,
  * retention cohorts, histogram/CDF, and IVF ANN. The cell-exact values
  * are gated by the DuckDB oracle; these specs assert the algebraic
  * invariants the oracle can't express (recall floors, partition-of-corpus
  * properties, hand-computed single-document values).
  */
class RoundTwoOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("repetition: hand-computed doc matches; ratios bounded") {
    val rep = TextAnalysis.qRepetition(spark, sf).cache()
    val rows = rep.collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val dup = r.getAs[Long]("dup_token_x10000")
      val top = r.getAs[Long]("top_2gram_x10000")
      assert(dup >= 0 && dup <= 10000, s"dup ratio out of range: $r")
      assert(top >= 0 && top <= 10000, s"2-gram ratio out of range: $r")
      assert(r.getAs[Long]("top_2gram_n") >= 1) // every doc has ≥2 tokens
    }
    // recompute one document by hand
    val doc = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") === 7).select("text").head.getString(0)
    val toks = doc.split(" ").toSeq
    val grams = toks.sliding(2).map(_.mkString(" ")).toSeq
    val (bestGram, bestN) = grams.groupBy(identity).view.mapValues(_.size)
      .toSeq.minBy { case (g, n) => (-n, g) }
    val r7 = rows.find(_.getAs[Long]("doc_id") == 7).get
    assert(r7.getAs[Int]("n_tokens") == toks.size)
    assert(r7.getAs[Long]("dup_token_x10000") ==
      (toks.size - toks.distinct.size).toLong * 10000 / toks.size)
    assert(r7.getAs[String]("top_2gram") == bestGram)
    assert(r7.getAs[Long]("top_2gram_n") == bestN.toLong)
    rep.unpersist()
  }

  test("retention cohorts: week-0 is full retention and covers every user") {
    val ret = Events.qRetentionCohorts(spark, sf).cache()
    val week0 = ret.filter(col("week_offset") === 0)
    assert(week0.filter(col("retention_x10000") =!= 10000).isEmpty,
      "week-0 retention must be exactly 10000 for every cohort")
    val cohortSum = week0.agg(sum("n_users")).head.getLong(0)
    val totalUsers = graft.Tables.events(spark, sf)
      .select(countDistinct("user_id")).head.getLong(0)
    assert(cohortSum == totalUsers,
      s"cohort week-0 sizes ($cohortSum) must partition all users ($totalUsers)")
    assert(ret.filter(col("n_users").isNull ||
      col("retention_x10000").isNull).isEmpty, "no null counts or rates")
    ret.unpersist()
  }

  test("histogram: counts partition the table, CDF ends at exactly 10000") {
    val hist = Profiling.qHistogramPrices(spark, sf).collect()
    val total = graft.Tables.lineitem(spark, sf).count()
    assert(hist.map(_.getAs[Long]("n")).sum == total)
    assert(hist.last.getAs[Long]("cdf_x10000") == 10000)
    val buckets = hist.map(_.getAs[Long]("bucket"))
    assert(buckets.sameElements(buckets.sorted), "buckets must be ascending")
    hist.foreach { r =>
      assert(r.getAs[Long]("hi") - r.getAs[Long]("lo") == 5000)
      assert(r.getAs[Long]("cum_n") >= r.getAs[Long]("n"))
    }
  }

  test("fuzzy match: banded distances, blocked equi-join plan") {
    val fm = Linkage.qFuzzyMatch(spark, sf)
    val rows = fm.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dist = r.getAs[Int]("edit_dist")
      assert(dist >= 1 && dist <= Linkage.MaxEdit)
      assert(r.getAs[Long]("part_a") < r.getAs[Long]("part_b"))
    }
    val plan = fm.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"fuzzy match must block via equi-join, not a cross product:\n$plan")
  }

  test("z-score outliers and exact median agree with a Scala recompute") {
    // recompute the alphabetically-first priority group exactly in Scala
    val byGroup = graft.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"),
        (col("o_totalprice").cast(graft.Tables.Money) * 100).cast("long").as("c"))
      .collect()
      .groupBy(_.getAs[String]("o_orderpriority"))
    val (grp, rows) = byGroup.toSeq.minBy(_._1)
    val xs = rows.map(r => (r.getAs[Long]("o_orderkey"), r.getAs[Long]("c")))
    val n = BigInt(xs.size)
    val s = xs.map(x => BigInt(x._2)).sum
    val q = xs.map(x => BigInt(x._2) * x._2).sum
    val expectedOutliers = xs.filter { case (_, c) =>
      val dev = n * c - s; 4 * dev * dev > 9 * (n * q - s * s)
    }.map(_._1).toSet
    val got = Profiling.qZscoreOutliers(spark, sf)
      .filter(col("o_orderpriority") === grp)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(got == expectedOutliers, s"group $grp: ${got.size} vs ${expectedOutliers.size}")

    val sortedXs = xs.sortBy { case (k, c) => (c, k) }
    val medianRow = sortedXs((xs.size + 1) / 2 - 1) // rank ceil(n/2), 1-based
    val gotMedian = Profiling.qExactMedian(spark, sf)
      .filter(col("o_orderpriority") === grp).head
    assert(gotMedian.getAs[Long]("median_cents") == medianRow._2)
    assert(gotMedian.getAs[Long]("median_orderkey") == medianRow._1)
  }

  test("pagerank: positive ranks, near-conserved mass, degree-monotone tendency") {
    val pr = Graph.qPagerank(spark, sf).collect()
    assert(pr.nonEmpty)
    val total = pr.map(_.getAs[Long]("rank_scaled")).sum
    // floors only ever LOSE mass: total ≤ Scale, and each node keeps at
    // least the teleport base, so the loss is bounded by n per division
    assert(total <= Graph.Scale)
    assert(total > Graph.Scale * 8 / 10, s"too much mass lost: $total")
    pr.foreach(r => assert(r.getAs[Long]("rank_scaled") > 0))
    // suppliers aggregate many customers: the max-degree node must
    // out-rank the min-degree node after 3 iterations
    val byDeg = pr.sortBy(_.getAs[Long]("deg"))
    assert(byDeg.last.getAs[Long]("rank_scaled") > byDeg.head.getAs[Long]("rank_scaled"))
  }

  test("grouping sets: exactly the three declared sets, no cross products") {
    val gs = Relational.qGroupingSets(spark, sf).collect()
    val statuses = gs.filter(_.getAs[String]("priority") == "__ALL__")
      .map(_.getAs[String]("status")).toSet
    val priorities = gs.filter(_.getAs[String]("status") == "__ALL__")
      .map(_.getAs[String]("priority")).toSet
    // every row belongs to set {(status)} or {(priority)} or {()} —
    // a cube would also emit (status, priority) pairs
    assert(gs.forall(r => r.getAs[String]("status") == "__ALL__" ||
      r.getAs[String]("priority") == "__ALL__"))
    assert(statuses.contains("__ALL__") && priorities.contains("__ALL__"))
    assert(gs.length == (statuses.size - 1) + (priorities.size - 1) + 1)
    // the grand total row counts every order once
    val grand = gs.find(r => r.getAs[String]("status") == "__ALL__" &&
      r.getAs[String]("priority") == "__ALL__").get
    assert(grand.getAs[Long]("n_orders") ==
      graft.Tables.orders(spark, sf).count())
  }

  test("gap fill: dense hourly spine, zero rows for gaps, mass preserved") {
    val gf = Events.qGapFill(spark, sf).cache()
    assert(gf.filter(col("n_events") === 0).count() > 0,
      "expected real gaps in the hourly series")
    val total = gf.agg(sum("n_events")).head.getLong(0)
    assert(total == graft.Tables.events(spark, sf).count())
    // spine is dense: per type, rows == hours between min and max inclusive
    gf.groupBy("event_type")
      .agg(count(lit(1)).as("rows"), min("hour").as("h0"), max("hour").as("h1"))
      .collect().foreach { r =>
        val hours = (r.getAs[java.sql.Timestamp]("h1").getTime -
          r.getAs[java.sql.Timestamp]("h0").getTime) / 3600000 + 1
        assert(r.getAs[Long]("rows") == hours, s"sparse spine: $r")
      }
    gf.unpersist()
  }

  test("full outer reconcile: statuses partition, counts consistent") {
    val fo = Relational.qFullOuterReconcile(spark, sf).collect()
    assert(fo.nonEmpty)
    fo.foreach { r =>
      val (n94, n95) = (r.getAs[Long]("n_1996"), r.getAs[Long]("n_1997"))
      val st = r.getAs[String]("status")
      assert((st == "new" && n94 == 0 && n95 > 0) ||
        (st == "churned" && n94 > 0 && n95 == 0) ||
        (st == "retained" && n94 > 0 && n95 > 0), s"bad row: $r")
    }
    assert(Set("new", "churned", "retained")
      .subsetOf(fo.map(_.getAs[String]("status")).toSet))
  }

  test("SCD2 history: intervals chain, at most one current version per key") {
    val hist = Cdc.qCdcScd2(spark, sf).collect()
      .groupBy(_.getAs[Int]("id"))
    assert(hist.nonEmpty)
    hist.foreach { case (id, vs) =>
      val sorted = vs.sortBy(_.getAs[Int]("version"))
      // intervals chain: each version's valid_to is the next's valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("valid_to_lsn") == b.getAs[Long]("valid_from_lsn"),
            s"broken chain for id $id")
        case _ =>
      }
      assert(sorted.last.getAs[Long]("valid_to_lsn") == -1L)
      val current = sorted.filter(_.getAs[Boolean]("is_current"))
      if (sorted.last.getAs[String]("op") == "d") assert(current.isEmpty)
      else {
        assert(current.length == 1)
        assert(current.head.getAs[Int]("version") == sorted.length)
      }
      // deleted keys (id % 7 == 0) end with the delete version
      if (id % 7 == 0) assert(sorted.last.getAs[String]("op") == "d")
    }
  }

  test("CMS top-k: estimates never undercount; error within the CMS bound") {
    val rows = Approx.qCmsTopk(spark, sf).collect()
    assert(rows.length == 10)
    val n = graft.Tables.lineitem(spark, sf).count()
    rows.foreach { r =>
      val est = r.getAs[Long]("cms_est")
      val exact = r.getAs[Long]("exact_cnt")
      assert(est >= exact, s"CMS must never undercount: $r")
      // standard bound: overcount ≤ 2N/W holds with prob 1-2^-R per key;
      // assert a loose 4N/W so the spec isn't flaky-by-construction
      assert(est - exact <= 4 * n / Approx.CmsWidth,
        s"overcount beyond CMS bound: $r (n=$n)")
    }
  }

  test("IVF ANN: recall floor vs brute force, per-query row cap") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.qAnnBruteforce(spark, sf))
    val ivfDf = Similarity.qAnnIvf(spark, sf)
    val ivf = pairs(ivfDf)
    assert(exact.nonEmpty)
    val recall = (ivf & exact).size.toDouble / exact.size
    // nProbe=2 of ~9 cells at sf0.01: the true neighbor set concentrates
    // in the query's own cell, so well above the 2/9 random floor
    assert(recall >= 0.2, s"IVF recall $recall below floor")
    val perQuery = ivfDf.groupBy("query_id").count().collect()
    perQuery.foreach(r => assert(r.getLong(1) <= Similarity.TopK))
  }

  test("vocab stats: df ≤ cf, df ≤ corpus size, top-50 ordered by cf") {
    val rows = TextAnalysis.qVocabStats(spark, sf).collect()
    // synthetic vocab is ~31 terms at sf0.01 — smaller than the top-k cap
    assert(rows.nonEmpty && rows.length <= 50)
    val nDocs = graft.Tables.documents(spark, sf).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_freq") <= r.getAs[Long]("coll_freq"), r.toString)
      assert(r.getAs[Long]("doc_freq") <= nDocs, r.toString)
    }
    val cfs = rows.map(_.getAs[Long]("coll_freq"))
    assert(cfs.zip(cfs.tail).forall { case (a, b) => a >= b }, "not cf-descending")
    // spot-check one term against a direct recompute
    val term = rows.head.getAs[String]("token")
    val direct = graft.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") === term).count()
    assert(rows.head.getAs[Long]("coll_freq") == direct)
  }

  test("train/test split: partition of corpus, ~TrainPct split, stable under growth") {
    val split = Curation.qTrainTestSplit(spark, sf).cache()
    val n = split.count()
    assert(n == graft.Tables.documents(spark, sf).count())
    val byS = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS.keySet == Set("train", "test"))
    val frac = byS("train").toDouble / n
    assert(math.abs(frac - Curation.TrainPct / 100.0) < 0.05,
      s"train fraction $frac far from ${Curation.TrainPct}%")
    // growth stability: the assignment on a PREFIX of the corpus is the
    // restriction of the full assignment (hash of id, independent of peers)
    val full = split.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val prefixDir = tmpDir("split-prefix")
    graft.Tables.documents(spark, sf).filter(col("doc_id") < 100)
      .write.mode("overwrite").parquet(s"$prefixDir/documents.parquet")
    Curation.qTrainTestSplit(spark, prefixDir).collect().foreach { r =>
      assert(full(r.getAs[Long]("doc_id")) == r.getAs[String]("split"),
        s"assignment flipped for ${r.getAs[Long]("doc_id")}")
    }
    split.unpersist()
  }

  test("events dedup: no key-bucket repeats, earliest-wins, subset of events") {
    val out = Events.qEventsDedup(spark, sf).cache()
    val keyed = out.groupBy("bucket", "user_id", "event_type").count().collect()
    keyed.foreach(r => assert(r.getAs[Long]("count") == 1L,
      s"duplicate survivor in ${r}"))
    // survivors carry the minimum ts of their group in the raw table
    val raw = graft.Tables.events(spark, sf)
      .withColumn("bucket", window(col("ts"), "10 minutes").getField("start"))
      .groupBy("bucket", "user_id", "event_type").agg(min("ts").as("min_ts"))
    val joined = out.join(raw, Seq("bucket", "user_id", "event_type"))
    assert(joined.filter(col("ts") =!= col("min_ts")).count() == 0)
    assert(out.count() == raw.count())
    out.unpersist()
  }
}
