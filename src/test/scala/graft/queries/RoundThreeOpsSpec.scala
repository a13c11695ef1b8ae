package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant + Scala-recompute specs for the round-3 operators:
  * substring-level dedup, OOV rate, weighted sampling, and embedding
  * quantization. Cell-exact values are gated by the DuckDB oracle; these
  * specs independently recompute the same semantics in plain Scala (no
  * Spark expressions) so a bug shared by the query and its SQL twin
  * still gets caught.
  */
class RoundThreeOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hash56(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).take(14), 16)

  private val P = graft.text.TextOps.P

  /** Plain-Scala twin of TextAnalysis.qualityScoreExpr. */
  private def qualityScore(text: String, nChars: Long): Int = {
    val toks = text.split(" ").toSeq
    val ttrPct = toks.distinct.size.toLong * 100 / toks.size
    val stops = graft.text.TextOps.LangMarkers("en").toSet
    val stopPct = toks.count(stops).toLong * 100 / toks.size
    val lenScore = if (nChars >= 200 && nChars <= 450) 40
      else if (nChars >= 100) 25 else 10
    val divScore = if (ttrPct >= 60) 30 else if (ttrPct >= 40) 20 else 5
    val stopScore = if (stopPct >= 2 && stopPct <= 20) 30 else 10
    lenScore + divScore + stopScore
  }

  test("substring dedup: full Scala recompute matches") {
    val k = Dedup.SubstrK
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val windows: Map[Long, Seq[String]] = docs.map { case (id, text) =>
      val toks = text.split(" ").toSeq
      id -> (if (toks.size >= k) toks.sliding(k).map(_.mkString(" ")).toSeq
             else Seq.empty)
    }
    val docsPerWindow = windows.toSeq
      .flatMap { case (id, ws) => ws.distinct.map(w => (w, id)) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val rows = Dedup.qDedupSubstring(spark, sf).collect()
    assert(rows.length == docs.size, "one row per document")
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val ws = windows(id)
      val nDup = ws.count(w => docsPerWindow(w) >= 2).toLong
      assert(r.getAs[Long]("n_windows") == ws.size.toLong, s"n_windows doc $id")
      assert(r.getAs[Long]("n_dup_windows") == nDup, s"n_dup_windows doc $id")
      val expFrac = if (ws.isEmpty) 0L else nDup * 10000 / ws.size
      assert(r.getAs[Long]("dup_win_x10000") == expFrac, s"frac doc $id")
    }
    // the synthetic corpus genuinely contains cross-doc duplicated spans
    assert(rows.count(_.getAs[Long]("n_dup_windows") > 0) > 10,
      "expected some substring duplication in the corpus")
  }

  test("oov rate: full Scala recompute matches") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val cf = docs.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val vocab = cf.toSeq.sortBy { case (t, n) => (-n, t) }
      .take(TextAnalysis.OovVocabSize).map(_._1).toSet
    val rows = TextAnalysis.qOovRate(spark, sf).collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val toks = docs(id)
      val nOov = toks.count(t => !vocab(t)).toLong
      assert(r.getAs[Long]("n_tokens") == toks.size.toLong, s"n_tokens doc $id")
      assert(r.getAs[Long]("n_oov") == nOov, s"n_oov doc $id")
      assert(r.getAs[Long]("oov_x10000") == nOov * 10000 / toks.size,
        s"oov ratio doc $id")
    }
  }

  test("weighted sample: exactly the k lowest deterministic priorities win") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val pri = docs.map { case (id, text, nChars) =>
      val w = qualityScore(text, nChars).toLong
      val p = (((hash56(s"wsamp:$id") % P) + P) % P) / w
      (id, w, p)
    }
    val expected = pri.sortBy { case (id, _, p) => (p, id) }
      .take(Curation.WeightedSampleK)
    val rows = Curation.qWeightedSample(spark, sf).collect()
    assert(rows.length == Curation.WeightedSampleK)
    // the query's output order is (priority, doc_id) — compare pairwise
    expected.zip(rows).foreach { case ((id, w, p), r) =>
      assert(r.getAs[Long]("doc_id") == id, s"selection order at doc $id")
      assert(r.getAs[Long]("weight") == w, s"weight doc $id")
      assert(r.getAs[Long]("priority") == p, s"priority doc $id")
    }
    // selection pressure: the sample skews toward higher-quality docs
    val meanAll = pri.map(_._2).sum.toDouble / pri.length
    val meanSel = expected.map(_._2).sum.toDouble / expected.length
    assert(meanSel > meanAll,
      f"sample mean weight $meanSel%.1f should exceed corpus mean $meanAll%.1f")
  }

  /** Event (user, UTC day-offset) pairs — shared by the decayed-engagement
    * and rolling-actives recomputes. Days derived via Instant→UTC, the
    * same semantics as Spark's to_date under the UTC session TZ.
    */
  private def eventDays(): Seq[(Long, java.time.LocalDate)] =
    graft.Tables.events(spark, sf).select("user_id", "ts").collect().toSeq
      .map { r =>
        (r.getLong(0), r.getTimestamp(1).toInstant
          .atZone(java.time.ZoneOffset.UTC).toLocalDate)
      }

  test("decayed engagement: exact integer half-life recompute matches") {
    val evs = eventDays()
    val anchor = evs.map(_._2).maxBy(_.toEpochDay)
    val h = Events.DecayHorizon
    val expected = evs.groupBy(_._1).map { case (u, es) =>
      val ages = es.map { case (_, d) =>
        java.time.temporal.ChronoUnit.DAYS.between(d, anchor) }
      u -> (es.size.toLong,
        ages.count(_ <= 6).toLong,
        ages.min,
        ages.map(a => if (a >= 0 && a < h) 1L << (h - 1 - a) else 0L).sum)
    }
    val rows = Events.qDecayedEngagement(spark, sf).collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val (n, n7, last, score) = expected(u)
      assert(r.getAs[Long]("n_events") == n, s"n_events user $u")
      assert(r.getAs[Long]("n_last7") == n7, s"n_last7 user $u")
      assert(r.getAs[Long]("days_since_last") == last, s"recency user $u")
      assert(r.getAs[Long]("decayed_score") == score, s"score user $u")
    }
    // decay sanity: a user active only on the anchor day would score
    // 2^(h-1) per event; everyone's score is positive (all in horizon)
    assert(rows.forall(_.getAs[Long]("decayed_score") > 0))
  }

  test("rolling actives: 7-day distinct windows recomputed per day") {
    val du = eventDays().distinct
    val maxDay = du.map(_._2).maxBy(_.toEpochDay)
    val rows = Events.qRollingActives(spark, sf).collect()
    rows.foreach { r =>
      // the raw query emits DateType (SparkEntry's presentation layer
      // does the timestamp cast); java.sql.Date.toLocalDate is TZ-free
      val day = r.getDate(0).toLocalDate
      assert(!day.isAfter(maxDay), s"clipped at max day: $day")
      val in7 = du.filter { case (_, d) =>
        val a = java.time.temporal.ChronoUnit.DAYS.between(d, day)
        a >= 0 && a <= 6
      }.map(_._1).distinct.size.toLong
      val in1 = du.filter(_._2 == day).map(_._1).distinct.size.toLong
      assert(r.getAs[Long]("actives_7d") == in7, s"7d actives on $day")
      assert(r.getAs[Long]("actives_1d") == in1, s"1d actives on $day")
    }
    // every day from first event to maxDay appears (fanout covers gaps)
    val minDay = du.map(_._2).minBy(_.toEpochDay)
    val nDays = java.time.temporal.ChronoUnit.DAYS.between(minDay, maxDay) + 1
    assert(rows.length == nDays, s"expected $nDays days, got ${rows.length}")
  }

  test("variant extract: agrees with the get_json_object formulation") {
    val viaVariant = Events.qVariantExtract(spark, sf).collect()
    val viaWalk = graft.Tables.events(spark, sf)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"), (col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n_events"), sum(col("k")).as("sum_k"))
      .orderBy(col("event_type"), col("k_mod"))
      .collect()
    assert(viaVariant.map(_.toSeq).toSeq == viaWalk.map(_.toSeq).toSeq)
    assert(viaVariant.length > 1)
  }

  test("volume anomalies: lag ratios recomputed per type; boundary flags") {
    val daily = graft.Tables.events(spark, sf)
      .select("event_type", "ts").collect()
      .map { r =>
        (r.getString(0), r.getTimestamp(1).toInstant
          .atZone(java.time.ZoneOffset.UTC).toLocalDate)
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rows = Events.qVolumeAnomalies(spark, sf).collect()
    rows.foreach { r =>
      val t = r.getString(0)
      // raw query emits DateType; SparkEntry's presentation layer does the
      // timestamp cast. java.sql.Date.toLocalDate is TZ-free.
      val day = r.getDate(1).toLocalDate
      val n = r.getAs[Long]("n")
      val prev = r.getAs[Long]("prev_n")
      assert(daily((t, day)) == n, s"count $t $day")
      // prev_n is the count of the PREVIOUS OBSERVED day for this type
      val prevDay = daily.keys.filter(k => k._1 == t && k._2.isBefore(day))
        .map(_._2).maxBy(_.toEpochDay)
      assert(daily((t, prevDay)) == prev, s"prev of $t $day")
      val ratio = n * 10000 / prev
      assert(r.getAs[Long]("ratio_x10000") == ratio)
      assert(r.getAs[Boolean]("is_anomaly") == (ratio <= 5000 || ratio >= 15000))
    }
    // each type contributes (its days - 1) rows
    val expRows = daily.keys.groupBy(_._1).view.mapValues(_.size - 1).values.sum
    assert(rows.length == expRows)
  }

  test("event transitions: Markov counts and shares recomputed in Scala") {
    val evs = graft.Tables.events(spark, sf)
      .select("user_id", "event_type", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).getTime * 1000 + r.getTimestamp(2).getNanos / 1000 % 1000,
        r.getLong(3)))
    val counts = evs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy { case (_, _, t, id) => (t, id) }
      ordered.zip(ordered.drop(1)).map { case ((_, a, _, _), (_, b, _, _)) =>
        (a, b)
      }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fromTotals = counts.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val rows = Events.qEventTransitions(spark, sf).collect()
    assert(rows.length == counts.size)
    rows.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val n = r.getAs[Long]("n")
      assert(counts(key) == n, s"count $key")
      assert(r.getAs[Long]("share_x10000") ==
        n * 10000 / fromTotals(key._1), s"share $key")
    }
    // shares leaving each type sum to ~10000 (floor-division shortfall < k)
    rows.groupBy(_.getString(0)).foreach { case (f, rs) =>
      val tot = rs.map(_.getAs[Long]("share_x10000")).sum
      assert(tot > 10000 - rs.size && tot <= 10000, s"shares of $f: $tot")
    }
  }

  test("dwell times: exact lower-median gap per transition recomputed") {
    val evs = graft.Tables.events(spark, sf)
      .select("user_id", "event_type", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).getTime * 1000 +
          r.getTimestamp(2).getNanos / 1000 % 1000, r.getLong(3)))
    val gaps = evs.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val ordered = rows.sortBy { case (_, _, t, id) => (t, id) }
      ordered.zip(ordered.drop(1)).map {
        case ((_, a, t1, id1), (_, b, t2, _)) => ((a, b), t2 - t1, u, id1)
      }
    }
    // lower median under the query's (gap, user_id, event_id) tie-break —
    // the pair row carries the FIRST event's user_id and event_id (lead
    // pulls the next event's values onto the current row)
    val expected = gaps
      .groupBy(_._1)
      .map { case (k, gs) =>
        val sorted = gs.map { case (_, g, u, id) => (g, u, id) }.sorted
        k -> (gs.size.toLong, sorted((gs.size + 1) / 2 - 1)._1)
      }
    val rows = Events.qDwellTimes(spark, sf).collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(r.getAs[Long]("n") == expected(k)._1, s"n of $k")
      assert(r.getAs[Long]("median_gap_us") == expected(k)._2, s"median $k")
    }
    assert(rows.forall(_.getAs[Long]("median_gap_us") >= 0))
  }

  test("data validation: every check fires on injected violations") {
    import spark.implicits._
    val dir = tmpDir("graft-dv")
    // orders: one null custkey, one non-positive total, one duplicated key,
    // one custkey (99) with no customer row
    Seq((1L, Option(10L), 50.0), (2L, None, 60.0), (3L, Option(11L), -5.0),
      (3L, Option(10L), 70.0), (4L, Option(99L), 80.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    // lineitem: one orphan orderkey, one bad discount, one zero quantity,
    // one out-of-bounds shipdate
    Seq((1L, 0.05, 10.0, "1995-06-01"), (777L, 0.00, 5.0, "1996-01-01"),
      (2L, 1.50, 3.0, "1997-03-01"), (3L, 0.10, 0.0, "1998-04-01"),
      (4L, 0.02, 2.0, "2015-01-01"))
      .toDF("l_orderkey", "l_discount", "l_quantity", "ship")
      .withColumn("l_shipdate", col("ship").cast("timestamp")).drop("ship")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq(10L, 11L).toDF("c_custkey").write.parquet(s"$dir/customer.parquet")
    val got = Profiling.qDataValidation(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("orders_null_custkey") == (1L, 5L))
    assert(got("orders_nonpositive_totalprice") == (1L, 5L))
    assert(got("orders_duplicate_orderkey") == (1L, 5L))
    assert(got("orders_orphan_custkey") == (2L, 5L)) // null + unknown 99
    assert(got("lineitem_orphan_orderkey") == (1L, 5L))
    assert(got("lineitem_discount_out_of_range") == (1L, 5L))
    assert(got("lineitem_nonpositive_quantity") == (1L, 5L))
    assert(got("lineitem_shipdate_out_of_bounds") == (1L, 5L))
    // and on the real corpus the suite reports clean
    val real = Profiling.qDataValidation(spark, sf).collect()
    assert(real.forall(_.getAs[Long]("n_violations") == 0L))
  }

  test("embedding quantize: Scala recompute matches; codes bounded") {
    val vecs = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    val rows = Similarity.qEmbeddingQuantize(spark, sf).collect()
    assert(rows.length == vecs.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val v = vecs(id)
      val maxabs = v.map(math.abs).max
      // HALF_UP away from zero, like Spark round / DuckDB round
      def q(x: Double): Int = if (maxabs == 0) 0
        else BigDecimal(x * 127 / maxabs)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toInt
      val qv = v.map(q)
      assert(r.getAs[Double]("maxabs") == maxabs, s"maxabs vec $id")
      assert(r.getAs[Int]("q_min") == qv.min, s"q_min vec $id")
      assert(r.getAs[Int]("q_max") == qv.max, s"q_max vec $id")
      assert(qv.min >= -127 && qv.max <= 127, s"codes out of int8 range vec $id")
      assert(r.getAs[Long]("q_sum") == qv.map(_.toLong).sum, s"q_sum vec $id")
      assert(r.getAs[Long]("q_l1") == qv.map(c => math.abs(c.toLong)).sum,
        s"q_l1 vec $id")
      val err = v.zip(qv).foldLeft(0.0) { case (acc, (x, c)) =>
        acc + math.abs(x - c.toDouble * maxabs / 127)
      }
      assert(r.getAs[Long]("l1_err_x1e6") == math.floor(err * 1e6).toLong,
        s"l1 err vec $id")
      // each element's error is at most half a quantization step
      assert(err <= v.size * maxabs / 254 + 1e-9, s"error bound vec $id")
    }
  }
}
