package graft.queries

import graft.SparkSpec

/** Scala-recompute specs for the round-5 operators: exact-substring
  * span REWRITING (Lee et al. 2021 ExactSubstr semantics) and
  * transaction-boundary-consistent CDC materialization. Cell-exact
  * values are gated by the DuckDB oracle; these recompute the same
  * semantics in plain Scala (no Spark expressions, no SQL) so a bug
  * shared by the query and its SQL twin still gets caught.
  */
class RoundFiveOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // first 14 hex chars of md5 as a long — TextOps.hash56's contract
  private def h56(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 14), 16)

  test("span rewrite: full Scala recompute of excision + reassembly") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toVector)
      .toMap
    val expected = SpanRewriteReference.expected(docs, Dedup.SubstrK)
    val rows = Dedup.qDedupSpanRewrite(spark, sf).collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val (nTok, nRem, keptMd5) = expected(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_tokens") == nTok, s"n_tokens doc ${r.get(0)}")
      assert(r.getAs[Long]("n_removed") == nRem, s"n_removed doc ${r.get(0)}")
      assert(r.getAs[String]("kept_md5") == keptMd5, s"kept_md5 doc ${r.get(0)}")
    }
    // the rule must actually fire — and must not degenerate to deleting
    // every document's text
    assert(rows.exists(_.getAs[Long]("n_removed") > 0), "nothing excised")
    assert(rows.exists(r =>
      r.getAs[Long]("n_removed") == 0 && r.getAs[Long]("n_tokens") > 0),
      "every doc lost tokens")
    // keeper docs retain their spans: for every removed window there is a
    // lower doc_id still holding it, so total kept tokens stay positive
    assert(rows.map(_.getAs[Long]("n_tokens")).sum >
      rows.map(_.getAs[Long]("n_removed")).sum)
  }

  test("embedding pca: independent Gram + iteration recompute matches; " +
    "Rayleigh quotient non-decreasing") {
    val dim = Similarity.Dim
    val vecs = graft.Tables.embeddings(spark, sf)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    // HALF_UP (away from zero) to match Spark round() and DuckDB round()
    // — math.round is half-toward-+inf and diverges on negative halves
    val q = vecs.map(_.map(x => BigDecimal(x.toDouble * 10000d)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact))
    val g = Array.ofDim[Long](dim, dim)
    q.foreach { v =>
      var i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) { g(i)(j) += v(i) * v(j); j += 1 }
        i += 1
      }
    }
    def rayleigh(x: Array[Long]): BigDecimal = {
      val num = (for (i <- 0 until dim; j <- 0 until dim)
        yield BigInt(g(i)(j)) * x(i) * x(j)).sum
      val den = x.map(v => BigInt(v) * v).sum
      BigDecimal(num) / BigDecimal(den)
    }
    var x = Array.fill(dim)(10000L)
    var lastR = BigDecimal(-1)
    (1 to Similarity.PcaIters).foreach { _ =>
      val y = Array.tabulate(dim)(i => (0 until dim).map(j => g(i)(j) * x(j)).sum)
      val sdiv = y.map(math.abs).max / 10000L + 1L
      x = y.map(v => if (v < 0) -((-v) / sdiv) else v / sdiv)
      val r = rayleigh(x)
      // power-iteration invariant (integer truncation can cost at most a
      // hair, so compare with a 0.1% slack)
      assert(r >= lastR * BigDecimal("0.999"), s"Rayleigh fell: $lastR -> $r")
      lastR = r
    }
    val rows = Similarity.qEmbeddingPca(spark, sf).collect()
    assert(rows.length == dim)
    rows.foreach { r =>
      val i = r.getAs[Int]("dim")
      assert(r.getAs[Long]("gram_diag") == g(i)(i), s"gram_diag dim $i")
      assert(r.getAs[Long]("pc1_x10000") == x(i), s"pc1 dim $i")
    }
    // a degenerate all-zero direction would satisfy the equalities above
    // only if the corpus were empty — still, assert the vector is real
    // (the truncating renorm keeps max|component| within a hair of 1e4)
    val maxAbs = rows.map(r => math.abs(r.getAs[Long]("pc1_x10000"))).max
    assert(maxAbs >= 9000L && maxAbs <= 10000L,
      s"renormalization must keep max|component| near the 1e4 scale: $maxAbs")
  }

  test("media dedup: Scala frame-overlap recompute matches; partial and " +
    "full overlaps both occur; df cap respected") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).replaceAll("[^\\x00-\\x7F]", "?"))
      .toMap
    val k = Media.FrameBytes
    val fr: Map[Long, Set[String]] = docs.map { case (id, t) =>
      id -> t.grouped(k).map(md5Hex).toSet
    }
    val df = fr.toSeq.flatMap { case (id, hs) => hs.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val shareable = df.filter { case (_, n) =>
      n >= 2 && n <= Media.MediaDfCap
    }.keySet
    val expected = (for {
      (a, ha) <- fr.toSeq
      (b, hb) <- fr.toSeq if a < b
      shared = (ha intersect hb) intersect shareable
      if shared.nonEmpty
      ov = shared.size.toLong * 10000 / math.min(ha.size, hb.size)
      if ov >= Media.MediaOverlapX10000
    } yield (a, b) -> ((shared.size.toLong, ov))).toMap
    val rows = Media.qMediaDedup(spark, sf).collect()
    assert(rows.length == expected.size, s"${rows.length} vs ${expected.size}")
    rows.foreach { r =>
      val key = (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
      val (sh, ov) = expected(key)
      assert(r.getAs[Long]("shared") == sh, s"shared $key")
      assert(r.getAs[Long]("overlap_x10000") == ov, s"overlap $key")
    }
    assert(rows.exists(_.getAs[Long]("overlap_x10000") == 10000L),
      "no exact-duplicate pair")
    assert(rows.exists(_.getAs[Long]("overlap_x10000") < 10000L),
      "no partial-overlap pair")
  }

  test("table checksum: every chunk matches on sf0.01; a single mutated " +
    "cell or dropped/duplicated row flips exactly its chunk") {
    import org.apache.spark.sql.functions._
    val rows = Cdc.qCdcTableChecksum(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("matches")), "replica must verify")
    // sensitivity: corrupt one row three ways through the same fold
    import spark.implicits._
    val base = (1 to 250).map(i => (i, s"n$i", s"e$i@x", i.toLong))
      .toDF("id", "name", "email", "lsn")
    val clean = Cdc.checksumFold(base).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def folded(df: org.apache.spark.sql.DataFrame) =
      Cdc.checksumFold(df).collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val mutated = folded(base.withColumn("email",
      when(col("id") === 137, lit("evil@x")).otherwise(col("email"))))
    val dropped = folded(base.filter(col("id") =!= 42))
    val dup = base.filter(col("id") === 202)
    val duped2 = folded(base.unionAll(dup).unionAll(dup))
    assert(mutated.filter { case (c, v) => clean(c) != v }.keySet == Set(1),
      "mutation must flip exactly chunk 1 (id 137)")
    assert(dropped.filter { case (c, v) => clean(c) != v }.keySet == Set(0))
    // an EVEN number of extra copies cancels in the XOR — the blind spot
    // the COUNT column exists to close (the reason the digest carries both)
    assert(duped2(2)._1 == clean(2)._1 + 2 && duped2(2)._2 == clean(2)._2,
      "double-duplicate must be caught by n while x cancels")
    assert(duped2.filter { case (c, v) => clean(c) != v }.keySet == Set(2))
  }

  test("txn consistent: applied set recomputed from the envelope rules; " +
    "all three incompleteness categories occur") {
    val ids = graft.Tables.customer(spark, sf)
      .select("c_custkey").collect().map(_.getLong(0))
    val updKeys = ids.filter(_ % 3 == 0)
    def txOf(id: Long) = id / 30 + 1
    val expectedPerTx = updKeys.groupBy(txOf).map { case (t, ks) => t -> ks.length }
    val seenPerTx = updKeys.filter(_ % 33 != 0).groupBy(txOf)
      .map { case (t, ks) => t -> ks.length }
    val applied = expectedPerTx.keySet.filter { t =>
      t % 5 != 0 && seenPerTx.getOrElse(t, 0) == expectedPerTx(t)
    }
    // the fixture must exercise all three categories, or the gate is vacuous
    val inFlight = expectedPerTx.keySet.filter(_ % 5 == 0)
    val torn = expectedPerTx.keySet.filter(t =>
      t % 5 != 0 && seenPerTx.getOrElse(t, 0) < expectedPerTx(t))
    assert(applied.nonEmpty, "no transaction applies")
    assert(inFlight.nonEmpty, "no in-flight (END-less) transaction")
    assert(torn.nonEmpty, "no torn transaction")
    val appliedKeys = updKeys.filter(id => applied(txOf(id))).toSet
    val expected = ids.groupBy(_ % 10).map { case (b, ks) =>
      b -> ((ks.length.toLong,
        ks.count(appliedKeys).toLong,
        ks.sum,
        ks.map(id => if (appliedKeys(id)) id + 10000000L else id).max))
    }
    val rows = Cdc.qCdcTxnConsistent(spark, sf).collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val (n, nUpd, sumIds, maxLsn) = expected(r.getAs[Int]("bucket").toLong)
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("n_updated") == nUpd, s"bucket ${r.get(0)}")
      assert(r.getAs[Long]("sum_ids") == sumIds)
      assert(r.getAs[Long]("max_lsn") == maxLsn, s"bucket ${r.get(0)}")
    }
  }
}
