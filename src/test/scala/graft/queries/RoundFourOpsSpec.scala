package graft.queries

import graft.SparkSpec

/** Scala-recompute specs for the round-4 operators: Gopher-style rule
  * filtering, length-bucket padding economics, and kNN label-vote
  * classification. Cell-exact values are gated by the DuckDB oracle;
  * these recompute the same semantics in plain Scala (no Spark
  * expressions) so a bug shared by the query and its SQL twin still
  * gets caught.
  */
class RoundFourOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("gopher rules: full Scala recompute matches; both outcomes occur") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val stops = graft.text.TextOps.LangMarkers("en").toSet
    val rows = TextAnalysis.qGopherRules(spark, sf).collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val toks = docs(r.getAs[Long]("doc_id")).split(" ", -1).toSeq
      val n = toks.size.toLong
      val meanX100 = toks.map(_.length.toLong).sum * 100 / n
      // ASCII classes, matching the query/oracle regexes [a-zA-Z] and
      // [^a-zA-Z0-9] exactly — Character.isLetter would diverge on any
      // non-ASCII letter ('ü', '的': Unicode-alphabetic, regex-symbol)
      def asciiAlpha(c: Char) =
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
      def asciiAlnum(c: Char) = asciiAlpha(c) || (c >= '0' && c <= '9')
      val alpha = toks.count(_.exists(asciiAlpha)).toLong * 10000 / n
      val symbol = toks.count(t =>
        t.nonEmpty && t.forall(c => !asciiAlnum(c))).toLong * 10000 / n
      val stopHits = toks.count(stops)
      assert(r.getAs[Int]("n_tokens").toLong == n)
      assert(r.getAs[Long]("mean_len_x100") == meanX100)
      assert(r.getAs[Long]("alpha_x10000") == alpha)
      assert(r.getAs[Long]("symbol_x10000") == symbol)
      assert(r.getAs[Int]("stop_hits") == stopHits)
      val rules = Seq(
        n >= TextAnalysis.RuleMinWords && n <= TextAnalysis.RuleMaxWords,
        meanX100 >= TextAnalysis.RuleMinMeanLenX100 &&
          meanX100 <= TextAnalysis.RuleMaxMeanLenX100,
        alpha >= TextAnalysis.RuleMinAlphaX10000,
        symbol <= TextAnalysis.RuleMaxSymbolX10000,
        stopHits >= TextAnalysis.RuleMinStopwords)
      val names = Seq("r_word_count", "r_mean_len", "r_alpha", "r_symbol",
        "r_stopwords")
      names.zip(rules).foreach { case (c, expect) =>
        assert(r.getAs[Boolean](c) == expect, s"$c doc ${r.get(0)}")
      }
      assert(r.getAs[Boolean]("passes") == rules.forall(identity))
    }
    // thresholds must actually split the corpus, or the filter is a no-op
    assert(rows.exists(_.getAs[Boolean]("passes")), "no doc passes")
    assert(rows.exists(!_.getAs[Boolean]("passes")), "no doc fails")
  }

  test("length buckets: Scala recompute matches; buckets cover the corpus") {
    val b = Curation.LenBucket
    val lens = graft.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0).split(" ", -1).length.toLong)
    val expected = lens.groupBy(n => (n + b - 1) / b * b).map {
      case (bucket, ns) =>
        val padded = ns.size * bucket
        bucket -> (ns.size.toLong, ns.sum, padded,
          (padded - ns.sum) * 10000 / padded)
    }
    val rows = Curation.qLengthBuckets(spark, sf).collect()
    assert(rows.length == expected.size && rows.length > 1,
      s"want >1 buckets, got ${rows.length}")
    rows.foreach { r =>
      val (nDocs, sumTok, padded, waste) = expected(r.getAs[Long]("bucket_max"))
      assert(r.getAs[Long]("n_docs") == nDocs)
      assert(r.getAs[Long]("sum_tokens") == sumTok)
      assert(r.getAs[Long]("padded_tokens") == padded)
      assert(r.getAs[Long]("waste_x10000") == waste)
      // padding waste is bounded by one bucket-granule per doc
      assert(padded - sumTok < nDocs * b)
    }
  }

  test("simhash hamming: banded join finds EXACTLY the all-pairs result") {
    // ground truth: all-pairs hamming over the per-doc simhashes (which
    // are themselves gated by the q_dedup_simhash oracle)
    val hashes = Dedup.qDedupSimhash(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash56"))
    val truth = (for {
      (ida, sa) <- hashes; (idb, sb) <- hashes if ida < idb
      ham = java.lang.Long.bitCount(sa ^ sb) if ham <= Dedup.HamMaxDist
    } yield (ida, idb, ham)).toSet
    val got = Dedup.qSimhashHamming(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Int]("hamming"))).toSet
    // ⊇ is the pigeonhole recall guarantee (≤ bands−1 bits differ → some
    // band matches exactly); ⊆ is the verify filter — so exact equality
    assert(got == truth,
      s"missed ${truth -- got}; spurious ${got -- truth}")
    assert(truth.nonEmpty, "threshold finds no pairs — test is vacuous")
  }

  test("ann recall: set-intersection recompute over the gated outputs") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    val bf = pairs(Similarity.qAnnBruteforce(spark, sf)).groupBy(_._1)
    val lsh = pairs(Similarity.qAnnLsh(spark, sf)).toSet
    val ivf = pairs(Similarity.qAnnIvf(spark, sf)).toSet
    val rows = Similarity.qAnnRecall(spark, sf).collect()
    assert(rows.length == bf.size)
    rows.foreach { r =>
      val q = r.getAs[Long]("query_id")
      val truth = bf(q).toSet
      val lh = truth.count(lsh)
      val ih = truth.count(ivf)
      assert(r.getAs[Long]("lsh_hits") == lh, s"lsh hits q$q")
      assert(r.getAs[Long]("ivf_hits") == ih, s"ivf hits q$q")
      assert(r.getAs[Long]("lsh_recall_x10000") ==
        lh.toLong * 10000 / Similarity.TopK)
      assert(r.getAs[Long]("ivf_recall_x10000") ==
        ih.toLong * 10000 / Similarity.TopK)
    }
    // the approximate paths must actually find much of the truth, or the
    // banding parameters have rotted (true rot collapses toward 0). The
    // floor is 0.4: with the round-5 MaxQueries=8 cap the sf0.01 macro
    // recall sits at 0.475 — each query now carries 1/8 of the average.
    val macroRecall = rows.map(_.getAs[Long]("lsh_recall_x10000")).sum /
      rows.length
    assert(macroRecall >= 4000, s"LSH macro recall $macroRecall < 0.4")
  }

  test("dedup recall: set-intersection recompute over the gated pair lists") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val exact = pairs(Dedup.qDedupNgram(spark, sf))
    val est = pairs(Dedup.qDedupMinhash(spark, sf))
    // guard BEFORE the ratio arithmetic below divides by these sizes
    assert(exact.nonEmpty && est.nonEmpty, "degenerate eval — empty inputs")
    val both = (exact & est).size.toLong
    val r = Dedup.qDedupRecall(spark, sf).collect() match {
      case Array(only) => only
      case rs => fail(s"want exactly one summary row, got ${rs.length}")
    }
    assert(r.getAs[Long]("n_exact") == exact.size.toLong)
    assert(r.getAs[Long]("n_est") == est.size.toLong)
    assert(r.getAs[Long]("n_both") == both)
    assert(r.getAs[Long]("recall_x10000") == both * 10000 / exact.size)
    assert(r.getAs[Long]("precision_x10000") == both * 10000 / est.size)
  }

  test("shuffle shard: true permutation, hash-ordered, shards balanced ±1") {
    val rows = Layout.qShuffleShard(spark, sf).collect()
    val n = rows.length
    // positions are exactly 1..n (a permutation, no gaps or dups)
    assert(rows.map(_.getAs[Long]("shuffle_pos")).sorted.toSeq ==
      (1L to n.toLong))
    assert(rows.forall(_.getAs[Long]("n_total") == n.toLong))
    // position order IS (hash, id) order — recomputed in plain Scala
    val expected = rows.map(r =>
        (r.getAs[Long]("shuffle_key"), r.getAs[Long]("doc_id"))).sorted
      .zipWithIndex.map { case ((_, id), i) => id -> (i + 1L) }.toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("shuffle_pos") ==
        expected(r.getAs[Long]("doc_id")), s"pos of doc ${r.get(0)}")
      assert(r.getAs[Long]("shard") ==
        (r.getAs[Long]("shuffle_pos") - 1) % Layout.NShards)
    }
    // round-robin deal → shard sizes exactly balanced (±1)
    val sizes = rows.groupBy(_.getAs[Long]("shard")).values.map(_.length)
    assert(sizes.size == Layout.NShards && sizes.max - sizes.min <= 1)
    // the permutation actually shuffles: positions aren't id order
    val byId = rows.sortBy(_.getAs[Long]("doc_id"))
      .map(_.getAs[Long]("shuffle_pos"))
    assert(byId.zip(byId.tail).exists { case (a, b) => a > b })
  }

  test("knn classify: Scala top-k vote recompute matches") {
    val vecs = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getInt(2)))
    def norm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    val rows = Similarity.qKnnClassify(spark, sf).collect()
    assert(rows.length == vecs.count(v =>
      v._1 % Similarity.QueryMod == 0 && v._1 < Similarity.QueryCap))
    rows.foreach { r =>
      val qid = r.getAs[Long]("query_id")
      val (_, qv, qLabel) = vecs.find(_._1 == qid).get
      val topK = vecs.filter(_._1 != qid)
        .map { case (id, cv, l) =>
          val cos = qv.zip(cv).foldLeft(0.0) { case (a, (x, y)) => a + x * y } /
            (norm(qv) * norm(cv))
          (id, l, cos)
        }
        .sortBy { case (id, _, cos) => (-cos, id) }
        .take(Similarity.KnnK)
      val (predLabel, votes) = topK.groupBy(_._2).view
        .mapValues(_.length).toSeq
        .sortBy { case (l, n) => (-n, l) }.head
      assert(r.getAs[Int]("true_label") == qLabel, s"true label q$qid")
      assert(r.getAs[Int]("pred_label") == predLabel, s"pred q$qid")
      assert(r.getAs[Long]("votes") == votes.toLong, s"votes q$qid")
      assert(r.getAs[Boolean]("correct") == (predLabel == qLabel))
    }
  }

  /** Plain-Scala twin of [[graft.text.TextOps.hash56]]. */
  private def h56(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 14), 16)
  }

  test("classifier filter: hashed-weight recompute matches; both verdicts occur") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = TextAnalysis.qClassifierFilter(spark, sf).collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val toks = docs(r.getAs[Long]("doc_id")).split(" ", -1).toSeq
      val sumW = toks.map(t =>
        h56(t) % TextAnalysis.ClassifierBuckets - 1000L).sum
      // truncate toward zero, like the query's double-division cast and
      // DuckDB's signed //
      val score = (sumW * 1000.0 / toks.size).toLong
      assert(r.getAs[Long]("n_tokens") == toks.size.toLong)
      assert(r.getAs[Long]("sum_w") == sumW, s"doc ${r.get(0)}")
      assert(r.getAs[Long]("score_x1000") == score)
      assert(r.getAs[String]("verdict") == (if (score >= 0) "keep" else "drop"))
    }
    // a filter that keeps (or drops) everything is vacuous
    assert(rows.exists(_.getAs[String]("verdict") == "keep"), "none kept")
    assert(rows.exists(_.getAs[String]("verdict") == "drop"), "none dropped")
  }

  test("bpe pairs: full pair-count recompute matches the top-k exactly") {
    val texts = graft.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    for (t <- texts; tok <- t.split(" ", -1) if tok.length >= 2;
         i <- 0 until tok.length - 1) {
      val p = tok.substring(i, i + 2)
      counts(p) = counts.getOrElse(p, 0L) + 1L
    }
    val expect = counts.toSeq.sortBy { case (p, n) => (-n, p) }
      .take(TextAnalysis.BpePairTopK)
    val rows = TextAnalysis.qBpePairs(spark, sf).collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[Long]("n"))).toSeq
    assert(rows == expect)
  }

  test("semdedup: cell-assignment + keep-earliest recompute matches") {
    val vecs = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    def norm(v: Array[Double]) = math.sqrt(dot(v, v))
    val pivots = vecs.filter(v =>
      v._1 % Similarity.PivotMod == 0 && v._1 < Similarity.PivotCap)
    val cellOf = vecs.map { case (id, v) =>
      val best = pivots.map { case (pid, pv) =>
        (pid, dot(v, pv) / (norm(v) * norm(pv)))
      }.minBy { case (pid, pcos) => (-pcos, pid) }
      id -> best._1
    }.toMap
    val byCell = vecs.groupBy { case (id, _) => cellOf(id) }
    val earlier = vecs.map { case (id, v) =>
      val dups = byCell(cellOf(id))
        .filter { case (oid, ov) =>
          oid < id &&
            dot(v, ov) / (norm(v) * norm(ov)) >= Dedup.EmbedCosT
        }.map(_._1)
      id -> dups
    }.toMap
    val rows = Dedup.qSemdedup(spark, sf).collect()
    assert(rows.length == vecs.length)
    rows.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val dups = earlier(id)
      assert(r.getAs[Long]("cell") == cellOf(id), s"cell v$id")
      assert(r.getAs[Boolean]("is_kept") == dups.isEmpty, s"kept v$id")
      assert(r.getAs[Long]("dup_of") ==
        (if (dups.isEmpty) -1L else dups.min), s"dup_of v$id")
      assert(r.getAs[Long]("n_earlier_dups") == dups.length.toLong)
    }
    // the pass must actually prune something, and not everything
    assert(rows.exists(!_.getAs[Boolean]("is_kept")), "nothing pruned")
    assert(rows.count(_.getAs[Boolean]("is_kept")) > rows.length / 2,
      "over-pruning: most of the corpus dropped")
  }

  test("corpus overlap: per-source shingle-set recompute matches") {
    val bySource = graft.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .groupBy(_.getString(0))
      .map { case (src, rs) =>
        val hs = rs.flatMap { r =>
          val toks = r.getString(1).split(" ", -1)
          (0 to toks.length - 3).map(i =>
            h56(s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}"))
        }.toSet
        src -> hs
      }
    val rows = Dedup.qCorpusOverlap(spark, sf).collect()
    val sources = bySource.keys.toSeq.sorted
    val expectPairs = for {
      a <- sources; b <- sources if a < b
      common = (bySource(a) & bySource(b)).size if common > 0
    } yield (a, b)
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ==
      expectPairs)
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
      val (sa, sb) = (bySource(a), bySource(b))
      val common = (sa & sb).size.toLong
      assert(r.getAs[Long]("common") == common, s"$a/$b")
      assert(r.getAs[Long]("na") == sa.size.toLong)
      assert(r.getAs[Long]("nb") == sb.size.toLong)
      assert(r.getAs[Long]("jaccard_x10000") ==
        common * 10000 / (sa.size + sb.size - common))
      assert(r.getAs[Long]("containment_x10000") ==
        common * 10000 / math.min(sa.size, sb.size))
    }
  }
}
