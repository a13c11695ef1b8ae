package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-7 hardening: the trained-PQ recall floor (the LSH/IVF floors'
  * missing sibling — round-6 verdict "What's wrong #3": PQ recall was
  * measured in-gate but never asserted, so a codebook regression to
  * recall≈0 would have passed every gate).
  */
class Round7OpsSpec extends SparkSpec {

  test("pq recall floor: trained codebook holds macro recall@5 ≥ 0.35 at " +
    "sf0.01 (sampled-codebook placeholder measured 0.10; trained 16×16 " +
    "measures 0.425 there — sf0.001's different random corpus sits at " +
    "0.25, so the floor is pinned to the SF the driver gates run at)") {
    val rows = Similarity.qAnnRecall(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    val macroPq = rows.map(_.getAs[Long]("pq_recall_x10000")).sum / rows.length
    assert(macroPq >= 3500, s"PQ macro recall $macroPq < 0.35 — codebook " +
      s"training regressed (the untrained placeholder sat at 1000)")
  }

  test("pq rerank recall floor: the exact re-rank over the ADC-top-50 " +
    "shortlist holds recall@5 ≥ 0.7 at sf0.01 (raw ADC@5 measures " +
    "0.425 there; rerank measures 0.875) and strictly beats raw ADC") {
    val sf = "/root/testdata/sf0.01"
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = pairs(Similarity.qAnnBruteforce(spark, sf)
      .select(col("query_id"), col("neighbor_id")))
    val rr = pairs(Similarity.qAnnPqRerank(spark, sf)
      .select(col("query_id"), col("neighbor_id")))
    val pq = pairs(Similarity.qAnnPq(spark, sf)
      .select(col("query_id"), col("neighbor_id")))
    val rrRecall = (bf & rr).size * 10000L / bf.size
    val pqRecall = (bf & pq).size * 10000L / bf.size
    assert(rrRecall >= 7000, s"rerank recall $rrRecall < 0.7")
    assert(rrRecall > pqRecall,
      s"re-ranking must beat raw ADC: $rrRecall vs $pqRecall")
  }

  test("global ed-join == brute id-level quadratic on an adversarial " +
    "corpus: CROSS-BRAND pairs found (the within-brand gates' blind " +
    "spot), duplicate names expand to all id pairs, short/long paths " +
    "both exercised") {
    import spark.implicits._
    val dir = tmpDir("fuzzy-global")
    // reuses Round6OpsSpec's adversarial shapes but scatters brands so
    // most true pairs STRADDLE brands; adds duplicate-name rows (ids 1,
    // 21) so one matched value pair must expand to several id pairs
    val rows = Seq(
      (0L, "linen azure brushed tomato steel", "Brand#1"),
      (1L, "linen azure brushed tomato steel", "Brand#2"), // exact dup, cross
      (2L, "linen azure brushed tomato steal", "Brand#3"), // tail sub
      (3L, "linen azure brushed tomato stee", "Brand#4"), // deletion
      (4L, "linen azure brushed tomato steels", "Brand#5"), // insertion
      (5L, "line azure brushed tomato steel", "Brand#1"), // head deletion
      (6L, "linen azure crushed tomato steel", "Brand#2"), // mid sub
      (7L, "litmus azure brushed tomato steel", "Brand#3"), // ed 3: none
      (8L, "navy mint brushed rose steel", "Brand#4"),
      (9L, "navy mint brushed rose stee1", "Brand#5"), // ed 1, cross-brand
      (10L, "ab cdefgh", "Brand#1"), // short (< prefix len)
      (11L, "ab cdefgi", "Brand#2"), // ed 1 of row 10, cross-brand
      (12L, "abcde", "Brand#3"), // 5 chars: 3 grams only
      (13L, "azcye", "Brand#4"), // ed 2 of row 12, ZERO shared grams
      (14L, "ax", "Brand#5"), // below q: no grams at all
      (15L, "bx", "Brand#1"), // ed 1 of row 14, cross-brand
      (16L, "wholly unrelated spring chiffon", "Brand#2"),
      (17L, "qrstuvwxyzmnop", "Brand#3"),
      (18L, "ZZqrstuvwxyzmnop", "Brand#4"), // ed 2: head double-insert
      (19L, "zozozo glint paddle", "Brand#5"),
      (20L, "zozozo glint padle", "Brand#1"), // ed 1: tail deletion
      (21L, "linen azure brushed tomato steel", "Brand#3")) // 3rd dup id
    rows.toDF("p_partkey", "p_name", "p_brand")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = Linkage.qFuzzyMatchGlobal(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getInt(4))).toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // brute reference: id-level quadratic over the WHOLE corpus — no
    // brand key anywhere
    val want = (for {
      a <- rows; b <- rows
      if a._1 < b._1
      ed = lev(a._2, b._2) if ed >= 1 && ed <= Linkage.MaxEdit
    } yield (a._1, b._1, a._2, b._2, ed)).toSet
    assert(got == want,
      s"global ed-join must be lossless corpus-wide:\n got=$got\nwant=$want")
    // the gate's reason to exist: pairs the within-brand variants CANNOT
    // see (different brands) are found
    val brandOf = rows.map(r => r._1 -> r._3).toMap
    assert(want.exists { case (a, b, _, _, _) => brandOf(a) != brandOf(b) },
      "fixture must contain cross-brand true pairs")
    // duplicate-name expansion: ids 1 and 21 share row 0's name, so every
    // match of that VALUE must appear once per id pair
    val dupSides = got.collect {
      case (a, b, _, _, _) if Set(a, b).intersect(Set(0L, 1L, 21L)).nonEmpty =>
        (a, b)
    }
    assert(dupSides.size >= 6,
      s"value→id expansion must fan out over duplicate names: $dupSides")
  }

  test("Materialize.barrier upgrades to a RELIABLE checkpoint once a " +
    "checkpoint dir is set (the one-line cluster deployment step): " +
    "results identical to the local fallback, checkpoint files on disk") {
    import org.apache.spark.GraftSparkInternals
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty,
      "spec session must start on the local-fallback branch")
    val df = spark.range(0, 5000).toDF("id")
      .withColumn("v", (col("id") * 37) % 101)
    def ranks(): Set[(Long, Long)] =
      graft.operators.GlobalRank
        .withRank(df, Seq(col("v"), col("id")), "rk", "n")
        .select(col("id"), col("rk")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val localRes = ranks() // barrier -> localCheckpoint (no dir)
    val dir = tmpDir("reliable-ckpt")
    sc.setCheckpointDir(dir)
    try {
      val reliableRes = ranks() // barrier -> reliable checkpoint()
      assert(reliableRes == localRes,
        "reliable-checkpoint path must be result-identical")
      def anyFiles(f: java.io.File): Boolean =
        f.isFile || Option(f.listFiles).exists(_.exists(anyFiles))
      assert(anyFiles(new java.io.File(dir)),
        s"no reliable checkpoint data written under $dir")
    } finally GraftSparkInternals.setCheckpointDirRaw(sc, None)
    assert(sc.getCheckpointDir.isEmpty, "shared session state restored")
  }

  test("incremental join view == full recompute under RANDOM multi-" +
    "generation lifecycles (inserts, updates, deletes, re-inserts, " +
    "absent keys); carried/refreshed marker tracks the last batch's " +
    "touched set exactly") {
    import spark.implicits._
    import graft.cdc.IncrementalJoinView
    for (seed <- 0 until 3) {
      val rnd = new scala.util.Random(41L + seed)
      val keys = 1 to 25
      val Gens = 3
      // per (gen, side): each key independently absent or one of r/u/d
      def genDeltas(gen: Int, side: String): Seq[(Int, String, Long, String)] =
        keys.flatMap { k =>
          // ~5/8 untouched per (key, side, gen) so the carried path is
          // guaranteed to occur alongside refreshes and deletes
          rnd.nextInt(8) match {
            case 5 => Some((k, "r", gen * 1000L + k, s"$side-r$gen-$k"))
            case 6 => Some((k, "u", gen * 1000L + k, s"$side-u$gen-$k"))
            case 7 => Some((k, "d", gen * 1000L + k, null))
            case _ => None // untouched this generation
          }
        }
      val aGens = (0 until Gens).map(g => genDeltas(g, "a"))
      val bGens = (0 until Gens).map(g => genDeltas(g, "b"))
      def df(rows: Seq[(Int, String, Long, String)], v: String) =
        rows.toDF("id", "op", "lsn", v)
      // bootstrap from generation 0, then two incremental steps
      var aState = IncrementalJoinView.sideState(df(aGens(0), "va"), "id")
      var bState = IncrementalJoinView.sideState(df(bGens(0), "vb"), "id")
      var view = aState.drop("lsn").join(bState.drop("lsn"), "id")
        .select(col("id"), col("va"), col("vb"))
      var lastTouched = Set.empty[Int]
      for (g <- 1 until Gens) {
        val (v2, a2, b2) = IncrementalJoinView.step(view, aState, bState,
          df(aGens(g), "va"), df(bGens(g), "vb"), "id", "via")
        view = v2; aState = a2; bState = b2
        lastTouched = (aGens(g) ++ bGens(g)).map(_._1).toSet
      }
      val got = view.collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getString(3))).toSet
      // reference: plain latest-state fold over ALL generations per side
      def fold(gens: Seq[Seq[(Int, String, Long, String)]])
          : Map[Int, String] =
        gens.flatten.groupBy(_._1).flatMap { case (k, rows) =>
          val w = rows.maxBy(r => (r._3, r._2))
          if (w._2 == "d") None else Some(k -> w._4)
        }
      val fa = fold(aGens); val fb = fold(bGens)
      val want = keys.flatMap(k => for (va <- fa.get(k); vb <- fb.get(k))
        yield (k, va, vb,
          if (lastTouched(k)) "refreshed" else "carried")).toSet
      assert(got == want, s"seed $seed:\n got=${got.toSeq.sorted}\n" +
        s"want=${want.toSeq.sorted}")
      // both markers genuinely occur across the run
      assert(got.exists(_._4 == "carried") && got.exists(_._4 == "refreshed"),
        s"seed $seed: fixture must exercise both maintenance paths")
    }
  }

  test("triangle count == brute-force triple enumeration: orientation " +
    "counts each triangle exactly once, sub-threshold pairs drop out, " +
    "edge-free suppliers report zeros") {
    import spark.implicits._
    val dir = tmpDir("triangles")
    // co-order graph by construction: one order per (pair, repeat) puts
    // exactly that supplier pair in the order. Supports: the 2-3-4
    // triangle rim and the 1-2-3 triangle all at MinSupport; (4,5) one
    // BELOW threshold — its triangle-with-nothing and its degree must
    // both vanish; (5,6) above; supplier 7 appears in no lineitem.
    val pairSupport = Seq(
      (1L, 2L) -> Graph.MinSupport, (1L, 3L) -> (Graph.MinSupport + 2),
      (2L, 3L) -> Graph.MinSupport, (2L, 4L) -> (Graph.MinSupport + 1),
      (3L, 4L) -> Graph.MinSupport, (4L, 5L) -> (Graph.MinSupport - 1),
      (5L, 6L) -> Graph.MinSupport)
    val li = pairSupport.zipWithIndex.flatMap {
      case (((a, b), s), pi) =>
        (0 until s).flatMap { r =>
          val ok = (pi * 100 + r).toLong
          Seq((ok, a), (ok, b))
        }
    }
    li.toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    (1L to 7L).toDF("s_suppkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val got = Graph.qTriangleCount(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute reference: thresholded edge set, all C(n,3) triples
    val edges = pairSupport.collect {
      case ((a, b), s) if s >= Graph.MinSupport => Set(a, b)
    }.toSet
    val nodes = edges.flatten
    val triangles = (for {
      a <- nodes; b <- nodes if a < b; c <- nodes if b < c
      if edges(Set(a, b)) && edges(Set(b, c)) && edges(Set(a, c))
    } yield Set(a, b, c)).toSet
    val want = (1L to 7L).map { n =>
      (n, edges.count(_.contains(n)).toLong,
        triangles.count(_.contains(n)).toLong)
    }.toSet
    assert(got == want, s"got=$got\nwant=$want")
    // each triangle credited exactly 3 node-units — double counting would
    // inflate this even if per-node spot values happened to collide
    assert(got.toSeq.map(_._3).sum == 3L * triangles.size)
    assert(want.exists { case (n, deg, tri) => deg == 0 && tri == 0 },
      "fixture must include an edge-free supplier")
  }

  test("entity resolution closes NON-transitive match chains: A≈B≈C with " +
    "lev(A,C)=4 lands in ONE entity labeled by the min name; duplicate " +
    "names share the entity; singletons keep their own label") {
    import spark.implicits._
    val dir = tmpDir("entity-res")
    val rows = Seq(
      (0L, "mmmm aaaa"), // chain end A
      (1L, "mmmm aabb"), // B: ed 2 of A, ed 2 of C
      (2L, "mmmm bbbb"), // C: ed 4 of A — only reachable via B
      (3L, "mmmm aaaa"), // duplicate of A: same entity, not a new variant
      (4L, "zzzz qqqq")) // singleton
    rows.toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = Linkage.qEntityResolution(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toList
    val want = List(
      (0L, "mmmm aaaa", "mmmm aaaa", 4L, 3L),
      (1L, "mmmm aabb", "mmmm aaaa", 4L, 3L),
      (2L, "mmmm bbbb", "mmmm aaaa", 4L, 3L),
      (3L, "mmmm aaaa", "mmmm aaaa", 4L, 3L),
      (4L, "zzzz qqqq", "zzzz qqqq", 1L, 1L))
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("unigram segmentation == exhaustive enumeration over all piece " +
    "compositions: vocab construction, quantized-log2 costs, and the " +
    "(cost, n_pieces, seg) tie order all reproduced; over-length words " +
    "stay out of the gate contract") {
    import spark.implicits._
    val dir = tmpDir("unigram")
    // motifs repeated so multi-char pieces earn low costs; 'abab' shapes
    // force real tie-breaking between 2- and 3-char pieces; a 1-char
    // word; a 20-char word that must be excluded by the length contract
    val texts = Seq(
      "wish wash wish wash wishwash",
      "abab ababab abababab abab",
      "a tree a tree a stree",
      "zq internationalizing!", // 18 chars — over UnigramUnroll
      "wish tree wash abab zq")
    texts.toDF("text").withColumn("doc_id", monotonically_increasing_id())
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.qUnigramSegment(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toList
    // ---- brute reference, from the raw texts ----
    val words = texts.flatMap(t => "[a-z]+".r.findAllIn(t.toLowerCase))
      .filter(_.length <= TextAnalysis.UnigramUnroll)
    val cnt = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val freq = scala.collection.mutable.Map.empty[String, Long]
    for ((w, c) <- cnt; st <- 0 until w.length;
         ln <- 1 to math.min(TextAnalysis.UnigramMaxPiece, w.length - st))
      freq(w.substring(st, st + ln)) = freq.getOrElse(w.substring(st, st + ln), 0L) + c
    val singles = freq.filter(_._1.length == 1)
    val multi = freq.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, f) => (-f, p) }.take(TextAnalysis.UnigramVocabTopK)
    val vocab = (singles ++ multi).toMap
    val t = vocab.values.sum
    def bitlen(x: Long) = java.lang.Long.toBinaryString(x).length
    val cost = vocab.map { case (p, f) => p -> (bitlen(t) - bitlen(f) + 1L) }
    def segmentations(w: String): Seq[List[String]] =
      if (w.isEmpty) Seq(Nil)
      else (1 to math.min(TextAnalysis.UnigramMaxPiece, w.length)).flatMap { l =>
        val p = w.substring(0, l)
        if (cost.contains(p)) segmentations(w.substring(l)).map(p :: _)
        else Nil
      }
    val want = cnt.keys.toSeq.sorted.map { w =>
      val best = segmentations(w).map { pieces =>
        val combined = pieces.map(p =>
          cost(p) * TextAnalysis.UnigramTieScale + 1L).sum
        (combined, pieces.mkString(" "))
      }.min // (combined, seg) lexicographic — the gate's total order
      (w, cnt(w), best._1 % TextAnalysis.UnigramTieScale,
        best._1 / TextAnalysis.UnigramTieScale, best._2)
    }.toList
    assert(got == want, s"got=$got\nwant=$want")
    assert(!got.exists(_._1 == "internationalizing"),
      "words over UnigramUnroll must stay outside the gate contract")
    // fixture sanity: the DP must genuinely prefer multi-char pieces
    // somewhere (a trivial per-char segmentation would also 'match')
    assert(got.exists(_._5.split(" ").exists(_.length >= 2)),
      "fixture must produce at least one multi-char piece")
  }

  test("incremental aggregate-over-join view == full recompute under " +
    "RANDOM lifecycles incl. GROUP MOVES; delta_applied marks exactly " +
    "the last batch's retraction∪insertion groups") {
    import spark.implicits._
    import graft.cdc.{IncrementalAggView, IncrementalJoinView}
    for (seed <- 0 until 3) {
      val rnd = new scala.util.Random(97L + seed)
      val keys = 1 to 40
      // enough groups that every generation provably leaves some
      // untouched — the carried branch must occur, not just may
      val groups = (1 to 20).map(i => f"g$i%02d").toVector
      val Gens = 3
      // side A payload = the GROUP; side B payload = the metric. Group
      // updates are the move case the delta merge must retract+insert.
      def genA(gen: Int): Seq[(Int, String, Long, String)] =
        keys.flatMap { k =>
          rnd.nextInt(8) match {
            case 5 => Some((k, "r", gen * 1000L + k, groups(rnd.nextInt(groups.size))))
            case 6 => Some((k, "u", gen * 1000L + k, groups(rnd.nextInt(groups.size))))
            case 7 => Some((k, "d", gen * 1000L + k, null))
            case _ => None
          }
        }
      def genB(gen: Int): Seq[(Int, String, Long, java.lang.Long)] =
        keys.flatMap { k =>
          rnd.nextInt(8) match {
            case 5 => Some((k, "r", gen * 1000L + k,
              java.lang.Long.valueOf(rnd.nextInt(100).toLong)))
            case 6 => Some((k, "u", gen * 1000L + k,
              java.lang.Long.valueOf(rnd.nextInt(100).toLong)))
            case 7 => Some((k, "d", gen * 1000L + k, null))
            case _ => None
          }
        }
      val aGens = (0 until Gens).map(genA)
      val bGens = (0 until Gens).map(genB)
      var aState = IncrementalJoinView.sideState(
        aGens(0).toDF("id", "op", "lsn", "g"), "id")
      var bState = IncrementalJoinView.sideState(
        bGens(0).toDF("id", "op", "lsn", "m"), "id")
      var agg = IncrementalAggView.bootstrap(aState, bState, "id", "g", "m")
      var lastTouched = Set.empty[Int]
      var lastOldStates: (Map[Int, String], Map[Int, Long]) = (null, null)
      def foldA(upTo: Int): Map[Int, String] =
        aGens.take(upTo).flatten.groupBy(_._1).flatMap { case (k, rows) =>
          val w = rows.maxBy(r => (r._3, r._2))
          if (w._2 == "d") None else Some(k -> w._4)
        }
      def foldB(upTo: Int): Map[Int, Long] =
        bGens.take(upTo).flatten.groupBy(_._1).flatMap { case (k, rows) =>
          val w = rows.maxBy(r => (r._3, r._2))
          if (w._2 == "d") None else Some(k -> w._4.longValue)
        }
      for (g <- 1 until Gens) {
        lastOldStates = (foldA(g), foldB(g))
        val (a2, as2, bs2) = IncrementalAggView.step(agg, aState, bState,
          aGens(g).toDF("id", "op", "lsn", "g"),
          bGens(g).toDF("id", "op", "lsn", "m"),
          "id", "g", "m", "via")
        // the marker column rides into the next step's input harmlessly:
        // step() never references it and the merge re-derives it
        agg = a2; aState = as2; bState = bs2
        lastTouched = (aGens(g).map(_._1) ++ bGens(g).map(_._1)).toSet
      }
      val got = agg.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toSet
      // reference: full-recompute aggregate over the final fold
      val fa = foldA(Gens); val fb = foldB(Gens)
      val contribs = keys.flatMap(k =>
        for (g0 <- fa.get(k); m <- fb.get(k)) yield (g0, m))
      // marker reference: groups in the last batch's retraction set
      // (touched keys' pre-batch joined groups) or insertion set
      // (touched keys' post-batch joined groups)
      val (oa, ob) = lastOldStates
      val touchedGroups =
        lastTouched.flatMap(k =>
          for (g0 <- oa.get(k); _ <- ob.get(k)) yield g0) ++
        lastTouched.flatMap(k =>
          for (g0 <- fa.get(k); _ <- fb.get(k)) yield g0)
      val want = contribs.groupBy(_._1).map { case (g0, rows) =>
        (g0, rows.size.toLong, rows.map(_._2).sum,
          if (touchedGroups(g0)) "delta_applied" else "carried")
      }.toSet
      assert(got == want, s"seed $seed:\n got=${got.toSeq.sorted}\n" +
        s"want=${want.toSeq.sorted}")
      assert(got.exists(_._4 == "carried") &&
        got.exists(_._4 == "delta_applied"),
        s"seed $seed: fixture must exercise both maintenance paths")
    }
  }

  test("equal-lsn delta supersedes carried state in a view refresh: a " +
    "tombstone compacted onto the stored row's own lsn deletes the key " +
    "from the join view AND retracts its aggregate contribution " +
    "(with op='r' re-tagging both silently survived the tie)") {
    import spark.implicits._
    import graft.cdc.{IncrementalAggView, IncrementalJoinView}
    val a1 = Seq((1, "r", 10L, "g1"), (2, "r", 20L, "g1"))
      .toDF("id", "op", "lsn", "g")
    val b1 = Seq((1, "r", 10L, 5L), (2, "r", 20L, 7L))
      .toDF("id", "op", "lsn", "m")
    // the tombstone lands at lsn 10 — EXACTLY the stored row's position
    val aDelta = Seq((1, "d", 10L, null.asInstanceOf[String]))
      .toDF("id", "op", "lsn", "g")
    val bDelta = Seq.empty[(Int, String, Long, java.lang.Long)]
      .toDF("id", "op", "lsn", "m")
    val aS = IncrementalJoinView.sideState(a1, "id")
    val bS = IncrementalJoinView.sideState(b1, "id")
    val view = aS.drop("lsn").join(bS.drop("lsn"), "id")
      .select(col("id"), col("g"), col("m"))
    val (v2, aS2, _) = IncrementalJoinView.step(
      view, aS, bS, aDelta, bDelta, "id", "via")
    assert(v2.collect().map(_.getInt(0)).toSet == Set(2),
      "the equal-lsn tombstone must remove key 1 from the view")
    assert(aS2.collect().map(_.getInt(0)).toSet == Set(2),
      "the deleted key must also leave the maintained side state")
    val agg1 = IncrementalAggView.bootstrap(aS, bS, "id", "g", "m")
    val (agg2, _, _) = IncrementalAggView.step(
      agg1, aS, bS, aDelta, bDelta, "id", "g", "m", "via")
    val got = agg2.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("g1", 1L, 7L)),
      s"key 1's contribution must be retracted on the lsn tie: $got")
  }

  test("community label propagation == brute synchronous LPA with the " +
    "min-label tie rule: two cliques joined by a weak bridge keep " +
    "distinct communities; sizes exact") {
    import spark.implicits._
    val dir = tmpDir("community")
    // two 4-cliques bridged by one edge; all edges at MinSupport
    val cliqueEdges = (for {
      grp <- Seq(Seq(1L, 2L, 3L, 4L), Seq(5L, 6L, 7L, 8L))
      i <- grp.indices; j <- grp.indices if i < j
    } yield (grp(i), grp(j))) :+ ((4L, 5L))
    val li = cliqueEdges.zipWithIndex.flatMap { case ((a, b), pi) =>
      (0 until Graph.MinSupport).flatMap { r =>
        val ok = (pi * 100 + r).toLong
        Seq((ok, a), (ok, b))
      }
    }
    li.toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Graph.qCommunityLp(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute reference: K synchronous rounds, mode of neighbor labels,
    // ties to the smallest label
    val nbrs = cliqueEdges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lab: Map[Long, Long] = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to Graph.LpRounds)
      lab = nbrs.map { case (n, ns) =>
        val freq = ns.groupBy(lab).view.mapValues(_.size)
        n -> freq.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    val sizes = lab.values.groupBy(identity).view.mapValues(_.size.toLong)
    val want = lab.map { case (n, l) => (n, l, sizes(l)) }.toSet
    assert(got == want, s"got=$got\nwant=$want")
    // structure: the bridge must not merge the cliques
    assert(lab(1L) != lab(8L), "fixture must yield ≥2 communities")
  }

  test("content-defined chunking == brute reference, and boundaries are " +
    "SHIFT-ROBUST: a head insertion leaves every chunk after the next " +
    "boundary identical (the fixed-window failure case)") {
    import spark.implicits._
    val dir = tmpDir("cdchunks")
    def h56(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 14), 16)
    }
    // a long shared passage; doc B = doc A with one token INSERTED at
    // the head, doc C = unrelated
    val shared = (1 to 60).map(i => s"tok$i").mkString(" ")
    val texts = Seq((0L, shared), (1L, s"inserted $shared"),
      (2L, (100 to 140).map(i => s"zz$i").mkString(" ")))
    texts.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // brute reference chunking
    def chunksOf(text: String): Seq[Seq[String]] = {
      val toks = text.split(" ").toSeq
      val out = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
      var cur = scala.collection.mutable.ArrayBuffer.empty[String]
      toks.foreach { t =>
        cur += t
        if (h56(t) % Curation.CdChunkMod == 0) { out += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer.empty }
      }
      if (cur.nonEmpty) out += cur.toSeq
      out.toSeq
    }
    val byDoc = texts.map { case (id, t) => id -> chunksOf(t) }.toMap
    val hashesByDoc = byDoc.view.mapValues(_.map(c => h56(c.mkString(" "))).toSeq).toMap
    val dfMap = hashesByDoc.toSeq.flatMap { case (id, hs) => hs.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val want = texts.map { case (id, _) =>
      val hs = hashesByDoc(id)
      val dups = hs.count(h => dfMap(h) >= 2).toLong
      (id, byDoc(id).map(_.size).sum.toLong, hs.size.toLong, dups,
        dups * 10000L / hs.size)
    }.toSet
    val got = Curation.qContentChunks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want, s"got=$got\nwant=$want")
    // the shift-robustness claim itself: all of doc A's chunks except
    // (at most) the first survive the head insertion verbatim
    val a = hashesByDoc(0L); val b = hashesByDoc(1L)
    assert(a.tail.forall(b.contains),
      "content-defined chunks after the first boundary must survive a " +
        "head insertion")
    assert(a.toSet.intersect(hashesByDoc(2L).toSet).isEmpty,
      "unrelated docs must share no chunks")
  }
}
