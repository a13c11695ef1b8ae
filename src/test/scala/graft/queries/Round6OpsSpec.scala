package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-6 operators: BPE fixpoint apply + q-gram prefix-filtered fuzzy
  * match. The gate's corpus shows zero
  * single-pass/fixpoint divergence (measured, in-gate) — so this spec
  * proves the machinery on an ADVERSARIAL corpus where the deviation
  * must fire: words made of immediately repeated pairs, where the
  * single-pass replace consumes shared delimiters and under-merges.
  */
class Round6OpsSpec extends SparkSpec {

  test("bpe fixpoint: diverges from single-pass on repeated-pair words, " +
    "converges within the unrolled depth, and only ever merges MORE") {
    import spark.implicits._
    val dir = tmpDir("bpe-fix")
    // 'ababababab' words: round 1 must pick 'a b' (count 20×5 = 100),
    // whose single-pass merge leaves shared-delimiter leftovers (count
    // 40). The five filler pair counts (90, 85, 80, 75, 70) all beat
    // the leftovers AND every merge-derived pair (≤40), so rounds 2–6
    // never re-pick 'a b' — the compensation that otherwise hides the
    // single-pass under-merge. Fixpoint apply must still fully merge.
    val texts = Seq.fill(20)("ababababab") ++ Seq(
      Seq.fill(90)("cd").mkString(" "),
      Seq.fill(85)("ef").mkString(" "),
      Seq.fill(80)("gh").mkString(" "),
      Seq.fill(75)("ij").mkString(" "),
      Seq.fill(70)("kl").mkString(" "))
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", s"s${i % 2}", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.qBpeEncodeFixpoint(spark, dir).collect()
    assert(rows.nonEmpty)
    val totalDiverging = rows.map(_.getAs[Long]("n_docs_diverging")).sum
    assert(totalDiverging > 0,
      s"adversarial corpus must trigger the single-pass under-merge: " +
        rows.mkString(", "))
    rows.foreach { r =>
      assert(r.getAs[Boolean]("all_converged"),
        s"fixpoint depth ${TextAnalysis.BpeFixpointPasses} not reached: $r")
      assert(r.getAs[Long]("sum_tokens_fix") <=
        r.getAs[Long]("sum_tokens_single"),
        s"fixpoint can only merge MORE (fewer tokens), never fewer: $r")
    }
    // and on the real sf0.001 corpus: converged, deviation measured zero
    val real = TextAnalysis.qBpeEncodeFixpoint(spark, "/root/testdata/sf0.001")
      .collect()
    assert(real.forall(_.getAs[Boolean]("all_converged")))
  }

  test("pq ann: full Scala recompute of k-means TRAINING + encode + ADC " +
    "matches the gate bit-for-bit; training moves the centroids; " +
    "self never ranks") {
    val sf = "/root/testdata/sf0.001"
    val M = Similarity.PqM; val S = Similarity.PqSub
    // quantize exactly as the engine/oracle do: round(x·10⁴) half-up
    val vs: Map[Long, Array[Long]] = spark.read
      .parquet(s"$sf/embeddings.parquet")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x =>
          BigDecimal(x.toDouble * Similarity.PqQuant)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray)
      .toMap
    val seeds = vs.keys.filter(id => id % Similarity.PqSeedMod == 0 &&
      id < Similarity.PqSeedCap).toSeq.sorted
    assert(seeds.size == Similarity.PqK,
      s"seed cap must BIND at sf0.001: ${seeds.size}")
    var cb: Array[Array[Array[Long]]] = Array.tabulate(M)(m =>
      seeds.map(id => vs(id).slice(m * S, (m + 1) * S)).toArray)
    val seed0 = cb.map(_.map(_.clone()))
    val nK = seeds.size
    def dist(q: Array[Long], m: Int, c: Array[Long]): Long =
      (0 until S).foldLeft(0L)((acc, i) =>
        acc + (q(m * S + i) - c(i)) * (q(m * S + i) - c(i)))
    def codesOf(q: Array[Long]): Array[Int] = Array.tabulate(M)(m =>
      (0 until nK).minBy(k => (dist(q, m, cb(m)(k)), k)))
    for (_ <- 1 to Similarity.PqIters) {
      val assign = vs.toSeq.map { case (id, q) => (q, codesOf(q)) }
      val next = cb.map(_.map(_.clone()))
      for (m <- 0 until M; k <- 0 until nK) {
        val members = assign.collect { case (q, cs) if cs(m) == k => q }
        if (members.nonEmpty) {
          val n = members.size.toLong
          for (i <- 0 until S) {
            val sv = members.foldLeft(0L)((acc, q) => acc + q(m * S + i))
            next(m)(k)(i) = if (sv < 0) -((-sv) / n) else sv / n
          }
        }
      }
      cb = next
    }
    // training is real: the Lloyd rounds moved centroids off the seeds
    assert(cb.flatten.map(_.toSeq) != seed0.flatten.map(_.toSeq),
      "k-means left every centroid exactly at its seed")
    val queries = vs.keys.filter(id => id % Similarity.QueryMod == 0 &&
      id < Similarity.QueryCap).toSeq.sorted
    val want = queries.flatMap { qid =>
      val lut = Array.tabulate(M, nK)((m, k) => dist(vs(qid), m, cb(m)(k)))
      vs.toSeq.filter(_._1 != qid).map { case (id, v) =>
        val c = codesOf(v)
        (id, (0 until M).foldLeft(0L)((acc, m) => acc + lut(m)(c(m))))
      }.sortBy { case (id, dd) => (dd, id) }.take(Similarity.TopK)
        .zipWithIndex.map { case ((id, dd), i) => (qid, id, i + 1, dd) }
    }.toSet
    val got = Similarity.qAnnPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .toSet
    assert(got == want, s"ADC recompute diverges:\n got=${got.toSeq.sorted}" +
      s"\nwant=${want.toSeq.sorted}")
    // structural sanity: codes are in range and the codebook is genuinely
    // multi-cell in every subspace (a collapsed codebook would make ADC
    // vacuous while still "matching")
    val allCodes = vs.values.toSeq.map(codesOf)
    (0 until M).foreach { m =>
      val used = allCodes.map(_(m)).toSet
      assert(used.forall(k => k >= 0 && k < nK))
      assert(used.size >= 4,
        s"subspace $m collapsed to ${used.size} live cells")
    }
  }

  test("qgram fuzzy match == brute quadratic on adversarial names: " +
    "word-boundary edits, duplicates-of-rare-grams, hot shared grams, " +
    "length skews") {
    import spark.implicits._
    val dir = tmpDir("fuzzy-qgram")
    // every string pair within a brand is a potential near-match;
    // brands are EXPLICIT so each designed pair shares one (an i%2
    // assignment silently split them in an earlier draft and made the
    // short-name cases vacuous). Cases: 1-char edits at word
    // boundaries, names sharing ONLY hot q-grams (no match), ed-3
    // lookalikes (no match), identical names (ed 0 — excluded), and
    // SHORT names where the prefix theorem gives no guarantee —
    // including an ed-2 pair sharing ZERO 3-grams ('abcde'/'azcye'),
    // which only the short fallback can find
    val rows = Seq(
      (0L, "linen azure brushed tomato steel", "Brand#1"),
      (1L, "linen azure brushed tomato steel", "Brand#1"), // exact dup
      (2L, "linen azure brushed tomato steal", "Brand#1"), // tail sub
      (3L, "linen azure brushed tomato stee", "Brand#1"), // deletion
      (4L, "linen azure brushed tomato steels", "Brand#1"), // insertion
      (5L, "line azure brushed tomato steel", "Brand#1"), // head deletion
      (6L, "linen azure crushed tomato steel", "Brand#1"), // mid sub
      (7L, "litmus azure brushed tomato steel", "Brand#1"), // ed 3: none
      (8L, "navy mint brushed rose steel", "Brand#2"), // hot grams only
      (9L, "navy mint brushed rose stee1", "Brand#2"), // ed 1 of row 8
      (10L, "ab cdefgh", "Brand#2"), // short (< prefix len)
      (11L, "ab cdefgi", "Brand#2"), // ed 1 of row 10
      (12L, "abcde", "Brand#2"), // 5 chars: 3 grams only
      (13L, "azcye", "Brand#2"), // ed 2 of row 12, ZERO shared grams
      (14L, "ax", "Brand#2"), // below q: no grams at all
      (15L, "bx", "Brand#2"), // ed 1 of row 14
      (16L, "wholly unrelated spring chiffon", "Brand#1"),
      // location-filter boundary: two HEAD insertions shift every
      // surviving gram by exactly k = 2 positions — |Δpos| = MaxEdit,
      // the edge a '< MaxEdit' regression would lose
      (17L, "qrstuvwxyzmnop", "Brand#3"),
      (18L, "ZZqrstuvwxyzmnop", "Brand#3"), // ed 2: head double-insert
      // repeated rare gram: the same 3-gram recurs at positions > k
      // apart; only the monotone occurrence-matching argument (each
      // side's pos tiebreak in the prefix order) keeps this lossless
      (19L, "zozozo glint paddle", "Brand#3"),
      (20L, "zozozo glint padle", "Brand#3")) // ed 1: tail deletion
    rows.toDF("p_partkey", "p_name", "p_brand")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = Linkage.qFuzzyMatchQgram(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(5))).toSet
    // brute reference: full quadratic within brand, unit-cost edit
    // distance, band [1, MaxEdit]
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      a <- rows; b <- rows
      if a._1 < b._1 && a._3 == b._3
      ed = lev(a._2, b._2) if ed >= 1 && ed <= Linkage.MaxEdit
    } yield (a._1, b._1, ed)).toSet
    assert(got == want,
      s"prefix filter must be lossless and verify exact:\n got=$got\nwant=$want")
    assert(want.exists(_._3 == 1) && want.exists(_._3 == 2),
      "fixture must exercise both edit distances")
    assert(got.contains((12L, 13L, 2)) && got.contains((14L, 15L, 1)),
      "the short fallback must find the zero-shared-gram ed-2 pair " +
        "and the below-q pair the prefix theorem cannot cover")
    assert(got.contains((17L, 18L, 2)),
      "the location filter's |Δpos| ≤ k boundary: a head double-insert " +
        "shifts every surviving gram by exactly k and must still match")
    assert(got.contains((19L, 20L, 1)),
      "repeated-gram prefixes must still witness their pair")
  }
}
