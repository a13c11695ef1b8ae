package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the data-mixture resampler and the bigram-LM scorer
  * (exact values are oracle-gated; these pin semantics + plan shape).
  */
class CurationMixSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("data mixture: rates respect weights, kept counts within rate bounds") {
    val rows = Curation.qDataMixture(spark, sf).collect()
    assert(rows.nonEmpty)
    val bySrc = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // upweighted (even-index) sources get a strictly higher rate than
    // odd ones of the same size
    val evens = bySrc.filter { case (s, _) => s.drop(3).toLong % 2 == 0 }
    val odds = bySrc.filter { case (s, _) => s.drop(3).toLong % 2 == 1 }
    assert(evens.nonEmpty && odds.nonEmpty)
    assert(evens.values.map(_._2).min > odds.values.map(_._2).max)
    // kept ≤ candidates; rate==0 → kept==0; rate==10000 → kept==n_src
    bySrc.values.foreach { case (n, rate, kept) =>
      assert(kept <= n)
      if (rate == 0) assert(kept == 0)
      if (rate == 10000L) assert(kept == n)
    }
    // the hash selection is reproducible: run twice, same result
    val again = Curation.qDataMixture(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("lm score: bounded by 10000·max(B/U)≤10000-ish and deterministic") {
    val rows = TextAnalysis.qLmScore(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1); val sc = r.getLong(2)
      assert(n >= 1)
      // per-gram ratio B(g)/U(w1) ≤ 1 (a bigram starting with w1 cannot
      // occur more often than w1 itself), so the scaled average ≤ 10000
      assert(sc >= 0 && sc <= 10000, s"score out of range: $r")
    }
    // a doc made of the corpus's most common continuations scores higher
    // than a doc of rare ones — proxy: scores are not all equal
    assert(rows.map(_.getLong(2)).distinct.length > 1)
  }

  test("lm score: every multi-token doc appears exactly once") {
    val n = TextAnalysis.qLmScore(spark, sf)
      .groupBy(col("doc_id")).count().filter(col("count") > 1).count()
    assert(n == 0)
    val docs = graft.Tables.documents(spark, sf).count()
    assert(TextAnalysis.qLmScore(spark, sf).count() == docs)
  }
}
