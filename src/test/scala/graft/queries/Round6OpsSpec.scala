package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-6 operators: BPE fixpoint apply. The gate's corpus shows zero
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
}
