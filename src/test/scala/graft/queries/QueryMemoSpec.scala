package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The suite-run memoization contract: composites consult [[QueryMemo]]
  * but never require it, so the correctness gates (which never seed) are
  * untouched, and a seeded suite run produces IDENTICAL results.
  */
class QueryMemoSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("composites produce identical results with and without seeded twins") {
    QueryMemo.clear()
    // gate path: memo empty → recompute from scratch
    val recallCold = rows(Dedup.qDedupRecall(spark, sf))
    val clustersCold = rows(Dedup.qDedupClusters(spark, sf))
    val annCold = rows(Similarity.qAnnRecall(spark, sf))
    val encodeCold = rows(TextAnalysis.qBpeEncode(spark, sf))

    // suite path: seed the twins the way Bench does
    QueryMemo.seed("q_dedup_ngram", sf, Dedup.qDedupNgram(spark, sf))
    QueryMemo.seed("q_dedup_minhash", sf, Dedup.qDedupMinhash(spark, sf))
    QueryMemo.seed("q_ann_bruteforce", sf, Similarity.qAnnBruteforce(spark, sf))
    QueryMemo.seed("q_ann_lsh", sf, Similarity.qAnnLsh(spark, sf))
    QueryMemo.seed("q_ann_ivf", sf, Similarity.qAnnIvf(spark, sf))
    QueryMemo.seed("q_bpe_train", sf, TextAnalysis.qBpeTrain(spark, sf))
    try {
      assert(rows(Dedup.qDedupRecall(spark, sf)) == recallCold)
      assert(rows(Dedup.qDedupClusters(spark, sf)) == clustersCold)
      assert(rows(Similarity.qAnnRecall(spark, sf)) == annCold)
      assert(rows(TextAnalysis.qBpeEncode(spark, sf)) == encodeCold)
    } finally QueryMemo.clear()
  }

  test("seeding pins exactly the seeded checkpoint, and lookup is keyed by dir") {
    QueryMemo.clear()
    import spark.implicits._
    val sc = spark.sparkContext
    // an unrelated checkpoint that a suite sweep SHOULD free
    val unrelated = Seq(1, 2, 3).toDF("x").localCheckpoint()
    val before = sc.getPersistentRDDs.keySet
    QueryMemo.seed("t", "/dir/a", Seq(4, 5).toDF("y"))
    val added = sc.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty && added.forall(QueryMemo.isPinned))
    assert(before.forall(id => !QueryMemo.isPinned(id)),
      "pre-existing checkpoints must not be pinned")
    assert(QueryMemo.lookup("t", "/dir/a").isDefined)
    assert(QueryMemo.lookup("t", "/dir/b").isEmpty,
      "a seed for one sf dir must never serve another")
    // the Bench sweep pattern: unpersist everything unpinned, then the
    // seeded frame must still be readable
    sc.getPersistentRDDs
      .filter { case (id, _) => !QueryMemo.isPinned(id) }
      .values.foreach(_.unpersist(true))
    assert(QueryMemo.lookup("t", "/dir/a").get.count() == 2)
    QueryMemo.clear()
    unrelated.unpersist()
  }
}
