package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics + scale-shape checks for the retrieval operators
  * (exact values are gated by the DuckDB oracle; these specs pin the
  * invariants and the physical plan the 100 TB design relies on).
  */
class RetrievalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bm25: top-k ordered, scores positive, only matching docs") {
    val rows = Retrieval.qBm25TopK(spark, sf).collect()
    assert(rows.length == Retrieval.BmTopK)
    val scores = rows.map(_.getLong(rows.head.fieldIndex("score_x10000")))
    assert(scores.sameElements(scores.sortBy(-_)), "scores must be descending")
    assert(scores.forall(_ > 0))
    val nTerms = rows.map(_.getLong(rows.head.fieldIndex("n_terms")))
    assert(nTerms.forall(n => n >= 1 && n <= Retrieval.QueryTerms.size))
    // determinism: equal scores tie-break on doc_id ascending
    rows.sliding(2).foreach { case Array(a, b) =>
      if (a.getLong(1) == b.getLong(1)) assert(a.getLong(0) < b.getLong(0))
    }
  }

  test("bm25: more on-term occurrences cannot lower the rank order basis") {
    // saturation sanity: tf enters the score monotonically (k1 saturation),
    // checked on the closed-form integer formula used by the query
    def score(idf: Long, tf: Long, rel: Long): Long =
      idf * 2200L * tf / (tf * 1000L + 300L + rel * 9L / 10L)
    val idf = 12345L
    val rel = 1000L
    val s = (1L to 30L).map(score(idf, _, rel))
    assert(s == s.sorted, "score must be monotone in tf")
    // and saturates: the marginal gain shrinks
    val gains = s.sliding(2).map { case Seq(a, b) => b - a }.toSeq
    assert(gains.head > gains.last)
  }

  test("bm25: plan is one corpus scan, top-k as TakeOrderedAndProject") {
    val df = Retrieval.qBm25TopK(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // the corpus-side tf computation must not shuffle the corpus: the only
    // exchanges are the tiny df/stats aggregates and the final doc rollup
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("hybrid search: RRF fuses both arms, agrees with a Scala recompute") {
    val rows = Retrieval.qHybridSearch(spark, sf).collect()
    assert(rows.length == Retrieval.HybridTopK)
    rows.foreach { r =>
      val (t, v, rrf) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(t >= 0 && t <= Retrieval.HybridArmK)
      assert(v >= 0 && v <= Retrieval.HybridArmK)
      assert(t > 0 || v > 0, "a fused doc must appear in at least one arm")
      def c(rank: Long) = if (rank == 0) 0L else 1000000L / (Retrieval.RrfK + rank)
      assert(rrf == c(t) + c(v), s"RRF mismatch: $r")
    }
    // ordered by fused score desc then doc_id
    val scores = rows.map(_.getLong(3))
    assert(scores.sameElements(scores.sortBy(-_)))
    // a doc ranked #1 in BOTH arms would dominate; at minimum the top
    // fused doc must beat any single-arm-only doc's best possible score
    val topBoth = rows.filter(r => r.getLong(1) > 0 && r.getLong(2) > 0)
    topBoth.foreach(r => assert(r.getLong(3) > 1000000L / (Retrieval.RrfK + 1)))
  }

  test("kmeans update: exact partition of the corpus into centroid cells") {
    val rows = Retrieval.qKmeansUpdate(spark, sf).collect()
    val nVecs = graft.Tables.embeddings(spark, sf).count()
    // 64 rows per cluster, members partition the corpus exactly
    val byCluster = rows.groupBy(_.getLong(0))
    assert(byCluster.values.forall(_.length == 64))
    val memberTotal = byCluster.values.map(_.head.getLong(2)).sum
    assert(memberTotal == nVecs, s"$memberTotal != $nVecs")
    // clusters are centroid ids
    assert(byCluster.keySet.forall(_ % Retrieval.CentroidMod == 0))
    // within-cluster n_members is constant across dims
    byCluster.values.foreach { rs =>
      assert(rs.map(_.getLong(2)).distinct.length == 1)
    }
  }

  test("kmeans update: centroid components stay inside the coordinate hull") {
    val rows = Retrieval.qKmeansUpdate(spark, sf).collect()
    val hull = graft.Tables.embeddings(spark, sf)
      .select(explode(col("embedding")).as("x"))
      .agg(min(col("x")), max(col("x"))).collect().head
    val (lo, hi) = (hull.getFloat(0) * Retrieval.CoordScale,
      hull.getFloat(1) * Retrieval.CoordScale)
    val cs = rows.map(_.getLong(3))
    assert(cs.forall(c => c >= lo - 1 && c <= hi + 1),
      s"centroid outside hull: ${cs.min}..${cs.max} vs $lo..$hi")
  }

  test("kmeans update: assignment broadcasts centroids (no corpus shuffle before partial agg)") {
    val df = Retrieval.qKmeansUpdate(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
