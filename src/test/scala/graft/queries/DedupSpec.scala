package graft.queries

import graft.SparkSpec

/** LSH embedding-dedup vs the exact all-pairs baseline: candidate pairs
  * must be a strict subset (no false positives — the cosine verify is
  * exact), recall must clear a floor consistent with 4-band/4-bit
  * hyperplane LSH, and the plan must contain no cartesian product (the
  * whole point of the bucketed path).
  */
class DedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("embedding LSH pairs ⊆ exact pairs, recall floor, no cartesian plan") {
    val exact = Dedup.qDedupEmbedding(spark, sf)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshDf = Dedup.qDedupEmbeddingLsh(spark, sf)
    val lsh = lshDf.select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(lsh.subsetOf(exact),
      s"LSH produced pairs the exact baseline lacks: ${lsh -- exact}")
    assert(exact.nonEmpty)
    val recall = lsh.size.toDouble / exact.size
    // 16-bit/4-band hyperplane LSH at cos≥0.4: P(pair survives) =
    // 1-(1-p^4)^4 with p = 1-θ/π ≈ 0.63 at the threshold — ~50% there,
    // higher for closer pairs. 0.25 is a conservative floor.
    assert(recall >= 0.25, s"recall $recall below floor (${lsh.size}/${exact.size})")

    val plan = lshDf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"LSH dedup plan must not contain a cartesian product:\n$plan")
  }
}
