package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Embedding near-dup variants vs the TRUE all-pairs oracle. The
  * unbounded crossJoin lives ONLY here — no gated query ships an O(n²)
  * plan; this spec is where its answer is still computed (test scale) to
  * measure what the bounded variants trade away:
  *  - blocked exact ([[Dedup.qDedupEmbedding]]): pairs must be EXACTLY
  *    the all-pairs matches whose endpoints share a super-block (no
  *    approximation inside a block),
  *  - banded LSH ([[Dedup.qDedupEmbeddingLsh]]): pairs ⊆ all-pairs, with
  *    a recall floor from the band survival probability,
  *  - neither plan may contain a cartesian product.
  */
class DedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  /** Test-only all-pairs cosine matches + each endpoint's super-block. */
  private def allPairs(): (Set[(Long, Long)], Set[(Long, Long)]) = {
    val emb = Tables.embeddings(spark, sf).select(
      col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("norm",
        sqrt(graft.functions.VectorFunctions.dot(col("v"), col("v"))))
      .withColumn("block",
        Similarity.superBlock(col("v"), Dedup.EmbedBlockBits))
      .localCheckpoint()
    val a = emb.select(col("vec_id").as("vec_a"), col("v").as("va"),
      col("norm").as("na"), col("block").as("ba"))
    val b = emb.select(col("vec_id").as("vec_b"), col("v").as("vb"),
      col("norm").as("nb"), col("block").as("bb"))
    val pairs = a.crossJoin(b)
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", graft.functions.VectorFunctions.dot(col("va"), col("vb")) /
        (col("na") * col("nb")))
      .filter(col("cos") >= 0.4)
      .select(col("vec_a"), col("vec_b"), (col("ba") === col("bb")).as("same_block"))
      .collect()
    val all = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    val sameBlock = pairs.filter(_.getBoolean(2))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (all, sameBlock)
  }

  test("blocked exact = all-pairs ∩ same-block; LSH ⊆ all-pairs with recall floor; no cartesian plans") {
    val (all, sameBlock) = allPairs()
    assert(all.nonEmpty)

    val blockedDf = Dedup.qDedupEmbedding(spark, sf)
    val blocked = blockedDf.select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == sameBlock,
      s"blocked exact must be precisely the same-block all-pairs matches; " +
        s"extra=${blocked -- sameBlock} missing=${sameBlock -- blocked}")

    val lshDf = Dedup.qDedupEmbeddingLsh(spark, sf)
    val lsh = lshDf.select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(all),
      s"LSH produced pairs the all-pairs oracle lacks: ${lsh -- all}")
    val lshRecall = lsh.size.toDouble / all.size
    // 16-bit/4-band hyperplane LSH at cos≥0.4: P(pair survives) =
    // 1-(1-p^4)^4 with p = 1-θ/π ≈ 0.63 at the threshold — ~50% there,
    // higher for closer pairs. 0.25 is a conservative floor.
    assert(lshRecall >= 0.25,
      s"LSH recall $lshRecall below floor (${lsh.size}/${all.size})")

    for ((name, df) <- Seq("blocked" -> blockedDf, "lsh" -> lshDf)) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
        s"$name dedup plan must not contain a cartesian product:\n$plan")
    }
  }
}
