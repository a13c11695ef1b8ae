package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity-resolution / record-linkage operators: fuzzy matching of near-
  * identical names via blocked edit distance — the "same real-world thing,
  * different spelling" problem every ingest pipeline hits.
  *
  * Scale design: never all-pairs. A BLOCKING key (here the brand) bounds
  * the candidate product to Σ block², the classic ER compromise; the pair
  * join is an equi-join on the block key (one shuffle, AQE-skew-splittable
  * if a block runs hot). At 100 TB, blocks too large for a quadratic pass
  * get the PPJoin prefix-filter treatment ([[Dedup.qDedupNgramPrefix]]) on
  * name q-grams instead — same verify, subquadratic candidates.
  *
  * `levenshtein` is unit-cost edit distance in both Spark and DuckDB, so
  * the oracle matches cell-exactly.
  */
object Linkage {

  /** Inclusive edit-distance band: 0 is exact dup (the dedup family's
    * job), >2 is noise on two-word names.
    */
  val MaxEdit = 2

  /** Near-identical part names at edit distance 1..2 — the canonical
    * "fat-finger variant" detector. Blocking key: (brand, LAST NAME
    * TOKEN). The second key is the standard hierarchical-blocking move
    * when a single key's blocks grow with the corpus (brand blocks are
    * n/25 — quadratic pair growth; adding the last token caps blocks at
    * the adjective vocabulary). Blocking keys are part of the operator
    * contract: recall is bounded by them (a pair straddling blocks is
    * unseen — on this corpus no distance≤2 pair does), which is the
    * explicit trade every production ER system makes.
    */
  def qFuzzyMatch(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
      .select(col("p_partkey"), col("p_name"), col("p_brand"),
        element_at(split(col("p_name"), " "), -1).as("blk_tok"))
    val a = p.select(col("p_brand"), col("blk_tok"),
      col("p_partkey").as("part_a"), col("p_name").as("name_a"))
    val b = p.select(col("p_brand"), col("blk_tok"),
      col("p_partkey").as("part_b"), col("p_name").as("name_b"))
    a.join(b, Seq("p_brand", "blk_tok"))
      .filter(col("part_a") < col("part_b"))
      // bounded form: banded DP that abandons a pair once distance
      // provably exceeds MaxEdit (returns -1) — O(k·n) per pair instead
      // of O(n·m), and the band collapses immediately on length-skewed
      // pairs. Kept rows and distances are identical to the unbounded
      // form filtered to [1, MaxEdit].
      .withColumn("edit_dist",
        levenshtein(col("name_a"), col("name_b"), MaxEdit))
      .filter(col("edit_dist") >= 1)
      .select(col("part_a"), col("part_b"), col("p_brand"),
        col("name_a"), col("name_b"), col("edit_dist"))
      .orderBy(col("part_a"), col("part_b"))
  }

  val oracle: Map[String, String] = Map(
    "q_fuzzy_match" ->
      s"""WITH p AS (SELECT p_partkey, p_name, p_brand,
         |  string_split(p_name, ' ')[-1] AS blk_tok FROM part)
         |SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
         |  a.p_brand, a.p_name AS name_a, b.p_name AS name_b,
         |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
         |FROM p a JOIN p b
         |  ON a.p_brand = b.p_brand AND a.blk_tok = b.blk_tok
         | AND a.p_partkey < b.p_partkey
         |WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND $MaxEdit
         |ORDER BY part_a, part_b""".stripMargin
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fuzzy_match" -> (qFuzzyMatch _)
  )
}
