package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global rank over a total order WITHOUT a single-partition window.
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY plans as a
  * single-partition sort — one task sees every row, the classic scale
  * cliff. The distributed-exact formulation used here:
  *
  *  1. range-partitioned `orderBy` (Spark's sampling-based
  *     TotalOrderPartitioner — each partition holds a contiguous key
  *     range, sorted within),
  *  2. `monotonically_increasing_id()` decomposed into its documented
  *     (partitionId << 33) + localIndex layout, giving each row its
  *     partition and its 0-based offset within the partition for free,
  *  3. per-partition row counts → exclusive prefix sums (a window over
  *     O(numPartitions) rows — metadata, not data),
  *  4. broadcast-join the offsets back: rank = offset + localIndex + 1.
  *
  * Two passes over the sorted data (one to count, one to rank) and one
  * broadcast join — no shuffle after the sort itself, every operator
  * whole-stage codegen. The sorted frame is locally checkpointed so both
  * passes see the SAME partition/id assignment (a recompute could resample
  * range boundaries).
  *
  * The sort columns must form a TOTAL order (include a unique tiebreaker);
  * otherwise ranks within a tie group depend on partition placement.
  */
object GlobalRank {

  /** The pre-checkpoint sort stage: range-partitioned `orderBy` + id
    * assignment. Exposed so plan tests can assert the sort's shape — the
    * checkpoint in [[withRank]] truncates lineage, hiding this stage from
    * the final query's executed plan.
    */
  private[graft] def sortedWithId(df: DataFrame, sortCols: Seq[Column]): DataFrame =
    df.orderBy(sortCols: _*)
      .withColumn("__mid", monotonically_increasing_id())

  /** Adds `rankCol` (1-based exact global rank under `sortCols`) and
    * `nCol` (total row count, the same on every row — callers need n for
    * quantile math and this avoids a second scan).
    */
  def withRank(df: DataFrame, sortCols: Seq[Column], rankCol: String,
      nCol: String): DataFrame = {
    val sorted = sortedWithId(df, sortCols).localCheckpoint()
    val local = col("__mid").bitwiseAND(lit((1L << 33) - 1))
    // exclusive prefix sum of per-partition counts, plus the grand total
    val offs = sorted
      .groupBy(shiftright(col("__mid"), 33).as("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset",
        coalesce(sum(col("__cnt")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn(nCol, sum(col("__cnt")).over(Window.orderBy(col("__pid"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .drop("__cnt")
    sorted
      .withColumn("__pid", shiftright(col("__mid"), 33))
      .join(broadcast(offs), "__pid")
      .withColumn(rankCol, col("__offset") + local + 1)
      .drop("__pid", "__mid", "__offset")
  }
}
