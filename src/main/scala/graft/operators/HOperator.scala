package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One round of the h-operator (Lü et al. 2016): replace each node's
  * value with the h-index of its neighbors' values — the largest h such
  * that ≥ h neighbors hold value ≥ h. Iterated from degrees, the
  * fixpoint is exactly CORENESS; the per-node local update is the
  * parallel formulation that survives many executors where the classic
  * min-degree peel is inherently serial.
  *
  * Layout contract (the `q_kcore` shape): `edges` is the SYMMETRIZED
  * (a, b) list, pre-partitioned on `a` — the window/agg key — and
  * staged by the caller; `values` is the O(nodes) (n, h) table and is
  * BROADCAST into that layout, so a round never exchanges the edge
  * list. On a graph whose node table outgrows broadcast, flip the join
  * to the hash-partitioned form (one edge exchange per round).
  *
  * The h-index folds over the per-node VALUE HISTOGRAM, not the raw
  * neighbor rows: within a block of equal-valued neighbors (descending
  * order), max(least(rn, v)) is attained at the block's last row, so
  * h(a) = max over distinct values v of least(cum_count(≥v), v). The
  * groupBy(a, vh) is exchange-free under the a-partitioning (clustering
  * on a superset of the partition key) and replaces the full-edge
  * window sort with one hash-agg pass. SKEW receipt: a HUB node's
  * window input is its distinct neighbor-VALUE count, not its degree —
  * a million-degree hub whose neighbors hold a few hundred distinct
  * h-values sorts a few hundred rows, so the power-law hot partition is
  * bounded by the value range (spec-pinned in `HOperatorSpec`). Exact
  * integers throughout; distinct vh per node, so no tiebreak is needed.
  */
object HOperator {

  /** One round: `edges` (a, b) ⋈ `values` (n, h) on b = n → (n, h'). */
  def round(edges: DataFrame, values: DataFrame): DataFrame = {
    val nb = edges.join(broadcast(values), edges("b") === values("n"))
      .select(col("a"), col("h").as("vh"))
      .groupBy(col("a"), col("vh")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("a")).orderBy(col("vh").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    nb.withColumn("cum", sum(col("c")).over(w))
      .groupBy(col("a")).agg(max(least(col("cum"), col("vh"))).as("h"))
      .select(col("a").as("n"), col("h"))
  }

  /** The histogram a round sorts per node — exposed so specs can pin
    * the skew bound (hub window rows = distinct neighbor values).
    */
  private[graft] def histogram(edges: DataFrame,
      values: DataFrame): DataFrame =
    edges.join(broadcast(values), edges("b") === values("n"))
      .select(col("a"), col("h").as("vh"))
      .groupBy(col("a"), col("vh")).agg(count(lit(1)).as("c"))
}
