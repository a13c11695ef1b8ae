package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental connected-components maintenance under EDGE INSERTIONS —
  * the graph member of the IVM family (`graft.cdc.Incremental*`): a
  * corpus-scale dedup/linkage graph only ever accretes pairs (a new
  * batch of near-dup candidates arrives; nobody un-discovers a
  * duplicate), and re-running full CC per batch re-pays the whole
  * corpus's propagation for a delta that touches a handful of
  * components.
  *
  * The step exploits the quotient-graph identity: connected components
  * of `G ∪ Δ` = components of the CONTRACTED graph whose nodes are the
  * current component labels (plus unseen endpoints as fresh singleton
  * labels) and whose edges are Δ mapped through the labeling. That
  * contracted graph is O(|Δ|) — bounded by the batch, independent of
  * the corpus — so the expensive iterative propagation
  * ([[MinLabelComponents]]) runs over a delta-sized frame, and the
  * corpus-sized label table is touched by exactly ONE broadcast-join
  * relabel pass.
  *
  * Deletions are intentionally out of scope: decremental connectivity
  * has no local formulation (removing one bridge can split a component
  * only a full traversal can certify), and append-only is the real
  * contract of candidate-pair streams. A deletion-bearing workload
  * recomputes — the same posture as the batch operator.
  *
  * The `via` marker witnesses maintenance structure inside the hash
  * gate: 'merged' exactly for rows whose component label the batch
  * TOUCHED (a delta edge ended in it — even when the merge turns out
  * net-zero, e.g. an edge internal to an existing component), plus all
  * newly-seen nodes; 'carried' rows were provably never rewritten.
  */
object IncrementalComponents {

  /** One maintenance step. `labels` is the maintained (nodeCol, labelCol)
    * frame; `deltaEdges` holds one row per new undirected pair
    * (srcCol, dstCol), possibly naming nodes the labeling has never
    * seen. Returns (nodeCol, labelCol, via) covering old ∪ new nodes.
    */
  def step(labels: DataFrame, deltaEdges: DataFrame, nodeCol: String,
      labelCol: String, srcCol: String, dstCol: String, via: String)
      : DataFrame = {
    import graft.Materialize.Ops
    val lbl = labels.select(col(nodeCol), col(labelCol))
    // delta endpoints resolved through the current labeling; endpoints
    // the labeling has never seen enter as fresh singleton labels
    val ends = deltaEdges
      .select(explode(array(col(srcCol), col(dstCol))).as(nodeCol))
      .distinct()
    val endLbl = ends.join(lbl, Seq(nodeCol), "left")
      .select(col(nodeCol),
        coalesce(col(labelCol), col(nodeCol)).as(labelCol))
      .stage() // both edge-endpoint maps + the contracted node set
    // the contracted graph: nodes = touched labels, edges = Δ mapped
    // through the labeling (self-loops drop; they still mark touch)
    val ce = deltaEdges
      .join(endLbl.select(col(nodeCol).as(srcCol), col(labelCol).as("__la")),
        srcCol)
      .join(endLbl.select(col(nodeCol).as(dstCol), col(labelCol).as("__lb")),
        dstCol)
      .select(col("__la"), col("__lb"))
      .filter(col("__la") =!= col("__lb"))
    val cnodes = endLbl.select(col(labelCol).as("__cn")).distinct()
    // delta-sized propagation: old label → post-batch component label
    val remap = MinLabelComponents
      .components(cnodes, ce, "__cn", "__la", "__lb")
      .select(col("__cn").as("__old"), col("label").as("__new"))
      .stage() // the corpus relabel join + the new-node relabel read it
    // ONE pass over the corpus-sized label table: remap is delta-bounded
    // (one row per touched component), the justified broadcast
    val relabeled = lbl
      .join(broadcast(remap), col(labelCol) === col("__old"), "left")
      .select(col(nodeCol),
        coalesce(col("__new"), col(labelCol)).as(labelCol),
        when(col("__old").isNotNull, lit("merged"))
          .otherwise(lit("carried")).as(via))
    val fresh = endLbl.join(lbl.select(col(nodeCol)), Seq(nodeCol),
        "left_anti")
      .join(broadcast(remap), col(labelCol) === col("__old"), "left")
      .select(col(nodeCol),
        coalesce(col("__new"), col(labelCol)).as(labelCol),
        lit("merged").as(via))
    relabeled.unionByName(fresh)
  }
}
