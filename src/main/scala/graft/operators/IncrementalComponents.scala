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
  * Deletions have no local formulation (removing one bridge can split a
  * component only a full traversal can certify), and append-only is the
  * real contract of candidate-pair streams — [[step]] therefore handles
  * insertions only. A deletion-bearing batch goes through
  * [[stepWithTombstones]], which DETECTS tombstones and falls back to a
  * witnessed recompute scoped to the affected components (gated by
  * `q_dedup_clusters_tombstone`), never silently treating the batch as
  * append-only.
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

  /** Maintenance step for a batch that MAY carry edge TOMBSTONES
    * (`opCol` = 'd' rows naming an existing pair in its stored
    * orientation; anything else is an insertion).
    *
    * Dispatch is explicit, never silent: a delete-free batch routes
    * through the O(|Δ|) [[step]]; a deletion-bearing batch falls back to
    * a WITNESSED recompute — decremental connectivity has no local form
    * (only a traversal can certify whether removing a bridge splits a
    * component) — but the recompute is SCOPED to the affected
    * components. Deleting or inserting an edge can only change the
    * component structure of components holding a delta endpoint: every
    * surviving old edge has both endpoints under one old label, and
    * every inserted edge's endpoints are delta endpoints, so the
    * affected subgraph is CLOSED and everything outside it carries
    * verbatim. At corpus scale a tombstone therefore re-certifies its
    * own component's subgraph, not the corpus.
    *
    * Requires the maintained live edge set (the pair system of record a
    * real dedup service keeps anyway). Returns `(labels', liveEdges')`;
    * labels' carries `via` ∈ {'recomputed', 'carried'} on the fallback
    * path and [[step]]'s {'merged', 'carried'} on the append-only path.
    * The dispatch read (`isEmpty` on the delta's tombstone slice) is
    * delta-bounded driver traffic, the same order as the IVM gates'
    * per-batch bookkeeping.
    */
  def stepWithTombstones(labels: DataFrame, liveEdges: DataFrame,
      delta: DataFrame, opCol: String, nodeCol: String, labelCol: String,
      srcCol: String, dstCol: String, via: String)
      : (DataFrame, DataFrame) = {
    import graft.Materialize.Ops
    val dels = delta.filter(col(opCol) === "d")
      .select(col(srcCol), col(dstCol))
    val ins = delta.filter(col(opCol) =!= "d")
      .select(col(srcCol), col(dstCol))
    // maintained live-edge state stays duplicate-free (round-9
    // advisory: a re-inserted already-live pair must not accumulate a
    // second copy across batches — harmless for connectivity, but it
    // grows the state and skews any count over it). One anti-join of
    // the corpus-sized live set against the delta-bounded (dels ∪ ins)
    // probe, HINTED broadcast (round-10: the unhinted join planned as a
    // sort-merge at sf0.1, shuffling the whole live set per batch — the
    // q_dedup_clusters_tombstone median regression), then the batch's
    // distinct insertions.
    val survivors = liveEdges
      .join(broadcast(delta.select(col(srcCol), col(dstCol)).distinct()),
        Seq(srcCol, dstCol), "left_anti")
      .unionByName(ins.distinct())
    if (dels.isEmpty)
      (step(labels, ins, nodeCol, labelCol, srcCol, dstCol, via), survivors)
    else {
      val lbl = labels.select(col(nodeCol), col(labelCol))
      // affected components = labels holding ANY delta endpoint
      // (deletes and inserts both); unseen endpoints are their own label
      val ends = delta
        .select(explode(array(col(srcCol), col(dstCol))).as(nodeCol))
        .distinct()
      val touched = ends.join(lbl, Seq(nodeCol), "left")
        .select(coalesce(col(labelCol), col(nodeCol)).as("__tl"))
        .distinct()
        .stage() // semi/anti probes below; delta-bounded build side
      val fresh = ends.join(lbl.select(col(nodeCol)), Seq(nodeCol),
        "left_anti")
      val affNodes = lbl
        .join(broadcast(touched), col(labelCol) === col("__tl"),
          "left_semi")
        .select(col(nodeCol)).unionByName(fresh)
        .stage() // the recompute's node frame + the edge scope probe
      // the affected subgraph is closed (see scaladoc), so scoping on
      // the src endpoint alone keeps the surviving-edge scan one-pass
      val affEdges = survivors.join(
        affNodes.select(col(nodeCol).as(srcCol)), Seq(srcCol), "left_semi")
      val recomputed = MinLabelComponents
        .components(affNodes, affEdges, nodeCol, srcCol, dstCol)
        .select(col(nodeCol), col("label").as(labelCol),
          lit("recomputed").as(via))
      val carried = lbl
        .join(broadcast(touched), col(labelCol) === col("__tl"),
          "left_anti")
        .select(col(nodeCol), col(labelCol), lit("carried").as(via))
      (carried.unionByName(recomputed), survivors)
    }
  }

  /** Fold a tombstone-capable step's markers with the PREVIOUS
    * generation's — the combine both tombstone gates (batch and
    * streaming delivery) share, in ONE place so they cannot drift
    * (round-10 advisory; a drift would be caught only by their common
    * oracle): the recompute path OUTRANKS ('recomputed' stays), and a
    * row the step carried keeps its previous witness
    * ('merged'/'carried'/'bootstrap' from the earlier generation). Rows
    * the previous labeling never held (fresh nodes) keep the step's own
    * marker — on the tombstone path a fresh node is always in the
    * recompute scope, so the fallback only fires for append-path calls.
    *
    * `stepped` is the step's (nodeCol, labelCol, stepVia) output; `prev`
    * carries (nodeCol, prevVia). Returns (nodeCol, labelCol, outVia).
    * Markers are uniform per final cluster on both axes (the affected
    * subgraph is closed; an untouched cluster is a whole previous
    * cluster), so a per-cluster `max` over `outVia` reduces exactly.
    */
  def combineTombstoneMarkers(stepped: DataFrame, prev: DataFrame,
      nodeCol: String, labelCol: String, stepVia: String, prevVia: String,
      outVia: String): DataFrame =
    stepped.select(col(nodeCol), col(labelCol), col(stepVia).as("__sv"))
      .join(prev.select(col(nodeCol), col(prevVia).as("__pv")),
        Seq(nodeCol), "left")
      .select(col(nodeCol), col(labelCol),
        when(col("__sv") === "recomputed", lit("recomputed"))
          .otherwise(coalesce(col("__pv"), col("__sv"))).as(outVia))
}
