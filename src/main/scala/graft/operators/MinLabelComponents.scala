package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative MIN-LABEL propagation to
  * convergence — the shared engine behind near-dup clustering
  * ([[graft.queries.Dedup]] `qDedupClusters`) and entity resolution
  * ([[graft.queries.Linkage]] `qEntityResolution`). Extracted (round-7
  * review) because the tracked-checkpoint loop is subtle enough that two
  * hand-kept copies WILL drift: an eager lineage barrier per iteration,
  * persistent-RDD-id diffing so superseded generations free immediately,
  * a convergence probe that only scans the just-cached blocks, and a
  * loud failure if the diameter bound is exceeded.
  *
  * Scale shape: each iteration is one equi-join + one aggregate
  * (shuffle on the node key); iterations = component diameter (near-dup
  * and same-entity clusters are tiny, so a handful). The driver loop
  * only checks a converged flag — no data is collected. Deterministic:
  * labels monotonically decrease to the component minimum. The eager
  * checkpoint per iteration is [[graft.Materialize]]'s documented loop
  * case (an unbounded lineage chain across iterations is what the
  * barrier exists to cut); on a cluster this loop runs over reliable
  * checkpoints once `setCheckpointDir` is configured.
  */
object MinLabelComponents {

  /** Propagate until no label changes. `nodes` is the one-column vertex
    * frame (`nodeCol`); `edges` holds ONE row per undirected pair
    * (`srcCol`, `dstCol`) and is symmetrized internally. Labels
    * initialize to the node value itself; the result is
    * (`nodeCol`, "label") with label = the component's minimum value.
    */
  def components(nodes: DataFrame, edges: DataFrame, nodeCol: String,
      srcCol: String, dstCol: String, maxIter: Int = 100): DataFrame = {
    val sc = nodes.sparkSession.sparkContext
    val bidir = edges
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .unionByName(edges
        .select(col(dstCol).as("__src"), col(srcCol).as("__dst")))
    var labelIds = Set.empty[Int] // checkpoint blocks of the live labels
    def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet.toSet
      // Materialize.barrier: reliable checkpoint() when a dir is set
      // (cluster posture — the id diff then finds nothing to reclaim,
      // which is correct: reliable checkpoints hold no executor
      // blocks), localCheckpoint otherwise; eager either way, so the
      // convergence probe below never recomputes the iteration
      val ck = graft.Materialize.barrier(df)
      (ck, sc.getPersistentRDDs.keySet.toSet -- before)
    }
    var labels = {
      val (ck, ids) = checkpointTracked(
        nodes.select(col(nodeCol).as("__node"))
          .withColumn("__label", col("__node")))
      labelIds = ids; ck
    }
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val nbrMin = bidir
        .join(labels, col("__dst") === col("__node"))
        .groupBy(col("__src").as("__probe"))
        .agg(min(col("__label")).as("__nbr_min"))
      // One real pass per iteration: the new label AND a changed flag
      // materialize together in the eager checkpoint; the convergence
      // probe below only scans the just-cached blocks. Superseded
      // generations free immediately — an unbounded checkpoint chain
      // multiplies resident memory by the iteration count.
      val (updated, newIds) = checkpointTracked(labels
        .join(nbrMin, col("__node") === col("__probe"), "left_outer")
        .select(col("__node"),
          least(col("__label"),
            coalesce(col("__nbr_min"), col("__label"))).as("__label"),
          (coalesce(col("__nbr_min"), col("__label")) < col("__label"))
            .as("__changed")))
      converged = updated.filter(col("__changed")).isEmpty
      labelIds.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
      labelIds = newIds
      labels = updated.select(col("__node"), col("__label"))
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"label propagation did not converge in $maxIter iterations")
    labels.select(col("__node").as(nodeCol), col("__label").as("label"))
  }
}
