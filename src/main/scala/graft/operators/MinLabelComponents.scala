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
    // Reliable-checkpoint mode also tracks each generation's rdd-N
    // directories inside the (session-unique, setCheckpointDir-UUID'd)
    // checkpoint dir, by before/after listing, so superseded
    // generations' files are DELETED on rotation (round-8 advisory: a
    // K-iteration run otherwise accretes K full label-frame copies on
    // the cluster store for the app lifetime). Assumes the session
    // checkpoints sequentially during the loop — true for this repo's
    // Verify/Bench/spec drivers. The FINAL generation's blocks/files
    // intentionally outlive the call (the caller consumes the frame);
    // Verify/Bench free blocks in their per-query sweep, and the final
    // checkpoint files go with the app's checkpoint dir.
    def ckptDirsNow(): Set[String] = sc.getCheckpointDir match {
      case Some(d) =>
        val p = new org.apache.hadoop.fs.Path(d)
        val fs = p.getFileSystem(sc.hadoopConfiguration)
        if (fs.exists(p)) fs.listStatus(p).map(_.getPath.toString).toSet
        else Set.empty[String]
      case None => Set.empty[String]
    }
    var labelDirs = Set.empty[String]
    def checkpointTracked(df: DataFrame): (DataFrame, Set[Int], Set[String]) = {
      val before = sc.getPersistentRDDs.keySet.toSet
      val dirsBefore = ckptDirsNow()
      // Materialize.barrier: reliable checkpoint() when a dir is set
      // (cluster posture — the id diff then finds nothing to reclaim,
      // which is correct: reliable checkpoints hold no executor
      // blocks; the DIR diff reclaims instead), localCheckpoint
      // otherwise; eager either way, so the convergence probe below
      // never recomputes the iteration
      val ck = graft.Materialize.barrier(df)
      (ck, sc.getPersistentRDDs.keySet.toSet -- before,
        ckptDirsNow() -- dirsBefore)
    }
    def dropCheckpointDirs(dirs: Set[String]): Unit = dirs.foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(sc.hadoopConfiguration).delete(p, true)
    }
    var labels = {
      val (ck, ids, dirs) = checkpointTracked(
        nodes.select(col(nodeCol).as("__node"))
          .withColumn("__label", col("__node")))
      labelIds = ids; labelDirs = dirs; ck
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
      val (updated, newIds, newDirs) = checkpointTracked(labels
        .join(nbrMin, col("__node") === col("__probe"), "left_outer")
        .select(col("__node"),
          least(col("__label"),
            coalesce(col("__nbr_min"), col("__label"))).as("__label"),
          (coalesce(col("__nbr_min"), col("__label")) < col("__label"))
            .as("__changed")))
      converged = updated.filter(col("__changed")).isEmpty
      labelIds.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
      dropCheckpointDirs(labelDirs)
      labelIds = newIds
      labelDirs = newDirs
      labels = updated.select(col("__node"), col("__label"))
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"label propagation did not converge in $maxIter iterations")
    labels.select(col("__node").as(nodeCol), col("__label").as("label"))
  }
}
