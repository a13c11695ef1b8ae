package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Cluster-safe materialization policy, in one place.
  *
  * Round-6 verdict: `localCheckpoint()` had become the de-facto
  * materialization primitive (~40 call sites). It is correct and fast at
  * local[32], but it TRUNCATES LINEAGE: on a real cluster a lost executor
  * makes the cached blocks unrecoverable and kills the job ("RDD ...
  * cannot be recomputed"). At 100 TB on 1000 executors, executor loss is
  * routine — the default materialization must tolerate recompute.
  *
  * Two primitives, chosen per call site by what the site NEEDS:
  *
  *  - [[stage]] — the default. `persist(MEMORY_AND_DISK)`: the plan keeps
  *    its lineage, every consumer reads the cache once filled (block-level
  *    locking means concurrent branches fill each partition once), and a
  *    lost executor recomputes only the lost partitions from lineage —
  *    slower, never fatal, never wrong. Lazy: materialization happens
  *    inside the query's own action, so a plan-construction pass (explain,
  *    plan sweeps) no longer runs jobs. Only valid for DETERMINISTIC
  *    subtrees — recompute must reproduce the same rows.
  *
  *  - [[barrier]] — for sites where cutting lineage (or freezing a
  *    non-redoable read) is the SEMANTIC point, not a cache tactic:
  *    iterative loops that must not accrue O(K²) replay chains, frames
  *    whose inputs the caller is about to overwrite (compaction /
  *    index-write swap), and layout-dependent id assignment
  *    (zipWithIndex). Eager by construction. On a cluster, set
  *    `sparkContext.setCheckpointDir` and every barrier becomes a RELIABLE
  *    checkpoint (HDFS/object-store backed, survives executor loss); with
  *    no checkpoint dir (local runs, tests) it falls back to
  *    `localCheckpoint()`, whose loss-fatality is acceptable exactly
  *    there. JDBC snapshot freezing (`JdbcIncremental`) keeps its own
  *    explicit localCheckpoint + block-freeing protocol and is not routed
  *    through here.
  */
object Materialize {

  /** Recompute-tolerant shared materialization (see class doc). */
  def stage(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    df
  }

  /** Eager lineage cut: reliable `checkpoint()` when a checkpoint dir is
    * configured (the cluster posture), `localCheckpoint()` otherwise.
    */
  def barrier(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()

  /** Chainable forms: `.stage()` / `.barrier()` read like the
    * `.localCheckpoint()` calls they replace.
    */
  implicit class Ops(private val df: DataFrame) extends AnyVal {
    def stage(): DataFrame = Materialize.stage(df)
    def barrier(): DataFrame = Materialize.barrier(df)
  }
}
