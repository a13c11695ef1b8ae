package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of an AGGREGATE-over-join view from CDC
  * deltas — the step past [[IncrementalJoinView]]: a warehouse keeps
  * `V = SELECT g, count(*), sum(m) FROM A ⋈ B GROUP BY g` materialized
  * and applies each change batch ALGEBRAICALLY, in O(|Δ|), without
  * re-scanning the base tables or re-aggregating untouched groups (the
  * reference's consumers maintain exactly such per-group rollups from
  * the change topics, `/root/reference/docs/architecture.md:49-66`).
  *
  * count/sum are self-maintainable aggregates: the view moves by the
  * DIFFERENCE between the touched keys' new and old contributions, so a
  * step never needs any untouched key's row. A maintenance step:
  *   1. collects the touched-key set from both delta batches;
  *   2. reads those keys' OLD joined contributions from the maintained
  *      states — the retraction set;
  *   3. refreshes both side states for touched keys only
  *      ([[IncrementalJoinView.sideState]] reduction) and reads the NEW
  *      contributions — the insertion set;
  *   4. folds insertions(+1) and retractions(−1) to per-group
  *      (Δcount, Δsum) and merges them into the view by one group-keyed
  *      outer join: groups reaching count 0 leave the view, groups the
  *      delta touched are marked `delta_applied` (even on a net-zero
  *      delta — the marker witnesses MAINTENANCE structure, not change),
  *      all other groups are `carried` untouched.
  *
  * This handles every keyed-CDC mutation shape: a payload update shifts
  * a group's sum; a GROUP-attribute update retracts from the old group
  * and inserts into the new one (the case plain re-aggregation of the
  * delta rows gets wrong); a delete on either side retracts the joined
  * contribution.
  *
  * Scale shape: contributions and state refreshes are key-equi joins
  * semi-filtered to the touched set (O(|Δ|)); the per-group delta fold
  * partially aggregates map-side; only the final merge touches the view,
  * which is GROUP-sized — orders of magnitude below the base tables it
  * summarizes. Per-batch cost is O(|Δ| + |groups|) versus the full
  * recompute's O(|A| + |B|) scan + join + aggregate.
  */
object IncrementalAggView {

  /** Joined per-key contributions `(key, g, m)` of the two live states:
    * `groupCol` rides on side A, `metricCol` on side B.
    */
  def contribs(aState: DataFrame, bState: DataFrame, key: String,
      groupCol: String, metricCol: String): DataFrame =
    aState.drop("lsn").join(bState.drop("lsn"), key)
      .select(col(key), col(groupCol).as("g"), col(metricCol).as("m"))

  /** Bootstrap the maintained aggregate from the two initial states. */
  def bootstrap(aState: DataFrame, bState: DataFrame, key: String,
      groupCol: String, metricCol: String): DataFrame =
    contribs(aState, bState, key, groupCol, metricCol)
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_members"), sum(col("m")).as("total"))

  /** One maintenance step. `agg` is the maintained view
    * `(g, n_members, total)`; deltas carry `(key, op, lsn, payload…)`.
    * Returns `(agg', aState', bState')`, with `touchedCol` on the view.
    */
  def step(agg: DataFrame, aState: DataFrame, bState: DataFrame,
      aDelta: DataFrame, bDelta: DataFrame, key: String,
      groupCol: String, metricCol: String, touchedCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val (a, aS, bS, _) = stepCore(agg, aState, bState, aDelta,
      bDelta, key, groupCol, metricCol, touchedCol, wantTouched = false)
    (a, aS, bS)
  }

  /** [[step]] that ALSO returns the step's touched-GROUP set — distinct
    * `g` over the retraction ∪ insertion contribution frontier, i.e.
    * every group the merge could possibly have rewritten, INCLUDING
    * groups the step emptied out of the view (a marker-based read of
    * the merged view would miss exactly those — they are the feed's
    * 'd' rows). This is the probe [[graft.operators.ViewDelta
    * .diffTouched]] wants: the per-batch change feed then costs
    * O(touched), never O(view). Only THIS variant stages the delta
    * fold (it is consumed twice — merge and probe); the plain [[step]]
    * keeps it lazy inside the merge plan, where staging would add a
    * whole extra materialization pass per step (measured +1.9 s on the
    * two-step `q_cdc_mv_ivm` when round 12 briefly staged both paths).
    */
  def stepWithTouched(agg: DataFrame, aState: DataFrame, bState: DataFrame,
      aDelta: DataFrame, bDelta: DataFrame, key: String,
      groupCol: String, metricCol: String, touchedCol: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) =
    stepCore(agg, aState, bState, aDelta, bDelta, key, groupCol,
      metricCol, touchedCol, wantTouched = true)

  private def stepCore(agg: DataFrame, aState: DataFrame,
      bState: DataFrame, aDelta: DataFrame, bDelta: DataFrame,
      key: String, groupCol: String, metricCol: String,
      touchedCol: String, wantTouched: Boolean)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    import graft.Materialize.Ops
    val touched = IncrementalJoinView.touchedKeys(aDelta, bDelta, key)
      .stage() // semi-probes (×2), both refreshes, and both carries
    def touchedOnly(state: DataFrame): DataFrame =
      state.join(touched, Seq(key), "left_semi").stage() // oldC + refresh
    val aTouched = touchedOnly(aState)
    val bTouched = touchedOnly(bState)
    // retractions: what the touched keys contribute NOW (pre-batch)
    val oldC = contribs(aTouched, bTouched, key, groupCol, metricCol)
    // refreshed side states for touched keys (max-lsn/delete-wins over
    // touched state rows + delta rows — the shared sideState reduction,
    // with the empty-op re-tag so an equal-lsn delta supersedes state)
    val aT = IncrementalJoinView.refreshTouched(aTouched, aDelta, touched, key)
      .stage() // newC + state carry
    val bT = IncrementalJoinView.refreshTouched(bTouched, bDelta, touched, key)
      .stage() // newC + state carry
    val newC = contribs(aT, bT, key, groupCol, metricCol)
    val aCarry = IncrementalJoinView.carryState(aState, touched, aT, key)
    val bCarry = IncrementalJoinView.carryState(bState, touched, bT, key)
    if (wantTouched) {
      val delta = deltaFold(newC, oldC).stage() // merge + touched probe
      (mergeFold(agg, delta, touchedCol), aCarry, bCarry,
        delta.select(col("g")))
    } else
      (mergeDelta(agg, newC, oldC, touchedCol), aCarry, bCarry, null)
  }

  /** Fold insertion(+1)/retraction(−1) contribution sets `(key, g, m)`
    * to per-group (Δcount, Δsum) and merge them into the maintained
    * aggregate by ONE group-keyed outer join — shared by the shared-key
    * step above and [[IncrementalFkAggView.step]]. Groups reaching
    * count 0 leave the view; groups present in EITHER contribution set
    * mark `delta_applied` (even net-zero — the marker witnesses
    * maintenance structure), all others `carried`.
    */
  private[cdc] def mergeDelta(agg: DataFrame, newC: DataFrame,
      oldC: DataFrame, touchedCol: String): DataFrame =
    mergeFold(agg, deltaFold(newC, oldC), touchedCol)

  /** The per-group algebraic delta `(g, dn, dm)` of an
    * insertion(+1)/retraction(−1) contribution pair; the sign folds
    * map-side before any shuffle. Its key set IS the step's touched
    * groups ([[stepWithTouched]] stages and reuses it for both the
    * merge and the change-feed probe).
    */
  private[cdc] def deltaFold(newC: DataFrame, oldC: DataFrame): DataFrame =
    newC.withColumn("sign", lit(1L))
      .unionByName(oldC.withColumn("sign", lit(-1L)))
      .groupBy(col("g"))
      .agg(sum(col("sign")).as("dn"), sum(col("m") * col("sign")).as("dm"))

  /** Merge a pre-folded [[deltaFold]] frame into the maintained view by
    * one group-keyed outer join (see [[mergeDelta]] for the contract).
    */
  private[cdc] def mergeFold(agg: DataFrame, delta: DataFrame,
      touchedCol: String): DataFrame =
    agg
      .join(delta.select(col("g").as("dg"), col("dn"), col("dm")),
        col("g") === col("dg"), "full_outer")
      .select(coalesce(col("g"), col("dg")).as("g"),
        (coalesce(col("n_members"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n_members"),
        (coalesce(col("total"), lit(0L)) + coalesce(col("dm"), lit(0L)))
          .as("total"),
        when(col("dg").isNotNull, lit("delta_applied"))
          .otherwise(lit("carried")).as(touchedCol))
      .filter(col("n_members") > 0)
}
