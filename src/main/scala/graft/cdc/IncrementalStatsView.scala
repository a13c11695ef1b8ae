package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a count/sum/MIN/MAX aggregate view from
  * keyed CDC deltas — the step past [[IncrementalAggView]]: min and max
  * are NOT self-maintainable under deletion (retracting the row that
  * holds a group's extremum leaves no algebraic way to know the
  * runner-up), so every production IVM engine pairs the algebraic
  * count/sum path with a scoped re-aggregation for the groups whose
  * boundary a retraction touched. This operator implements exactly that
  * split (the reference's consumers keep per-group rollups fresh from
  * the change topics, `/root/reference/docs/architecture.md:49-66`;
  * min/max over those rollups is the first shape that forces the
  * recompute path):
  *
  *   - count/sum move ALGEBRAICALLY, O(|Δ|), by the insertion(+1)/
  *     retraction(−1) contribution fold [[IncrementalAggView]] proved;
  *   - min/max move algebraically where that is VALUE-EXACT, and fall
  *     back to a re-aggregation SCOPED to the threatened groups (with a
  *     `recomputed` witness) where it is not.
  *
  * The dichotomy theorem the split rests on: let (mn, mx) be a group's
  * maintained extrema and R its retraction multiset for this batch.
  *   - If every r ∈ R satisfies mn < r < mx STRICTLY, no retraction can
  *     carry the extremum (the rows holding mn and mx survive), so
  *     min' = least(mn, min(insertions)) and
  *     max' = greatest(mx, max(insertions)) — pure semilattice folds.
  *   - Otherwise some retraction touches the boundary (r ≤ mn or
  *     r ≥ mx — equality included: removing one of two copies of the
  *     minimum keeps it, but the algebra cannot know the multiplicity),
  *     and the group's extrema are re-aggregated from its FULL
  *     post-batch live rows. Recompute is always correct; the threat
  *     test only decides when it is NEEDED.
  *
  * A maintenance step therefore:
  *   1. collects the touched-key set and the touched keys' OLD rows —
  *      the retraction set — and the refreshed rows — the insertion set
  *      (the shared max-lsn/delete-wins [[IncrementalJoinView]]
  *      reduction);
  *   2. folds (Δcount, Δsum) per group algebraically;
  *   3. probes retractions against the maintained (mn, mx) to find the
  *      threatened groups;
  *   4. re-aggregates min/max for threatened groups only, from the
  *      post-batch state semi-filtered to those groups; folds
  *      least/greatest for everyone else;
  *   5. merges by one group-keyed outer join: groups reaching count 0
  *      leave the view; `touchedCol` marks `recomputed` (boundary
  *      fallback ran), `delta_applied` (algebraic only), or `carried`.
  *
  * Scale shape: contributions are semi-joins on the touched-key set
  * (O(|Δ|)); the threat probe joins the retraction set against the
  * GROUP-sized view; the recompute semi-join's probe side is the
  * threatened-group set — broadcast-sized when |Δ| is small — so its
  * cost is O(rows of threatened groups), not O(state). At 100 TB,
  * bucket the live state by the group column so the recompute probe
  * prunes to the threatened groups' buckets instead of scanning; the
  * classic refinement of keeping a per-group k-smallest/k-largest
  * reserve (so most boundary deletes re-fold from the reserve instead
  * of re-aggregating) drops the fallback frequency by ~k× and slots in
  * behind the same threat test.
  */
object IncrementalStatsView {

  /** Bootstrap the maintained view `(g, n_members, total, mn, mx)` from
    * a live keyed state carrying `groupCol` and `metricCol`.
    */
  def bootstrap(state: DataFrame, groupCol: String, metricCol: String)
      : DataFrame =
    state.groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n_members"), sum(col(metricCol)).as("total"),
        min(col(metricCol)).as("mn"), max(col(metricCol)).as("mx"))

  /** One maintenance step. `agg` is the maintained view
    * `(g, n_members, total, mn, mx)`; `state` the live keyed rows
    * `(key, lsn, …payload)`; `delta` a change batch
    * `(key, op, lsn, …payload)`. Returns `(agg', state')` with
    * `touchedCol` on the view.
    */
  def step(agg: DataFrame, state: DataFrame, delta: DataFrame,
      key: String, groupCol: String, metricCol: String,
      touchedCol: String): (DataFrame, DataFrame) = {
    import graft.Materialize.Ops
    val touched = delta.select(col(key)).distinct()
      .stage() // semi-probe, refresh, and carry
    val stTouched = state.join(touched, Seq(key), "left_semi")
      .stage() // retraction read + refresh input
    // retractions: what the touched keys contribute NOW (pre-batch)
    val oldC = stTouched
      .select(col(groupCol).as("g"), col(metricCol).as("m"))
    val refreshed = IncrementalJoinView
      .refreshTouched(stTouched, delta, touched, key)
      .stage() // insertion read + state carry
    // insertions: what the touched keys contribute AFTER the batch
    val newC = refreshed
      .select(col(groupCol).as("g"), col(metricCol).as("m"))
    val state2 = IncrementalJoinView.carryState(state, touched, refreshed, key)
      .stage() // recompute probe + returned state
    // algebraic (Δcount, Δsum): sign fold partially aggregates map-side
    val deltaAgg = newC.withColumn("sign", lit(1L))
      .unionByName(oldC.withColumn("sign", lit(-1L)))
      .groupBy(col("g"))
      .agg(sum(col("sign")).as("dn"), sum(col("m") * col("sign")).as("dm"))
    // boundary threat: a retraction at or beyond the maintained extrema
    // means the algebra cannot certify min/max — recompute that group
    val threat = oldC
      .join(agg.select(col("g"), col("mn"), col("mx")), Seq("g"))
      .filter(col("m") <= col("mn") || col("m") >= col("mx"))
      .select(col("g")).distinct()
      .stage() // recompute semi-probe + marker join
    val recomputed = state2
      .select(col(groupCol).as("g"), col(metricCol).as("m"))
      .join(threat, Seq("g"), "left_semi")
      .groupBy(col("g"))
      .agg(min(col("m")).as("rmn"), max(col("m")).as("rmx"))
    // semilattice fold of the insertion set for the unthreatened
    val insAgg = newC.groupBy(col("g"))
      .agg(min(col("m")).as("imn"), max(col("m")).as("imx"))
    val merged = agg
      .join(deltaAgg.select(col("g").as("dg"), col("dn"), col("dm")),
        col("g") === col("dg"), "full_outer")
      .select(coalesce(col("g"), col("dg")).as("g"),
        (coalesce(col("n_members"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n_members"),
        (coalesce(col("total"), lit(0L)) + coalesce(col("dm"), lit(0L)))
          .as("total"),
        col("mn"), col("mx"), col("dg").isNotNull.as("__touched"))
      .join(insAgg, Seq("g"), "left")
      .join(threat.withColumn("__threat", lit(true)), Seq("g"), "left")
      .join(recomputed, Seq("g"), "left")
      .select(col("g"), col("n_members"), col("total"),
        // least/greatest skip nulls: an untouched group keeps (mn, mx),
        // a brand-new group takes the insertion fold outright
        when(col("__threat"), col("rmn"))
          .otherwise(least(col("mn"), col("imn"))).as("mn"),
        when(col("__threat"), col("rmx"))
          .otherwise(greatest(col("mx"), col("imx"))).as("mx"),
        when(col("__threat"), lit("recomputed"))
          .when(col("__touched"), lit("delta_applied"))
          .otherwise(lit("carried")).as(touchedCol))
      .filter(col("n_members") > 0)
    (merged, state2)
  }
}
