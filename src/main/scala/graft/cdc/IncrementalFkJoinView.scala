package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of an N:1 FOREIGN-KEY join view from CDC
  * deltas — the warehouse's commonest materialization shape:
  * `V = fact ⋈ dim ON fact.fk = dim.pk`, where MANY fact rows reference
  * one dim row (the enrichment-over-stream shape the reference's
  * consumers maintain from the change topics,
  * `/root/reference/docs/architecture.md:49-66`). This is the case
  * [[IncrementalJoinView]] (shared key, ≤1 live row per side) cannot
  * express: a single dim delta must FAN OUT to every fact-side view row
  * referencing it — one updated dimension attribute rewrites N view
  * rows, one dim delete drops N view rows — while everything else
  * carries untouched.
  *
  * Touched-key propagation THROUGH the join:
  *   1. touched dim keys = dim-delta pks;
  *   2. touched fact keys = fact-delta ids ∪ {facts whose CURRENT
  *      (pre-batch) fk references a touched dim} — the fan-out set,
  *      found by ONE semi-join of the fact state against the touched
  *      dim keys. The pre-batch fk is the right probe: a fact UPDATE
  *      that re-points its fk is already touched via its own delta, and
  *      its OLD row is superseded whole (view rows are keyed by fact
  *      id, so re-pointing needs no old-group retraction here — the
  *      aggregate case is [[IncrementalAggView]]'s job);
  *   3. both states refresh for their touched keys only (the shared
  *      [[IncrementalJoinView.refreshTouched]] max-lsn/delete-wins
  *      reduction with the empty-op carried-state sentinel);
  *   4. view rows for touched fact keys rebuild against the POST-batch
  *      dim state — refreshed facts may reference UNTOUCHED dims (a new
  *      fact row pointing at an old dim), so the lookup side is the
  *      carried+refreshed dim state, not just the refreshed rows;
  *   5. every untouched view row carries via an anti-join on the
  *      touched fact-key set.
  *
  * Scale shape: the fan-out probe is a semi-join whose build side is
  * the (typically broadcast-sized) touched-dim set; state refreshes are
  * O(|Δ| + |fan-out|); the rebuild joins O(|touched facts|) rows
  * against the dim state — the SMALL side of an N:1 join by
  * construction, broadcastable or AQE-planned; the carry is one
  * anti-join on the fact key. Per-batch cost is O(|Δ| + fan-out), where
  * fan-out is exactly the number of view rows that MUST be rewritten —
  * the information-theoretic floor — versus the full recompute's
  * O(|fact| + |dim|) scan and re-join.
  */
object IncrementalFkJoinView {

  /** One maintenance step. `view` must be the N:1 inner join of the two
    * maintained states keyed by `factKey`, with the fact's `fkCol`
    * column joined to the dim state's `dimKey`; `factState` carries
    * (factKey, lsn, fkCol, fact payload…), `dimState` (dimKey, lsn, dim
    * payload…); deltas carry the same shapes plus `op`. Returns
    * `(view', factState', dimState')` with a `touchedCol` marker on the
    * view: `"refreshed"` for fact keys the batch touched — directly or
    * through the dim fan-out — and `"carried"` for rows that moved
    * through untouched.
    */
  def step(view: DataFrame, factState: DataFrame, dimState: DataFrame,
      factDelta: DataFrame, dimDelta: DataFrame, factKey: String,
      fkCol: String, dimKey: String, touchedCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    import graft.Materialize.Ops
    val touchedDims = dimDelta.select(col(dimKey)).distinct()
      .stage() // fan-out probe, dim refresh, dim carry
    // fan-out: facts whose pre-batch fk references a touched dim
    val fanOut = factState
      .join(touchedDims, factState(fkCol) === touchedDims(dimKey),
        "left_semi")
      .select(col(factKey))
    val touchedFacts = factDelta.select(col(factKey))
      .unionByName(fanOut).distinct()
      .stage() // fact refresh, view anti-join, fact carry
    val factT = IncrementalJoinView
      .refreshTouched(factState, factDelta, touchedFacts, factKey)
      .stage() // view rebuild + fact-state carry
    val dimT = IncrementalJoinView
      .refreshTouched(dimState, dimDelta, touchedDims, dimKey)
      .stage() // post-batch dim state + dim-state carry
    // post-batch dim state: rebuild lookups may hit UNTOUCHED dims
    val dimAfter = IncrementalJoinView
      .carryState(dimState, touchedDims, dimT, dimKey)
      .stage() // view rebuild + returned dim state
    val viewCols = view.columns.filter(_ != touchedCol)
    val vCarried = view.select(viewCols.map(col).toIndexedSeq: _*)
      .join(touchedFacts, Seq(factKey), "left_anti")
      .withColumn(touchedCol, lit("carried"))
    val fT = factT.drop("lsn")
    val dA = dimAfter.drop("lsn")
    val joined = fT.join(dA, fT(fkCol) === dA(dimKey)).drop(dA(dimKey))
    // pre-drift view order first, then any drift-added columns (the
    // carried rows NULL-backfill them — see IncrementalJoinView.step)
    val outCols = viewCols ++ joined.columns.filterNot(viewCols.contains)
    val vRefreshed = joined
      .withColumn(touchedCol, lit("refreshed"))
      .select((outCols.map(col) :+ col(touchedCol)).toIndexedSeq: _*)
    (vCarried.unionByName(vRefreshed, allowMissingColumns = true)
      .select((outCols.map(col) :+ col(touchedCol)).toIndexedSeq: _*),
      IncrementalJoinView.carryState(factState, touchedFacts, factT, factKey),
      dimAfter)
  }
}
