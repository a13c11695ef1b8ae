package graft

import org.apache.spark.sql.SparkSession

/** Session-level engine tuning shared by every driver-contract main
  * (Bench / Verify / Explain / Profile), so the measured posture and the
  * correctness posture can never drift apart. Both knobs are
  * scale-ADAPTIVE (they delegate the actual sizing decision to AQE /
  * the workload), parameterised by env with these defaults — see
  * OPTIMIZATION_r13.md for the measurements behind them.
  *
  *  - `spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=true`
  *    (guide §2.2/§2.4): the engine's `.stage()` (persist) call sites
  *    pin their shuffles' output partitioning when this is at its
  *    default `false` — AQE partition coalescing is disabled inside
  *    every cached plan, so a group-sized staged frame carries the full
  *    `spark.sql.shuffle.partitions` partition count into every
  *    downstream job (measured: 33–328-task jobs over ~15 K-row staged
  *    frames in the IVM gates; `q_cdc_mv_ivm` 8.3 → 6.6 s warm from
  *    this knob alone). With `true`, cached plans coalesce by BYTES
  *    exactly like uncached ones — tiny staged frames collapse to a few
  *    partitions, 100 TB staged frames keep thousands; nothing here is
  *    sized to local[32]. Correctness: only physical partitioning of
  *    cached frames changes; no gate derives values from a cached
  *    frame's layout (layout-dependent id assignment goes through
  *    `GlobalRank`, which pins its frame with `localCheckpoint` —
  *    unaffected by this conf).
  *
  *  - `spark.sql.codegen.cache.maxEntries` (default 100 → 20000): the
  *    whole-stage-codegen compile cache is keyed by generated source;
  *    a 223-query suite generates thousands of distinct classes, so at
  *    the default size every pass recompiles nearly everything
  *    (measured: `q_cdc_feed_chain` +530 Janino compiles ≈ 5.4 s on a
  *    WARM re-run; 0–111 with the cache sized to the suite —
  *    17.9 → 14.5 s). This is a JVM-wide compiler cache, not data or
  *    result caching: every query still computes from parquet every
  *    time, and the knob is workload-sized (number of distinct plan
  *    shapes), not data-sized.
  */
object EngineTuning {

  /** STATIC-CONF constraint (round-13 advisory):
    * `spark.sql.codegen.cache.maxEntries` is a static SQL conf — it only
    * takes effect when set BEFORE the first SparkSession in the JVM, and
    * builder-supplied values are silently ignored once a session exists.
    * All four mains call this on their builder before `getOrCreate`; an
    * embedder that already created a session should call [[verify]] to
    * fail loudly instead of running with the 100-entry default.
    */
  def apply(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
      sys.env.getOrElse("SPARK_GRAFT_CACHED_AQE", "true"))
    .config("spark.sql.codegen.cache.maxEntries",
      sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "20000"))

  /** Assert the active session actually runs with the tuning [[apply]]
    * requested — catches the static-conf silent-ignore case above.
    */
  def verify(spark: SparkSession): Unit = {
    val expect = Seq(
      "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning" ->
        sys.env.getOrElse("SPARK_GRAFT_CACHED_AQE", "true"),
      "spark.sql.codegen.cache.maxEntries" ->
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "20000"))
    expect.foreach { case (k, v) =>
      val got = spark.conf.get(k)
      require(got == v,
        s"EngineTuning: $k is '$got', expected '$v' — a SparkSession " +
          "existed before EngineTuning ran (static confs cannot be " +
          "applied retroactively); create the session through " +
          "EngineTuning(builder) before any other getOrCreate")
    }
  }
}
