package graft.queries

import graft.SparkSpec

/** Round-9 gate internals. */
class Round9OpsSpec extends SparkSpec {

  test("tombstone-clusters gate: the suite memo path (decode the " +
    "incremental gate's cluster table back to labels) is row-identical " +
    "to the standalone recompute") {
    val d = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2),
        r.getString(3))).toSeq
    try {
      // standalone path (what Verify measures): memo empty
      QueryMemo.clear()
      val standalone = rows(Dedup.qDedupClustersTombstone(spark, d))
      // suite path: seed exactly what Bench seeds — the incremental
      // gate's measured result — and rerun
      QueryMemo.seed("q_dedup_clusters_incremental", d,
        Dedup.qDedupClustersIncremental(spark, d))
      val memoed = rows(Dedup.qDedupClustersTombstone(spark, d))
      assert(standalone == memoed,
        s"memo decode drifted: ${standalone.diff(memoed).take(3)} vs " +
          s"${memoed.diff(standalone).take(3)}")
      // the witness values all survive both paths
      val vias = standalone.map(_._4).toSet
      assert(vias == Set("recomputed", "merged", "carried"),
        s"marker vocabulary $vias")
    } finally QueryMemo.clear()
  }
}
