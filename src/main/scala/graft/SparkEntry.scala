package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Cdc.queries ++
      graft.queries.TextAnalysis.queries ++
      graft.queries.Dedup.queries ++
      graft.queries.Similarity.queries ++
      graft.queries.Events.queries ++
      graft.queries.Media.queries ++
      graft.queries.Approx.queries ++
      graft.queries.Profiling.queries ++
      graft.queries.Curation.queries ++
      graft.queries.Linkage.queries ++
      graft.queries.Graph.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.Cdc.oracle ++
      graft.queries.TextAnalysis.oracle ++
      graft.queries.Dedup.oracle ++
      graft.queries.Similarity.oracle ++
      graft.queries.Events.oracle ++
      graft.queries.Media.oracle ++
      graft.queries.Approx.oracle ++
      graft.queries.Profiling.oracle ++
      graft.queries.Curation.oracle ++
      graft.queries.Linkage.oracle ++
      graft.queries.Graph.oracle
}
