package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.Ops

/** Graph analytics over a relationally-derived graph: fixed-iteration
  * PageRank on the customer↔supplier trade graph (an edge wherever a
  * customer's order includes a supplier's lineitem). Complements the
  * connected-components operator in [[Dedup.qDedupClusters]] with the
  * other classic iterative-propagation shape.
  *
  * Determinism: all rank arithmetic is scaled-integer floor division
  * (×10^12), so results are independent of summation order, partitioning,
  * and engine — float PageRank would differ in the last bits everywhere.
  * The fixed iteration count (no convergence test) keeps the oracle an
  * unrolled CTE chain.
  *
  * Scale shape: each iteration is one equi-join of ranks onto edges (both
  * sides hash-partitioned on the node key — the exchange is reused across
  * iterations) plus one aggregate with map-side partials. K iterations =
  * K joins + K aggregates, the same per-iteration cost profile GraphX/
  * Pregel pays; the node-count scalar joins in as a broadcast literal row.
  */
object Graph {

  /** Rank scale (10^12): keeps floor-division quotients exact in both
    * engines — every dividend stays ≤ ~10^14, far under the 2^52 bound
    * where floor(double-division) stops matching integer division.
    */
  val Scale = 1000000000000L
  val Iterations = 3
  /** Damping 0.85 expressed as an integer ratio. */
  val DampNum = 85L
  val DampDen = 100L

  private def idiv(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) = graft.text.TextOps.idiv(a, b)

  /** Symmetric customer↔supplier edge list with degrees; one row per
    * directed edge. Checkpointed: reused by every iteration.
    */
  def qPagerank(s: SparkSession, d: String): DataFrame = {
    // Node ids are LONGS in flight (customer 2k, supplier 2k+1): every
    // shuffle/sort/join in the iteration loop compares 8-byte keys, not
    // variable-length strings. The presentation strings ("c<id>"/"s<id>")
    // are built once in the final projection only.
    val pairs = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2L).as("a"),
        (col("l_suppkey") * 2L + 1L).as("b"))
      .distinct()
    // pre-partition on the join key BEFORE the checkpoint: localCheckpoint
    // preserves partitioning, so every iteration's edges⋈ranks starts from
    // an already-hash-partitioned big side — no edges exchange in any
    // iteration (ReuseExchange would dedup them, but this removes even
    // the first, and pins the layout against AQE coalescing drift)
    val edges = pairs
      .unionByName(pairs.select(col("b").as("a"), col("a").as("b")))
      .repartition(col("a"))
      .stage()
    // checkpoint the degree table: r0 plus every iteration's base term and
    // every broadcast node-count subquery re-reads it — uncheckpointed,
    // each of those re-aggregates the full edge list (~8 passes)
    val deg = edges.groupBy(col("a")).agg(count(lit(1)).as("deg"))
      .stage()
    val nCnt = deg.agg(count(lit(1)).as("n"))
    // the teleport term and r0 are iteration-invariant — computed ONCE and
    // checkpointed (tiny: one row per node) instead of rebuilding the
    // deg × nCnt broadcast join inside every iteration
    val base = deg.crossJoin(broadcast(nCnt))
      .select(col("a"),
        idiv(lit(Scale), col("n")).as("r0"),
        idiv(lit((DampDen - DampNum) * Scale), col("n") * DampDen).as("tele"),
        col("deg"))
      .stage()
    var ranks = base.select(col("a"), col("r0").as("rank"), col("deg"))
    for (_ <- 1 to Iterations) {
      val contrib = edges.join(ranks, "a")
        .select(col("b").as("node"),
          idiv(col("rank") * DampNum, col("deg") * DampDen).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_sum"))
      ranks = base
        .join(contrib, col("a") === col("node"), "left")
        .select(col("a"),
          (col("tele") + coalesce(col("in_sum"), lit(0L))).as("rank"),
          col("deg"))
    }
    ranks.select(
      when(col("a") % 2 === 0, concat(lit("c"), shiftright(col("a"), 1)))
        .otherwise(concat(lit("s"), shiftright(col("a"), 1))).as("node"),
      col("rank").as("rank_scaled"), col("deg"))
      .orderBy(col("node"))
  }

  val oracle: Map[String, String] = Map(
    "q_pagerank" -> {
      val iters = (1 to Iterations).map { k =>
        s"""c$k AS (SELECT e.b AS node,
           |  sum(r * $DampNum // (deg * $DampDen)) AS s
           |  FROM e JOIN r${k - 1} USING (a) GROUP BY 1),
           |r$k AS (SELECT deg.a,
           |  CAST(${(DampDen - DampNum) * Scale} // (n * $DampDen)
           |    + coalesce(s, 0) AS BIGINT) AS r, deg.deg, n
           |  FROM deg CROSS JOIN nn LEFT JOIN c$k ON deg.a = c$k.node)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (SELECT DISTINCT
         |    'c' || CAST(o_custkey AS VARCHAR) AS a,
         |    's' || CAST(l_suppkey AS VARCHAR) AS b
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |e AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
         |deg AS (SELECT a, count(*) AS deg FROM e GROUP BY 1),
         |nn AS (SELECT count(*) AS n FROM deg),
         |r0 AS (SELECT a, CAST($Scale // n AS BIGINT) AS r, deg, n
         |       FROM deg CROSS JOIN nn),
         |$iters
         |SELECT a AS node, r AS rank_scaled, deg
         |FROM r$Iterations ORDER BY node""".stripMargin
    }
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank" -> (qPagerank _)
  )
}
