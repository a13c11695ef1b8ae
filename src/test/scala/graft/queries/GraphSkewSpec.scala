package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Adversarial ONE-HUB fixtures for the graph family's power-law skew
  * bounds (round-9 verdict stretch item): the stated arguments — the
  * degree-ordered orientation's O(√m) out-degree bound and LPA's
  * histogram-not-degree window input — asserted on the graph shape
  * they exist for, where the naive formulations blow up quadratically
  * at the hub.
  */
class GraphSkewSpec extends SparkSpec {

  test("degree-ordered orientation on a one-hub graph: the hub's " +
    "out-degree is 0, every out-degree obeys k(k+1) <= 2m, the wedge " +
    "input collapses versus the naive deg^2 blowup, and the triangle " +
    "witnesses stay exact") {
    val s = spark; import s.implicits._
    // hub 0 joined to spokes 1..40; consecutive spokes (2k-1, 2k)
    // paired, so each pair closes a triangle with the hub
    val edges = ((1 to 40).map(i => (0, i)) ++
      (1 to 20).map(k => (2 * k - 1, 2 * k))).toDF("a", "b")
    val deg = Graph.edgeDegrees(edges)
    val oriented = Graph.orientByDegree(edges, deg)
    // every hub edge points INTO the hub: zero wedges enumerate there
    assert(oriented.filter(col("src") === 0).count() == 0,
      "the celebrity hub must have oriented out-degree 0")
    val m = edges.count()
    val outdeg = oriented.groupBy(col("src"))
      .agg(count(lit(1)).as("od"))
    val maxOut = outdeg.agg(max(col("od"))).head.getLong(0)
    // the theorem: k higher-ordered neighbors of degree >= own degree
    // force k(k+1) <= sum(deg) = 2m
    assert(maxOut * (maxOut + 1) <= 2 * m,
      s"out-degree $maxOut violates the sqrt(2m) bound at m=$m")
    // skew collapse: the wedge join's input is sum(outdeg^2), not the
    // naive sum(deg^2) the hub dominates
    val sumOut2 = outdeg.agg(sum(col("od") * col("od"))).head.getLong(0)
    val sumDeg2 = deg.agg(sum(col("dg") * col("dg"))).head.getLong(0)
    assert(sumDeg2 >= 1600 && sumOut2 <= 4 * m,
      s"wedge input sumOut2=$sumOut2 vs naive sumDeg2=$sumDeg2")
    // exactness on the same fixture: 20 triangles, hub credited in all
    val tri = Graph.orientedTriangles(oriented)
    assert(tri.count() == 20)
    val credit = tri
      .select(explode(array(col("u"), col("x"), col("y"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("t"))
    assert(credit.filter(col("n") === 0).head.getLong(1) == 20)
    assert(credit.filter(col("n") =!= 0).agg(max(col("t")))
      .head.getLong(0) == 1)
  }

  test("LPA adoption windows read the neighbor-label HISTOGRAM: the " +
    "hub's window input is its distinct neighbor labels, collapsing " +
    "to one row once the neighborhood agrees — never its degree") {
    val s = spark; import s.implicits._
    val e0 = (1 to 40).map(i => (0, i)).toDF("a", "b")
    val edges = e0.unionByName(
      e0.select(col("b").as("a"), col("a").as("b")))
    var labels = edges.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
    // round 1: spokes all carry distinct self-labels — the hub's
    // histogram is deg rows, the worst case
    val h1 = Graph.lpaHistogram(edges, labels)
    assert(h1.filter(col("a") === 0).count() == 40)
    labels = Graph.lpaAdopt(h1)
    // every spoke's sole neighbor is the hub (label 0) → all adopt 0;
    // round 2's hub window input is ONE histogram row carrying the
    // full degree-40 mass — O(distinct labels), not O(deg)
    val h2 = Graph.lpaHistogram(edges, labels)
    val hubRows = h2.filter(col("a") === 0).collect()
    assert(hubRows.length == 1,
      s"hub histogram must collapse to 1 row, got ${hubRows.length}")
    assert(hubRows.head.getAs[Long]("c") == 40,
      "the collapsed row must carry the full neighbor mass")
    // per-node bound everywhere: histogram rows <= distinct neighbor
    // labels <= degree (spokes each see exactly the hub's one label)
    assert(h2.filter(col("a") =!= 0)
      .groupBy(col("a")).agg(count(lit(1)).as("rows"))
      .agg(max(col("rows"))).head.getLong(0) == 1)
  }
}
