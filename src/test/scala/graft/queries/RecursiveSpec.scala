package graft.queries

import graft.SparkSpec

/** The recursive-CTE family (`UnionLoop`) against closed forms computed
  * independently in Scala from the same parquet: parent(id) = id div 2 is
  * a binary tree, so depth/path/subtree have exact brute-force twins.
  */
class RecursiveSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private lazy val nodes: Map[Int, Int] = {
    val s = spark
    graft.Tables.customer(s, sf)
      .selectExpr("CAST(c_custkey AS INT)", "CAST(c_nationkey AS INT)")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
  }

  private def chain(id: Int): List[Int] = {
    // self + ancestors along id -> id/2 -> ... while present in the table
    val b = List.newBuilder[Int]
    var cur = id
    b += cur
    while (cur > 1 && nodes.contains(cur / 2)) { cur = cur / 2; b += cur }
    b.result()
  }

  test("q_recursive_path matches the closed-form depth and path sum") {
    val out = Recursive.qRecursivePath(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toList
    assert(out.map(_._1) == out.map(_._1).sorted, "ordered by id")
    assert(out.size == nodes.size)
    out.foreach { case (id, depth, pathW) =>
      val c = chain(id)
      assert(depth == c.size - 1, s"depth of $id")
      assert(pathW == c.map(nodes(_).toLong).sum, s"path_w of $id")
    }
  }

  test("q_recursive_subtree matches the brute-force descendant rollup") {
    val out = Recursive.qRecursiveSubtree(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toList
    // brute force: desc D belongs to anc A iff A is on D's chain
    val under = nodes.keys.toList.flatMap(d => chain(d).map(a => a -> d))
      .groupBy(_._1).map { case (a, ps) => a -> ps.map(_._2) }
    assert(out.size == nodes.size)
    out.foreach { case (id, members, w) =>
      val ds = under(id)
      assert(members == ds.size.toLong, s"members of $id")
      assert(w == ds.map(nodes(_).toLong).sum, s"subtree_w of $id")
    }
  }

  test("q_recursive_bom matches the closed-form extended quantity") {
    val out = Recursive.qRecursiveBom(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toList
    def qty(id: Int): Long = id % 5 + 1
    def ext(id: Int): Long = if (id == 1) qty(1) else ext(id / 2) * qty(id)
    // custkeys start at 0 in this data: node 0 is NOT reachable from
    // root 1 (and only it — every id ≥ 2 halves down to 1), so the BOM
    // traversal emits exactly the root-reachable nodes
    def reachable(id: Int): Boolean =
      id == 1 || (id > 1 && nodes.contains(id / 2) && reachable(id / 2))
    assert(out.size == nodes.keys.count(reachable))
    out.foreach { case (id, lvl, e) =>
      assert(lvl == chain(id).size - 1, s"lvl of $id")
      assert(e == ext(id), s"ext_qty of $id")
    }
  }

  test("q_recursive_cyclic matches brute-force simple-path enumeration: " +
    "the guard blocks the 60→1 cycle and only it") {
    val present = nodes.keySet.filter(id => id >= 1 && id <= 63)
    val edges: Map[Int, List[Int]] =
      (present.filter(_ >= 2).toList.map(id => (id / 2, id)) ++
        List((60, 1), (45, 6)))
        .groupBy(_._1).map { case (p, cs) => p -> cs.map(_._2) }
    // brute-force DFS over simple paths from 1
    val paths = scala.collection.mutable.Map.empty[Int, List[Int]]
    def dfs(node: Int, path: List[Int], depth: Int): Unit = {
      paths(node) = depth :: paths.getOrElse(node, Nil)
      edges.getOrElse(node, Nil).foreach { c =>
        if (!path.contains(c)) dfs(c, c :: path, depth + 1)
      }
    }
    dfs(1, List(1), 0)
    val out = Recursive.qRecursiveCyclic(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getInt(2), r.getLong(3))))
      .toMap
    assert(out.keySet == paths.keySet)
    out.foreach { case (id, (n, mx, sm)) =>
      val ds = paths(id)
      assert(n == ds.size.toLong, s"n_paths of $id")
      assert(mx == ds.max, s"max_depth of $id")
      assert(sm == ds.map(_.toLong).sum, s"depth_sum of $id")
    }
    // the cross edge must have produced genuine second paths (else the
    // "only cycles blocked" half of the claim is vacuous at this sf)
    assert(out.exists(_._2._1 > 1L), "no multi-path node — cross edge dead")
  }

  test("the optimized plan runs through UnionLoop, and the witness is loud") {
    // positive witness is exercised by the gates above (require inside);
    // prove the guard actually fires on a non-recursive lookalike
    val s = spark
    val df = graft.Tables.customer(s, sf)
      .selectExpr("CAST(c_custkey AS INT) AS id")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("UnionLoop"))
  }
}
