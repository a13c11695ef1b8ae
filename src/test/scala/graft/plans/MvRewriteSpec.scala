package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}
import org.apache.spark.sql.functions._

/** Pins the MV-rewrite rule's safety properties: it fires on exactly
  * the registered shape, misses on every nearby-but-different shape
  * (where a false match would corrupt results), preserves values and
  * output binding — including the zero-group global-aggregate edge
  * (count must fold to 0, not NULL) and the min/max/avg algebra — and
  * its lifetime is SCOPED: install returns a handle, uninstall removes
  * exactly it, and a post-uninstall aggregate over the same base is
  * untouched.
  */
class MvRewriteSpec extends SparkSpec {

  private lazy val basePath = {
    val p = tmpDir("graft-mv-base") + "/base.parquet"
    val s = spark; import s.implicits._
    Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L), (4L, "b", 7L),
      (5L, "c", 1L))
      .toDF("id", "seg", "v")
      .write.parquet(p)
    p
  }

  private lazy val mvPath = {
    val p = tmpDir("graft-mv-view") + "/mv.parquet"
    spark.read.parquet(basePath).groupBy(col("seg"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .write.parquet(p)
    p
  }

  /** Finer MV carrying the full algebra: count/sum/min/max over v. */
  private lazy val statsMvPath = {
    val p = tmpDir("graft-mv-stats") + "/statsmv.parquet"
    spark.read.parquet(basePath).groupBy(col("seg"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
      .write.parquet(p)
    p
  }

  private def installed[T](f: MvRewrite.RewriteRule => T): T = {
    // force both fixtures BEFORE the rule exists: building the MV runs
    // the exact registered shape, and with the rule live that build
    // would re-enter the still-initializing lazy (the same read-while-
    // overwrite hazard the gate's build-before-install ordering guards)
    basePath; mvPath
    val rule = MvRewrite.install(spark, MvRewrite.Registration(
      baseTag = "base.parquet",
      groupCols = Seq("seg"),
      aggSpecs = Seq(("count", None), ("sum", Some("v"))),
      mv = () => spark.read.parquet(mvPath)))
    try f(rule)
    finally MvRewrite.uninstall(spark, rule)
  }

  private def statsInstalled[T](f: => T): T = {
    basePath; statsMvPath
    val rule = MvRewrite.install(spark, MvRewrite.Registration(
      baseTag = "base.parquet",
      groupCols = Seq("seg"),
      aggSpecs = Seq(("count", None), ("sum", Some("v")),
        ("min", Some("v")), ("max", Some("v"))),
      mv = () => spark.read.parquet(statsMvPath)))
    try f
    finally MvRewrite.uninstall(spark, rule)
  }

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
    }.flatten

  private def agg: DataFrame = spark.read.parquet(basePath)
    .groupBy(col("seg"))
    .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))

  test("the registered shape rewrites to the MV scan with identical " +
    "values and intact downstream binding") {
    val plain = agg.orderBy(col("seg")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    installed { _ =>
      val q = agg.orderBy(col("seg"))
      assert(scanPaths(q).exists(_.contains("mv.parquet")) &&
        !scanPaths(q).exists(_.contains("base.parquet")),
        s"rewrite did not fire: ${scanPaths(q)}")
      val got = q.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == plain, s"$got != $plain")
      // downstream operators rebind through the preserved exprIds
      val filtered = agg.filter(col("n") >= 2).orderBy(col("seg"))
      assert(filtered.collect().map(_.getString(0)).toSeq == Seq("a", "b"))
    }
  }

  test("HAVING composes with group-filter pushdown and the rollup " +
    "re-fold in one routed query (the q_cdc_mv_having shape)") {
    installed { _ =>
      // σ(group) → global rollup → HAVING on the agg output: the filter
      // pushes onto the MV, the re-fold aggregates the refinement, and
      // the parent filter rebinds through the preserved exprIds
      def q: DataFrame = spark.read.parquet(basePath)
        .filter(col("seg") =!= "c")
        .groupBy()
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      val kept = q.filter(col("n") >= 4)
      assert(scanPaths(kept).exists(_.contains("mv.parquet")) &&
        !scanPaths(kept).exists(_.contains("base.parquet")),
        s"rewrite did not fire under HAVING: ${scanPaths(kept)}")
      assert(kept.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        Seq((4L, 42L)))
      // a HAVING that filters the only row yields empty, not a crash
      assert(q.filter(col("n") >= 5).collect().isEmpty)
    }
  }

  test("nearby-but-different shapes are untouched (false match would " +
    "corrupt results)") {
    installed { _ =>
      val differentGroup = spark.read.parquet(basePath)
        .groupBy(col("id")).agg(count(lit(1)).as("n"),
          sum(col("v")).as("sv"))
      val differentAgg = spark.read.parquet(basePath)
        .groupBy(col("seg")).agg(count(lit(1)).as("n"),
          sum(col("id")).as("sv"))
      val filteredBase = spark.read.parquet(basePath)
        .filter(col("v") > 5)
        .groupBy(col("seg")).agg(count(lit(1)).as("n"),
          sum(col("v")).as("sv"))
      val castBearing = spark.read.parquet(basePath)
        .select(col("seg"), col("v").cast("int").as("v"))
        .groupBy(col("seg")).agg(count(lit(1)).as("n"),
          sum(col("v")).as("sv"))
      val distinctAgg = spark.read.parquet(basePath)
        .groupBy(col("seg")).agg(count(lit(1)).as("n"),
          sum_distinct(col("v")).as("sv"))
      // min/max/avg are NOT answerable from the count+sum registration
      val unanswerable = spark.read.parquet(basePath)
        .groupBy(col("seg")).agg(min(col("v")).as("mn"))
      for ((q, what) <- Seq(differentGroup -> "different grouping",
          differentAgg -> "different agg input",
          filteredBase -> "filtered base",
          castBearing -> "cast-bearing projection",
          distinctAgg -> "distinct aggregate",
          unanswerable -> "min over a count+sum-only registration"))
        assert(!scanPaths(q).exists(_.contains("mv.parquet")),
          s"$what must NOT rewrite: ${scanPaths(q)}")
      // and the filtered query still computes correctly from base
      assert(filteredBase.orderBy(col("seg")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq ==
        Seq(("a", 2L), ("b", 1L)))
    }
  }

  test("subsumption: a group-column filter pushes onto the MV and a " +
    "grouping-subset rollup re-aggregates it — both value-exact") {
    installed { _ =>
      // filter on the group column, same groupings → σ over the MV
      val f = spark.read.parquet(basePath).filter(col("seg") =!= "b")
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      assert(scanPaths(f).exists(_.contains("mv.parquet")),
        s"filter case did not rewrite: ${scanPaths(f)}")
      assert(f.orderBy(col("seg")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
        Seq(("a", 2L, 30L), ("c", 1L, 1L)))
      // rollup to the empty grouping (global totals) → re-aggregate MV
      val g = spark.read.parquet(basePath)
        .groupBy()
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      assert(scanPaths(g).exists(_.contains("mv.parquet")),
        s"rollup case did not rewrite: ${scanPaths(g)}")
      assert(g.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        Seq((5L, 43L)))
      // composed: filter + rollup
      val fg = spark.read.parquet(basePath).filter(col("seg") =!= "b")
        .groupBy()
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      assert(scanPaths(fg).exists(_.contains("mv.parquet")))
      assert(fg.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        Seq((3L, 31L)))
      // a filter touching the METRIC must NOT rewrite (not
      // group-homogeneous — rewriting would be wrong)
      val metricFilter = spark.read.parquet(basePath)
        .filter(col("v") > 5).groupBy(col("seg"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      assert(!scanPaths(metricFilter).exists(_.contains("mv.parquet")),
        "metric filter must not rewrite")
    }
  }

  test("a zero-group global aggregate folds count to 0, not NULL " +
    "(round-9 advisory: the silently-corrupting shape)") {
    installed { _ =>
      // the group-column filter matches NO groups; the base query
      // returns one row (count=0, sum=NULL) — so must the rewrite
      val q = spark.read.parquet(basePath).filter(col("seg") === "nope")
        .groupBy()
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      assert(scanPaths(q).exists(_.contains("mv.parquet")),
        s"zero-group global case did not rewrite: ${scanPaths(q)}")
      val row = q.collect().head
      assert(row.getLong(0) == 0L, s"count must be 0, got ${row.get(0)}")
      assert(row.isNullAt(1), "sum over zero rows stays NULL")
    }
  }

  test("min/max/avg: direct reads in the exact case, semilattice and " +
    "sum/count-decomposition folds in the rollup case — value-exact") {
    def statsAgg: DataFrame = spark.read.parquet(basePath)
      .groupBy(col("seg"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"),
        avg(col("v")).as("av"))
    val plainExact = statsAgg.orderBy(col("seg")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    def statsRollup: DataFrame = spark.read.parquet(basePath)
      .groupBy()
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"),
        avg(col("v")).as("av"), count(lit(1)).as("n"))
    val plainRollup = statsRollup.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSeq
    statsInstalled {
      val e = statsAgg.orderBy(col("seg"))
      assert(scanPaths(e).exists(_.contains("statsmv.parquet")),
        s"exact stats case did not rewrite: ${scanPaths(e)}")
      val gotExact = e.collect()
        .map(r =>
          (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq
      assert(gotExact == plainExact, s"$gotExact != $plainExact")
      val g = statsRollup
      assert(scanPaths(g).exists(_.contains("statsmv.parquet")),
        s"rollup stats case did not rewrite: ${scanPaths(g)}")
      val gotRollup = g.collect()
        .map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSeq
      assert(gotRollup == plainRollup, s"$gotRollup != $plainRollup")
    }
  }

  private lazy val factPath = {
    val p = tmpDir("graft-mv-fact") + "/fact.parquet"
    val s = spark; import s.implicits._
    // a null fk exercises the inferred IsNotNull guard the matcher
    // must tolerate; fk=99 has no dim row (inner join drops it)
    Seq((1L, Some(10L), 5L), (2L, Some(10L), 7L), (3L, Some(20L), 1L),
      (4L, Some(30L), 2L), (5L, Some(99L), 9L), (6L, None, 4L))
      .toDF("id", "fk", "v")
      .write.parquet(p)
    p
  }

  private lazy val dimPath = {
    val p = tmpDir("graft-mv-dim") + "/dim.parquet"
    val s = spark; import s.implicits._
    Seq((10L, "a"), (20L, "b"), (30L, "b")).toDF("pk", "seg")
      .write.parquet(p)
    p
  }

  private lazy val joinMvPath = {
    val p = tmpDir("graft-mv-join") + "/joinmv.parquet"
    spark.read.parquet(factPath)
      .join(spark.read.parquet(dimPath), col("fk") === col("pk"))
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .write.parquet(p)
    p
  }

  private def joinInstalled[T](f: => T): T = {
    factPath; dimPath; joinMvPath
    val rule = MvRewrite.install(spark, MvRewrite.Registration(
      baseTag = "fact.parquet", groupCols = Seq("seg"),
      aggSpecs = Seq(("count", None), ("sum", Some("v"))),
      mv = () => spark.read.parquet(joinMvPath),
      join = Some(MvRewrite.JoinSpec("fact.parquet", "dim.parquet",
        "fk", "pk"))))
    try f
    finally MvRewrite.uninstall(spark, rule)
  }

  private def joinAgg: DataFrame = spark.read.parquet(factPath)
    .join(spark.read.parquet(dimPath), col("fk") === col("pk"))
    .groupBy(col("seg"))
    .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))

  test("a JOIN-bearing registration routes the fact-dim aggregate to " +
    "the MV — value-exact through null keys and unmatched fks — and " +
    "rolls up to the global grouping") {
    val plain = joinAgg.orderBy(col("seg")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    joinInstalled {
      val q = joinAgg.orderBy(col("seg"))
      assert(scanPaths(q).exists(_.contains("joinmv.parquet")) &&
        !scanPaths(q).exists(_.contains("fact.parquet")) &&
        !scanPaths(q).exists(_.contains("dim.parquet")),
        s"join rewrite did not fire: ${scanPaths(q)}")
      val got = q.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == plain, s"$got != $plain")
      // rollup to the empty grouping re-folds the joined MV
      val g = spark.read.parquet(factPath)
        .join(spark.read.parquet(dimPath), col("fk") === col("pk"))
        .groupBy()
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      assert(scanPaths(g).exists(_.contains("joinmv.parquet")))
      assert(g.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        plain.map(t => (t._2, t._3))
          .reduceOption((a, b) => (a._1 + b._1, a._2 + b._2)).toSeq)
    }
  }

  test("a group-column filter over the JOIN (pushed to the dim side " +
    "before the rule runs) re-applies as sigma over the MV; composed " +
    "with the global rollup it stays value-exact") {
    joinInstalled {
      val f = spark.read.parquet(factPath)
        .join(spark.read.parquet(dimPath), col("fk") === col("pk"))
        .filter(col("seg") =!= "b")
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      assert(scanPaths(f).exists(_.contains("joinmv.parquet")),
        s"dim-pushed filter case did not rewrite: ${scanPaths(f)}")
      assert(f.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
        Seq(("a", 2L, 12L)))
      // composed: filter + rollup to the empty grouping
      val fg = spark.read.parquet(factPath)
        .join(spark.read.parquet(dimPath), col("fk") === col("pk"))
        .filter(col("seg") === "b")
        .groupBy()
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      assert(scanPaths(fg).exists(_.contains("joinmv.parquet")))
      assert(fg.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        Seq((2L, 3L)))
    }
  }

  test("a reference-free non-deterministic filter (rand) is NOT " +
    "group-homogeneous and must miss — single-relation and join both") {
    installed { _ =>
      val q = spark.read.parquet(basePath).filter(rand() < 0.5)
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      assert(!scanPaths(q).exists(_.contains("mv.parquet")),
        "rand() filter must not rewrite (row-level vs group-level)")
    }
    joinInstalled {
      val q = spark.read.parquet(factPath)
        .join(spark.read.parquet(dimPath), col("fk") === col("pk"))
        .filter(rand() < 0.5)
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      assert(!scanPaths(q).exists(_.contains("joinmv.parquet")),
        "rand() filter must not rewrite through the join either")
    }
  }

  test("nearby-but-different JOIN shapes are untouched") {
    joinInstalled {
      val leftOuter = spark.read.parquet(factPath)
        .join(spark.read.parquet(dimPath), col("fk") === col("pk"),
          "left_outer")
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      val wrongKey = spark.read.parquet(factPath)
        .join(spark.read.parquet(dimPath), col("id") === col("pk"))
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      val filteredSide = spark.read.parquet(factPath)
        .filter(col("v") > 2)
        .join(spark.read.parquet(dimPath), col("fk") === col("pk"))
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      for ((q, what) <- Seq(leftOuter -> "left-outer join",
          wrongKey -> "different join key",
          filteredSide -> "metric-filtered fact side"))
        assert(!scanPaths(q).exists(_.contains("joinmv.parquet")),
          s"$what must NOT rewrite: ${scanPaths(q)}")
      // and the untouched shapes still compute correctly from base
      assert(filteredSide.orderBy(col("seg")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
        Seq(("a", 2L, 12L)))
    }
  }

  test("a multi-registration catalog routes each query to ITS view and " +
    "never cross-matches (the q_cdc_mv_multi shape)") {
    basePath; mvPath
    // second base + view over a DIFFERENT table shape
    val base2 = tmpDir("graft-mv-base2") + "/base2.parquet"
    val s = spark; import s.implicits._
    Seq((10L, "x", 3L), (11L, "y", 4L), (12L, "x", 5L))
      .toDF("oid", "pri", "w").write.parquet(base2)
    val mv2 = tmpDir("graft-mv-view2") + "/mv2.parquet"
    spark.read.parquet(base2).groupBy(col("pri"))
      .agg(count(lit(1)).as("n"), sum(col("w")).as("sw"))
      .write.parquet(mv2)
    val rule = MvRewrite.install(spark, Seq(
      MvRewrite.Registration("base.parquet", Seq("seg"),
        Seq(("count", None), ("sum", Some("v"))),
        () => spark.read.parquet(mvPath)),
      MvRewrite.Registration("base2.parquet", Seq("pri"),
        Seq(("count", None), ("sum", Some("w"))),
        () => spark.read.parquet(mv2))))
    try {
      val q1 = agg.orderBy(col("seg"))
      val q2 = spark.read.parquet(base2).groupBy(col("pri"))
        .agg(count(lit(1)).as("n"), sum(col("w")).as("sw"))
        .orderBy(col("pri"))
      assert(scanPaths(q1).exists(_.contains("mv.parquet")) &&
        !scanPaths(q1).exists(p =>
          p.contains("base.parquet") || p.contains("mv2.parquet")),
        s"q1 routed wrong: ${scanPaths(q1)}")
      assert(scanPaths(q2).exists(_.contains("mv2.parquet")) &&
        !scanPaths(q2).exists(p =>
          p.contains("base2.parquet") || p.contains("/mv.parquet")),
        s"q2 routed wrong: ${scanPaths(q2)}")
      assert(q1.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
        Seq(("a", 2L, 30L), ("b", 2L, 12L), ("c", 1L, 1L)))
      assert(q2.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
        Seq(("x", 2L, 8L), ("y", 1L, 4L)))
      // a shape NEITHER registration answers still falls through
      val miss = spark.read.parquet(base2).groupBy(col("oid"))
        .agg(count(lit(1)).as("n"))
      assert(scanPaths(miss).exists(_.contains("base2.parquet")))
    } finally MvRewrite.uninstall(spark, rule)
  }

  test("lifetime is scoped: uninstall removes exactly the handle and a " +
    "post-uninstall aggregate over the same base is untouched") {
    val before = spark.experimental.extraOptimizations
    installed { _ =>
      assert(scanPaths(agg).exists(_.contains("mv.parquet")))
      assert(spark.experimental.extraOptimizations
        .count(_.isInstanceOf[MvRewrite.RewriteRule]) == 1)
    }
    // the round-9 finding: the rule must NOT outlive its gate — a later
    // bare aggregate over the same base must read the base
    assert(scanPaths(agg).exists(_.contains("base.parquet")) &&
      !scanPaths(agg).exists(_.contains("mv.parquet")),
      "rule leaked past uninstall")
    assert(spark.experimental.extraOptimizations == before)
    // a stale rule left by a crashed holder is pruned by the next install
    MvRewrite.install(spark, MvRewrite.Registration(
      baseTag = "base.parquet", groupCols = Seq("seg"),
      aggSpecs = Seq(("count", None), ("sum", Some("v"))),
      mv = () => spark.read.parquet(mvPath)))
    installed { _ =>
      assert(spark.experimental.extraOptimizations
        .count(_.isInstanceOf[MvRewrite.RewriteRule]) == 1,
        "install must prune stale graft rules, not stack them")
    }
    spark.experimental.extraOptimizations = Nil
  }

  test("a freshness token gates routing on the live frontier: routes " +
    "while frontier == expected, falls back the moment it advances, " +
    "and resumes under a re-certified registration") {
    basePath; mvPath
    // the live frontier a maintenance loop would advance — the rule
    // must consult it on EVERY match attempt, not capture it once
    var frontier: Option[Long] = Some(0L)
    def reg(expected: Long) = MvRewrite.Registration(
      baseTag = "base.parquet", groupCols = Seq("seg"),
      aggSpecs = Seq(("count", None), ("sum", Some("v"))),
      mv = () => spark.read.parquet(mvPath),
      freshness = Some(MvRewrite.Freshness(() => frontier, expected)))
    val rule = MvRewrite.install(spark, reg(0L))
    try {
      assert(scanPaths(agg).exists(_.contains("mv.parquet")),
        "certified registration must route while the frontier matches")
      frontier = Some(1L) // maintenance published a newer generation
      assert(scanPaths(agg).exists(_.contains("base.parquet")) &&
        !scanPaths(agg).exists(_.contains("mv.parquet")),
        "stale registration must fall through to the base")
      frontier = None // store wiped entirely: also stale
      assert(!scanPaths(agg).exists(_.contains("mv.parquet")))
    } finally MvRewrite.uninstall(spark, rule)
    frontier = Some(1L)
    val recert = MvRewrite.install(spark, reg(1L))
    try assert(scanPaths(agg).exists(_.contains("mv.parquet")),
      "re-certified registration must resume routing")
    finally MvRewrite.uninstall(spark, recert)
  }

  test("cost-based choice: the exact-grain view beats a finer rollup " +
    "registered FIRST; a query only the finer view answers still " +
    "routes onto it") {
    basePath; mvPath
    // finer view: (seg, id) grain — answers the seg query only by
    // re-folding its refinement; the exact seg view needs no re-fold
    val finePath = tmpDir("graft-mv-fine") + "/finemv.parquet"
    spark.read.parquet(basePath).groupBy(col("seg"), col("id"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .write.parquet(finePath)
    val fineReg = MvRewrite.Registration("base.parquet",
      Seq("seg", "id"), Seq(("count", None), ("sum", Some("v"))),
      () => spark.read.parquet(finePath))
    val exactReg = MvRewrite.Registration("base.parquet", Seq("seg"),
      Seq(("count", None), ("sum", Some("v"))),
      () => spark.read.parquet(mvPath))
    val rule = MvRewrite.install(spark, Seq(fineReg, exactReg))
    try {
      // both subsume the seg query; the EXACT one must win despite
      // the finer being first in registration order
      assert(scanPaths(agg).exists(_.contains("mv.parquet")) &&
        !scanPaths(agg).exists(_.contains("finemv.parquet")),
        s"exact-grain view must win: ${scanPaths(agg)}")
      assert(agg.orderBy(col("seg")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
        Seq(("a", 2L, 30L), ("b", 2L, 12L), ("c", 1L, 1L)))
      // only the finer view answers the (seg, id) grain
      val fineQ = spark.read.parquet(basePath)
        .groupBy(col("seg"), col("id"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      assert(scanPaths(fineQ).exists(_.contains("finemv.parquet")),
        s"finer-only query must still route: ${scanPaths(fineQ)}")
    } finally MvRewrite.uninstall(spark, rule)
  }

  test("statistics-based choice: with row-count hints, the " +
    "fewer-column/HIGHER-cardinality registration LOSES (the round-12 " +
    "column-count proxy's counterexample), and parquetRowCount reads " +
    "exact counts from footer metadata alone") {
    val s = spark; import s.implicits._
    val dir = tmpDir("graft-mv-cost")
    val wideBase = s"$dir/wide.parquet"
    (0 until 100).map(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b", i % 2L, i % 3L, i * 3L))
      .toDF("id", "seg", "l1", "l2", "v").write.parquet(wideBase)
    // FEW columns, HIGH cardinality: (seg, id) → 100 MV rows
    val fewPath = s"$dir/fewmv.parquet"
    spark.read.parquet(wideBase).groupBy(col("seg"), col("id"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .write.parquet(fewPath)
    // MORE columns, LOW cardinality: (seg, l1, l2) → ≤ 6 MV rows
    val morePath = s"$dir/moremv.parquet"
    spark.read.parquet(wideBase).groupBy(col("seg"), col("l1"), col("l2"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .write.parquet(morePath)
    // footer-metadata row counts are exact
    assert(MvRewrite.parquetRowCount(spark, wideBase) == 100L)
    val fewRows = MvRewrite.parquetRowCount(spark, fewPath)
    val moreRows = MvRewrite.parquetRowCount(spark, morePath)
    assert(fewRows == 100L, s"few-grain MV rows: $fewRows")
    assert(moreRows == 6L, s"more-grain MV rows: $moreRows")
    def reg(cols: Seq[String], path: String, rows: Long) =
      MvRewrite.Registration("wide.parquet", cols,
        Seq(("count", None), ("sum", Some("v"))),
        () => spark.read.parquet(path), rowsHint = Some(rows))
    val rule = MvRewrite.install(spark, Seq(
      reg(Seq("seg", "id"), fewPath, fewRows),
      reg(Seq("seg", "l1", "l2"), morePath, moreRows)))
    try {
      def q: DataFrame = spark.read.parquet(wideBase).groupBy(col("seg"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      // the 2-column registration would have won on the column-count
      // proxy; with statistics the 6-row 3-column view must route
      assert(scanPaths(q).exists(_.contains("moremv.parquet")) &&
        !scanPaths(q).exists(_.contains("fewmv.parquet")),
        s"row-count hint must out-rank column count: ${scanPaths(q)}")
      assert(q.orderBy(col("seg")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
        Seq(("a", 50L, 7350L), ("b", 50L, 7500L)))
    } finally MvRewrite.uninstall(spark, rule)
  }

  test("exact-grain matching is SET-based: a column-order-permuted " +
    "grouping reads the MV directly (no re-fold) with correct values") {
    val s = spark; import s.implicits._
    val dir = tmpDir("graft-mv-perm")
    val permBase = s"$dir/permbase.parquet"
    Seq((1L, "a", 0L, 10L), (2L, "a", 1L, 20L), (3L, "b", 0L, 5L))
      .toDF("id", "seg", "l1", "v").write.parquet(permBase)
    val permMv = s"$dir/permmv.parquet"
    spark.read.parquet(permBase).groupBy(col("seg"), col("l1"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .write.parquet(permMv)
    val rule = MvRewrite.install(spark, MvRewrite.Registration(
      "permbase.parquet", Seq("seg", "l1"),
      Seq(("count", None), ("sum", Some("v"))),
      () => spark.read.parquet(permMv)))
    try {
      // grouping order permuted vs the registration: (l1, seg)
      val q = spark.read.parquet(permBase).groupBy(col("l1"), col("seg"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      assert(scanPaths(q).exists(_.contains("permmv.parquet")),
        s"permuted exact grain must still route: ${scanPaths(q)}")
      // direct read, NOT a re-fold: no Aggregate survives optimization
      assert(!q.queryExecution.optimizedPlan.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Aggregate]),
        "permuted exact match must not re-aggregate the MV")
      assert(q.orderBy(col("l1"), col("seg")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSeq ==
        Seq((0L, "a", 1L, 10L), (0L, "b", 1L, 5L), (1L, "a", 1L, 20L)))
    } finally MvRewrite.uninstall(spark, rule)
  }

  test("the per-rule enabled switch suppresses the rewrite (the MV " +
    "build window) without touching other registrations") {
    installed { rule =>
      rule.enabled = false
      try assert(scanPaths(agg).exists(_.contains("base.parquet")),
        "disabled rule must leave the base scan")
      finally rule.enabled = true
      assert(scanPaths(agg).exists(_.contains("mv.parquet")))
    }
  }
}
