package graft.cdc

import graft.SparkSpec

/** A real Hadoop FileSystem registered under a NON-`file:` scheme, backed
  * by the local disk. Hadoop instantiates it reflectively from the
  * `fs.graftmock.impl` conf key, exactly as it would an HDFS or object
  * store client — so any code path that only works through `java.io.File`
  * breaks under this scheme while FileSystem-API code keeps working.
  */
class MockSchemeFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI =
    java.net.URI.create(MockSchemeFileSystem.Scheme + ":///")
  override def getScheme: String = MockSchemeFileSystem.Scheme
}
object MockSchemeFileSystem { val Scheme = "graftmock" }

/** Pins [[VersionedState]]'s cluster portability: version discovery,
  * reads, and idempotent publishes must all resolve through the Hadoop
  * FileSystem API, proven against a non-`file:` scheme where the round-8
  * `java.io.File` listing bug would silently see nothing.
  */
class VersionedStateSpec extends SparkSpec {

  private lazy val store: String = {
    spark.sparkContext.hadoopConfiguration.set(
      s"fs.${MockSchemeFileSystem.Scheme}.impl",
      classOf[MockSchemeFileSystem].getName)
    s"${MockSchemeFileSystem.Scheme}://${tmpDir("graft-vstate")}/store"
  }

  private def df(rows: Seq[(String, Long)]) = {
    val s = spark; import s.implicits._
    rows.toDF("g", "total")
  }

  test("latestVersion resolves through the Hadoop API on a non-file scheme") {
    val vs = new VersionedState(spark, store, "agg")
    assert(vs.latestVersion.isEmpty, "empty store must report no version")

    vs.publish("agg", 0L, df(Seq(("a", 1L))))
    vs.publish("agg", 3L, df(Seq(("a", 2L), ("b", 5L))))
    assert(vs.latestVersion.contains(3L))

    // the exact round-8 bug: a java.io.File listing of the same store
    // sees NOTHING under a non-local scheme (no error, just None-shaped
    // emptiness) — the regression this spec exists to catch
    assert(new java.io.File(s"$store/agg").listFiles() == null)

    val latest = vs.readLatest("agg").get.collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(latest.toSeq == Seq(("a", 2L), ("b", 5L)))
  }

  test("publish is idempotent under batch-id replay") {
    val vs = new VersionedState(spark, store, "agg")
    // checkpoint-replayed foreachBatch re-delivers the same batch id:
    // the overwrite must land the replayed content, not fail or append
    vs.publish("agg", 3L, df(Seq(("a", 2L), ("b", 5L))))
    assert(vs.latestVersion.contains(3L))
    assert(vs.readLatest("agg").get.count() == 2)
  }

  test("anchor kind alone drives version discovery") {
    val vs = new VersionedState(spark, store, "agg")
    // a newer side-state publish without its anchor (the torn-batch
    // crash window) must NOT advance the visible version
    vs.publish("aState", 7L, df(Seq(("x", 9L))))
    assert(vs.latestVersion.contains(3L))
    assert(vs.readLatest("agg").get.count() == 2)
  }

  test("bounded read excludes the batch's own publish: a replayed " +
    "foreachBatch folds into the PRE-batch state, never its own") {
    val vs = new VersionedState(spark, store, "agg")
    // the crash window this guards: batch 3's publish completed but the
    // streaming checkpoint never committed it; on restart batch 3 is
    // re-delivered. An unbounded read returns v3 (the batch's own
    // result) — a non-idempotent step would double-apply its delta.
    assert(vs.latestVersionBefore(0L).isEmpty) // batch 0's replay: fresh
    assert(vs.readLatestBefore("agg", 0L).isEmpty)
    // store holds agg v0 (1 row) and v3 (2 rows) from the tests above:
    // batch 3's own replay must see v0, not its own v3
    assert(vs.latestVersionBefore(3L).contains(0L))
    assert(vs.readLatestBefore("agg", 3L).get.count() == 1)
    vs.publish("agg", 5L, df(Seq(("c", 1L))))
    // batch 5's own replay sees v3; anything later sees v5
    assert(vs.latestVersionBefore(5L).contains(3L))
    assert(vs.readLatestBefore("agg", 5L).get.count() == 2)
    assert(vs.latestVersionBefore(6L).contains(5L))
    assert(vs.readLatestBefore("agg", 6L).get.count() == 1)
    // unbounded stays the overall latest
    assert(vs.latestVersion.contains(5L))
  }

  test("prune retains the newest K anchor versions, sweeps every kind " +
    "by the same retained set, and keeps time-travel reads consistent") {
    // self-contained store layout (round-11 advisory: the old version
    // of this test depended on the earlier tests' accumulated state, so
    // isolation or reordering broke it): agg v0 (1 row) / v3 (2 rows) /
    // v5 (1 row), plus a torn side-state publish aState v7 whose anchor
    // never landed
    val pruneStore = s"$store-prune"
    val vs = new VersionedState(spark, pruneStore, "agg")
    vs.publish("agg", 0L, df(Seq(("a", 1L))))
    vs.publish("agg", 3L, df(Seq(("a", 2L), ("b", 5L))))
    vs.publish("agg", 5L, df(Seq(("c", 1L))))
    vs.publish("aState", 7L, df(Seq(("x", 9L))))
    assert(vs.versions == Seq(0L, 3L, 5L))
    vs.prune(keepLast = 2)
    assert(vs.versions == Seq(3L, 5L))
    // pruned version unreachable; retained ones intact
    assert(vs.readLatestBefore("agg", 3L).isEmpty)
    assert(vs.readLatestBefore("agg", 5L).get.count() == 2)
    assert(vs.readLatest("agg").get.count() == 1)
    // the torn non-anchor version is swept by the SAME retained set
    // (orphan cleanup — it can never be read through the anchor)
    val fs = new org.apache.hadoop.fs.Path(pruneStore)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(
      !fs.exists(new org.apache.hadoop.fs.Path(s"$pruneStore/aState/v7")))
    // down to one: latest survives, history is gone
    vs.prune(keepLast = 1)
    assert(vs.versions == Seq(5L))
    assert(vs.readLatest("agg").get.count() == 1)
    intercept[IllegalArgumentException](vs.prune(0))
  }

  test("a stray non-numeric v* directory is skipped, not thrown on") {
    // a killed writer can leave a temp directory whose name starts with
    // 'v' but isn't a version (e.g. a copy tool's v5.parquet_tmp); reads
    // of the store must keep working rather than die in Long parsing
    val junkStore = s"$store-junk"
    val vs = new VersionedState(spark, junkStore, "agg")
    vs.publish("agg", 2L, df(Seq(("a", 1L))))
    val fs = new org.apache.hadoop.fs.Path(junkStore)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$junkStore/agg/v5_tmp"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$junkStore/agg/vgarbage"))
    assert(vs.versions == Seq(2L))
    assert(vs.latestVersion.contains(2L))
    assert(vs.readLatest("agg").get.count() == 1)
    // prune must also tolerate (and not misparse) the stray entries
    vs.publish("agg", 4L, df(Seq(("b", 2L))))
    vs.prune(keepLast = 1)
    assert(vs.versions == Seq(4L))
  }

  test("prune reclaims AGED unparseable strays but never fresh ones " +
    "(round-12 advisory: skipped strays used to accumulate forever)") {
    val strayStore = s"$store-stray"
    val vs = new VersionedState(spark, strayStore, "agg")
    vs.publish("agg", 1L, df(Seq(("a", 1L))))
    val fs = new org.apache.hadoop.fs.Path(strayStore)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val aged = new org.apache.hadoop.fs.Path(s"$strayStore/agg/v3_tmp")
    val fresh = new org.apache.hadoop.fs.Path(s"$strayStore/agg/v4_tmp")
    fs.mkdirs(aged)
    fs.mkdirs(fresh)
    // age one stray past the safety window; leave the other current —
    // the sweep must take exactly the aged one (a live writer's staging
    // directory must never be deleted from under it)
    fs.setTimes(aged, System.currentTimeMillis() - 60 * 60 * 1000L, -1)
    vs.prune(keepLast = 1, strayTtlMs = 10 * 60 * 1000L)
    assert(!fs.exists(aged), "aged stray should have been reclaimed")
    assert(fs.exists(fresh), "fresh stray must survive the sweep")
    assert(vs.versions == Seq(1L))
  }

  test("publishConcurrently: independent non-anchor kinds land in " +
      "parallel, the anchor is rejected, and anchor-gated visibility " +
      "is unchanged") {
    val s2 = s"$store-conc"
    val vs = new VersionedState(spark, s2, "agg")
    // concurrent non-anchor publishes, anchor strictly after — the
    // drive handlers' exact shape
    vs.publishConcurrently(1L,
      "aState" -> df(Seq(("a", 1L))), "bState" -> df(Seq(("b", 2L))))
    // before the anchor lands, nothing is visible through versioned reads
    assert(vs.latestVersion.isEmpty)
    vs.publish("agg", 1L, df(Seq(("g", 3L))))
    assert(vs.versions == Seq(1L))
    assert(vs.readLatest("aState").get.collect().map(_.getLong(1)).toSeq
      == Seq(1L))
    assert(vs.readLatest("bState").get.collect().map(_.getLong(1)).toSeq
      == Seq(2L))
    // the anchor must never ride the concurrent path (publish-last
    // discipline is the crash rail)
    intercept[IllegalArgumentException] {
      vs.publishConcurrently(2L, "agg" -> df(Seq(("x", 9L))))
    }
  }
}
