package graft.cdc

import graft.SparkSpec

/** The snapshot-chunk storage contract: a chunk's localCheckpoint blocks
  * must actually leave executor storage when the chunk is done — a long
  * backfill otherwise accumulates every chunk's rows until GC happens to
  * run (Dataset.unpersist is a CacheManager call and does NOT free
  * lineage-truncation blocks).
  */
class ChunkStorageSpec extends SparkSpec {

  test("freeing a localCheckpoint removes its blocks from storage") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = (1 to 10000).toDF("x").localCheckpoint()
    assert(df.count() == 10000)
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty, "localCheckpoint must persist an RDD")
    JdbcIncremental.freeLocalCheckpoint(df)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(added.forall(!after.contains(_)),
      s"checkpoint blocks ${added.filter(after.contains)} still cached")
  }
}
