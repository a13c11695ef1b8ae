package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join: pairs of rows (one from each side, same key)
  * whose closed intervals [aStart, aEnd] and [bStart, bEnd] overlap.
  * Complements [[RangeJoin]] (point-in-interval): this is the
  * interval × interval case behind session-collision detection,
  * double-booking checks, and validity-window reconciliation.
  *
  * Scale shape: the naive form equi-joins on the key alone and filters
  * the overlap predicate — every pair of the key's intervals is
  * materialized, quadratic in per-key interval count. Here both sides
  * explode to fixed-width time buckets and the join is equi on
  * (key, bucket): a candidate pair meets only in buckets both intervals
  * cover. A pair overlapping several buckets would then surface once per
  * shared bucket; instead of a `distinct` (a second full shuffle of the
  * OUTPUT, typically far larger than either input), each surviving pair
  * is kept only in the ONE bucket containing max(aStart, bStart) — a
  * point that, for genuinely overlapping closed intervals, lies in both,
  * so exactly one bucket emits the pair and the dedup is a free scalar
  * predicate. One shuffle of each side on (key, bucket); fanout per
  * interval is len/bucket + 1, bounded when `bucket` is chosen near the
  * typical interval length; AQE splits hot buckets as with any skewed
  * equi-join.
  *
  * Times are numeric (one unit, caller-chosen, matching `bucket`). The
  * two inputs must not share column names besides `key`.
  */
object IntervalJoin {

  /** Per-row bucket fanout cap — shared guard, see [[BucketedTime]]. */
  val MaxFanout: Long = BucketedTime.MaxFanout

  def overlap(a: DataFrame, b: DataFrame, key: String,
      aStart: String, aEnd: String, bStart: String, bEnd: String,
      bucket: Long): DataFrame = {
    require(bucket > 0, s"bucket=$bucket must be positive")
    // guard semantics documented on BucketedTime.guardedBucketSeq
    def exploded(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("__bucket", explode(BucketedTime.guardedBucketSeq(
        "IntervalJoin", col(s), col(e), s, e, bucket)))
    exploded(a, aStart, aEnd)
      .join(exploded(b, bStart, bEnd), Seq(key, "__bucket"))
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      .filter(col("__bucket") ===
        BucketedTime.bucketOf(greatest(col(aStart), col(bStart)), bucket))
      .drop("__bucket")
  }
}
