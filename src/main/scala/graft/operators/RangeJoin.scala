package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic point-in-interval range join: for each point row, every interval
  * row with the same key whose [start, end) (or [start, end]) contains the
  * point's time. The relational shape behind attribution windows ("views in
  * the hour before each purchase"), validity intervals, and maintenance
  * windows.
  *
  * Scale shape: the naive formulation equi-joins on the key alone and
  * filters the range predicate, fanning every point out to ALL of its key's
  * intervals — quadratic in per-key activity. Here time is bucketed into
  * fixed-width buckets: each interval explodes to the buckets it covers
  * (fanout = len/bucketWidth + 1, bounded when the bucket width is chosen
  * near the typical interval length), each point maps to exactly ONE
  * bucket, and the join is equi on (key, bucket) — a point meets only
  * intervals overlapping its own bucket, then the exact range filter runs
  * on that small candidate set. One shuffle of each side on (key, bucket);
  * AQE handles hot buckets like any skewed equi-join.
  *
  * Times are numeric (epoch micros/seconds — caller picks one unit and the
  * matching `bucket` width). Both inputs must not share column names other
  * than `key`.
  */
object RangeJoin {

  /** Per-row bucket fanout cap — shared guard, see [[BucketedTime]]. */
  val MaxFanout: Long = BucketedTime.MaxFanout

  /** @param points       rows carrying `pointTime`
    * @param intervals    rows carrying `startCol`/`endCol` (start <= end)
    * @param key          equality key column (same name both sides)
    * @param bucket       bucket width in the time columns' unit
    * @param endInclusive containment is [start, end] when true, [start, end)
    *                     when false (the attribution convention)
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, key: String,
      pointTime: String, startCol: String, endCol: String, bucket: Long,
      endInclusive: Boolean = false): DataFrame = {
    require(bucket > 0, s"bucket=$bucket must be positive")
    // guard semantics documented on BucketedTime.guardedBucketSeq
    val iv = intervals.withColumn("__bucket",
      explode(BucketedTime.guardedBucketSeq("RangeJoin",
        col(startCol), col(endCol), startCol, endCol, bucket)))
    val pt = points.withColumn("__bucket",
      BucketedTime.bucketOf(col(pointTime), bucket))
    val upper = if (endInclusive) col(pointTime) <= col(endCol)
      else col(pointTime) < col(endCol)
    pt.join(iv, Seq(key, "__bucket"))
      .filter(col(pointTime) >= col(startCol) && upper)
      .drop("__bucket")
  }
}
