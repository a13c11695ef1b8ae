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

  /** Per-row bucket fanout cap, as in [[IntervalJoin.MaxFanout]]: one
    * corrupt or unit-mismatched endpoint (micros where the bucket width is
    * in seconds) would otherwise make sequence() build a ~10^9-element
    * array and kill the job — fail loudly with the offending values.
    */
  val MaxFanout = 100000L

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
    val (lo, hi) = (floor(col(startCol) / bucket).cast("long"),
      floor(col(endCol) / bucket).cast("long"))
    // same in-plan guards as IntervalJoin.overlap: null endpoints drop at
    // the explode (a null time matches nothing); an inverted interval
    // (sequence counts DOWN — silent wasted candidates) or an over-wide
    // fanout raises a named error instead
    val guarded = when(col(startCol).isNull || col(endCol).isNull,
      lit(null).cast("array<long>"))
      .when(col(startCol) <= col(endCol) && hi - lo + 1 <= MaxFanout,
        sequence(lo, hi))
      .otherwise(raise_error(concat(
        lit(s"RangeJoin: invalid interval [$startCol,$endCol]=["),
        col(startCol), lit(","), col(endCol),
        lit(s"] (inverted, or fanout > $MaxFanout buckets of $bucket)"))))
    val iv = intervals.withColumn("__bucket", explode(guarded))
    val pt = points.withColumn("__bucket",
      floor(col(pointTime) / bucket).cast("long"))
    val upper = if (endInclusive) col(pointTime) <= col(endCol)
      else col(pointTime) < col(endCol)
    pt.join(iv, Seq(key, "__bucket"))
      .filter(col(pointTime) >= col(startCol) && upper)
      .drop("__bucket")
  }
}
