package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared bucket arithmetic for the bucketed temporal joins
  * ([[RangeJoin]], [[IntervalJoin]]): floor-division bucket ids and the
  * guarded bucket-span sequence both operators explode on. One
  * implementation, so the guard semantics (null endpoints drop at the
  * explode, inverted intervals and over-wide fanouts raise with the
  * offending values) cannot silently drift between the two.
  */
object BucketedTime {

  /** Per-row bucket fanout cap: one corrupt or unit-mismatched endpoint
    * (micros where the bucket width is in seconds) would make sequence()
    * build a ~10^9-element array and kill the job — fail loudly with the
    * offending values instead.
    */
  val MaxFanout = 100000L

  def bucketOf(t: Column, bucket: Long): Column =
    floor(t / bucket).cast("long")

  /** `array<long>` of bucket ids covered by the closed interval [s, e].
    * NULL endpoints yield null (the row drops at the caller's explode —
    * a null time matches nothing, the equi-join convention); an inverted
    * interval (`sequence` would count DOWN, generating candidates for a
    * semantically-empty interval that no downstream filter re-checks) or
    * a span past [[MaxFanout]] raises a named error carrying the values.
    */
  def guardedBucketSeq(op: String, s: Column, e: Column,
      sName: String, eName: String, bucket: Long): Column = {
    val (lo, hi) = (bucketOf(s, bucket), bucketOf(e, bucket))
    when(s.isNull || e.isNull, lit(null).cast("array<long>"))
      .when(s <= e && hi - lo + 1 <= MaxFanout, sequence(lo, hi))
      .otherwise(raise_error(concat(
        lit(s"$op: invalid interval [$sName,$eName]=["), s, lit(","), e,
        lit(s"] (inverted, or fanout > $MaxFanout buckets of $bucket)"))))
  }
}
