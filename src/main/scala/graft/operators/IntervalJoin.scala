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

  /** Per-row bucket fanout cap: an interval spanning more than this many
    * buckets (bucket chosen far below interval lengths, or a corrupt
    * endpoint) would explode the output unboundedly — fail loudly with
    * the offending span instead.
    */
  val MaxFanout = 100000L

  def overlap(a: DataFrame, b: DataFrame, key: String,
      aStart: String, aEnd: String, bStart: String, bEnd: String,
      bucket: Long): DataFrame = {
    require(bucket > 0, s"bucket=$bucket must be positive")
    def exploded(df: DataFrame, s: String, e: String): DataFrame = {
      val (lo, hi) =
        (floor(col(s) / bucket).cast("long"), floor(col(e) / bucket).cast("long"))
      // precondition guards, in-plan: a NULL endpoint yields a null
      // sequence and the row drops at the explode (join semantics — a
      // null time matches nothing; same as the pre-guard behavior); an
      // inverted interval (end < start) or one fanning out past
      // MaxFanout buckets raises a named error carrying the offending
      // values. Without the guard these are SILENT wrong-output modes,
      // not errors: sequence(lo, hi) with lo > hi counts DOWN (the
      // reversed bucket span would generate candidates for a
      // semantically-empty interval, and the overlap filter never
      // re-checks start <= end), and an over-wide span just explodes
      // the output row count
      val guarded = when(col(s).isNull || col(e).isNull,
        lit(null).cast("array<long>"))
        .when(col(s) <= col(e) && hi - lo + 1 <= MaxFanout, sequence(lo, hi))
        .otherwise(raise_error(concat(
          lit(s"IntervalJoin: invalid interval [$s,$e]=["), col(s),
          lit(","), col(e),
          lit(s"] (inverted, or fanout > $MaxFanout buckets of $bucket)"))))
      df.withColumn("__bucket", explode(guarded))
    }
    exploded(a, aStart, aEnd)
      .join(exploded(b, bStart, bEnd), Seq(key, "__bucket"))
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      .filter(col("__bucket") ===
        floor(greatest(col(aStart), col(bStart)) / bucket).cast("long"))
      .drop("__bucket")
  }
}
