package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Temporal-join invariants for the SCD2 point-in-time lookup (exact
  * values are oracle-gated).
  */
class PointInTimeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("point-in-time: matched version's validity interval contains the probe") {
    val hist = Cdc.qCdcScd2(spark, sf)
      .select(col("id"), col("version"),
        col("valid_from_lsn"), col("valid_to_lsn"))
    val pit = Cdc.qCdcPointInTime(spark, sf)
    val joined = pit.join(hist, Seq("id", "version")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val q = r.getAs[Long]("q_lsn")
      val from = r.getAs[Long]("valid_from_lsn")
      val to = r.getAs[Long]("valid_to_lsn")
      assert(from <= q, s"valid_from > probe: $r")
      assert(to == -1L || q < to, s"probe past valid_to: $r")
    }
  }

  test("event patterns: counts match a Scala recompute of ordered sequences") {
    val rows = Events.qEventPatterns(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4))).toMap
    assert(rows.nonEmpty)
    // independent recompute from the raw events
    val raw = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    raw.groupBy(_._1).foreach { case (user, evs) =>
      val ordered = evs.sortBy(e => (e._2.getTime, e._2.getNanos, e._3)).map(_._4)
      val (nEvents, nRuns, first, last) = rows(user)
      assert(nEvents == ordered.length, s"user $user event count")
      assert(first == ordered.head && last == ordered.last, s"user $user endpoints")
      // independent formulation: sliding window over the ordered types —
      // catches back-to-back runs the way the query's leading-anchored
      // replace does
      val expected = ordered.sliding(3)
        .count(_.toSeq == Seq("view", "click", "purchase"))
      assert(nRuns == expected, s"user $user: $nRuns != $expected")
    }
  }

  test("point-in-time: one row per order, all version kinds reachable") {
    val pit = Cdc.qCdcPointInTime(spark, sf).collect()
    val keys = pit.map(_.getAs[Long]("o_orderkey"))
    assert(keys.length == keys.distinct.length)
    // the probe sweep spans all three LSN bands → r, u, and d versions
    // all appear as answers (d = "entity was deleted as of that time")
    val ops = pit.map(_.getAs[String]("op")).toSet
    assert(ops == Set("r", "u", "d"), s"expected all ops, got $ops")
  }
}
