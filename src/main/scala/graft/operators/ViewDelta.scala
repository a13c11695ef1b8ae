package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CHANGE FEED between two versions of a keyed view — the output half
  * of incremental view maintenance: the `graft.cdc.Incremental*`
  * operators keep a materialization fresh in O(Δ), and downstream
  * consumers (a cache layer, a search index, another IVM stage) want
  * the VIEW'S OWN deltas, not repeated snapshots — the capability
  * lakehouse formats ship as a Change Data Feed. Expressed as one
  * keyed full-outer join of the two versions:
  *
  *  - a key only in `after`  → `op = 'c'` (the view gained the group)
  *  - a key only in `before` → `op = 'd'` (the group left the view)
  *  - a key in both with ANY value column differing (null-safe
  *    compare) → `op = 'u'`
  *  - keys with identical values are NOT emitted — the feed is sized
  *    to the change, which is the entire point.
  *
  * Output columns: keyCols, `op`, then `old_<v>` / `new_<v>` per value
  * column ('c' rows carry null olds, 'd' rows null news — the
  * before/after images a CDC consumer expects).
  *
  * Scale shape: one key-partitioned full-outer join of two
  * group-cardinality frames (both are VIEWS — metadata-sized next to
  * their base tables), then a narrow filter. At 100 TB the feed stage
  * costs O(|view|), never O(base); pair it with a maintained view
  * whose step already knows its touched groups and the join side can
  * be pre-pruned to them (the gates feed full versions so the diff's
  * own unchanged-suppression is what the hash pins).
  */
object ViewDelta {

  /** Diff `before` → `after` on `keyCols`, comparing `valueCols`.
    * Both frames must be key-unique (views are). The key match is
    * NULL-SAFE (`<=>`): a groupBy over a nullable column legitimately
    * produces a null-keyed group, and a plain equi-join would never
    * match it with itself — every diff would emit a spurious 'd'+'c'
    * pair for an unchanged null group. With `valueCols` empty the feed
    * degrades to pure membership (c/d only — no value to make a 'u').
    * See class doc for the op semantics and output layout.
    */
  def diff(before: DataFrame, after: DataFrame, keyCols: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "ViewDelta.diff needs at least one key")
    val b = before.select(
      keyCols.map(k => col(k).as(s"__bk_$k")) ++
        valueCols.map(v => col(v).as(s"old_$v")): _*)
      .withColumn("__in_before", lit(true))
    val a = after.select(
      keyCols.map(k => col(k).as(s"__ak_$k")) ++
        valueCols.map(v => col(v).as(s"new_$v")): _*)
      .withColumn("__in_after", lit(true))
    val keyMatch = keyCols
      .map(k => col(s"__bk_$k") <=> col(s"__ak_$k")).reduce(_ && _)
    val changed = valueCols
      .map(v => !(col(s"old_$v") <=> col(s"new_$v")))
      .reduceOption(_ || _).getOrElse(lit(false))
    b.join(a, keyMatch, "full_outer")
      .withColumn("op",
        when(col("__in_before").isNull, lit("c"))
          .when(col("__in_after").isNull, lit("d"))
          .otherwise(lit("u")))
      .filter(col("op") =!= "u" || changed)
      .select(keyCols.map(k =>
          coalesce(col(s"__bk_$k"), col(s"__ak_$k")).as(k)) ++
        Seq(col("op")) ++
        valueCols.map(v => col(s"old_$v")) ++
        valueCols.map(v => col(s"new_$v")): _*)
  }
}
