package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** [[ViewDelta]]'s op semantics on a synthetic keyed view — including
  * the cases the gate fixture cannot produce: a DROPPED group ('d'),
  * null-valued columns under the null-safe compare, and the
  * unchanged-suppression that keeps the feed delta-sized.
  */
class ViewDeltaSpec extends SparkSpec {

  private def v(rows: Seq[(String, java.lang.Long, java.lang.Long)])
      : DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("g", "n", "t")
  }

  test("c/d/u classification, before/after images, and " +
    "unchanged suppression") {
    val before = v(Seq(("a", 2L, 30L), ("b", 1L, 5L), ("c", 4L, 9L)))
    val after = v(Seq(("a", 3L, 42L), ("c", 4L, 9L), ("d", 1L, 7L)))
    val got = ViewDelta.diff(before, after, Seq("g"), Seq("n", "t"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getString(1),
        Option(r.get(2)), Option(r.get(3)),
        Option(r.get(4)), Option(r.get(5)))).toSeq
    assert(got == Seq(
      ("a", "u", Some(2L), Some(30L), Some(3L), Some(42L)),
      ("b", "d", Some(1L), Some(5L), None, None),
      ("d", "c", None, None, Some(1L), Some(7L))))
    // "c" (unchanged) is absent: the feed is sized to the change
  }

  test("null-safe value compare: null -> value and value -> null are " +
    "updates; null -> null is unchanged") {
    val before = v(Seq(("a", null, 1L), ("b", 2L, null), ("c", null, 3L)))
    val after = v(Seq(("a", 5L, 1L), ("b", 2L, null), ("c", null, 4L)))
    val got = ViewDelta.diff(before, after, Seq("g"), Seq("n", "t"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getString(1)))
      .toSeq
    // b is identical (null <=> null on n's sibling t) and suppressed
    assert(got == Seq(("a", "u"), ("c", "u")))
  }

  test("null KEYS are matched null-safely: an unchanged null-keyed " +
    "group is suppressed, a changed one is one 'u' row (round-11 " +
    "review: the equi-join emitted a spurious d+c pair every diff)") {
    val before = v(Seq((null, 2L, 30L), ("a", 1L, 5L)))
    val unchanged = ViewDelta.diff(before,
      v(Seq((null, 2L, 30L), ("a", 1L, 5L))), Seq("g"), Seq("n", "t"))
    assert(unchanged.collect().isEmpty)
    val updated = ViewDelta.diff(before,
      v(Seq((null, 3L, 31L), ("a", 1L, 5L))), Seq("g"), Seq("n", "t"))
      .collect().map(r => (Option(r.getString(0)), r.getString(1))).toSeq
    assert(updated == Seq((None, "u")))
  }

  test("empty valueCols degrades to a membership (c/d) feed instead " +
    "of crashing") {
    val got = ViewDelta.diff(
      v(Seq(("a", 1L, 1L), ("b", 1L, 1L))).select("g"),
      v(Seq(("b", 1L, 1L), ("c", 1L, 1L))).select("g"),
      Seq("g"), Seq.empty)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("a", "d"), ("c", "c")))
  }

  test("multi-column keys diff independently") {
    val s = spark; import s.implicits._
    val before = Seq(("x", 1, 10L), ("x", 2, 20L)).toDF("g", "k", "t")
    val after = Seq(("x", 1, 11L), ("x", 2, 20L), ("y", 1, 5L))
      .toDF("g", "k", "t")
    val got = ViewDelta.diff(before, after, Seq("g", "k"), Seq("t"))
      .orderBy("g", "k").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSeq
    assert(got == Seq(("x", 1, "u"), ("y", 1, "c")))
  }
}
