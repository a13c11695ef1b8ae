package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Codegen/interpreted consistency for the custom Catalyst expressions:
  * the codegen'd result must be bit-identical to the composable
  * higher-order-function formulation it replaced.
  */
class ExpressionSpec extends SparkSpec {

  test("DotProduct matches zip_with+aggregate bit-exactly") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(50)((
      Seq.fill(64)(rng.nextDouble() * 2 - 1),
      Seq.fill(64)(rng.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val out = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0d), _ + _).as("slow")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("ZOrder2 matches the literal-shift composed fold bit-exactly") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = Seq.fill(200)((rng.nextInt(1 << 16).toLong,
      rng.nextInt(1 << 16).toLong)) ++
      Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L))
    val out = rows.toDF("x", "y").select(
      LayoutFunctions.zorder(col("x"), col("y")).as("fast"),
      graft.queries.Layout.zvalueComposed(col("x"), col("y")).as("slow"))
      .collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("DotProduct edge cases: empty, mismatched length, null") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq.empty[Double]), Some(Seq.empty[Double])),
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(10.0))),
      (None, Some(Seq(1.0)))).toDF("a", "b")
    val out = df.select(VectorFunctions.dot(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 0.0)
    // dimension mismatch → null (like zip_with's null-padded product),
    // NOT a truncated partial sum — a corrupt vector must not produce a
    // plausible-looking similarity score
    assert(out(1).isNullAt(0))
    assert(out(2).isNullAt(0))
  }

  test("SimHash56 matches the 56-fold majority-vote formulation") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val df = Seq.fill(30)(Seq.fill(rng.nextInt(40) + 1)(
      rng.nextLong().abs % (1L << 56))).toDF("hs")
    val folds = (0 until 56).map { j =>
      val vote = aggregate(col("hs"), lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val out = df.select(
      VectorFunctions.simhash56(col("hs")).as("fast"), folds.as("slow")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("MinHashSig matches the composable hashP+permutation formulation") {
    import spark.implicits._
    import graft.text.TextOps
    val rng = new scala.util.Random(13)
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val df = (Seq.fill(25)(Seq.fill(rng.nextInt(30) + 1)(
      words(rng.nextInt(words.size)) + " " + words(rng.nextInt(words.size))))
      :+ Seq.empty[String]).toDF("shingles")
    val out = df.select(
      VectorFunctions.minhashSig(
        transform(col("shingles"), sh => TextOps.hash56(sh)),
        TextOps.MinhashParams, TextOps.P).as("fast"),
      TextOps.minhashSignature(
        transform(col("shingles"), sh => TextOps.hashP(sh))).as("slow")).collect()
    out.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("ShingleHash56 matches shingles+hash56 composable formulation") {
    import spark.implicits._
    import graft.text.TextOps
    val rng = new scala.util.Random(17)
    val words = Seq("a", "bb", "ccc", "dd", "e")
    val df = (Seq.fill(25)(
      (1 to rng.nextInt(30) + 1).map(_ => words(rng.nextInt(words.size)))
        .mkString(" ")) :+ "one two").toDF("text")
    val out = df.select(
      VectorFunctions.shingleHash56(TextOps.tokens(col("text"))).as("fast"),
      transform(TextOps.shingles(TextOps.tokens(col("text"))),
        sh => TextOps.hash56(sh)).as("slow")).collect()
    out.foreach(r =>
      assert(r.getSeq[Long](0).toSet == r.getSeq[Long](1).toSet
        && r.getSeq[Long](0).size == r.getSeq[Long](1).size))
  }

  test("ShingleHash56 skips null tokens like the concat_ws stack it replaces") {
    import spark.implicits._
    import graft.text.TextOps
    // ['a', null, 'b', 'c']: windows hash as concat_ws(' ', …) would
    // join them — nulls dropped, no NPE
    val df = Seq(Tuple1(Seq(Some("a"), None, Some("b"), Some("c"))))
      .toDF("toks")
    val out = df.select(
      VectorFunctions.shingleHash56(col("toks"), k = 3).as("fast"),
      transform(
        sequence(lit(1), size(col("toks")) - 2),
        i => TextOps.hash56(concat_ws(" ",
          element_at(col("toks"), i), element_at(col("toks"), i + 1),
          element_at(col("toks"), i + 2)))).as("slow")).collect()
    assert(out(0).getSeq[Long](0).toSet == out(0).getSeq[Long](1).toSet)
  }

  test("ShingleHash56 positional mode matches per-window composable hashes") {
    import spark.implicits._
    import graft.text.TextOps
    val k = 8
    val rng = new scala.util.Random(23)
    val words = Seq("a", "bb", "ccc", "dd", "e")
    // includes docs SHORTER than k (empty output) and with repeated
    // windows (positional mode must keep every occurrence)
    val df = (Seq.fill(25)(
      (1 to rng.nextInt(30) + 1).map(_ => words(rng.nextInt(words.size)))
        .mkString(" ")) :+ "one two" :+ "x x x x x x x x x x").toDF("text")
    val slow = when(size(TextOps.tokens(col("text"))) >= k,
      transform(
        sequence(lit(1), size(TextOps.tokens(col("text"))) - (k - 1)),
        i => TextOps.hash56(concat_ws(" ",
          (0 until k).map(j =>
            element_at(TextOps.tokens(col("text")), i + j)): _*))))
      .otherwise(typedLit(Seq.empty[Long]))
    val out = df.select(
      VectorFunctions.shingleHash56(TextOps.tokens(col("text")), k,
        distinct = false).as("fast"),
      slow.as("slow")).collect()
    out.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("null array elements: DotProduct/HyperplaneBits null out, " +
      "MinHashSig skips — matching each composable form") {
    import spark.implicits._
    // DotProduct: composable zip_with+aggregate yields NULL on a null
    // element; the codegen'd expression must too, not a partial sum
    val dots = Seq((Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](2.0, 3.0)))
      .toDF("a", "b")
      .select(
        VectorFunctions.dot(col("a"), col("b")).as("fast"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x).as("slow"))
      .collect()(0)
    assert(dots.isNullAt(0) && dots.isNullAt(1), dots)
    // HyperplaneBits: null element → null sketch (not a corrupt one)
    val planes = Seq(Seq(1.0, -1.0))
    val hb = Seq(Seq[java.lang.Double](1.0, null))
      .toDF("v").select(VectorFunctions.hyperplaneBits(col("v"), planes))
      .collect()(0)
    assert(hb.isNullAt(0))
    // MinHashSig: array_min skips nulls, so a null slot contributes
    // nothing; a lone null behaves like the empty set (all sentinel P)
    val params = graft.text.TextOps.MinhashParams
    val p = graft.text.TextOps.P
    val sigRows = Seq(Seq[java.lang.Long](null), Seq.empty[java.lang.Long])
      .toDF("hs").select(VectorFunctions.minhashSig(col("hs"), params, p))
      .collect()
    assert(sigRows(0).getSeq[Long](0) == sigRows(1).getSeq[Long](0))
    // negative input hashes: floorMod (the composable pmod), never a
    // sign-preserving % whose negative slots beat every honest value
    val neg = Seq(Seq(-42L)).toDF("hs")
      .select(VectorFunctions.minhashSig(col("hs"), params, p))
      .collect()(0).getSeq[Long](0)
    assert(neg.forall(v => v >= 0 && v < p), neg)
  }

  test("constructor validation: shingle k, simhash bits") {
    val e = org.apache.spark.sql.GraftSqlBridge.expression(lit(1))
    intercept[IllegalArgumentException] {
      graft.functions.ShingleHash56(e, k = 0)
    }
    intercept[IllegalArgumentException] {
      graft.functions.SimHash56(e, bits = 65)
    }
  }

  test("SimHash56: similar inputs give near fingerprints, empty gives 0") {
    import spark.implicits._
    val rng3 = new scala.util.Random(3)
    val base = Seq.fill(100)(rng3.nextLong().abs % (1L << 56))
    val perturbed = base.updated(0, 12345L).updated(50, 99999L)
    val df = Seq(base, perturbed, Seq.empty[Long]).toDF("hs")
    val out = df.select(VectorFunctions.simhash56(col("hs"))).collect().map(_.getLong(0))
    assert(java.lang.Long.bitCount(out(0) ^ out(1)) <= 8,
      "2% token change must flip few bits")
    assert(out(2) == 0L)
  }
}
