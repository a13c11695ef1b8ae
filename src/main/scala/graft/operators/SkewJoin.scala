package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * At 100 TB a handful of hot keys (one power user, one default value) can
  * put an entire shuffle partition on one executor. AQE's skew-join split
  * handles sort-merge cases adaptively; explicit salting remains the tool
  * when the skewed side must hash-join or the skew is known up front.
  *
  * Left rows get a random-but-deterministic salt in [0, factor); right rows
  * are replicated `factor` times, so `(key, salt)` equality reproduces
  * exactly the plain `key` equality — result-identical to the unsalted
  * join, but the hot key's rows spread across `factor` reducers.
  */
object SkewJoin {

  /** Inner equi-join of `left` and `right` on `leftKey === rightKey`,
    * salted `factor` ways. The salt is xxhash64 of stable row CONTENT —
    * the key plus either `saltSource` or every other left column — never
    * RNG or partition-layout-dependent ids, so the plan stays deterministic
    * and retry-safe. (Rows that are full duplicates share a salt; salting
    * cannot spread literally identical rows.)
    */
  def salted(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, factor: Int,
      saltSource: Option[String] = None): DataFrame = {
    require(factor > 0)
    // the default all-columns basis must skip unhashable types: hash()
    // rejects MapType (analysis error), so a stray map column would fail
    // the whole join even though it is irrelevant to the salt
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val basisCols = saltSource.map(c => Seq(col(leftKey), col(c))).getOrElse {
      val names = left.schema.fields.filter(f => hashable(f.dataType))
        .map(_.name).toSeq
      // a basis of just the key can't spread a hot key at all — the
      // operator would silently degenerate to the unsalted join
      require(names.exists(_ != leftKey),
        "SkewJoin: no hashable non-key column for the default salt " +
          "basis — pass saltSource explicitly")
      names.map(col)
    }
    val saltBasis = xxhash64(basisCols: _*)
    val l = left.withColumn("__salt", pmod(saltBasis, lit(factor)).cast("int"))
    // sequence(0, f-1) is already array<int>; explode must be top-level
    // in its projection (no nesting inside cast)
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
      .drop("__salt")
  }
}
