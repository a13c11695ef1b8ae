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
    val basisCols = saltSource.map(c => Seq(col(leftKey), col(c)))
      .getOrElse(left.columns.toSeq.map(col))
    val saltBasis = xxhash64(basisCols: _*)
    val l = left.withColumn("__salt", pmod(saltBasis, lit(factor)).cast("int"))
    // sequence(0, f-1) is already array<int>; explode must be top-level
    // in its projection (no nesting inside cast)
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
      .drop("__salt")
  }
}
